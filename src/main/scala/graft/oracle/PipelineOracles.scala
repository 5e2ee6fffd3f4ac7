package graft.oracle

import graft.dedup.Dedup
import graft.functions.Portable
import graft.multimodal.Multimodal
import graft.similarity.{Pq, Similarity}
import graft.text.TextAnalysis

/** DuckDB oracle SQL for the LLM-pipeline operators. These are generated
  * (not hand-written) so the constants — thresholds, stopword lists, LSH
  * hyperplanes, band layouts — are read from the SAME Scala objects the
  * Spark queries use; the oracle replays the identical algorithm, making
  * even the approximate operators (minhash/simhash/LSH) EXACTLY
  * checkable.
  *
  * Shared arithmetic conventions (bit-identical across engines):
  *  - md5-derived hashes via CAST('0x'||substr(md5(..)..) AS BIGINT);
  *  - dot products as left-fold double accumulation (list_reduce with a
  *    prepended 0.0 == Spark aggregate(zip_with ..., 0.0, +));
  *  - hyperplane constants emitted as CAST(k AS DOUBLE)/524288 - 1 (k the
  *    20-bit splitmix output) — exact in both engines.
  */
object PipelineOracles {

  // ---- shared fragments -------------------------------------------------

  private val toks = """regexp_split_to_array(lower(text), '[ \t]')"""

  private def shingleSetsOver(rel: String) =
    s"""toks AS (SELECT doc_id, $toks AS w FROM $rel),
       |sets AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3
       |    THEN list_distinct(list_transform(generate_series(1, len(w)-2), i -> w[i]||' '||w[i+1]||' '||w[i+2]))
       |    ELSE CAST([] AS VARCHAR[]) END AS shs
       |  FROM toks),
       |shx AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
       |sizes AS (SELECT doc_id, len(shs) AS n FROM sets),
       |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private val shingleSets = shingleSetsOver("documents")

  /** Replays the pooled reference-LM bigram score: distinct bigrams per
    * doc, bigram/unigram document frequencies over the en reference
    * slice, exact BIGINT sums, one round6'd division.
    */
  val textLmScore: String =
    s"""WITH toks AS (SELECT doc_id, lang, $toks AS w FROM documents),
       |bsets AS (SELECT doc_id, lang,
       |  CASE WHEN len(w) >= 2
       |    THEN list_distinct(list_transform(generate_series(1, len(w)-1), i -> w[i]||' '||w[i+1]))
       |    ELSE CAST([] AS VARCHAR[]) END AS bgs
       |  FROM toks),
       |bgx AS MATERIALIZED (SELECT doc_id, lang, unnest(bgs) AS bg FROM bsets),
       |bcnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS bc FROM bgx WHERE lang = 'en' GROUP BY 1),
       |ucnt AS (SELECT w1, CAST(count(*) AS BIGINT) AS uc FROM (
       |  SELECT doc_id, unnest(list_distinct(w)) AS w1 FROM toks WHERE lang = 'en') GROUP BY 1),
       |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ucnt)
       |SELECT bgx.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  ${round6Sql("CAST(sum(coalesce(bc, 0) + 1) AS DOUBLE) / CAST(sum(coalesce(uc, 0) + v) AS DOUBLE)")} AS lm_score
       |FROM bgx
       |LEFT JOIN bcnt USING (bg)
       |LEFT JOIN ucnt ON ucnt.w1 = string_split(bgx.bg, ' ')[1]
       |CROSS JOIN vv
       |GROUP BY bgx.doc_id
       |ORDER BY bgx.doc_id""".stripMargin

  /** Replays the trained pooled-NB classifier: per-class token document
    * frequencies over the train split, exact BIGINT pooled sums per
    * (held-out doc, class), one double division, argmax with the
    * cls_rank tie-break — the same arithmetic Spark's max(struct) runs.
    */
  val textClassifier: String = {
    val m = TextAnalysis.ClsHeldMod
    s"""WITH toks AS (SELECT doc_id, lang, list_distinct($toks) AS w FROM documents),
       |tokx AS MATERIALIZED (SELECT doc_id, lang, unnest(w) AS t FROM toks),
       |train AS (SELECT * FROM tokx WHERE doc_id % $m <> 0),
       |model AS MATERIALIZED (SELECT t, lang AS cls, CAST(count(*) AS BIGINT) AS df
       |  FROM train GROUP BY 1, 2),
       |classes AS (SELECT cls, CAST(row_number() OVER (ORDER BY cls) AS BIGINT) AS cls_rank
       |  FROM (SELECT DISTINCT lang AS cls FROM train) c),
       |nc AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_c FROM documents
       |  WHERE doc_id % $m <> 0 GROUP BY 1),
       |vv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM model),
       |test AS (SELECT doc_id, t FROM tokx WHERE doc_id % $m = 0),
       |sc AS (SELECT test.doc_id, classes.cls, classes.cls_rank,
       |    CAST(count(*) AS BIGINT) AS n_d,
       |    CAST(sum(coalesce(model.df, 0) + 1) AS BIGINT) AS num
       |  FROM test CROSS JOIN classes
       |  LEFT JOIN model ON model.t = test.t AND model.cls = classes.cls
       |  GROUP BY 1, 2, 3),
       |p AS (SELECT doc_id, cls, cls_rank,
       |    CAST(num AS DOUBLE) / CAST(n_d * (n_c + v) AS DOUBLE) AS p
       |  FROM sc JOIN nc USING (cls) CROSS JOIN vv),
       |best AS (SELECT doc_id, cls, p,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY p DESC, cls_rank) AS rn FROM p)
       |SELECT d.doc_id, d.lang, coalesce(best.cls, 'und') AS pred_lang,
       |  ${round6Sql("coalesce(best.p, 0.0)")} AS score,
       |  CAST(CASE WHEN coalesce(best.cls, 'und') = d.lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
       |FROM documents d LEFT JOIN best ON best.doc_id = d.doc_id AND best.rn = 1
       |WHERE d.doc_id % $m = 0 ORDER BY d.doc_id""".stripMargin
  }

  /** Replays the deterministic shard shuffle: keyed-md5 order key, shard
    * = h mod S, position = rank of (h, doc_id) within the shard.
    */
  val textShuffleShards: String = {
    val s = graft.text.Sampling.ShuffleShards
    s"""WITH h AS (SELECT doc_id,
       |    CAST('0x' || substr(md5('shuffle#' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM documents)
       |SELECT doc_id, h % $s AS shard,
       |  CAST(row_number() OVER (PARTITION BY h % $s ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM h ORDER BY doc_id""".stripMargin
  }

  private def jaccardSelect(candTable: String, threshold: Double, ordered: Boolean = true): String = {
    val candJoin =
      if (candTable == "common") ""
      else s"\nJOIN common ON common.id_a = $candTable.id_a AND common.id_b = $candTable.id_b"
    s"""SELECT $candTable.id_a, $candTable.id_b, round(c / (sa.n + sb.n - c), 6) AS jaccard
       |FROM $candTable$candJoin
       |JOIN sizes sa ON sa.doc_id = $candTable.id_a
       |JOIN sizes sb ON sb.doc_id = $candTable.id_b
       |WHERE round(c / (sa.n + sb.n - c), 6) >= $threshold${if (ordered) "\nORDER BY 1, 2" else ""}""".stripMargin
  }

  /** Left-fold double dot product of two list columns (same accumulation
    * order as Portable.dot).
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Exact BIGINT dot product of two int-list columns (quantized ANN
    * path). Integer sums are associativity-free, so unlike dotSql no
    * fold-order contract is needed — any summation order agrees.
    */
  private def idotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS BIGINT) * CAST($b[i] AS BIGINT))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Chained-sum dot product against literal hyperplane constants — left
    * association matches the fold in Portable.dotConst.
    */
  private def dotConstSql(vec: String, plane: Array[Double]): String = {
    // recover the 20-bit k from the quantized value: v = k/2^19 - 1
    plane.zipWithIndex
      .map { case (v, i) =>
        val k = Math.round((v + 1.0) * 524288.0)
        s"CAST($vec[${i + 1}] AS DOUBLE)*(CAST($k AS DOUBLE)/524288-1)"
      }
      .mkString(" + ")
  }

  /** Integer sum of distinct powers of two — association-free, so the
    * per-plane terms are grouped in chunks of 8 to stay under DuckDB's
    * 128-deep expression binder limit (the inner float dot chains MUST
    * stay left-associated for parity and are depth-64 on their own).
    */
  private def lshSigSql(vec: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex
      .map { case (p, i) =>
        s"(CASE WHEN ${dotConstSql(vec, p)} > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
      }
      .grouped(8)
      .map(_.mkString("(", " + ", ")"))
      .mkString(" + ")

  private def stopList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def hitsSql(words: Seq[String]): String =
    s"CAST(len(list_filter(w, t -> list_contains(${stopList(words)}, t))) AS BIGINT)"

  /** Portable 6dp rounding: floor(x·10⁶ + 0.5)/10⁶ — the identical IEEE
    * sequence TextAnalysis.round6 runs, immune to the engines' differing
    * round() boundary behavior (see that scaladoc).
    */
  private def round6Sql(x: String): String = s"floor(($x) * 1e6 + 0.5) / 1e6"

  // ---- dedup ------------------------------------------------------------

  val dedupExact: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Candidates = pairs sharing ≥1 shingle ≡ pairs with common > 0, so the
    * inverted-index query IS the exact all-pairs result.
    */
  val dedupNgramJaccard: String =
    s"""WITH $shingleSets
       |${jaccardSelect("common", Dedup.NgramThreshold)}""".stripMargin

  /** Replays asymmetric containment: same inverted-index intersection
    * counts, max-direction ratio, portable 6dp rounding.
    */
  val dedupContainment: String =
    s"""WITH $shingleSets
       |SELECT common.id_a, common.id_b,
       |  ${round6Sql("greatest(c / sa.n, c / sb.n)")} AS containment
       |FROM common
       |JOIN sizes sa ON sa.doc_id = common.id_a
       |JOIN sizes sb ON sb.doc_id = common.id_b
       |WHERE ${round6Sql("greatest(c / sa.n, c / sb.n)")} >= ${Dedup.ContainmentThreshold}
       |ORDER BY 1, 2""".stripMargin

  /** Replays the stop-shingle-capped variant: intersection counts over
    * the pruned index (shingles with document frequency above the cap
    * dropped before the self-join), sizes over the full sets —
    * conservative lower-bound jaccard, mirroring
    * Dedup.ngramJaccard(maxShingleDf = Some(cap)).
    */
  def dedupNgramCapped(cap: Int): String =
    s"""WITH $shingleSets,
       |dfreq AS (SELECT sh, count(*) AS df FROM shx GROUP BY sh),
       |shc AS (SELECT shx.doc_id, shx.sh FROM shx JOIN dfreq USING (sh) WHERE df <= $cap),
       |candc AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT candc.id_a, candc.id_b, round(c / (sa.n + sb.n - c), 6) AS jaccard
       |FROM candc
       |JOIN sizes sa ON sa.doc_id = candc.id_a
       |JOIN sizes sb ON sb.doc_id = candc.id_b
       |WHERE round(c / (sa.n + sb.n - c), 6) >= ${Dedup.NgramThreshold}
       |ORDER BY 1, 2""".stripMargin

  /** Replays the df-capped containment variant: intersections over the
    * pruned index, sizes over the full sets (conservative lower bound —
    * same construction as dedupNgramCapped for the asymmetric measure).
    */
  def dedupContainmentCapped(cap: Int): String =
    s"""WITH $shingleSets,
       |dfreq AS (SELECT sh, count(*) AS df FROM shx GROUP BY sh),
       |shc AS (SELECT shx.doc_id, shx.sh FROM shx JOIN dfreq USING (sh) WHERE df <= $cap),
       |candc AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT candc.id_a, candc.id_b,
       |  ${round6Sql("greatest(c / sa.n, c / sb.n)")} AS containment
       |FROM candc
       |JOIN sizes sa ON sa.doc_id = candc.id_a
       |JOIN sizes sb ON sb.doc_id = candc.id_b
       |WHERE ${round6Sql("greatest(c / sa.n, c / sb.n)")} >= ${Dedup.ContainmentThreshold}
       |ORDER BY 1, 2""".stripMargin

  /** Replays the minhash signatures (8 md5 seeds × 4 hex chunks = 32
    * hashes) and the b=16/r=2 banding (a band matches when BOTH of its
    * two member hashes agree), then the same exact-Jaccard verification.
    */
  // CTE chain through the banded signatures, shared by the self-dedup
  // (dedupMinhash/dedupClusters) and incremental-ingest replays
  private def minhashBandCtesOver(rel: String): String =
    s"""${shingleSetsOver(rel)},
       |mh AS (
       |  SELECT doc_id, ss.s * 4 + cc.c AS i,
       |    min(CAST('0x' || substr(md5(sh || '#' || CAST(ss.s AS VARCHAR)), 1 + 8 * cc.c, 8) AS BIGINT)) AS v
       |  FROM shx, (SELECT unnest(generate_series(0, ${Dedup.MinhashSeeds - 1})) AS s) ss,
       |       (SELECT unnest(generate_series(0, 3)) AS c) cc
       |  GROUP BY doc_id, ss.s * 4 + cc.c),
       |bands AS (SELECT e.doc_id, e.i // 2 AS band, e.v AS v1, o.v AS v2
       |  FROM mh e JOIN mh o ON o.doc_id = e.doc_id AND o.i = e.i + 1
       |  WHERE e.i % 2 = 0)""".stripMargin

  private val minhashBandCtes: String = minhashBandCtesOver("documents")

  private val minhashCtes: String =
    s"""$minhashBandCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id)""".stripMargin

  /** Band-bucket-capped candidate CTEs (the `Dedup.MinhashBucketCap`
    * replay): buckets over the cap leave BEFORE the candidate
    * self-join. Drop-in alternative to [[minhashCtes]]'s `cand`.
    */
  private val cappedCandCtes: String =
    s"""bandsm AS MATERIALIZED (SELECT * FROM bands),
       |bdf AS (SELECT band, v1, v2 FROM bandsm
       |  GROUP BY 1, 2, 3 HAVING count(*) <= ${Dedup.MinhashBucketCap}),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandsm a
       |  JOIN bdf ON bdf.band = a.band AND bdf.v1 = a.v1 AND bdf.v2 = a.v2
       |  JOIN bandsm b ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id)""".stripMargin

  /** Replays incremental ingest dedup: same NewBatchMod split, same
    * exact-hash semi-join, same batch×corpus band candidates, same
    * verified-Jaccard near-dup minimum. `corpusLive` further restricts
    * which EXISTING-corpus docs the index still holds (the delete
    * variant's tombstone predicate); the batch side is never filtered.
    */
  val dedupIncremental: String = dedupIncrementalReplay(_ => "TRUE")

  /** Admission after the index takedown: identical replay with the
    * victims absent from BOTH duplicate sources (exact-hash and banded
    * candidates) — a batch doc whose only match was a victim flips to
    * admitted, the right-to-be-forgotten semantics the spec pins on a
    * planted pair. Replays the CAPPED admission arm the delete-family
    * serves ride (live-bucket census: victims leave before population
    * is counted), mirroring Dedup.indexDeleted.
    */
  val dedupIndexDelete: String = dedupIncrementalReplay(
    c => s"NOT ($c % ${Dedup.IndexDeleteMod} = ${Dedup.IndexDeleteRem})",
    bucketCap = Some(Dedup.MinhashBucketCap)
  )

  /** Capped-ingest replay: INDEX band buckets with population over
    * MinhashBucketCap leave before the batch×index candidate join —
    * the exact-hash arm stays uncapped, mirroring the engine.
    */
  val dedupIncrementalCapped: String =
    dedupIncrementalReplay(_ => "TRUE", bucketCap = Some(Dedup.MinhashBucketCap))

  /** Replays the FULL admission tick over the same planted arrivals
    * the engine derives (exact twins and one-token near-twins of
    * selected batch docs): intra-batch exact (md5, min smaller id),
    * intra-batch verified-near (banded candidates among batch docs,
    * same Jaccard arithmetic), then the CAPPED index-side checks (the
    * dedup_incremental_capped arm: hot index buckets leave before the
    * candidate join) — keep requires surviving ALL FOUR arms.
    */
  val dedupBatchAdmit: String = {
    val m = Dedup.NewBatchMod
    val thr = Dedup.JaccardThreshold
    s"""WITH alldocs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + ${Dedup.BatchTwinBase} AS doc_id, text FROM documents
       |    WHERE doc_id % $m = 0 AND doc_id % ${Dedup.BatchTwinMod} = 0
       |  UNION ALL SELECT doc_id + ${Dedup.BatchTwinBase} AS doc_id,
       |      text || '${Dedup.BatchNearSuffix}' AS text FROM documents
       |    WHERE doc_id % $m = 0 AND doc_id % ${Dedup.BatchTwinMod} = ${Dedup.BatchNearTwinRem}),
       |${minhashBandCtesOver("alldocs")},
       |bex AS (SELECT n.doc_id, min(o.doc_id) AS bx
       |  FROM alldocs n JOIN alldocs o
       |    ON md5(n.text) = md5(o.text) AND o.doc_id < n.doc_id AND o.doc_id % $m = 0
       |  WHERE n.doc_id % $m = 0 GROUP BY 1),
       |bbc AS (SELECT band, v1, v2 FROM bands WHERE doc_id % $m = 0
       |  GROUP BY 1, 2, 3 HAVING count(*) <= ${Dedup.MinhashBucketCap}),
       |bcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND b.doc_id < a.doc_id
       |  JOIN bbc ON bbc.band = a.band AND bbc.v1 = a.v1 AND bbc.v2 = a.v2
       |  WHERE a.doc_id % $m = 0 AND b.doc_id % $m = 0),
       |bint AS (SELECT bcand.id_a, bcand.id_b, count(*) AS c
       |  FROM bcand
       |  JOIN shx sa ON sa.doc_id = bcand.id_a
       |  JOIN shx sb ON sb.doc_id = bcand.id_b AND sb.sh = sa.sh
       |  GROUP BY 1, 2),
       |bnear AS (SELECT bint.id_a AS doc_id, min(bint.id_b) AS bn
       |  FROM bint
       |  JOIN sizes za ON za.doc_id = bint.id_a
       |  JOIN sizes zb ON zb.doc_id = bint.id_b
       |  WHERE round(c / (za.n + zb.n - c), 6) >= $thr
       |  GROUP BY 1),
       |idxbc AS (SELECT band, v1, v2 FROM bands WHERE doc_id % $m <> 0
       |  GROUP BY 1, 2, 3 HAVING count(*) <= ${Dedup.MinhashBucketCap}),
       |candn AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2
       |  JOIN idxbc ON idxbc.band = b.band AND idxbc.v1 = b.v1 AND idxbc.v2 = b.v2
       |  WHERE a.doc_id % $m = 0 AND b.doc_id % $m <> 0),
       |cint AS (SELECT candn.id_a, candn.id_b, count(*) AS c
       |  FROM candn
       |  JOIN shx sa ON sa.doc_id = candn.id_a
       |  JOIN shx sb ON sb.doc_id = candn.id_b AND sb.sh = sa.sh
       |  GROUP BY 1, 2),
       |near AS (SELECT cint.id_a AS doc_id, min(cint.id_b) AS near_dup_of
       |  FROM cint
       |  JOIN sizes za ON za.doc_id = cint.id_a
       |  JOIN sizes zb ON zb.doc_id = cint.id_b
       |  WHERE round(c / (za.n + zb.n - c), 6) >= $thr
       |  GROUP BY 1),
       |ex AS (SELECT DISTINCT n.doc_id
       |  FROM alldocs n JOIN alldocs o
       |    ON md5(n.text) = md5(o.text) AND o.doc_id % $m <> 0
       |  WHERE n.doc_id % $m = 0)
       |SELECT d.doc_id,
       |  CASE WHEN bex.bx IS NOT NULL OR bnear.bn IS NOT NULL
       |    THEN least(COALESCE(bex.bx, bnear.bn), COALESCE(bnear.bn, bex.bx)) END AS batch_dup_of,
       |  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       |  near.near_dup_of,
       |  CAST(CASE WHEN bex.bx IS NULL AND bnear.bn IS NULL
       |      AND ex.doc_id IS NULL AND near.near_dup_of IS NULL
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM alldocs d
       |LEFT JOIN bex ON bex.doc_id = d.doc_id
       |LEFT JOIN bnear ON bnear.doc_id = d.doc_id
       |LEFT JOIN ex ON ex.doc_id = d.doc_id
       |LEFT JOIN near ON near.doc_id = d.doc_id
       |WHERE d.doc_id % $m = 0
       |ORDER BY d.doc_id""".stripMargin
  }

  private def dedupIncrementalReplay(
      corpusLive: String => String,
      bucketCap: Option[Int] = None
  ): String = {
    // the bucket census runs over the LIVE index view (victims absent),
    // mirroring the engine: dedupBatchAgainstIndexDf counts bucket
    // population on the frame it is handed, which for the delete family
    // is `stored ∖ DV` — so a victim leaving a bucket can re-enable it
    val capCte = bucketCap
      .map(c =>
        s"""idxbc AS (SELECT band, v1, v2 FROM bands
           |  WHERE doc_id % ${Dedup.NewBatchMod} <> 0 AND ${corpusLive("doc_id")}
           |  GROUP BY 1, 2, 3 HAVING count(*) <= $c),
           |""".stripMargin
      )
      .getOrElse("")
    val capJoin =
      if (bucketCap.isDefined)
        "\n  JOIN idxbc ON idxbc.band = b.band AND idxbc.v1 = b.v1 AND idxbc.v2 = b.v2"
      else ""
    s"""WITH $minhashBandCtes,
       |${capCte}candn AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2$capJoin
       |  WHERE a.doc_id % ${Dedup.NewBatchMod} = 0 AND b.doc_id % ${Dedup.NewBatchMod} <> 0
       |    AND ${corpusLive("b.doc_id")}),
       |cint AS (SELECT candn.id_a, candn.id_b, count(*) AS c
       |  FROM candn
       |  JOIN shx sa ON sa.doc_id = candn.id_a
       |  JOIN shx sb ON sb.doc_id = candn.id_b AND sb.sh = sa.sh
       |  GROUP BY 1, 2),
       |near AS (SELECT cint.id_a AS doc_id, min(cint.id_b) AS near_dup_of
       |  FROM cint
       |  JOIN sizes za ON za.doc_id = cint.id_a
       |  JOIN sizes zb ON zb.doc_id = cint.id_b
       |  WHERE round(c / (za.n + zb.n - c), 6) >= ${Dedup.JaccardThreshold}
       |  GROUP BY 1),
       |ex AS (SELECT DISTINCT n.doc_id
       |  FROM documents n JOIN documents o
       |    ON md5(n.text) = md5(o.text) AND o.doc_id % ${Dedup.NewBatchMod} <> 0
       |      AND ${corpusLive("o.doc_id")}
       |  WHERE n.doc_id % ${Dedup.NewBatchMod} = 0)
       |SELECT d.doc_id,
       |  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       |  near.near_dup_of,
       |  CAST(CASE WHEN ex.doc_id IS NULL AND near.near_dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM documents d
       |LEFT JOIN ex ON ex.doc_id = d.doc_id
       |LEFT JOIN near ON near.doc_id = d.doc_id
       |WHERE d.doc_id % ${Dedup.NewBatchMod} = 0
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Replays the cap-selection ledger: exact per-shingle df, the 3-cap
    * grid, and the C(df,2)-mass arithmetic in BIGINT (df·(df−1) is even,
    * so // 2 is exact in both engines).
    */
  val dedupCapProfile: String = {
    val unc = "sum(df * (df - 1) // 2)"
    val cap = "sum(least(df, cap) * (least(df, cap) - 1) // 2)"
    s"""WITH $shingleSets,
       |dfs AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shx GROUP BY 1),
       |caps AS (SELECT CAST(unnest([${Dedup.CapGrid.mkString(", ")}]) AS BIGINT) AS cap)
       |SELECT cap,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN df > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
       |  ${round6Sql("CAST(sum(CASE WHEN df > cap THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS hot_frac,
       |  CAST($unc AS BIGINT) AS pairs_uncapped,
       |  CAST($cap AS BIGINT) AS pairs_capped,
       |  CASE WHEN $unc > 0
       |    THEN ${round6Sql(s"CAST($unc - $cap AS DOUBLE) / CAST($unc AS DOUBLE)")}
       |    ELSE 0.0 END AS pairs_saved_frac
       |FROM dfs, caps
       |GROUP BY cap ORDER BY cap""".stripMargin
  }

  /** Replays the streaming ingest gate: batch-split docs against the
    * corpus-derived index — exact md5 hits, plus the smallest corpus doc
    * sharing any LSH band (bucket-min lookup, UNVERIFIED candidate by
    * design — the stream gate is the admission filter; verification is
    * the batch compaction dedupIncremental replays).
    */
  val streamIngestDedup: String =
    s"""WITH $minhashBandCtes,
       |bandmin AS (SELECT band, v1, v2, min(doc_id) AS cand_id FROM bands
       |  WHERE doc_id % ${Dedup.NewBatchMod} <> 0 GROUP BY 1, 2, 3),
       |near AS (SELECT a.doc_id, min(bm.cand_id) AS lsh_candidate_of
       |  FROM bands a JOIN bandmin bm ON bm.band = a.band AND bm.v1 = a.v1 AND bm.v2 = a.v2
       |  WHERE a.doc_id % ${Dedup.NewBatchMod} = 0 GROUP BY 1),
       |ex AS (SELECT DISTINCT n.doc_id
       |  FROM documents n JOIN documents o
       |    ON md5(n.text) = md5(o.text) AND o.doc_id % ${Dedup.NewBatchMod} <> 0
       |  WHERE n.doc_id % ${Dedup.NewBatchMod} = 0)
       |SELECT d.doc_id,
       |  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       |  near.lsh_candidate_of,
       |  CAST(CASE WHEN ex.doc_id IS NULL AND near.lsh_candidate_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM documents d
       |LEFT JOIN ex ON ex.doc_id = d.doc_id
       |LEFT JOIN near ON near.doc_id = d.doc_id
       |WHERE d.doc_id % ${Dedup.NewBatchMod} = 0
       |ORDER BY d.doc_id""".stripMargin

  val dedupMinhash: String =
    s"""WITH $minhashCtes
       |${jaccardSelect("cand", Dedup.JaccardThreshold)}""".stripMargin

  /** Replays the band-bucket-capped LSH variant: buckets holding more
    * than MinhashBucketCap docs are dropped before the candidate
    * self-join (joining the kept-bucket set on side a suffices — the
    * join key forces side b into the same bucket).
    */
  val dedupMinhashCapped: String =
    s"""WITH $minhashBandCtes,
       |$cappedCandCtes
       |${jaccardSelect("cand", Dedup.JaccardThreshold)}""".stripMargin

  /** Replays the recall evaluation off the SAME shared CTEs: exact
    * pairs from the inverted index (`common`), verified LSH pairs from
    * the band candidates (`cand`), exact integer counts, one rounded
    * division. The pair sets are MATERIALIZED — each is referenced
    * twice, and DuckDB would otherwise inline (re-evaluate) the whole
    * shingle + minhash chain per reference (see graphTriangles).
    */
  val dedupLshRecall: String =
    s"""WITH $minhashCtes,
       |ex AS MATERIALIZED (SELECT id_a, id_b FROM (${jaccardSelect("common", Dedup.NgramThreshold, ordered = false)})),
       |lv AS MATERIALIZED (SELECT id_a, id_b FROM (${jaccardSelect("cand", Dedup.JaccardThreshold, ordered = false)})),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
       |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lv),
       |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM ex JOIN lv USING (id_a, id_b))
       |SELECT n_exact, n_lsh, n_hit,
       |  CASE WHEN n_exact > 0 THEN ${round6Sql("n_hit / n_exact")} ELSE 1.0 END AS recall
       |FROM ne, nl, h""".stripMargin

  /** Connected components over the minhash-LSH pair set via a recursive
    * min-reachable-label CTE: `reach` accumulates, for every doc, every
    * label reachable over pair edges (seeded with the doc's own id);
    * min(reachable) is the component minimum — the same fixpoint the
    * engine's label propagation converges to. Singletons (docs in no
    * pair) keep their own id through the seed row.
    */
  // pairs → symmetric edges → min-reachable labels → components (cc);
  // shared by dedupClusters[Capped], dedupKeepBest[Capped] and
  // pipelineCurateFuzzy — the `cand` CTE supplied upstream picks the
  // edge source (exact vs band-bucket-capped LSH pairs)
  private val componentCtes: String =
    s"""pairs AS (${jaccardSelect("cand", Dedup.JaccardThreshold, ordered = false)}),
       |e AS (SELECT id_a AS u, id_b AS v FROM pairs UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
       |reach(u, lbl) AS (
       |  SELECT doc_id AS u, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v),
       |cc AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u)""".stripMargin

  private def clustersSql(candCtes: String): String =
    s"""WITH RECURSIVE $candCtes,
       |$componentCtes,
       |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
       |SELECT cc.doc_id, cc.cluster_id, cs.cluster_size,
       |  CAST(CASE WHEN cc.doc_id = cc.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
       |FROM cc JOIN cs USING (cluster_id)
       |ORDER BY cc.doc_id""".stripMargin

  val dedupClusters: String = clustersSql(minhashCtes)

  /** Same components contract over the CAPPED edge set — the
    * production edge source (capped edges ⊆ exact edges, so these
    * components refine the exact ones; the refinement is spec-pinned).
    */
  val dedupClustersCapped: String =
    clustersSql(s"$minhashBandCtes,\n$cappedCandCtes")

  /** Replays keep-best-in-cluster: the shared minhash-LSH components
    * (cc) joined with the text_quality composite (re-using the `toks`
    * CTE the shingle chain already defines), winner per cluster by
    * (quality_score DESC, doc_id) — quality_score is the round6'd
    * composite both engines agree on bit-for-bit. `scored` is
    * referenced three times (rows, winner, sizes) → MATERIALIZED, so
    * the recursive component fixpoint and the quality chain run once.
    */
  private def keepBestSql(candCtes: String): String =
    s"""WITH RECURSIVE $candCtes,
       |$componentCtes,
       |qb AS (SELECT doc_id,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |  ${hitsSql(TextAnalysis.StopEn)} AS stop_hits
       |  FROM toks),
       |qs AS (SELECT doc_id, ${round6Sql(
        """CAST(0.3 AS DOUBLE) * (stop_hits / n_tokens)
          |        + CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), n_tokens / CAST(100.0 AS DOUBLE))
          |        + CAST(0.3 AS DOUBLE) * (n_distinct / n_tokens)""".stripMargin
      )} AS quality_score
       |  FROM qb),
       |kb_scored AS MATERIALIZED (SELECT cc.doc_id, cc.cluster_id, qs.quality_score
       |  FROM cc JOIN qs USING (doc_id)),
       |kb_best AS (SELECT cluster_id, doc_id AS kept_id FROM (
       |  SELECT cluster_id, doc_id,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_score DESC, doc_id) AS rn
       |  FROM kb_scored) WHERE rn = 1),
       |kb_cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM kb_scored GROUP BY 1)
       |SELECT s.doc_id, s.cluster_id, kb_cs.cluster_size, s.quality_score, kb_best.kept_id,
       |  CAST(CASE WHEN s.doc_id = kb_best.kept_id THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM kb_scored s
       |JOIN kb_best USING (cluster_id)
       |JOIN kb_cs USING (cluster_id)
       |ORDER BY s.doc_id""".stripMargin

  val dedupKeepBest: String = keepBestSql(minhashCtes)

  /** Keep-best over the CAPPED edge set — see [[dedupClustersCapped]]. */
  val dedupKeepBestCapped: String =
    keepBestSql(s"$minhashBandCtes,\n$cappedCandCtes")

  /** Shared simhash signature CTE chain (toks → per-token md5 nibbles →
    * 64 signed bit sums → packed 64-bit signature), replaying
    * `Dedup.simhashSignatures` bit-for-bit.
    */
  private val simhashSigCtes: String = {
    val nibbleCols = (1 to Dedup.SimhashBits / 4)
      .map(p => s"CAST('0x' || substr(md5(t), $p, 1) AS INT) AS n$p")
      .mkString(", ")
    val sumCols = (0 until Dedup.SimhashBits)
      .map(j => s"sum(CASE WHEN ((n${j / 4 + 1} >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val sigExpr = (0 until Dedup.SimhashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""toks AS (SELECT doc_id, list_distinct($toks) AS w FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS t FROM toks),
       |nib AS (SELECT doc_id, $nibbleCols FROM tok),
       |sums AS (SELECT doc_id, $sumCols FROM nib GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS simhash FROM sums)""".stripMargin
  }

  /** Brute-force hamming pairs over replayed 64-bit simhash signatures
    * (the Spark side's banding is exact by pigeonhole, so brute force is
    * the same set).
    */
  val dedupSimhash: String =
    s"""WITH $simhashSigCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimhashMaxHamming}
       |ORDER BY id_a, id_b""".stripMargin

  /** Replays the band-bucket-capped simhash variant: the 4×16-bit band
    * layout, band buckets holding more than SimhashBucketCap docs dropped
    * before the candidate self-join (joining the kept-bucket set on side
    * a suffices — the join key forces side b into the same bucket), then
    * the exact hamming ≤ MaxHamming verification. The band CTE is
    * MATERIALIZED: it is referenced three times and DuckDB would
    * otherwise re-evaluate the whole signature chain per reference.
    */
  val dedupSimhashCapped: String = {
    val mask = (1L << Dedup.SimhashBandBits) - 1
    s"""WITH $simhashSigCtes,
       |bands AS MATERIALIZED (SELECT doc_id, simhash, bb.b AS band,
       |    ((simhash >> (${Dedup.SimhashBandBits} * bb.b)) & $mask) AS bucket
       |  FROM sig, (SELECT unnest(generate_series(0, ${Dedup.SimhashBands - 1})) AS b) bb),
       |keep AS (SELECT band, bucket FROM bands
       |  GROUP BY 1, 2 HAVING count(*) <= ${Dedup.SimhashBucketCap})
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM bands a
       |JOIN keep ON keep.band = a.band AND keep.bucket = a.bucket
       |JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimhashMaxHamming}
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val planes = Portable.hyperplanes(Dedup.EmbedPlanes, 64)

  private val embNorms =
    s"""norms AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings)""".stripMargin

  private def embBands(src: String): String =
    s"""sig AS (SELECT vec_id, embedding, nrm, ${lshSigSql("embedding", planes)} AS s FROM $src),
       |bands AS (SELECT vec_id, bb.b AS band,
       |    ((s >> (${Dedup.EmbedBandBits} * bb.b)) & ${(1L << Dedup.EmbedBandBits) - 1}) AS bucket
       |  FROM sig, (SELECT unnest(generate_series(0, ${Dedup.EmbedBands - 1})) AS b) bb)""".stripMargin

  /** Replays hyperplane signatures, the shared band layout
    * (Dedup.EmbedBands × Dedup.EmbedBandBits), and exact cosine
    * verification.
    */
  val dedupEmbedding: String =
    s"""WITH $embNorms,
       |${embBands("norms")},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (SELECT id_a, id_b,
       |    ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
       |  FROM cand JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b)
       |SELECT id_a, id_b, round(cosine, 6) AS cosine FROM scored
       |WHERE cosine >= ${Dedup.EmbedCosThreshold}
       |ORDER BY id_a, id_b""".stripMargin

  // ---- similarity search ------------------------------------------------

  val simTopK: String =
    s"""WITH $embNorms,
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM norms WHERE vec_id < ${Similarity.NumQueries}),
       |scored AS (SELECT q.query_id, n.vec_id AS neighbor_id,
       |    ${dotSql("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cosine
       |  FROM q, norms n WHERE n.vec_id <> q.query_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= ${Similarity.TopK} ORDER BY query_id, rank""".stripMargin

  /** MMR replay: the greedy diversification unrolled into one CTE per
    * pick. Candidate pool and pairwise sims use the same left-fold dot
    * as every cosine oracle (bit-identical doubles), the λ/(1−λ)
    * weights are the same decimal literals the Spark side uses, and
    * every argmax breaks ties by cand_id — so each pick's comparison
    * runs on identical IEEE values and the greedy trajectories cannot
    * diverge.
    */
  val simMmrDiversify: String = {
    import graft.similarity.Similarity.{MmrLambda, MmrPenaltyW, MmrPool, MmrSelect, NumQueries}
    val steps = (2 to MmrSelect)
      .map { k =>
        s"""rem$k AS (SELECT c.* FROM cand c LEFT JOIN sel${k - 1} s
           |  ON s.query_id = c.query_id AND s.cand_id = c.cand_id WHERE s.cand_id IS NULL),
           |pen$k AS (SELECT r.query_id, r.cand_id, r.rel, max(s.sim) AS pen
           |  FROM rem$k r JOIN sims s ON s.query_id = r.query_id AND s.a_id = r.cand_id
           |  JOIN sel${k - 1} z ON z.query_id = s.query_id AND z.cand_id = s.b_id
           |  GROUP BY 1, 2, 3),
           |s$k AS (SELECT query_id, cand_id, rel, mmr FROM (
           |  SELECT query_id, cand_id, rel, $MmrLambda*rel - $MmrPenaltyW*pen AS mmr,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY $MmrLambda*rel - $MmrPenaltyW*pen DESC, cand_id) AS rn
           |  FROM pen$k) WHERE rn = 1),
           |sel$k AS (SELECT query_id, cand_id FROM sel${k - 1}
           |  UNION ALL SELECT query_id, cand_id FROM s$k)""".stripMargin
      }
      .mkString(",\n")
    val picks = (1 to MmrSelect)
      .map { k =>
        s"""SELECT query_id, CAST($k AS BIGINT) AS pick, cand_id,
           |  ${round6Sql("rel")} AS rel, ${round6Sql("mmr")} AS mmr_score FROM s$k""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH $embNorms,
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM norms WHERE vec_id < $NumQueries),
       |scored AS (SELECT q.query_id, n.vec_id AS cand_id,
       |    ${dotSql("q.qe", "n.embedding")} / (q.qn * n.nrm) AS rel
       |  FROM q, norms n WHERE n.vec_id <> q.query_id),
       |cand AS (SELECT query_id, cand_id, rel FROM (
       |  SELECT query_id, cand_id, rel,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
       |  FROM scored) WHERE rn <= $MmrPool),
       |sims AS (SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
       |    ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS sim
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
       |  JOIN norms na ON na.vec_id = a.cand_id JOIN norms nb ON nb.vec_id = b.cand_id),
       |s1 AS (SELECT query_id, cand_id, rel, $MmrLambda*rel - $MmrPenaltyW*0 AS mmr FROM (
       |  SELECT query_id, cand_id, rel,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
       |  FROM cand) WHERE rn = 1),
       |sel1 AS (SELECT query_id, cand_id FROM s1),
       |$steps
       |$picks
       |ORDER BY query_id, pick""".stripMargin
  }

  /** ε-ball replay: same cosine arithmetic as simTopK, thresholded on
    * the UNROUNDED value (both engines compute bit-identical doubles,
    * so the τ comparison can never straddle the rounding).
    */
  val simRangeSearch: String =
    s"""WITH $embNorms,
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM norms WHERE vec_id < ${Similarity.NumQueries}),
       |scored AS (SELECT q.query_id, n.vec_id AS neighbor_id,
       |    ${dotSql("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cosine
       |  FROM q, norms n WHERE n.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine
       |FROM scored WHERE cosine >= ${Similarity.RangeTau}
       |ORDER BY query_id, neighbor_id""".stripMargin

  /** Replays int8 scalar quantization end-to-end: the same corpus-wide
    * max|component| scale, the same round-half-up component mapping
    * (floor(x·scl + 0.5) — double ops in identical order), exact BIGINT
    * dots, and the boundary-safe floor-based 6dp rounding (quantized
    * cosines are integer ratios, exactly the class that can land on
    * decimal-.5 boundaries where the engines' round() disagree).
    */
  val simQuantized: String = {
    val q = Similarity.QuantRange
    s"""WITH ma AS (SELECT max(list_max(list_transform(embedding, x -> abs(x)))) AS max_abs
       |  FROM embeddings),
       |quant0 AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * ($q / CAST(max_abs AS DOUBLE)) + 0.5) AS INT)) AS qe
       |  FROM embeddings, ma),
       |quant1 AS (SELECT vec_id, qe, sqrt(CAST(${idotSql("qe", "qe")} AS DOUBLE)) AS qn FROM quant0),
       |quant AS (SELECT * FROM quant1 WHERE qn > 0),
       |q AS (SELECT vec_id AS query_id, qe AS qq, qn AS qqn FROM quant WHERE vec_id < ${Similarity.NumQueries}),
       |scored AS (SELECT q.query_id, n.vec_id AS neighbor_id,
       |    CAST(${idotSql("q.qq", "n.qe")} AS DOUBLE) / (q.qqn * n.qn) AS cosine
       |  FROM q, quant n WHERE n.vec_id <> q.query_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, ${round6Sql("cosine")} AS cosine
       |FROM ranked WHERE rank <= ${Similarity.TopK} ORDER BY query_id, rank""".stripMargin
  }

  val simAnnLsh: String =
    s"""WITH $embNorms,
       |${embBands("norms")},
       |qb AS (SELECT vec_id AS query_id, band, bucket FROM bands WHERE vec_id < ${Similarity.NumQueries}),
       |cand AS (SELECT DISTINCT qb.query_id, bands.vec_id
       |  FROM bands JOIN qb ON bands.band = qb.band AND bands.bucket = qb.bucket
       |  WHERE bands.vec_id <> qb.query_id),
       |scored AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cosine
       |  FROM cand JOIN norms q ON q.vec_id = cand.query_id JOIN norms e ON e.vec_id = cand.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** CTE chain ending in `ranked` — the corpus-wide kNN graph: symmetric
    * band-bucket candidates (both directions of every collision), exact
    * cosine re-rank, row_number per source. Shared by simKnnGraph and
    * graphTriangles so both replay the identical graph.
    */
  private val knnRankedCtes: String =
    s"""$embNorms,
       |${embBands("norms")},
       |cand AS (SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |scored AS (SELECT cand.src_id, cand.dst_id,
       |    ${dotSql("s.embedding", "d.embedding")} / (s.nrm * d.nrm) AS cosine
       |  FROM cand JOIN norms s ON s.vec_id = cand.src_id JOIN norms d ON d.vec_id = cand.dst_id),
       |ranked AS (SELECT src_id, dst_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, dst_id) AS INT) AS rank
       |  FROM scored)""".stripMargin

  /** Replays the corpus-wide kNN graph: top GraphK per source vector. */
  val simKnnGraph: String =
    s"""WITH $knnRankedCtes
       |SELECT src_id, dst_id, rank, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= ${Similarity.GraphK} ORDER BY src_id, rank""".stripMargin

  /** Replays degree-ordered triangle counting over the same kNN graph:
    * identical undirected edge set, identical (degree, id) orientation
    * and wedge ordering, exact integer counts, one rounded double
    * division for the clustering coefficient.
    *
    * The small intermediate sets are MATERIALIZED: DuckDB inlines
    * plain CTEs per reference, so the multiply-referenced edge list
    * would re-evaluate the entire 64-plane kNN chain each time (~25×
    * slower and an OOM risk under a loaded oracle session).
    */
  val graphTriangles: String =
    s"""WITH $knnRankedCtes,
       |knn AS MATERIALIZED (SELECT src_id, dst_id FROM ranked WHERE rank <= ${Similarity.GraphK}),
       |und AS MATERIALIZED (SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b FROM knn),
       |degs AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) GROUP BY node),
       |oe AS MATERIALIZED (SELECT
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b) THEN und.a ELSE und.b END AS u,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b) THEN und.b ELSE und.a END AS v,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b) THEN db.deg ELSE da.deg END AS dv
       |  FROM und JOIN degs da ON da.node = und.a JOIN degs db ON db.node = und.b),
       |w AS (SELECT e1.v AS x, e2.v AS y FROM oe e1 JOIN oe e2
       |  ON e1.u = e2.u AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))),
       |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w JOIN oe ON oe.u = w.x AND oe.v = w.y),
       |vstats AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       |    CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM degs),
       |estats AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
       |SELECT n_vertices, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges > 0
       |    THEN ${round6Sql("(3.0 * CAST(n_triangles AS DOUBLE)) / CAST(n_wedges AS DOUBLE)")}
       |    ELSE 0.0 END AS global_clustering
       |FROM vstats, estats, tri""".stripMargin

  /** Replays the IVF pipeline INCLUDING quantizer training: stride-
    * sample init, then Similarity.IvfLloydRounds Lloyd iterations —
    * nearest-cell assignment (ties to the lowest centroid id, same rule
    * as the Spark argmax) and a per-dimension mean over components
    * quantized to integers (floor(x·2²⁰+0.5)), whose sum is associative
    * and therefore identical across engines regardless of row order.
    * Then: nprobe nearest cells per query, exact cosine re-rank.
    */
  /** Shared IVF replay prefix: embNorms + stride-sample init +
    * IvfLloydRounds deterministic Lloyd rounds + every vector's nearest
    * cell (`cell`), exactly as `Similarity.lloydCentroids` computes them.
    * Used by simAnnIvf (probe path) and dedupSemantic (cluster-bounded
    * pair path).
    */
  /** `trainWhere`/`initOffset` let the append-index variant train the
    * quantizer on a slice (the base corpus) while `cell`/`cell_rank`
    * still assign EVERY vector against the trained centroids — the
    * stored-postings ∪ tick-assignment union the Spark side serves.
    * ("TRUE", 0) is the original whole-corpus training, bit-for-bit.
    */
  private def ivfCellCtesFor(trainWhere: String, initOffset: Int): String = {
    val s = Similarity.IvfMeanScale
    def lloydCtes(i: Int): String =
      s"""sc$i AS (SELECT n.vec_id, n.embedding, c.cid,
         |    ${dotSql("n.embedding", "c.ce")} / (n.nrm * c.cn) AS ccos
         |  FROM tnorms n, c${i - 1} c),
         |ar$i AS (SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM sc$i),
         |asg$i AS (SELECT cid, embedding FROM ar$i WHERE rn = 1),
         |cm$i AS (SELECT cid, d.j,
         |    CAST((CAST(CAST(sum(CAST(floor(CAST(embedding[d.j + 1] AS DOUBLE) * $s + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)) / $s AS REAL) AS cx
         |  FROM asg$i, (SELECT unnest(generate_series(0, 63)) AS j) d GROUP BY cid, d.j),
         |cl$i AS (SELECT cid, list(cx ORDER BY j) AS ce FROM cm$i GROUP BY cid),
         |c$i AS (SELECT cid, ce, sqrt(${dotSql("ce", "ce")}) AS cn FROM cl$i)""".stripMargin
    val rounds = Similarity.IvfLloydRounds
    s"""$embNorms,
       |tnorms AS (SELECT * FROM norms WHERE $trainWhere),
       |c0 AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn
       |  FROM tnorms WHERE vec_id % ${Similarity.IvfStride} = $initOffset
       |    AND vec_id < ${Similarity.IvfStride.toLong * Similarity.IvfMaxCells}),
       |${(1 to rounds).map(lloydCtes).mkString(",\n")},
       |cents AS (SELECT cid, ce, cn FROM c$rounds),
       |scored_cells AS (SELECT n.vec_id, cents.cid,
       |    ${dotSql("n.embedding", "cents.ce")} / (n.nrm * cents.cn) AS ccos
       |  FROM norms n, cents),
       |cell_rank AS MATERIALIZED (SELECT vec_id, cid, ccos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |  FROM scored_cells),
       |cell AS (SELECT vec_id, cid FROM cell_rank WHERE rn = 1)""".stripMargin
  }

  private val ivfCellCtes: String = ivfCellCtesFor("TRUE", 0)

  /** Probe tail shared by the whole-corpus and append-index IVF replays:
    * nprobe nearest cells per query (from cell_rank), posting-list
    * candidates, exact cosine re-rank, top-3.
    */
  private def ivfProbeTailFor(liveWhere: String): String =
    s"""qprobe AS (SELECT vec_id AS query_id, cid FROM cell_rank
       |  WHERE vec_id < ${Similarity.NumQueries} AND rn <= ${Similarity.IvfProbes}),
       |cand AS (SELECT DISTINCT qprobe.query_id, cell.vec_id
       |  FROM cell JOIN qprobe ON cell.cid = qprobe.cid
       |  WHERE cell.vec_id <> qprobe.query_id AND ($liveWhere)),
       |scored AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cosine
       |  FROM cand JOIN norms q ON q.vec_id = cand.query_id JOIN norms e ON e.vec_id = cand.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private val ivfProbeTail: String = ivfProbeTailFor("TRUE")

  /** IVF probe-path replay (training shared via [[ivfCellCtes]]). */
  val simAnnIvf: String =
    s"""WITH $ivfCellCtes,
       |$ivfProbeTail""".stripMargin

  /** Replays the incrementally-maintained IVF index: quantizer trained
    * on the BASE slice only (vec_id % IvfNewMod ≠ 0, stride-init offset
    * IvfAppendInitOffset), every vector — base postings plus the tick's
    * batch — assigned against those stored centroids, then the standard
    * probe path. Maintenance must not change the serving contract.
    */
  val simIvfAppend: String =
    s"""WITH ${ivfCellCtesFor(
        s"vec_id % ${Similarity.IvfNewMod} <> 0",
        Similarity.IvfAppendInitOffset
      )},
       |$ivfProbeTail""".stripMargin

  /** Replays the append-maintained IVF index AFTER the delete commit:
    * identical quantizer training and assignment to [[simIvfAppend]],
    * with the DV'd victims excluded from the CANDIDATE set only — the
    * merge-on-read anti-join. Centroids and stored postings are
    * untouched by a delete, so the replay differs from simIvfAppend in
    * exactly one predicate, which is the whole point: un-indexing must
    * not perturb anything else.
    */
  val simIvfDelete: String =
    s"""WITH ${ivfCellCtesFor(
        s"vec_id % ${Similarity.IvfNewMod} <> 0",
        Similarity.IvfAppendInitOffset
      )},
       |${ivfProbeTailFor(
        s"NOT (cell.vec_id % ${Similarity.IvfDeleteMod} = ${Similarity.IvfDeleteRem}" +
          s" AND cell.vec_id >= ${Similarity.NumQueries})"
      )}""".stripMargin

  /** Replays the RETRAINED index generation: quantizer trained on the
    * LIVE set (append-family init offset, delete victims excluded from
    * training), every vector assigned against the new centroids, probe
    * candidates restricted to the live set — the blue/green rollover
    * [[simIvfBalance]]'s trigger prices.
    */
  val simIvfRetrain: String = {
    val live =
      s"NOT (vec_id % ${Similarity.IvfDeleteMod} = ${Similarity.IvfDeleteRem}" +
        s" AND vec_id >= ${Similarity.NumQueries})"
    s"""WITH ${ivfCellCtesFor(live, Similarity.IvfAppendInitOffset)},
       |${ivfProbeTailFor(
        s"NOT (cell.vec_id % ${Similarity.IvfDeleteMod} = ${Similarity.IvfDeleteRem}" +
          s" AND cell.vec_id >= ${Similarity.NumQueries})"
      )}""".stripMargin
  }

  /** Replays the IVF cell-rebalance audit: the append family's quantizer
    * training + whole-corpus assignment (cell_rank), then per-cell
    * base/ticked populations, integer-quantized mean own-centroid
    * cosines (2²⁰-units — associative sums, engine-order-free), excess
    * mass over a balanced ceil(N/C) layout, and the two retrain
    * verdicts: per-cell (ticked > base) and the priced summary trigger
    * (serve-budget × probes × (Σpop²/N² − 1/C) ≥ one reassignment
    * pass). Mirrors Similarity.ivfBalance operation for operation.
    */
  val simIvfBalance: String = {
    val s = Similarity.IvfMeanScale
    val budget = (Similarity.RebalanceServeBudget * Similarity.IvfProbes).toDouble
    s"""WITH ${ivfCellCtesFor(
        s"vec_id % ${Similarity.IvfNewMod} <> 0",
        Similarity.IvfAppendInitOffset
      )},
       |m AS (SELECT r.cid, r.vec_id,
       |    CAST(floor(r.ccos * $s + 0.5) AS BIGINT) AS q,
       |    CASE WHEN r.vec_id % ${Similarity.IvfNewMod} <> 0 THEN 1 ELSE 0 END AS isb
       |  FROM cell_rank r WHERE r.rn = 1),
       |pc AS (SELECT cid,
       |    CAST(sum(isb) AS BIGINT) AS n_base,
       |    CAST(sum(1 - isb) AS BIGINT) AS n_ticked,
       |    CAST(count(*) AS BIGINT) AS n_total,
       |    CAST(sum(CASE WHEN isb = 1 THEN q END) AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN isb = 0 THEN q END) AS BIGINT) AS st
       |  FROM m GROUP BY cid),
       |tot AS (SELECT CAST(sum(n_total) AS BIGINT) AS n,
       |    CAST(sum(n_total * n_total) AS BIGINT) AS sp,
       |    CAST(sum(n_base) AS BIGINT) AS tb,
       |    CAST(sum(n_ticked) AS BIGINT) AS tt,
       |    CAST(sum(sb) AS BIGINT) AS tsb,
       |    CAST(sum(st) AS BIGINT) AS tst,
       |    (SELECT CAST(count(*) AS BIGINT) FROM cents) AS c
       |  FROM pc),
       |tot2 AS (SELECT *, (n + c - 1) // c AS bal FROM tot),
       |ex AS (SELECT CAST(sum(greatest(pc.n_total - t.bal, 0)) AS BIGINT) AS excess
       |  FROM pc, tot2 t),
       |per AS (SELECT pc.cid, pc.n_base, pc.n_ticked, pc.n_total,
       |    ${round6Sql("CAST(pc.n_ticked AS DOUBLE) / CAST(greatest(pc.n_base, 1) AS DOUBLE)")} AS growth,
       |    ${round6Sql(s"(CAST(pc.sb AS DOUBLE) / CAST(pc.n_base AS DOUBLE)) / $s")} AS base_cos,
       |    ${round6Sql(s"(CAST(pc.st AS DOUBLE) / CAST(pc.n_ticked AS DOUBLE)) / $s")} AS tick_cos,
       |    ${round6Sql(
        s"(CAST(pc.sb AS DOUBLE) / CAST(pc.n_base AS DOUBLE)" +
          s" - CAST(pc.st AS DOUBLE) / CAST(pc.n_ticked AS DOUBLE)) / $s"
      )} AS drift,
       |    ${round6Sql("CAST(greatest(pc.n_total - t.bal, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)")} AS excess_frac,
       |    CAST(CASE WHEN pc.n_ticked > pc.n_base THEN 1 ELSE 0 END AS BIGINT) AS retrain
       |  FROM pc, tot2 t),
       |smry AS (SELECT CAST(-1 AS BIGINT) AS cid, t.tb AS n_base, t.tt AS n_ticked, t.n AS n_total,
       |    ${round6Sql("CAST(t.tt AS DOUBLE) / CAST(greatest(t.tb, 1) AS DOUBLE)")} AS growth,
       |    ${round6Sql(s"(CAST(t.tsb AS DOUBLE) / CAST(t.tb AS DOUBLE)) / $s")} AS base_cos,
       |    ${round6Sql(s"(CAST(t.tst AS DOUBLE) / CAST(t.tt AS DOUBLE)) / $s")} AS tick_cos,
       |    ${round6Sql(
        s"(CAST(t.tsb AS DOUBLE) / CAST(t.tb AS DOUBLE)" +
          s" - CAST(t.tst AS DOUBLE) / CAST(t.tt AS DOUBLE)) / $s"
      )} AS drift,
       |    ${round6Sql("CAST(ex.excess AS DOUBLE) / CAST(t.n AS DOUBLE)")} AS excess_frac,
       |    CAST(CASE WHEN $budget *
       |        (CAST(t.sp AS DOUBLE) / CAST(t.n * t.n AS DOUBLE) - 1.0 / CAST(t.c AS DOUBLE)) >= 1.0
       |      THEN 1 ELSE 0 END AS BIGINT) AS retrain
       |  FROM tot2 t, ex)
       |SELECT * FROM per UNION ALL SELECT * FROM smry ORDER BY cid""".stripMargin
  }

  /** Replays SemDeDup: the shared quantizer training + cell assignment,
    * exact cosine pairs WITHIN each cell, min-id duplicate groups, keep
    * flags. `cell` is re-read three times — it comes from the
    * MATERIALIZED cell_rank, so the Lloyd chain runs once.
    */
  val dedupSemantic: String =
    s"""WITH $ivfCellCtes,
       |pairs AS (SELECT b.vec_id, a.vec_id AS id_a,
       |    ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
       |  FROM cell a JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN norms na ON na.vec_id = a.vec_id
       |  JOIN norms nb ON nb.vec_id = b.vec_id),
       |dups AS (SELECT vec_id, min(id_a) AS sem_dup_of FROM pairs
       |  WHERE cosine >= ${Dedup.EmbedCosThreshold} GROUP BY 1)
       |SELECT cell.vec_id, cell.cid, dups.sem_dup_of,
       |  CAST(CASE WHEN dups.sem_dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM cell LEFT JOIN dups ON dups.vec_id = cell.vec_id
       |ORDER BY cell.vec_id""".stripMargin

  /** Replays the capped SemDeDup: identical to [[dedupSemantic]] except
    * cells holding more than `cap` vectors are dropped from the pair
    * join (their members keep their rows with keep=1 — the same
    * dropped-hot-bucket semantics as the simhash/minhash caps).
    */
  def dedupSemanticCapped(cap: Int): String =
    s"""WITH $ivfCellCtes,
       |pop AS (SELECT cid, CAST(count(*) AS BIGINT) AS cell_n FROM cell GROUP BY 1),
       |okc AS (SELECT cid FROM pop WHERE cell_n <= $cap),
       |pairs AS (SELECT b.vec_id, a.vec_id AS id_a,
       |    ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
       |  FROM cell a JOIN okc ON okc.cid = a.cid
       |  JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN norms na ON na.vec_id = a.vec_id
       |  JOIN norms nb ON nb.vec_id = b.vec_id),
       |dups AS (SELECT vec_id, min(id_a) AS sem_dup_of FROM pairs
       |  WHERE cosine >= ${Dedup.EmbedCosThreshold} GROUP BY 1)
       |SELECT cell.vec_id, cell.cid, dups.sem_dup_of,
       |  CAST(CASE WHEN dups.sem_dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM cell LEFT JOIN dups ON dups.vec_id = cell.vec_id
       |ORDER BY cell.vec_id""".stripMargin

  /** Replays prototype selection off the shared IVF cells: best-aligned
    * vector per cell (ties to smallest vec_id), cell population, round6
    * alignment.
    */
  val simPrototypes: String =
    s"""WITH $ivfCellCtes,
       |cellc AS (SELECT vec_id, cid, ccos FROM cell_rank WHERE rn = 1),
       |reps AS (SELECT cid, vec_id, ccos,
       |    row_number() OVER (PARTITION BY cid ORDER BY ccos DESC, vec_id) AS rrn
       |  FROM cellc),
       |cs AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size FROM cellc GROUP BY 1)
       |SELECT reps.cid, reps.vec_id AS rep_id, cs.cluster_size,
       |  ${round6Sql("ccos")} AS rep_cos
       |FROM reps JOIN cs USING (cid) WHERE rrn = 1 ORDER BY reps.cid""".stripMargin

  /** Replays the streaming semantic-admission gate: shared quantizer
    * training + cell assignment, per-cell prototype (the simPrototypes
    * argmax), then — for the streamed slice (vec_id % StreamAdmitMod
    * = 0) — the cosine to the assigned cell's prototype and the
    * admit/reject verdict at the embed near-dup bar.
    */
  val streamSemanticAdmit: String =
    s"""WITH $ivfCellCtes,
       |cellc AS (SELECT vec_id, cid, ccos FROM cell_rank WHERE rn = 1),
       |reps AS (SELECT cid, vec_id AS rep_id FROM (
       |    SELECT cid, vec_id,
       |      row_number() OVER (PARTITION BY cid ORDER BY ccos DESC, vec_id) AS rrn
       |    FROM cellc) WHERE rrn = 1),
       |strm AS (SELECT n.vec_id, n.embedding, n.nrm, c.cid FROM norms n
       |  JOIN cell c ON c.vec_id = n.vec_id
       |  WHERE n.vec_id % ${Similarity.StreamAdmitMod} = 0),
       |sc AS (SELECT strm.vec_id, strm.cid, reps.rep_id,
       |    ${dotSql("strm.embedding", "r.embedding")} / (strm.nrm * r.nrm) AS pc
       |  FROM strm JOIN reps ON reps.cid = strm.cid
       |  JOIN norms r ON r.vec_id = reps.rep_id)
       |SELECT vec_id, cid, rep_id, ${round6Sql("pc")} AS proto_cos,
       |  CAST(CASE WHEN pc >= ${Dedup.EmbedCosThreshold} AND vec_id <> rep_id
       |    THEN 0 ELSE 1 END AS BIGINT) AS keep
       |FROM sc ORDER BY vec_id""".stripMargin

  /** Replays PQ end-to-end: per-subspace views, stride-init codebooks,
    * Pq.PqLloydRounds deterministic Lloyd rounds (assignment argmax on
    * 2·⟨s,c⟩ − ⟨c,c⟩ with ties to the lowest code, integer-pooled
    * means — the IVF recipe verbatim), corpus encoding, the per-query
    * lookup table, and the fixed-order 4-term ADC sum. `subv` and
    * `pcents` are multi-referenced → MATERIALIZED, so the Lloyd chain
    * runs once per oracle evaluation.
    */
  /** `trainWhere`/`stride`/`offset` let the append-index variant train
    * the codebooks on the base slice with an init class that never
    * leaves it (the ivfCellCtesFor pattern); the full-corpus form is
    * `("TRUE", PqStride, 0)`. Encoding always covers ALL vectors — for
    * the append index that IS the final table state after the ticks.
    */
  private def pqCodesCtesFor(trainWhere: String, stride: Int, offset: Int): String = {
    val s = Similarity.IvfMeanScale
    val sd = Pq.PqSubDim
    def lloydCtes(i: Int): String =
      s"""psc$i AS (SELECT v.vec_id, v.m, v.sub, c.code,
         |    2.0 * ${dotSql("v.sub", "c.ce")} - ${dotSql("c.ce", "c.ce")} AS score
         |  FROM tsubv v JOIN pc${i - 1} c ON c.m = v.m),
         |par$i AS (SELECT vec_id, m, sub, code,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, code) AS rn FROM psc$i),
         |pas$i AS (SELECT m, code, sub FROM par$i WHERE rn = 1),
         |pcm$i AS (SELECT m, code, d.j,
         |    CAST((CAST(CAST(sum(CAST(floor(CAST(sub[d.j + 1] AS DOUBLE) * $s + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)) / $s AS REAL) AS cx
         |  FROM pas$i, (SELECT unnest(generate_series(0, ${sd - 1})) AS j) d GROUP BY m, code, d.j),
         |pc$i AS (SELECT m, code, list(cx ORDER BY j) AS ce FROM pcm$i GROUP BY m, code)""".stripMargin
    val rounds = Pq.PqLloydRounds
    s"""subv AS MATERIALIZED (SELECT vec_id, mm.m AS m,
       |    embedding[mm.m * $sd + 1 : mm.m * $sd + $sd] AS sub
       |  FROM embeddings, (SELECT unnest(generate_series(0, ${Pq.PqSubspaces - 1})) AS m) mm),
       |tsubv AS MATERIALIZED (SELECT * FROM subv WHERE $trainWhere),
       |pc0 AS (SELECT m, CAST((vec_id - $offset) // $stride AS INT) AS code, sub AS ce FROM tsubv
       |  WHERE vec_id % $stride = $offset AND vec_id < ${offset.toLong + stride.toLong * Pq.PqCodes}),
       |${(1 to rounds).map(lloydCtes).mkString(",\n")},
       |pcents AS MATERIALIZED (SELECT m, code, ce FROM pc$rounds),
       |enc_sc AS (SELECT v.vec_id, v.m, c.code,
       |    2.0 * ${dotSql("v.sub", "c.ce")} - ${dotSql("c.ce", "c.ce")} AS score
       |  FROM subv v JOIN pcents c ON c.m = v.m),
       |enc_rk AS (SELECT vec_id, m, code,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, code) AS rn FROM enc_sc),
       |codes AS (SELECT vec_id, m, code FROM enc_rk WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, c.m, c.code, ${dotSql("q.sub", "c.ce")} AS v
       |  FROM subv q JOIN pcents c ON c.m = q.m WHERE q.vec_id < ${Similarity.NumQueries})""".stripMargin
  }

  /** Full-corpus ADC scan + refine tail over the stored artifacts
    * (`codes`, `lut`) of [[pqCodesCtesFor]]. `liveWhere` restricts
    * which code rows are scored at all (the delete variant's tombstone
    * predicate — victims leave before the ADC aggregate).
    */
  private def pqAdcCtesFor(
      trainWhere: String,
      stride: Int,
      offset: Int,
      liveWhere: String = "TRUE"
  ): String =
    s"""${pqCodesCtesFor(trainWhere, stride, offset)},
       |adc AS (SELECT l.query_id, k.vec_id,
       |${(0 until Pq.PqSubspaces)
        .map(m => s"    sum(CASE WHEN k.m = $m THEN l.v END) AS l$m")
        .mkString(",\n")}
       |  FROM codes k JOIN lut l ON l.m = k.m AND l.code = k.code
       |  WHERE $liveWhere
       |  GROUP BY 1, 2),
       |pq_ranked AS (SELECT query_id, vec_id, $adcSumSql AS adc_dot,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY $adcSumSql DESC, vec_id) AS INT) AS rank
       |  FROM adc WHERE vec_id <> query_id),
       |pq_cand AS (SELECT query_id, vec_id, adc_dot FROM pq_ranked
       |  WHERE rank <= ${Pq.PqRefine}),
       |pq_refined AS (SELECT c.query_id, c.vec_id, c.adc_dot,
       |    ${dotSql("q.embedding", "e.embedding")} AS xdot
       |  FROM pq_cand c
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |  JOIN embeddings e ON e.vec_id = c.vec_id),
       |pq_rerank AS (SELECT query_id, vec_id, adc_dot, xdot,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY xdot DESC, vec_id) AS INT) AS rank
       |  FROM pq_refined)""".stripMargin

  private lazy val pqAdcCtes: String = pqAdcCtesFor("TRUE", Pq.PqStride, 0)
  private lazy val pqCodesCtes: String = pqCodesCtesFor("TRUE", Pq.PqStride, 0)

  /** Left-to-right 8-term ADC sum — matches Spark's reduce(_ + _). */
  private def adcSumSql: String =
    (1 until Pq.PqSubspaces).foldLeft("l0")((acc, m) => s"($acc + l$m)")

  val simPqAdc: String =
    s"""WITH $pqAdcCtes
       |SELECT query_id, vec_id AS neighbor_id, rank,
       |  ${round6Sql("xdot")} AS dot, ${round6Sql("adc_dot")} AS adc_dot
       |FROM pq_rerank WHERE rank <= ${Pq.PqTopK} ORDER BY query_id, rank""".stripMargin

  /** Replays the MAINTAINED PQ index's final state: codebooks trained
    * on the base slice only (init class inside the slice), codes for
    * the whole corpus (base build + ticks ≡ encode-all against the
    * stored codebooks), the same ADC + exact-refine tail. Equality
    * proves the tick API converges to exactly the from-scratch index.
    */
  val simPqAppend: String =
    s"""WITH ${pqAdcCtesFor(
        s"vec_id % ${Similarity.IvfNewMod} <> 0",
        Pq.PqAppendStride,
        Pq.PqAppendOffset
      )}
       |SELECT query_id, vec_id AS neighbor_id, rank,
       |  ${round6Sql("xdot")} AS dot, ${round6Sql("adc_dot")} AS adc_dot
       |FROM pq_rerank WHERE rank <= ${Pq.PqTopK} ORDER BY query_id, rank""".stripMargin

  /** The maintained PQ index after the delete commit: the
    * [[simPqAppend]] replay with the tombstoned victims excluded from
    * the scored code set (and therefore from the refine tail) — one
    * predicate of difference, the merge-on-read contract. Victims share
    * the sim_ivf_delete fixture: one takedown list, every vector index
    * honors it.
    */
  val simPqDelete: String =
    s"""WITH ${pqAdcCtesFor(
        s"vec_id % ${Similarity.IvfNewMod} <> 0",
        Pq.PqAppendStride,
        Pq.PqAppendOffset,
        liveWhere = s"NOT (k.vec_id % ${Similarity.IvfDeleteMod} = ${Similarity.IvfDeleteRem}" +
          s" AND k.vec_id >= ${Similarity.NumQueries})"
      )}
       |SELECT query_id, vec_id AS neighbor_id, rank,
       |  ${round6Sql("xdot")} AS dot, ${round6Sql("adc_dot")} AS adc_dot
       |FROM pq_rerank WHERE rank <= ${Pq.PqTopK} ORDER BY query_id, rank""".stripMargin

  /** Recall@k of the ADC ranking vs the exact max-inner-product top-k
    * (ranked by the same raw dot the ADC approximates).
    */
  val simPqRecall: String =
    s"""WITH $pqAdcCtes,
       |xsc AS (SELECT q.vec_id AS query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${dotSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS xrank
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < ${Similarity.NumQueries}),
       |ex AS MATERIALIZED (SELECT query_id, vec_id FROM xsc WHERE xrank <= ${Pq.PqTopK}),
       |napprox AS (SELECT count(*) AS n_hits FROM pq_rerank a
       |  JOIN ex ON ex.query_id = a.query_id AND ex.vec_id = a.vec_id
       |  WHERE a.rank <= ${Pq.PqTopK}),
       |nexact AS (SELECT count(*) AS n_exact FROM ex)
       |SELECT n_exact, n_hits,
       |  ${round6Sql("CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE)")} AS recall
       |FROM nexact, napprox""".stripMargin

  /** Replays IVF-PQ end-to-end: the shared IVF training/cell chain
    * ([[ivfCellCtes]]) gates which vectors enter the ADC scan (the
    * probed inverted lists), the shared PQ chain ([[pqCodesCtes]])
    * supplies the code table + query LUT, and the tail is the
    * `sim_pq_adc` rank/refine recipe restricted to the candidate set.
    * CTE namespaces are disjoint by construction (the c-/cell- family
    * vs the pc-/pq- family), so both training chains compose in one
    * WITH.
    */
  /** The IVF-PQ retrieval chain (probe → posting-list candidates → ADC
    * over stored codes → exact-dot refine tail), shared by the top-k
    * serve replay ([[simIvfPq]]) and the hybrid-fusion replay
    * ([[simHybridRerankPq]]). Expects [[ivfCellCtes]] + [[pqCodesCtes]]
    * earlier in the WITH.
    */
  private def ipqCtesLive(liveSql: String): String =
    s"""ipq_probe AS (SELECT vec_id AS query_id, cid FROM cell_rank
       |  WHERE vec_id < ${Similarity.NumQueries} AND rn <= ${Similarity.IvfProbes}),
       |ipq_cand AS (SELECT p.query_id, cell.vec_id
       |  FROM cell JOIN ipq_probe p ON cell.cid = p.cid
       |  WHERE cell.vec_id <> p.query_id AND ($liveSql)),
       |ipq_n AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_probed
       |  FROM ipq_cand GROUP BY 1),
       |ipq_adc AS (SELECT c.query_id, c.vec_id,
       |${(0 until Pq.PqSubspaces)
        .map(m => s"    sum(CASE WHEN k.m = $m THEN l.v END) AS l$m")
        .mkString(",\n")}
       |  FROM ipq_cand c
       |  JOIN codes k ON k.vec_id = c.vec_id
       |  JOIN lut l ON l.query_id = c.query_id AND l.m = k.m AND l.code = k.code
       |  GROUP BY 1, 2),
       |ipq_ranked AS (SELECT query_id, vec_id, $adcSumSql AS adc_dot,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY $adcSumSql DESC, vec_id) AS INT) AS rank
       |  FROM ipq_adc),
       |ipq_refined AS (SELECT c.query_id, c.vec_id, c.adc_dot,
       |    ${dotSql("q.embedding", "e.embedding")} AS xdot
       |  FROM (SELECT query_id, vec_id, adc_dot FROM ipq_ranked
       |    WHERE rank <= ${Pq.PqRefine}) c
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |  JOIN embeddings e ON e.vec_id = c.vec_id),
       |ipq_rerank AS (SELECT query_id, vec_id, adc_dot, xdot,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY xdot DESC, vec_id) AS INT) AS rank
       |  FROM ipq_refined)""".stripMargin

  private val ipqCtes: String = ipqCtesLive("TRUE")

  /** Filtered-ANN replay: same IVF chain, the label predicate applied
    * to candidates (pre-filter, exactly where the engine drops them —
    * `=` for filtered retrieval, `<>` for hard-negative mining), exact
    * cosine re-rank, top-3.
    */
  private def simAnnLabelled(labelOp: String): String =
    s"""WITH $ivfCellCtes,
       |qprobe AS (SELECT vec_id AS query_id, cid FROM cell_rank
       |  WHERE vec_id < ${Similarity.NumQueries} AND rn <= ${Similarity.IvfProbes}),
       |qmeta AS (SELECT vec_id AS query_id, label FROM embeddings
       |  WHERE vec_id < ${Similarity.NumQueries}),
       |fcand AS (SELECT DISTINCT qprobe.query_id, cell.vec_id
       |  FROM cell JOIN qprobe ON cell.cid = qprobe.cid
       |  JOIN embeddings ne ON ne.vec_id = cell.vec_id
       |  JOIN qmeta ON qmeta.query_id = qprobe.query_id
       |  WHERE cell.vec_id <> qprobe.query_id AND ne.label $labelOp qmeta.label),
       |fscored AS (SELECT f.query_id, m.label, f.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cosine
       |  FROM fcand f
       |  JOIN norms q ON q.vec_id = f.query_id
       |  JOIN norms e ON e.vec_id = f.vec_id
       |  JOIN qmeta m ON m.query_id = f.query_id),
       |franked AS (SELECT query_id, label, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM fscored)
       |SELECT query_id, label, neighbor_id, rank, round(cosine, 6) AS cosine
       |FROM franked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  val simAnnFiltered: String = simAnnLabelled("=")

  /** Hard-negative mining: the same probed candidate chain with the
    * label predicate inverted.
    */
  val simHardNegatives: String = simAnnLabelled("<>")

  /** Both-modality pretraining replay: the pretrain flow gated by the
    * semantic keep-list (vec_id ≡ doc_id); eval members drop via the
    * inner join exactly as the engine's.
    */
  def pipelinePretrainSemantic(pretrain: String): String =
    s"""SELECT p.* FROM ($pretrain) p
       |JOIN ($simDecontaminate) s ON s.vec_id = p.doc_id
       |WHERE s.keep = 1
       |ORDER BY p.doc_id""".stripMargin

  /** Triplet-miner replay: the rank-1 same-label positive joined with
    * the top-3 inverted-label negatives, margin computed on the rounded
    * cosines (identical doubles on both engines).
    */
  val pipelineTriplets: String =
    s"""SELECT p.query_id, p.label, p.neighbor_id AS pos_id, p.cosine AS pos_cos,
       |  n.neighbor_id AS neg_id, n.rank AS neg_rank, n.cosine AS neg_cos,
       |  round(p.cosine - n.cosine, 6) AS margin
       |FROM (${simAnnLabelled("=")}) p
       |JOIN (${simAnnLabelled("<>")}) n ON n.query_id = p.query_id
       |WHERE p.rank = 1
       |ORDER BY p.query_id, n.rank""".stripMargin

  /** Embedding-level decontamination replay: per corpus vector, max
    * cosine over the eval-query slice; the τ comparison runs on the
    * UNROUNDED max (the RangeTau discipline).
    */
  val simDecontaminate: String =
    s"""WITH $embNorms,
       |q AS (SELECT embedding AS qe, nrm AS qn FROM norms
       |  WHERE vec_id < ${Similarity.NumQueries}),
       |scored AS (SELECT n.vec_id,
       |    max(${dotSql("q.qe", "n.embedding")} / (q.qn * n.nrm)) AS mx
       |  FROM norms n, q WHERE n.vec_id >= ${Similarity.NumQueries} GROUP BY 1)
       |SELECT vec_id, round(mx, 6) AS max_eval_cos,
       |  CAST(CASE WHEN mx >= ${Similarity.SemDecontamTau} THEN 0 ELSE 1 END AS BIGINT) AS keep
       |FROM scored ORDER BY vec_id""".stripMargin

  val simIvfPq: String =
    s"""WITH $ivfCellCtes,
       |$pqCodesCtes,
       |$ipqCtes
       |SELECT r.query_id, r.vec_id AS neighbor_id, r.rank,
       |  ${round6Sql("r.xdot")} AS dot, ${round6Sql("r.adc_dot")} AS adc_dot,
       |  n.n_probed
       |FROM ipq_rerank r JOIN ipq_n n ON n.query_id = r.query_id
       |WHERE r.rank <= ${Pq.PqTopK} ORDER BY r.query_id, r.rank""".stripMargin

  /** Replays the composed IVF-PQ serve after the takedown: the same
    * probe → ADC → refine chain with the DV's victim predicate applied
    * to the probed candidate lists (exactly where the engine drops
    * them — before any code row is scored), so n_probed counts live
    * candidates and victims are absent at any rank.
    */
  val simIvfPqDeleted: String =
    s"""WITH $ivfCellCtes,
       |$pqCodesCtes,
       |${ipqCtesLive(
        s"NOT (cell.vec_id % ${Similarity.IvfDeleteMod} = ${Similarity.IvfDeleteRem}" +
          s" AND cell.vec_id >= ${Similarity.NumQueries})"
      )}
       |SELECT r.query_id, r.vec_id AS neighbor_id, r.rank,
       |  ${round6Sql("r.xdot")} AS dot, ${round6Sql("r.adc_dot")} AS adc_dot,
       |  n.n_probed
       |FROM ipq_rerank r JOIN ipq_n n ON n.query_id = r.query_id
       |WHERE r.rank <= ${Pq.PqTopK} ORDER BY r.query_id, r.rank""".stripMargin

  // ---- text analysis ----------------------------------------------------

  val textLangId: String =
    s"""WITH toks AS (SELECT doc_id, $toks AS w FROM documents),
       |scores AS (SELECT doc_id,
       |  ${hitsSql(TextAnalysis.StopEn)} AS en_hits,
       |  ${hitsSql(TextAnalysis.StopDe)} AS de_hits,
       |  ${hitsSql(TextAnalysis.StopFr)} AS fr_hits,
       |  ${hitsSql(TextAnalysis.StopEs)} AS es_hits
       |  FROM toks)
       |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
       |  CASE WHEN en_hits + de_hits + fr_hits + es_hits = 0 THEN 'und'
       |       WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS pred_lang
       |FROM scores ORDER BY doc_id""".stripMargin

  val textQuality: String =
    s"""WITH toks AS (SELECT doc_id, text, $toks AS w FROM documents),
       |base AS (SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_obs,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |  ${hitsSql(TextAnalysis.StopEn)} AS stop_hits
       |  FROM toks)
       |SELECT doc_id, n_chars_obs, n_tokens, n_distinct, stop_hits,
       |  ${round6Sql("n_distinct / n_tokens")} AS type_token_ratio,
       |  ${round6Sql("stop_hits / n_tokens")} AS stop_ratio,
       |  ${round6Sql(
        """CAST(0.3 AS DOUBLE) * (stop_hits / n_tokens)
          |        + CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), n_tokens / CAST(100.0 AS DOUBLE))
          |        + CAST(0.3 AS DOUBLE) * (n_distinct / n_tokens)""".stripMargin
      )} AS quality_score
       |FROM base ORDER BY doc_id""".stripMargin

  val textTokens: String =
    s"""SELECT doc_id,
       |  CAST(len($toks) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t]')) AS BIGINT) AS bpe_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_obs,
       |  ${round6Sql(s"CAST(length(text) AS BIGINT) / CAST(len($toks) AS BIGINT)")} AS chars_per_ws_token
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Replays the planted-PII fixture (doc_id-derived email/IPv4/phone
    * spans) and the fixed-order scrub. Patterns stay inside the
    * Java∩RE2 regex subset so both engines match identical spans;
    * counts via regexp_extract_all, global replace via the 'g' flag.
    */
  val textPiiRedact: String = {
    val email = TextAnalysis.EmailRe
    val ip = TextAnalysis.Ipv4Re
    val phone = TextAnalysis.PhoneRe
    s"""WITH planted AS (SELECT doc_id, text
       |  || CASE WHEN doc_id % 2 = 0
       |       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
       |  || CASE WHEN doc_id % 3 = 0
       |       THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.1' ELSE '' END
       |  || CASE WHEN doc_id % 5 = 0
       |       THEN ' tel 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |  AS raw FROM documents),
       |scrubbed AS (SELECT doc_id, raw,
       |  regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$email', '<EMAIL>', 'g'),
       |    '$ip', '<IP>', 'g'),
       |    '$phone', '<PHONE>', 'g') AS clean
       |  FROM planted)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(raw, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '$ip')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(raw, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(length(clean) AS BIGINT) AS clean_len,
       |  md5(clean) AS clean_md5
       |FROM scrubbed ORDER BY doc_id""".stripMargin
  }

  /** Replays the native-function SQL surface (sql_native_text): the
    * distinct-3-shingle count, the distinct-token count, and the seed-7
    * rolling polynomial hash — the same three semantics the injected
    * graft_word_shingles / graft_distinct_tokens / graft_rolling_hash
    * expressions compute in one pass.
    */
  val sqlNativeText: String =
    s"""WITH toks AS (SELECT doc_id, $toks AS w FROM documents),
       |sets AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3
       |    THEN list_distinct(list_transform(generate_series(1, len(w)-2), i -> w[i]||' '||w[i+1]||' '||w[i+2]))
       |    ELSE CAST([] AS VARCHAR[]) END AS shs,
       |  list_distinct(w) AS dts
       |  FROM toks)
       |SELECT d.doc_id,
       |  CAST(len(s.shs) AS BIGINT) AS n_shingles,
       |  CAST(len(s.dts) AS BIGINT) AS n_tokens,
       |  CASE WHEN length(d.text) = 0 THEN 7
       |    ELSE list_reduce(
       |      list_prepend(CAST(7 AS BIGINT),
       |        list_transform(generate_series(1, length(d.text)), i -> CAST(ord(substr(d.text, i, 1)) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % ${TextAnalysis.FingerprintMod})
       |  END AS fingerprint
       |FROM documents d JOIN sets s ON s.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val textFingerprint: String =
    s"""SELECT doc_id,
       |  CASE WHEN length(text) = 0 THEN 7
       |    ELSE list_reduce(
       |      list_prepend(CAST(7 AS BIGINT),
       |        list_transform(generate_series(1, length(text)), i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % ${TextAnalysis.FingerprintMod})
       |  END AS fingerprint
       |FROM documents ORDER BY doc_id""".stripMargin

  // bigram multiset of the token array (counting twin of the distinct
  // 3-shingle used by dedup); shared by textRepetition and textVocab
  private val bigramsCte =
    s"""toks AS (SELECT doc_id, $toks AS w FROM documents),
       |base AS (SELECT doc_id, w,
       |  CASE WHEN len(w) >= 2
       |    THEN list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])
       |    ELSE CAST([] AS VARCHAR[]) END AS bg
       |  FROM toks)""".stripMargin

  /** Replays the Gopher-style repetition stats relationally (unnest +
    * group counts); the engine computes the same multiset maxima
    * map-side, so values are exact-equal (integer counts, one double
    * division + round on each fraction).
    */
  val textRepetition: String =
    s"""WITH $bigramsCte,
       |uni AS (SELECT doc_id, t, count(*) AS c
       |  FROM (SELECT doc_id, unnest(w) AS t FROM base) GROUP BY 1, 2),
       |us AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
       |    CAST(max(c) AS BIGINT) AS max_tok
       |  FROM uni GROUP BY 1),
       |bi AS (SELECT doc_id, t, count(*) AS c
       |  FROM (SELECT doc_id, unnest(bg) AS t FROM base) GROUP BY 1, 2),
       |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS max_bigram
       |  FROM bi GROUP BY 1),
       |j AS (SELECT us.doc_id, us.n_tokens, us.n_distinct, us.max_tok,
       |    coalesce(bs.n_bigrams, 0) AS n_bigrams, coalesce(bs.max_bigram, 0) AS max_bigram
       |  FROM us LEFT JOIN bs ON bs.doc_id = us.doc_id),
       |f AS (SELECT doc_id, n_tokens, n_distinct, max_tok, n_bigrams, max_bigram,
       |    ${round6Sql("1.0 - n_distinct / n_tokens")} AS dup_word_frac,
       |    ${round6Sql("max_tok / n_tokens")} AS top_word_frac,
       |    CASE WHEN n_bigrams > 0 THEN ${round6Sql("max_bigram / n_bigrams")} ELSE 0.0 END AS top_bigram_frac
       |  FROM j)
       |SELECT doc_id, n_tokens, n_distinct, max_tok, n_bigrams, max_bigram,
       |  dup_word_frac, top_word_frac, top_bigram_frac,
       |  CAST(CASE WHEN top_word_frac > 0.2 OR top_bigram_frac > 0.18 THEN 1 ELSE 0 END AS BIGINT) AS repetitive
       |FROM f ORDER BY doc_id""".stripMargin

  /** Replays the inter-document duplicate-span fraction over the same
    * distinct-3-shingle inverted index the dedup family uses.
    */
  val textDupSpans: String =
    s"""WITH $shingleSets,
       |dfq AS (SELECT sh, count(*) AS df FROM shx GROUP BY sh),
       |per AS (SELECT shx.doc_id, count(*) AS n_shingles,
       |    CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
       |  FROM shx JOIN dfq USING (sh) GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
       |  CAST(coalesce(per.n_shared, 0) AS BIGINT) AS n_shared,
       |  CASE WHEN coalesce(per.n_shingles, 0) > 0
       |    THEN ${round6Sql("per.n_shared / per.n_shingles")} ELSE 0.0 END AS shared_frac
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Replays decontamination: the same held-out split rule, the same
    * distinct-3-shingle overlap counts against the eval shingle set.
    */
  val textDecontaminate: String =
    s"""WITH $shingleSets,
       |evx AS (SELECT DISTINCT sh FROM shx
       |  WHERE doc_id % ${TextAnalysis.EvalMod} = 0
       |    AND doc_id < ${TextAnalysis.EvalMod * TextAnalysis.EvalMaxDocs}),
       |tsh AS (SELECT doc_id, sh FROM shx WHERE doc_id % ${TextAnalysis.EvalMod} <> 0),
       |cont AS (SELECT tsh.doc_id, count(*) AS n_contaminated FROM tsh JOIN evx USING (sh) GROUP BY 1),
       |tsz AS (SELECT doc_id, count(*) AS n_shingles FROM tsh GROUP BY 1),
       |f AS (SELECT d.doc_id,
       |    CAST(coalesce(tsz.n_shingles, 0) AS BIGINT) AS n_shingles,
       |    CAST(coalesce(cont.n_contaminated, 0) AS BIGINT) AS n_contaminated
       |  FROM documents d
       |  LEFT JOIN tsz ON tsz.doc_id = d.doc_id
       |  LEFT JOIN cont ON cont.doc_id = d.doc_id
       |  WHERE d.doc_id % ${TextAnalysis.EvalMod} <> 0),
       |g AS (SELECT doc_id, n_shingles, n_contaminated,
       |    CASE WHEN n_shingles > 0 THEN ${round6Sql("n_contaminated / n_shingles")} ELSE 0.0 END AS contamination_frac
       |  FROM f)
       |SELECT doc_id, n_shingles, n_contaminated, contamination_frac,
       |  CAST(CASE WHEN contamination_frac <= ${TextAnalysis.ContamThreshold} THEN 1 ELSE 0 END AS BIGINT) AS is_clean
       |FROM g ORDER BY doc_id""".stripMargin

  /** Replays rational-idf TF-IDF: identical tf/df/n_docs integers,
    * identical double expression tf · (n_docs / df), identical rounded
    * ordering with lexical tie-break.
    */
  val textTfidf: String =
    s"""WITH tk AS (SELECT doc_id, $toks AS w FROM documents),
       |base AS (SELECT doc_id, unnest(w) AS term FROM tk),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM base GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (SELECT tf.doc_id, tf.term,
       |    ${round6Sql("CAST(tf.tf AS DOUBLE) * (CAST(nd.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE))")} AS tfidf
       |  FROM tf JOIN dfq USING (term), nd),
       |ranked AS (SELECT doc_id, term, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, tfidf
       |FROM ranked WHERE rank <= ${TextAnalysis.TfidfK}
       |ORDER BY doc_id, rank""".stripMargin

  /** Replays rational-idf BM25: identical map-side tf/dl integers,
    * identical 1-row corpus stats, the IDENTICAL left-associated double
    * expression per score term summed in query-term order, same
    * (score DESC, doc_id) top-K cut.
    */
  val textBm25: String = textBm25Over("documents")

  /** BM25 served post-delete: identical replay over the SURVIVING
    * corpus — retracting the victims' additive stats contributions must
    * leave exactly the stats (and so the idf/avgdl constants and the
    * ranking) of an index built fresh on the live docs.
    */
  val textBm25Deleted: String = textBm25Over(
    s"(SELECT * FROM documents WHERE doc_id % ${TextAnalysis.Bm25DeleteMod} <> ${TextAnalysis.Bm25DeleteRem})"
  )

  private def textBm25Over(rel: String): String = {
    val k1p1 = TextAnalysis.Bm25K1 + 1.0
    val oneMinusB = 1.0 - TextAnalysis.Bm25B
    val terms = TextAnalysis.Bm25Query
    val tfCols = terms.zipWithIndex
      .map { case (t, i) => s"CAST(len(list_filter(w, t -> t = '$t')) AS BIGINT) AS tf${i + 1}" }
      .mkString(",\n|  ".stripMargin)
    val dfCols = terms.indices
      .map(i => s"CAST(sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df${i + 1}")
      .mkString(", ")
    val idfCols = terms.indices
      .map { i =>
        val d = i + 1
        s"(CAST(n_docs AS DOUBLE) - CAST(df$d AS DOUBLE) + 0.5) / (CAST(df$d AS DOUBLE) + 0.5) AS idf$d"
      }
      .mkString(",\n  ")
    val anyHit = terms.indices.map(i => s"tf${i + 1}").mkString(" + ") + " > 0"
    val satSum = terms.indices
      .map { i =>
        val d = i + 1
        s"idf$d * ((CAST(tf$d AS DOUBLE) * $k1p1) / (CAST(tf$d AS DOUBLE) + nrm))"
      }
      .mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, $toks AS w FROM $rel),
       |base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, $tfCols FROM tk),
       |stats0 AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |  $dfCols FROM base),
       |stats AS (SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl,
       |  $idfCols FROM stats0),
       |pre AS (SELECT base.*, stats.*,
       |    ${TextAnalysis.Bm25K1} * ($oneMinusB + ${TextAnalysis.Bm25B} * (CAST(dl AS DOUBLE) / avgdl)) AS nrm
       |  FROM base, stats WHERE $anyHit),
       |scored AS (SELECT doc_id, dl, ${round6Sql(satSum)} AS score FROM pre),
       |ranked AS (SELECT doc_id, dl, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT doc_id, dl AS n_tokens, score, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= ${TextAnalysis.Bm25TopK} ORDER BY rank""".stripMargin
  }

  val textVocab: String =
    s"""WITH $bigramsCte,
       |uni AS (SELECT CAST(1 AS BIGINT) AS arity, t AS ngram, count(*) AS freq
       |  FROM (SELECT unnest(w) AS t FROM base) GROUP BY t
       |  ORDER BY freq DESC, ngram LIMIT ${TextAnalysis.VocabK}),
       |bi AS (SELECT CAST(2 AS BIGINT) AS arity, t AS ngram, count(*) AS freq
       |  FROM (SELECT unnest(bg) AS t FROM base) GROUP BY t
       |  ORDER BY freq DESC, ngram LIMIT ${TextAnalysis.VocabK})
       |SELECT * FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
       |ORDER BY arity, freq DESC, ngram""".stripMargin

  /** Replays the count-min sketch cell-for-cell: same md5-derived row
    * hashes, same 4×1024 geometry, same integer ε-bound arithmetic —
    * so even the sketch ESTIMATES (not just the exact counts) are
    * hash-checked, with the two CMS invariants pinned as booleans.
    */
  val textHeavyHitters: String = {
    val w = TextAnalysis.CmsWidth; val dep = TextAnalysis.CmsDepth
    val cell = "CAST('0x' || substr(md5(TOK || '#' || D), 1, 8) AS BIGINT) % " + w
    s"""WITH tok AS (SELECT unnest($toks) AS tok FROM documents),
       |cells AS (SELECT d.d AS d, ${cell.replace("TOK", "tok").replace("D", "d.d")} AS cell, count(*) AS cn
       |  FROM tok CROSS JOIN generate_series(0, ${dep - 1}) d(d) GROUP BY 1, 2),
       |top AS (SELECT tok, count(*) AS exact_n FROM tok GROUP BY 1
       |  ORDER BY exact_n DESC, tok LIMIT ${TextAnalysis.HeavyK}),
       |total AS (SELECT count(*) AS n_total FROM tok),
       |est AS (SELECT t.tok, t.exact_n, min(c.cn) AS cms_n
       |  FROM top t CROSS JOIN generate_series(0, ${dep - 1}) d(d)
       |  JOIN cells c ON c.d = d.d AND c.cell = ${cell.replace("TOK", "t.tok").replace("D", "d.d")}
       |  GROUP BY 1, 2)
       |SELECT tok, exact_n, cms_n,
       |  cms_n >= exact_n AS never_under,
       |  (cms_n - exact_n) * $w * 1000000 <= ${TextAnalysis.CmsEpsScaled} * n_total AS within_eps
       |FROM est CROSS JOIN total ORDER BY exact_n DESC, tok""".stripMargin
  }

  /** Replays the stratified top-k selection: same md5 order key, same
    * (h, doc_id) tie order, same per-stratum k.
    */
  val textStratifiedTopK: String = {
    import graft.text.Sampling
    s"""WITH k AS (SELECT source, lang, doc_id,
       |    CAST('0x' || substr(md5('strat#' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM documents),
       |r AS (SELECT source, lang, doc_id,
       |    row_number() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rank
       |  FROM k)
       |SELECT source, lang, CAST(rank AS BIGINT) AS rank, doc_id
       |FROM r WHERE rank <= ${Sampling.StratTopK}
       |ORDER BY source, lang, rank""".stripMargin
  }

  /** Replays the domain-mixture acceptance: same md5 permille bucket,
    * same per-source rates read from Sampling.MixPermille (sorted for a
    * stable CASE).
    */
  val textDomainMix: String = {
    import graft.text.Sampling
    val cases = Sampling.MixPermille.toSeq.sorted
      .map { case (s, r) => s"WHEN '$s' THEN $r" }
      .mkString(" ")
    s"""WITH k AS (SELECT source,
       |  CASE WHEN CAST('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000
       |       < (CASE source $cases ELSE ${Sampling.MixDefaultPermille} END)
       |    THEN 1 ELSE 0 END AS keep
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept,
       |  ${round6Sql("CAST(sum(keep) AS BIGINT) / count(*)")} AS kept_frac
       |FROM k GROUP BY source ORDER BY source""".stripMargin
  }

  /** Replays content-defined chunking: same rolling-hash boundary rule,
    * same cut-point construction, same chunk fingerprints.
    */
  val textCdcChunks: String = {
    val p = TextAnalysis.FingerprintMod
    val k = TextAnalysis.CdcWindow
    val m = TextAnalysis.CdcMask
    s"""WITH bs AS (SELECT doc_id, text,
       |    list_filter(generate_series($k, length(text)), i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(generate_series(i - $k + 1, i), j -> CAST(ord(substr(text, j, 1)) AS BIGINT))),
       |        (acc, c) -> (acc * 31 + c) % $p) % $m = 0) AS b
       |  FROM documents),
       |cuts AS (SELECT doc_id, text,
       |    list_concat(list_concat([0], list_filter(b, x -> x < length(text))), [length(text)]) AS c FROM bs),
       |chunks AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(c) - 1), i ->
       |      substr(text, c[i] + 1, c[i + 1] - c[i]))) AS chunk
       |  FROM cuts)
       |SELECT md5(chunk) AS chunk_md5, CAST(length(chunk) AS BIGINT) AS chunk_len,
       |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
       |FROM chunks GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY chunk_md5""".stripMargin
  }

  val textHashSplit: String =
    """SELECT
      |  CASE WHEN CAST('0x' || substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST('0x' || substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1 ORDER BY split""".stripMargin

  /** Replays the composed curation flow from the same fragments the
    * individual oracles use: language filter ∧ quality floor ∧
    * exact-dedup keeper ∧ hash split.
    */
  // language/quality stages + final keeper-joined select, shared by both
  // curation variants; `toks` (doc_id, w) must be in scope
  private val curateStages: String =
    s"""scores AS (SELECT doc_id,
       |  ${hitsSql(TextAnalysis.StopEn)} AS en_hits,
       |  ${hitsSql(TextAnalysis.StopDe)} AS de_hits,
       |  ${hitsSql(TextAnalysis.StopFr)} AS fr_hits,
       |  ${hitsSql(TextAnalysis.StopEs)} AS es_hits
       |  FROM toks),
       |lang AS (SELECT doc_id,
       |  CASE WHEN en_hits + de_hits + fr_hits + es_hits = 0 THEN 'und'
       |       WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS pred_lang
       |  FROM scores),
       |base AS (SELECT doc_id,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |  ${hitsSql(TextAnalysis.StopEn)} AS stop_hits
       |  FROM toks),
       |qual AS (SELECT doc_id,
       |  ${round6Sql(
        """CAST(0.3 AS DOUBLE) * (stop_hits / n_tokens)
          |        + CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), n_tokens / CAST(100.0 AS DOUBLE))
          |        + CAST(0.3 AS DOUBLE) * (n_distinct / n_tokens)""".stripMargin
      )} AS quality_score
       |  FROM base)""".stripMargin

  private def curateSelect(withKeepers: Boolean = true): String = {
    val splitBucket =
      """CAST('0x' || substr(md5('split#' || CAST(lang.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"""
    val keepersJoin = if (withKeepers) "\nJOIN keepers ON keepers.doc_id = lang.doc_id" else ""
    s"""SELECT lang.doc_id, pred_lang, quality_score,
       |  CASE WHEN $splitBucket < 80 THEN 'train'
       |       WHEN $splitBucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM lang
       |JOIN qual ON qual.doc_id = lang.doc_id$keepersJoin
       |WHERE pred_lang = 'en' AND quality_score >= ${graft.text.Curation.QualityMin}
       |ORDER BY lang.doc_id""".stripMargin
  }

  val pipelineCurate: String =
    s"""WITH toks AS (SELECT doc_id, $toks AS w FROM documents),
       |$curateStages,
       |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |${curateSelect()}""".stripMargin

  /** The drained streaming curation filter equals the batch language/
    * quality/split stages with no dedup join (stateless map — see
    * StreamingQueries.curateStream).
    */
  val streamCurate: String =
    s"""WITH toks AS (SELECT doc_id, $toks AS w FROM documents),
       |$curateStages
       |${curateSelect(withKeepers = false)}""".stripMargin

  /** The near-dup-aware curation composition: identical language/quality/
    * split stages, but keepers come from the minhash-LSH connected
    * components (cluster minima) instead of byte-exact dedup. minhashCtes
    * opens with the same `toks` CTE curateStages reads.
    */
  private def pipelineCurateFuzzySql(candCtes: String): String =
    s"""WITH RECURSIVE $candCtes,
       |$componentCtes,
       |keepers AS (SELECT doc_id FROM cc WHERE doc_id = cluster_id),
       |$curateStages
       |${curateSelect()}""".stripMargin

  val pipelineCurateFuzzy: String = pipelineCurateFuzzySql(minhashCtes)

  /** Fuzzy curation over the CAPPED edge set — the production edge
    * source (see [[dedupClustersCapped]]): capped components refine the
    * exact ones, so keepers — and therefore survivors — only grow.
    */
  val pipelineCurateFuzzyCapped: String =
    pipelineCurateFuzzySql(s"$minhashBandCtes,\n$cappedCandCtes")

  /** Multimodal curation replay: the image-clique keepers (min doc_id
    * per identical phash, from the same closed-form phash CTEs) feed
    * the standard curation stages.
    */
  val pipelineMultimodal: String =
    s"""WITH toks AS (SELECT doc_id, $toks AS w FROM documents),
       |$phashCtes,
       |keepers AS (SELECT min(doc_id) AS doc_id FROM ph GROUP BY ph_hi, ph_lo),
       |$curateStages
       |${curateSelect()}""".stripMargin

  /** Replays the full pretraining flow: fuzzy curation (minhash LSH →
    * connected components → keepers → language ∧ quality ∧ split),
    * decontamination's is_clean gate, train-split selection, then
    * packing over the survivors — every fragment shared verbatim with
    * the per-operator oracles.
    */
  private def pipelinePretrainSql(candCtes: String): String = {
    import graft.text.{Curation, Sampling}
    val splitBucket =
      """CAST('0x' || substr(md5('split#' || CAST(lang.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"""
    s"""WITH RECURSIVE $candCtes,
       |$componentCtes,
       |keepers AS (SELECT doc_id FROM cc WHERE doc_id = cluster_id),
       |$curateStages,
       |kept AS (SELECT lang.doc_id, pred_lang, quality_score,
       |    CASE WHEN $splitBucket < 80 THEN 'train'
       |         WHEN $splitBucket < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM lang
       |  JOIN qual ON qual.doc_id = lang.doc_id
       |  JOIN keepers ON keepers.doc_id = lang.doc_id
       |  WHERE pred_lang = 'en' AND quality_score >= ${Curation.QualityMin}),
       |evx AS (SELECT DISTINCT sh FROM shx
       |  WHERE doc_id % ${TextAnalysis.EvalMod} = 0
       |    AND doc_id < ${TextAnalysis.EvalMod * TextAnalysis.EvalMaxDocs}),
       |tsh AS (SELECT doc_id, sh FROM shx WHERE doc_id % ${TextAnalysis.EvalMod} <> 0),
       |cont AS (SELECT tsh.doc_id, count(*) AS n_contaminated FROM tsh JOIN evx USING (sh) GROUP BY 1),
       |tsz AS (SELECT doc_id, count(*) AS n_shingles FROM tsh GROUP BY 1),
       |clean AS (SELECT d.doc_id FROM documents d
       |  LEFT JOIN tsz ON tsz.doc_id = d.doc_id
       |  LEFT JOIN cont ON cont.doc_id = d.doc_id
       |  WHERE d.doc_id % ${TextAnalysis.EvalMod} <> 0
       |    AND (CASE WHEN coalesce(tsz.n_shingles, 0) > 0
       |         THEN ${round6Sql("coalesce(cont.n_contaminated, 0) / tsz.n_shingles")}
       |         ELSE 0.0 END) <= ${TextAnalysis.ContamThreshold}),
       |surv AS (SELECT kept.doc_id, pred_lang, quality_score FROM kept
       |  JOIN clean ON clean.doc_id = kept.doc_id WHERE split = 'train'),
       |tokc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
       |st AS (SELECT surv.doc_id, pred_lang, quality_score, n_tokens,
       |    surv.doc_id % ${Sampling.PackShards} AS shard
       |  FROM surv JOIN tokc ON tokc.doc_id = surv.doc_id),
       |pk AS (SELECT doc_id, pred_lang, quality_score, n_tokens, shard,
       |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM st)
       |SELECT doc_id, pred_lang, quality_score, n_tokens, shard,
       |  (cum - n_tokens) // ${Sampling.PackBlockTokens} AS start_block,
       |  (cum - 1) // ${Sampling.PackBlockTokens} AS end_block
       |FROM pk ORDER BY doc_id""".stripMargin
  }

  val pipelinePretrain: String = pipelinePretrainSql(minhashCtes)

  /** The pretraining flow over the CAPPED edge set — every stage
    * identical, only the cluster-label edge source swaps to the
    * band-bucket-capped candidates (see [[dedupClustersCapped]]).
    */
  val pipelinePretrainCapped: String =
    pipelinePretrainSql(s"$minhashBandCtes,\n$cappedCandCtes")

  /** Replays the shard-parallel concat-and-chunk packing: same running
    * token offset per shard, same integer block arithmetic.
    */
  val textPackBlocks: String = {
    import graft.text.Sampling
    s"""WITH t AS (SELECT doc_id, doc_id % ${Sampling.PackShards} AS shard,
       |    CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, shard, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM t)
       |SELECT doc_id, shard, n_tokens,
       |  (cum - n_tokens) // ${Sampling.PackBlockTokens} AS start_block,
       |  (cum - 1) // ${Sampling.PackBlockTokens} AS end_block
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---- multimodal -------------------------------------------------------

  /** head_hex slices BYTES on both sides: Spark hexes the first 8 bytes
    * of the binary payload, so the oracle takes the first 16 hex chars of
    * the whole encoded payload (char-based substr(text,1,8) would
    * diverge on any multi-byte UTF-8 document).
    */
  val mmMeta: String =
    """SELECT doc_id AS media_id, 'application/x-fake-' || source AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY media_id""".stripMargin

  /** Replays the deterministic fake decode (md5-derived dims). */
  val mmExtract: String =
    """SELECT doc_id AS media_id, 'application/x-fake-' || source AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  1 + CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1920 AS width,
      |  1 + CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1080 AS height,
      |  CAST(1 + octet_length(encode(text)) % 300 AS BIGINT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  /** Replays the resize planning over the replayed decode dims — pure
    * integer arithmetic, exact on both engines.
    */
  val mmResize: String = {
    val t = Multimodal.ResizeTarget
    """WITH dims AS (SELECT doc_id AS media_id,
      |  1 + CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1920 AS width,
      |  1 + CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1080 AS height
      |FROM documents)
      |SELECT media_id, width, height,
      |  CASE WHEN width >= height THEN TARGET ELSE greatest(1, (width * TARGET) // height) END AS out_w,
      |  CASE WHEN width >= height THEN greatest(1, (height * TARGET) // width) ELSE TARGET END AS out_h
      |FROM dims ORDER BY media_id""".stripMargin.replace("TARGET", t.toString)
  }

  /** Replays the deterministic frame sampling (same integer arithmetic:
    * k = least(n_frames, max), frame i → (i·n_frames) div k).
    */
  val mmFrames: String =
    s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS pm,
       |    CAST(1 + octet_length(encode(text)) % 300 AS BIGINT) AS n_frames
       |  FROM documents),
       |ks AS (SELECT media_id, pm, n_frames,
       |    least(n_frames, ${Multimodal.MaxSampledFrames}) AS k FROM m),
       |f AS (SELECT media_id, pm, n_frames, k,
       |    unnest(generate_series(0, k - 1)) AS i FROM ks)
       |SELECT media_id, (i * n_frames) // k AS frame_idx,
       |  md5(pm || '#' || CAST((i * n_frames) // k AS VARCHAR)) AS frame_md5,
       |  n_frames
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  // ---- streaming --------------------------------------------------------

  val streamTumbling: String = Oracles.eventsTumbling

  val streamUserStats: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** The doubled-then-deduplicated stream aggregates to the plain batch
    * per-type stats.
    */
  val streamDedup: String =
    """SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Batch equivalent of the drained stream–static enrichment join. */
  val streamEnrich: String =
    """SELECT c_mktsegment, event_type, count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Batch equivalent of the drained stream-stream interval join. */
  val streamIntervalJoin: String =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      |  round(p.value, 4) AS purchase_value
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts - INTERVAL 60 MINUTE AND p.ts <= c.ts
      |ORDER BY click_id, purchase_id""".stripMargin

  /** Segment-level dedup replay: identical fixed-width word windows
    * (split-on-single-space parity: both engines yield [''] for empty
    * text and keep empty tokens), df over md5(segment), reassembly in
    * segment order. string_agg/sum skip the NULLed-out dropped segments
    * exactly like Spark's collect_list.
    */
  def textSegDedup(segWords: Int, maxDf: Int): String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS wd,
       |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
       |  FROM documents),
       |segs AS (
       |  SELECT doc_id, pos // $segWords AS seg, string_agg(wd, ' ' ORDER BY pos) AS seg_text
       |  FROM w GROUP BY 1, 2),
       |dfc AS (SELECT md5(seg_text) AS h, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
       |k AS (SELECT s.doc_id, s.seg, s.seg_text, d.df
       |  FROM segs s JOIN dfc d ON md5(s.seg_text) = d.h)
       |SELECT d.doc_id,
       |  coalesce(string_agg(CASE WHEN k.df <= $maxDf THEN k.seg_text END, ' ' ORDER BY k.seg), '') AS text,
       |  CAST(coalesce(sum(CASE WHEN k.df > $maxDf THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped,
       |  CAST(count(k.seg) AS BIGINT) AS n_segments
       |FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared closed-form replay of the phash fixture: pixel formula →
    * 2×2 block sums → 9×8 dHash grid → two unsigned-32-bit halves.
    * The ENGINE computes the same hash from decoded bytes of a real
    * BMP it encoded (Multimodal.encodeGrayBmp → decodePixels); the
    * oracle never touches binary — equality proves the byte-level
    * round-trip is lossless. All constants come from the Multimodal
    * object, so fixture drift breaks the build, not the compare.
    */
  // def, not val: referenced by pipelineMultimodal above its
  // definition site — a val would still be null during object init
  private def phashCtes: String = {
    val w = Multimodal.PhashW; val h = Multimodal.PhashH
    val fam = Multimodal.PhashFamilies; val noise = Multimodal.PhashNoiseMod
    val mod = Multimodal.PhashPixMod
    s"""px AS (SELECT doc_id, gx.x AS x, gy.y AS y,
       |    CASE WHEN doc_id % $noise = 0 AND gx.x // 2 = doc_id % 9 AND gy.y // 2 = doc_id % 8
       |      THEN ((doc_id % $fam) * 97 + (gy.y * $w + gx.x) * (31 + doc_id % $fam) + 128) % $mod
       |      ELSE ((doc_id % $fam) * 97 + (gy.y * $w + gx.x) * (31 + doc_id % $fam)) % $mod END AS g
       |  FROM documents, generate_series(0, ${w - 1}) gx(x), generate_series(0, ${h - 1}) gy(y)),
       |$phashDhashTail""".stripMargin
  }

  /** 2×2 block sums → 9×8 dHash grid → two unsigned-32-bit halves,
    * over a `px(doc_id, x, y, g)` CTE — shared by the BMP/PNG closed
    * form ([[phashCtes]]) and the JPEG one ([[mmPhashJpeg]]).
    */
  private def phashDhashTail: String =
    s"""blk AS (SELECT doc_id, x // 2 AS bx, y // 2 AS by, sum(g) AS s FROM px GROUP BY 1, 2, 3),
       |bits AS (SELECT a.doc_id, a.by, a.bx,
       |    CASE WHEN b.s > a.s THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM blk a JOIN blk b ON b.doc_id = a.doc_id AND b.by = a.by AND b.bx = a.bx + 1
       |  WHERE a.bx < 8),
       |ph AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN by >= 4 THEN bit * (1::BIGINT << ((by - 4) * 8 + bx)) ELSE 0 END) AS BIGINT) AS ph_hi,
       |    CAST(sum(CASE WHEN by < 4 THEN bit * (1::BIGINT << (by * 8 + bx)) ELSE 0 END) AS BIGINT) AS ph_lo
       |  FROM bits GROUP BY 1)""".stripMargin

  /** Closed-form replay of the JPEG fixture's DECODED samples
    * (Multimodal.phashJpegPixel): per 8×8 block the four coefficient
    * values (a, t, r, e) from doc_id, the two irrational (2,0)/(0,2)
    * basis magnitudes as full-precision double literals (both engines
    * parse the same decimal → the same double; every sample is ≥0.03
    * from a rounding boundary by construction), exact ±e checker term,
    * round half up — then the shared dHash tail. The ENGINE computes
    * the same hash from entropy-decoded IDCT output of a real color
    * JPEG it encoded; equality proves the whole baseline codec
    * (Huffman, dequant, IDCT, YCbCr) is exactly lossless on the
    * fixture.
    */
  val mmPhashJpeg: String = {
    val w = Multimodal.PhashW; val h = Multimodal.PhashH
    val fam = Multimodal.PhashFamilies
    val k1 = String.valueOf(Multimodal.JpegZ(0))
    val k2 = String.valueOf(Multimodal.JpegZ(1))
    val zx = s"CASE WHEN gx.x % 8 IN (0, 7) THEN $k1 WHEN gx.x % 8 IN (1, 6) THEN $k2 " +
      s"WHEN gx.x % 8 IN (2, 5) THEN -$k2 ELSE -$k1 END"
    val zy = s"CASE WHEN gy.y % 8 IN (0, 7) THEN $k1 WHEN gy.y % 8 IN (1, 6) THEN $k2 " +
      s"WHEN gy.y % 8 IN (2, 5) THEN -$k2 ELSE -$k1 END"
    val sx = "CASE WHEN gx.x % 8 IN (0, 3, 4, 7) THEN 1 ELSE -1 END"
    val sy = "CASE WHEN gy.y % 8 IN (0, 3, 4, 7) THEN 1 ELSE -1 END"
    val f = s"(doc_id % $fam)"
    val a = s"(($f * 37 + (gx.x // 8) * 11 + (gy.y // 8) * 23) % 97 - 48)"
    val t = s"(($f * 13 + (gx.x // 8) * 7 + (gy.y // 8) * 5) % 7 - 3)"
    val r = s"(($f * 17 + (gx.x // 8) * 3 + (gy.y // 8) * 19) % 7 - 3)"
    val e = s"(($f * 29 + (gx.x // 8) * 13 + (gy.y // 8) * 7) % 13 - 6)"
    s"""WITH px AS (SELECT doc_id, gx.x AS x, gy.y AS y,
       |    CAST(floor(128.0 + $a + $t * ($zx) + $r * ($zy) + ($sx) * ($sy) * $e + 0.5) AS BIGINT) AS g
       |  FROM documents, generate_series(0, ${w - 1}) gx(x), generate_series(0, ${h - 1}) gy(y)),
       |$phashDhashTail
       |SELECT doc_id AS media_id, ph_hi, ph_lo FROM ph ORDER BY media_id""".stripMargin
  }

  val mmPhash: String =
    s"""WITH $phashCtes
       |SELECT doc_id AS media_id, ph_hi, ph_lo FROM ph ORDER BY media_id""".stripMargin

  val mmPhashPairs: String =
    s"""WITH $phashCtes,
       |bands AS (SELECT doc_id, bs.b AS band,
       |    CASE WHEN bs.b < 4 THEN (ph_lo >> (bs.b * 8)) & 255
       |         ELSE (ph_hi >> ((bs.b - 4) * 8)) & 255 END AS bv
       |  FROM ph, generate_series(0, 7) bs(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM bands a JOIN bands c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id)
       |SELECT cand.id_a, cand.id_b,
       |  CAST(bit_count(xor(pa.ph_hi, pb.ph_hi)) + bit_count(xor(pa.ph_lo, pb.ph_lo)) AS BIGINT) AS hamming
       |FROM cand
       |JOIN ph pa ON pa.doc_id = cand.id_a
       |JOIN ph pb ON pb.doc_id = cand.id_b
       |WHERE bit_count(xor(pa.ph_hi, pb.ph_hi)) + bit_count(xor(pa.ph_lo, pb.ph_lo)) <= ${Multimodal.PhashHamMax}
       |ORDER BY id_a, id_b""".stripMargin

  /** Replays the collapsed-clique near-dup: identical-hash groups
    * (min-id keeper + copy count) paired by the same bands + hamming
    * bound, but between DISTINCT hashes only — the scale path's exact
    * semantics.
    */
  val mmPhashDedup: String =
    s"""WITH $phashCtes,
       |grp AS (SELECT ph_hi, ph_lo, min(doc_id) AS keeper_id, count(*) AS n_copies
       |  FROM ph GROUP BY 1, 2),
       |bands AS (SELECT keeper_id, bs.b AS band,
       |    CASE WHEN bs.b < 4 THEN (ph_lo >> (bs.b * 8)) & 255
       |         ELSE (ph_hi >> ((bs.b - 4) * 8)) & 255 END AS bv
       |  FROM grp, generate_series(0, 7) bs(b)),
       |cand AS (SELECT DISTINCT a.keeper_id AS id_a, c.keeper_id AS id_b
       |  FROM bands a JOIN bands c ON a.band = c.band AND a.bv = c.bv AND a.keeper_id < c.keeper_id)
       |SELECT cand.id_a, cand.id_b,
       |  CAST(bit_count(xor(ga.ph_hi, gb.ph_hi)) + bit_count(xor(ga.ph_lo, gb.ph_lo)) AS BIGINT) AS hamming,
       |  ga.n_copies AS copies_a, gb.n_copies AS copies_b
       |FROM cand
       |JOIN grp ga ON ga.keeper_id = cand.id_a
       |JOIN grp gb ON gb.keeper_id = cand.id_b
       |WHERE bit_count(xor(ga.ph_hi, gb.ph_hi)) + bit_count(xor(ga.ph_lo, gb.ph_lo)) <= ${Multimodal.PhashHamMax}
       |ORDER BY id_a, id_b""".stripMargin

  /** Replays the audio-frame features from the closed-form square
    * wave; the ENGINE computes them from samples parsed back out of
    * the real RIFF/WAVE bytes it encoded, so equality proves the
    * 16-bit little-endian round-trip (incl. sign extension) lossless.
    */
  val mmAudioEnergy: String = {
    val n = Multimodal.AudioSamples; val fl = Multimodal.AudioFrameLen
    s"""WITH smp AS (SELECT doc_id, s.i AS i,
       |    CASE WHEN (s.i % (20 + doc_id % 30)) < (20 + doc_id % 30) // 2
       |      THEN 1000 + (doc_id % 50) * 100
       |      ELSE -(1000 + (doc_id % 50) * 100) END AS v
       |  FROM documents, generate_series(0, ${n - 1}) s(i)),
       |fr AS (SELECT doc_id, i // $fl AS frame_idx, i, v,
       |    lag(v) OVER (PARTITION BY doc_id, i // $fl ORDER BY i) AS pv
       |  FROM smp)
       |SELECT doc_id AS media_id, frame_idx,
       |  CAST(sum(v * v) AS BIGINT) AS energy,
       |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zcr
       |FROM fr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Bloom-gated admission is EXACT (the verify join removes every
    * bloom false positive), so the oracle is the plain anti-join
    * semantics — batch docs whose md5 does not occur in the corpus.
    */
  val dedupBloomAdmit: String =
    s"""SELECT d.doc_id, md5(d.text) AS h
       |FROM documents d
       |WHERE d.doc_id % ${Dedup.NewBatchMod} = 0
       |  AND NOT EXISTS (SELECT 1 FROM documents c
       |    WHERE c.doc_id % ${Dedup.NewBatchMod} <> 0
       |      AND md5(c.text) = md5(d.text))
       |ORDER BY d.doc_id""".stripMargin

  /** Char-entropy replay. The engine folds −Σ p·log₂p over runs of the
    * row's SORTED char array; the twin materializes the same per-char
    * probabilities and list_reduce-sums the identical (run/n)·ln(p)/ln 2
    * terms in the same ascending-char order — addition-for-addition the
    * engine's fold (seed 0.0 + t₁ ≡ t₁), so the double matches to the
    * ULP before the shared round6.
    */
  val textEntropy: String =
    s"""WITH pos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
       |  FROM documents),
       |ch AS (SELECT doc_id, substring(text, i, 1) AS ch FROM pos),
       |cnt AS (
       |  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
       |  FROM ch GROUP BY 1, 2),
       |base AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_obs,
       |    CAST(length(text) AS DOUBLE) AS n
       |  FROM documents),
       |terms AS (
       |  SELECT c.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_distinct_chars,
       |    list((c.c / b.n) * (ln(c.c / b.n) / ln(CAST(2.0 AS DOUBLE))) ORDER BY c.ch) AS l
       |  FROM cnt c JOIN base b USING (doc_id) GROUP BY c.doc_id)
       |SELECT b.doc_id, b.n_chars_obs,
       |  COALESCE(t.n_distinct_chars, 0) AS n_distinct_chars,
       |  ${round6Sql("-COALESCE(list_reduce(t.l, (a, x) -> a + x), CAST(0.0 AS DOUBLE))")} AS entropy_bits
       |FROM base b LEFT JOIN terms t USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  /** Hybrid-retrieval replay: the bm25 oracle verbatim as the lexical
    * list, the exact-cosine ranking as the semantic list, the same
    * integer-rank RRF arithmetic (1/(k+rank), missing source → 0) and
    * the same (rrf desc, doc_id) fused total order.
    */
  val simHybridRerank: String =
    s"""WITH $embNorms,
       |lex AS (SELECT doc_id, rank AS lex_rank FROM ($textBm25)),
       |qv AS (SELECT embedding AS qe, nrm AS qn FROM norms
       |  WHERE vec_id = ${Similarity.HybridQueryVec}),
       |sem0 AS (SELECT n.vec_id AS doc_id,
       |    ${dotSql("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cosine
       |  FROM norms n, qv q WHERE n.vec_id <> ${Similarity.HybridQueryVec}),
       |sem AS (SELECT doc_id, sem_rank FROM (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS sem_rank
       |  FROM sem0) WHERE sem_rank <= ${Similarity.HybridListK}),
       |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
       |  ${round6Sql(
        s"coalesce(CAST(1.0 AS DOUBLE) / CAST(lex_rank + ${Similarity.HybridRrfK} AS DOUBLE), CAST(0.0 AS DOUBLE))" +
          s" + coalesce(CAST(1.0 AS DOUBLE) / CAST(sem_rank + ${Similarity.HybridRrfK} AS DOUBLE), CAST(0.0 AS DOUBLE))"
      )} AS rrf_score
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf_score,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
       |FROM fused ORDER BY fused_rank""".stripMargin

  /** Hybrid-retrieval replay, IVF-PQ semantic source: the bm25 oracle
    * verbatim as the lexical list; the SEMANTIC list is the full
    * IVF-PQ serve chain ([[ipqCtes]] — probed cells, ADC over stored
    * codes, exact-dot refine) cut at rank ≤ HybridListK for the hybrid
    * query vector; then the identical RRF arithmetic and fused total
    * order as [[simHybridRerank]].
    */
  val simHybridRerankPq: String =
    s"""WITH $ivfCellCtes,
       |$pqCodesCtes,
       |$ipqCtes,
       |lex AS (SELECT doc_id, rank AS lex_rank FROM ($textBm25)),
       |sem AS (SELECT vec_id AS doc_id, CAST(rank AS BIGINT) AS sem_rank
       |  FROM ipq_rerank
       |  WHERE query_id = ${Similarity.HybridQueryVec}
       |    AND rank <= ${Similarity.HybridListK}),
       |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
       |  ${round6Sql(
        s"coalesce(CAST(1.0 AS DOUBLE) / CAST(lex_rank + ${Similarity.HybridRrfK} AS DOUBLE), CAST(0.0 AS DOUBLE))" +
          s" + coalesce(CAST(1.0 AS DOUBLE) / CAST(sem_rank + ${Similarity.HybridRrfK} AS DOUBLE), CAST(0.0 AS DOUBLE))"
      )} AS rrf_score
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf_score,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
       |FROM fused ORDER BY fused_rank""".stripMargin

  /** BPE round-1 replay: the same lowercase/space-tab tokenizer, the
    * same adjacent-2-gram enumeration with multiplicity, the same
    * count-desc / pair-asc total order at the top-K boundary.
    */
  /** Full tokenizer-train + encode + pack replay, independent of the
    * engine's mechanisms: per round, pair counts over the CURRENT
    * symbolization + (count desc, pair asc) argmax — then the greedy
    * no-remerge merge pass as a literal string replace over a
    * delimiter-DOUBLED representation (`|a||b|` → `|ab|`): doubling
    * makes adjacent matches share no characters (so left-to-right
    * non-overlapping replace ≡ the engine's justMerged fold, incl. the
    * [a,b,a,b] double-merge case) and delimits every symbol on both
    * sides (no suffix/prefix false matches). The alnum word filter
    * keeps symbols literal-safe. Tail: per-doc reassembly in word
    * order, then the text_pack_blocks arithmetic over BPE counts
    * (greatest(cum-1, 0) matches Spark's truncating div at cum = 0 —
    * an all-punctuation doc can hold position 0 of its shard).
    */
  val textBpeEncode: String = {
    import graft.text.{Bpe, Sampling}
    val rounds = (1 to Bpe.EncodeMerges)
      .map { r =>
        s"""l$r AS (SELECT string_split(trim(s, '|'), '||') AS ls FROM s${r - 1}),
           |p$r AS (SELECT ls[i] AS a, ls[i + 1] AS b, count(*) AS cnt
           |  FROM (SELECT ls, unnest(generate_series(1, len(ls) - 1)) AS i FROM l$r)
           |  GROUP BY 1, 2),
           |t$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
           |s$r AS (SELECT doc_id, pos,
           |    CASE WHEN t.a IS NULL THEN s
           |         ELSE replace(s, '|' || t.a || '||' || t.b || '|', '|' || t.a || t.b || '|') END AS s
           |  FROM s${r - 1} LEFT JOIN t$r t ON TRUE)""".stripMargin
      }
      .mkString(",\n")
    val n = Bpe.EncodeMerges
    s"""WITH wd0 AS (SELECT doc_id, unnest($toks) AS w, generate_subscripts($toks, 1) AS pos
       |  FROM documents),
       |wd AS (SELECT doc_id, pos, w FROM wd0 WHERE regexp_matches(w, '${Bpe.WordRe}')),
       |s0 AS (SELECT doc_id, pos,
       |    '|' || array_to_string(string_split(w, ''), '||') || '|' AS s FROM wd),
       |$rounds,
       |enc AS (SELECT doc_id, pos, string_split(trim(s, '|'), '||') AS syms FROM s$n),
       |de AS (SELECT doc_id, flatten(list(syms ORDER BY pos)) AS toks FROM enc GROUP BY 1),
       |base AS (SELECT d.doc_id,
       |    COALESCE(CAST(len(de.toks) AS BIGINT), 0) AS n_bpe_tokens,
       |    COALESCE(array_to_string(de.toks, ' '), '') AS bpe_text
       |  FROM documents d LEFT JOIN de ON d.doc_id = de.doc_id),
       |sh AS (SELECT doc_id, n_bpe_tokens, bpe_text, doc_id % ${Sampling.PackShards} AS shard
       |  FROM base),
       |c AS (SELECT doc_id, n_bpe_tokens, bpe_text, shard,
       |    CAST(sum(n_bpe_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM sh)
       |SELECT doc_id, n_bpe_tokens, bpe_text, shard,
       |  (cum - n_bpe_tokens) // ${Sampling.PackBlockTokens} AS start_block,
       |  greatest(cum - 1, 0) // ${Sampling.PackBlockTokens} AS end_block
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Capped-vocabulary replay of [[textBpeEncode]]: the top-V dictionary
    * is selected with the same (freq desc, word asc) total order, the
    * per-round pair counts are WEIGHTED by word frequency over the
    * capped dictionary's current symbolization (Σ_w freq·pairs — the
    * count-on-dictionary training shape), the merge pass is the same
    * delimiter-doubled literal replace, and encoding falls back to
    * per-character symbols for any word OUTSIDE the dictionary (the
    * LEFT JOIN's null arm). V < fixture vocabulary, so the fallback arm
    * is exercised on every scale factor. Tail: identical reassembly +
    * pack arithmetic.
    */
  val textBpeEncodeCapped: String = {
    import graft.text.{Bpe, Sampling}
    val rounds = (1 to Bpe.EncodeMerges)
      .map { r =>
        s"""dl$r AS (SELECT w, freq, string_split(trim(s, '|'), '||') AS ls FROM d${r - 1}),
           |dp$r AS (SELECT ls[i] AS a, ls[i + 1] AS b, sum(freq) AS cnt
           |  FROM (SELECT freq, ls, unnest(generate_series(1, len(ls) - 1)) AS i FROM dl$r)
           |  GROUP BY 1, 2),
           |dt$r AS (SELECT a, b FROM dp$r ORDER BY cnt DESC, a, b LIMIT 1),
           |d$r AS (SELECT w, freq,
           |    CASE WHEN t.a IS NULL THEN s
           |         ELSE replace(s, '|' || t.a || '||' || t.b || '|', '|' || t.a || t.b || '|') END AS s
           |  FROM d${r - 1} LEFT JOIN dt$r t ON TRUE)""".stripMargin
      }
      .mkString(",\n")
    val n = Bpe.EncodeMerges
    s"""WITH wd0 AS (SELECT doc_id, unnest($toks) AS w, generate_subscripts($toks, 1) AS pos
       |  FROM documents),
       |wd AS (SELECT doc_id, pos, w FROM wd0 WHERE regexp_matches(w, '${Bpe.WordRe}')),
       |vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM wd GROUP BY w
       |  ORDER BY freq DESC, w LIMIT ${Bpe.EncodeCapV}),
       |d0 AS (SELECT w, freq,
       |    '|' || array_to_string(string_split(w, ''), '||') || '|' AS s FROM vocab),
       |$rounds,
       |dict AS (SELECT w, string_split(trim(s, '|'), '||') AS syms FROM d$n),
       |enc AS (SELECT wd.doc_id, wd.pos,
       |    COALESCE(dict.syms, string_split(wd.w, '')) AS syms
       |  FROM wd LEFT JOIN dict ON wd.w = dict.w),
       |de AS (SELECT doc_id, flatten(list(syms ORDER BY pos)) AS toks FROM enc GROUP BY 1),
       |base AS (SELECT d.doc_id,
       |    COALESCE(CAST(len(de.toks) AS BIGINT), 0) AS n_bpe_tokens,
       |    COALESCE(array_to_string(de.toks, ' '), '') AS bpe_text
       |  FROM documents d LEFT JOIN de ON d.doc_id = de.doc_id),
       |sh AS (SELECT doc_id, n_bpe_tokens, bpe_text, doc_id % ${Sampling.PackShards} AS shard
       |  FROM base),
       |c AS (SELECT doc_id, n_bpe_tokens, bpe_text, shard,
       |    CAST(sum(n_bpe_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM sh)
       |SELECT doc_id, n_bpe_tokens, bpe_text, shard,
       |  (cum - n_bpe_tokens) // ${Sampling.PackBlockTokens} AS start_block,
       |  greatest(cum - 1, 0) // ${Sampling.PackBlockTokens} AS end_block
       |FROM c ORDER BY doc_id""".stripMargin
  }

  val textBpePairs: String =
    s"""WITH w AS (SELECT unnest($toks) AS w FROM documents),
       |idx AS (
       |  SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
       |  FROM w WHERE length(w) >= 2),
       |p AS (SELECT substring(w, i, 2) AS pair FROM idx),
       |c AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS cnt
       |  FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT ${graft.text.Bpe.PairTopK})
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank,
       |  pair, cnt FROM c""".stripMargin
}
