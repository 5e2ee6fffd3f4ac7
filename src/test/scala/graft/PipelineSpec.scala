package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the LLM-pipeline operators that the DuckDB oracle can't
  * express: banding exactness (simhash), LSH-vs-brute-force containment,
  * batched multimodal decode, streaming-vs-batch agreement.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "pipeline-spec")
  private val dir = "/root/testdata/sf0.001"

  test("simhash banding is exact: bucket-join pairs == brute-force hamming<=3 pairs") {
    import spark.implicits._
    val sig = Dedup.simhashSignatures(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sig; (ib, sb) <- sig if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.SimhashMaxHamming
    } yield (ia, ib, h.toLong)).toSet
    val banded = Dedup.simhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
  }

  test("minhash LSH finds the planted high-jaccard near-duplicates found by exact ngram") {
    import spark.implicits._
    val exact = Dedup.ngramJaccard(spark, dir).filter($"jaccard" >= 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, dir).filter($"jaccard" >= 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-duplicates")
    assert(lsh === exact)
  }

  test("sim_topk_agg (typed map-side aggregator) equals the window formulation") {
    val window = Similarity.topKBruteForce(spark, dir).collect().toSeq
    val agg = Similarity.topKAggregated(spark, dir).collect().toSeq
    assert(agg === window)
  }

  test("stop-shingle cap: conservative — capped pairs ⊆ uncapped, capped jaccard ≤ true jaccard") {
    import spark.implicits._
    val full = Dedup
      .ngramJaccard(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val capped = Dedup
      .ngramJaccard(spark, dir, maxShingleDf = Some(5))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    capped.foreach { case (pair, j) =>
      assert(full.contains(pair), s"capped pair $pair not in uncapped result")
      assert(j <= full(pair) + 1e-9, s"capped jaccard $j exceeds true ${full(pair)} for $pair")
    }
  }

  test("containment cap: conservative — capped pairs ⊆ uncapped, capped value ≤ true containment") {
    val full = Dedup
      .containment(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val capped = Dedup
      .containment(spark, dir, maxShingleDf = Some(5))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    capped.foreach { case (pair, c) =>
      assert(full.contains(pair), s"capped pair $pair not in uncapped result")
      assert(c <= full(pair) + 1e-9, s"capped containment $c exceeds true ${full(pair)} for $pair")
    }
  }

  test("incremental index covers zero-shingle corpus docs: exact dup of a tiny doc is caught") {
    import spark.implicits._
    // a <3-word corpus doc has zero shingles → no signature/count row;
    // the index must still carry its md5 (mh null, n=0) or an exact
    // byte-duplicate arriving in a batch slips past the exact check
    val dir = java.nio.file.Files.createTempDirectory("graft-tinydoc-").toString
    Seq(
      (1L, "tiny doc"), // corpus (1 % 5 != 0), zero shingles
      (2L, "an ordinary corpus document with enough words to shingle properly today"),
      (3L, "another ordinary corpus document with plenty of words for shingling paths"),
      (5L, "tiny doc"), // batch (5 % 5 == 0): byte-duplicate of doc 1
      (10L, "a fresh batch document with enough words and no match in the corpus")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Dedup
      .incremental(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(out(5L) === ((1L, 0L)), s"exact dup of the zero-shingle corpus doc must be flagged+dropped: $out")
    assert(out(10L) === ((0L, 1L)), s"non-duplicate batch doc must be kept: $out")
  }

  test("simhash band cap: conservative — capped pairs ⊆ uncapped; survivors have a non-hot matching band") {
    import spark.implicits._
    val full = Dedup
      .simhash(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val cap = 3 // tiny cap so hot buckets exist even at sf0.001
    val capped = Dedup
      .simhash(spark, dir, Some(cap))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(capped.nonEmpty, "capped simhash should retain some near-dup pairs at sf0.001")
    capped.foreach { case (pair, h) =>
      assert(full.contains(pair), s"capped pair $pair not in uncapped result")
      assert(h === full(pair), s"capped hamming $h differs from uncapped ${full(pair)} for $pair")
    }
    // the conditional pigeonhole guarantee under the cap: every surviving
    // pair collides in at least one band whose bucket df ≤ cap
    val sig = Dedup.simhashSignatures(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mask = (1L << Dedup.SimhashBandBits) - 1
    def bucket(s: Long, b: Int): Long = (s >>> (b * Dedup.SimhashBandBits)) & mask
    val df = (for {
      (_, s) <- sig.toSeq; b <- 0 until Dedup.SimhashBands
    } yield (b, bucket(s, b))).groupBy(identity).map { case (k, v) => k -> v.size }
    capped.foreach { case ((ia, ib), _) =>
      val hasColdBand = (0 until Dedup.SimhashBands).exists { b =>
        bucket(sig(ia), b) == bucket(sig(ib), b) && df((b, bucket(sig(ia), b))) <= cap
      }
      assert(hasColdBand, s"surviving pair ($ia,$ib) has no non-hot matching band at cap=$cap")
    }
  }

  test("capped components refine uncapped: same-capped-cluster ⇒ same-uncapped-cluster; keepers only grow") {
    val uncapped = Dedup
      .clusters(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val capped = Dedup
      .clusters(spark, dir, Some(Dedup.MinhashBucketCap))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // capped edges ⊆ uncapped edges ⇒ every capped cluster sits inside
    // ONE uncapped cluster (dropping edges can only split, never merge)
    capped.groupBy(_._2).foreach { case (cid, members) =>
      val parents = members.map(m => uncapped(m._1)).distinct
      assert(parents.length === 1, s"capped cluster $cid spans uncapped clusters $parents")
    }
    val cappedKeepers = capped.count(_._3 == 1L)
    val uncappedKeepers = Dedup.clusters(spark, dir).collect().count(_.getLong(3) == 1L)
    assert(cappedKeepers >= uncappedKeepers, "splitting clusters cannot reduce keeper count")
    // keep-best inherits the refinement: its cluster ids are the capped fixpoint's
    val kb = graft.text.Curation
      .keepBest(spark, dir, Some(Dedup.MinhashBucketCap))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(kb === capped.map(c => c._1 -> c._2).toMap)
  }

  test("capped pipeline flows: uncapped survivors ⊆ capped survivors; shared rows identical") {
    // capped edges ⊆ uncapped edges ⇒ components split ⇒ keepers grow:
    // every doc the uncapped curation keeps, the capped one keeps too,
    // with identical per-doc features (lang/quality/split are cap-blind)
    val cf = graft.text.Curation.curateFuzzy(spark, dir).collect().map(r => r.toSeq).toSet
    val cfCap = graft.text.Curation
      .curateFuzzy(spark, dir, Some(Dedup.MinhashBucketCap))
      .collect()
      .map(r => r.toSeq)
      .toSet
    assert(cf.subsetOf(cfCap), "uncapped fuzzy-curation survivors must survive under the cap")
    // pretrain inherits it: pack offsets can shift when the survivor set
    // grows, so compare on the cap-blind columns (doc_id + features)
    val pt = graft.text.Curation
      .pretrain(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val ptCap = graft.text.Curation
      .pretrain(spark, dir, Some(Dedup.MinhashBucketCap))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(pt.subsetOf(ptCap), "uncapped pretrain survivors must survive under the cap")
  }

  test("semantic dedup drops the planted within-cluster duplicate and keeps the smallest id") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-semdedup-").toString
    val rng = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val vecs = (0 until 120).map(i => (i.toLong, unit())).toArray
    vecs(7) = (7L, vecs(3)._2.clone()) // byte-identical duplicate of vec 3
    vecs.toSeq.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    val out = Similarity
      .semanticDedup(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(2)) -1L else r.getLong(2)) -> r.getLong(3)))
      .toMap
    assert(out(7L) === ((3L, 0L)), s"identical vector must be dropped against its smaller twin: ${out(7L)}")
    assert(out.size === 120)
    // dropped vectors are exactly those with a sem_dup_of
    out.values.foreach { case (dupOf, keep) => assert((dupOf >= 0) === (keep == 0L)) }
  }

  test("semantic cell cap: conservative — capped dup verdicts ⊆ uncapped; hot-cell members keep=1") {
    val sf = "/root/testdata/sf0.001"
    val full = Similarity
      .semanticDedup(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))))
      .toMap
    // cap low enough that the sf0.001 corpus (500 vectors over ≤10
    // Lloyd cells) actually drops hot cells, so the conservative path
    // is exercised, not vacuously equal
    val cap = 40
    val capped = Similarity
      .semanticDedup(spark, sf, Some(cap))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))))
      .toMap
    assert(capped.keySet === full.keySet, "cap must never drop vectors, only pair candidates")
    val cellPop = full.values.groupBy(_._1).map { case (cid, xs) => cid -> xs.size }
    assert(cellPop.values.exists(_ > cap), "fixture must contain at least one hot cell at this cap")
    capped.foreach { case (vid, (cid, dupOf, keep)) =>
      assert(cid === full(vid)._1, s"cell assignment of $vid must not change under the cap")
      if (cellPop(cid) > cap) {
        assert(dupOf === -1L && keep === 1L, s"hot-cell member $vid must be kept with no dup")
      } else {
        assert((dupOf, keep) === ((full(vid)._2, full(vid)._3)), s"cold-cell verdict of $vid must match uncapped")
      }
    }
  }

  test("persisted IVF quantizer: stored centroids serve the identical ANN result, once per fingerprint") {
    val sf = "/root/testdata/sf0.001"
    val live = Similarity.annIvf(spark, sf).collect().toSeq
    val served = Similarity.annIvfPersisted(spark, sf).collect().toSeq
    assert(served === live, "durability must not change the answer")
    val t = Similarity.ivfIndexTable(spark, sf)
    assert(spark.catalog.tableExists(t))
    val stored = spark.table(t).count()
    assert(stored > 0 && stored <= Similarity.IvfMaxCells, s"artifact must stay k-bounded: $stored")
    // second serve call reuses the catalog artifact (same table name,
    // still registered, no rebuild exception from a double write)
    assert(Similarity.annIvfPersisted(spark, sf).collect().toSeq === live)
  }

  test("decode parses real PNG/JPEG header dimensions; text payloads take the deterministic fallback") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // minimal PNG: signature + IHDR chunk declaring 640×480
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    val (w, h, _, _) = Multimodal.decodeStub(png)
    assert((w, h) === (640, 480))
    // minimal JPEG: SOI, APP0 (skipped), SOF0 declaring 480 high × 640 wide
    val jpeg = Array[Byte](
      0xff.toByte, 0xd8.toByte, // SOI
      0xff.toByte, 0xe0.toByte, 0, 4, 0, 0, // APP0, len 4 (2 payload bytes)
      0xff.toByte, 0xc0.toByte, 0, 17, 8, // SOF0, len, precision
      0x01, 0xe0.toByte, // height 480
      0x02, 0x80.toByte, // width 640
      3, 0, 0, 0
    )
    val (w2, h2, _, _) = Multimodal.decodeStub(jpeg)
    assert((w2, h2) === (640, 480))
    // text payload: no magic number — md5-derived fake, oracle-replayable
    val (w3, h3, _, _) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(w3 >= 1 && w3 <= 1920 && h3 >= 1 && h3 <= 1080)
  }

  test("uncompressed BMP and PPM decode end-to-end: real pixels, real features, format-agnostic") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    // 2×2 logical image, row-major: red green / blue white
    // BMP stores it bottom-up in BGR with rows padded to 4 bytes
    val bmp = Array[Byte]('B', 'M') ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++ // DIB: 2×2, 24bpp, BI_RGB
      le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      // stored row 0 = logical bottom row: blue(BGR FF 00 00), white, pad
      Array[Byte](0xff.toByte, 0, 0, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0, 0) ++
      // stored row 1 = logical top row: red(BGR 00 00 FF), green, pad
      Array[Byte](0, 0, 0xff.toByte, 0, 0xff.toByte, 0, 0, 0)
    val (bw, bh, bf, bfeat) = Multimodal.decodeStub(bmp)
    assert((bw, bh, bf) === (2, 2, 1))
    // means of the four pixels: R=G=B=(255+255)/4/255=0.5; half bright
    assert(math.abs(bfeat(0) - 0.5f) < 1e-6, bfeat.mkString(","))
    assert(math.abs(bfeat(1) - 0.5f) < 1e-6)
    assert(math.abs(bfeat(2) - 0.5f) < 1e-6)
    assert(bfeat(4) === 29f / 255f) // min luma = pure blue
    assert(bfeat(5) === 1.0f) // max luma = white
    assert(bfeat(7) === 0.5f) // green + white are bright
    // the SAME logical image as binary PPM (P6, top-down RGB, a comment
    // in the header) must decode to the IDENTICAL feature vector
    val ppm = "P6\n# tiny fixture\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0xff.toByte, 0, 0, 0, 0xff.toByte, 0, 0, 0, 0xff.toByte,
        0xff.toByte, 0xff.toByte, 0xff.toByte)
    val (pw, ph, pf, pfeat) = Multimodal.decodeStub(ppm)
    assert((pw, ph, pf) === (2, 2, 1))
    assert(pfeat.toSeq === bfeat.toSeq, "identical pixels must give identical features across formats")
    // a top-down BMP (negative height) decodes to the same image too
    val bmpTd = bmp.clone()
    le32(-2).copyToArray(bmpTd, 22) // height = -2 → rows stored top-down
    val tmp = bmpTd.slice(54, 62).clone() // swap the two stored rows
    Array.copy(bmpTd, 62, bmpTd, 54, 8)
    Array.copy(tmp, 0, bmpTd, 62, 8)
    val (tw, th, _, tfeat) = Multimodal.decodeStub(bmpTd)
    assert((tw, th) === (2, 2))
    assert(tfeat.toSeq === bfeat.toSeq)
  }

  test("pii redact scrubs every planted span: zero residual matches, counts match the plant rule") {
    import spark.implicits._
    val out = TextAnalysis.piiRedact(spark, dir)
    // counts follow the deterministic plant rule exactly
    val wrong = out
      .filter(
        $"n_emails" =!= when($"doc_id" % 2 === 0, 1L).otherwise(0L) ||
          $"n_ips" =!= when($"doc_id" % 3 === 0, 1L).otherwise(0L) ||
          $"n_phones" =!= when($"doc_id" % 5 === 0, 1L).otherwise(0L)
      )
      .count()
    assert(wrong === 0)
    // and the scrub is total: re-running the counters on the redacted
    // text finds nothing (the property a compliance pass actually needs)
    val docs = graft.Tables
      .documents(spark, dir)
      .select($"doc_id", TextAnalysis.withPlantedPii($"doc_id", $"text").as("raw"))
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace($"raw", lit(TextAnalysis.EmailRe), lit("<EMAIL>")),
        lit(TextAnalysis.Ipv4Re),
        lit("<IP>")
      ),
      lit(TextAnalysis.PhoneRe),
      lit("<PHONE>")
    )
    val residual = docs
      .select(
        (regexp_count(clean, lit(TextAnalysis.EmailRe)) +
          regexp_count(clean, lit(TextAnalysis.Ipv4Re)) +
          regexp_count(clean, lit(TextAnalysis.PhoneRe))).as("r")
      )
      .agg(sum($"r"))
      .head()
      .getLong(0)
    assert(residual === 0L)
  }

  test("seg dedup with an unreachable df threshold reassembles every document verbatim") {
    import spark.implicits._
    // with maxDf = MaxValue nothing is boilerplate, so the split →
    // hash → df-join → reorder → concat round-trip must be the identity
    // — this pins the reassembly (ordering, separator, empty-token)
    // logic independently of the oracle's replay of the same plan
    val orig = graft.Tables.documents(spark, dir).select($"doc_id", $"text".as("orig"))
    // exercise a non-default segment width too: identity must hold for
    // ANY window size, and this covers the segWords parameter
    for (segWords <- Seq(3, TextAnalysis.SegWords)) {
      val rebuilt = TextAnalysis.segDedup(spark, dir, segWords = segWords, maxDf = Int.MaxValue)
      val joined = rebuilt.join(orig, "doc_id").collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        assert(r.getAs[String]("text") === r.getAs[String]("orig"), s"segWords=$segWords doc ${r.get(0)}")
        assert(r.getAs[Long]("n_dropped") === 0L)
      }
    }
  }

  test("exact dedup keeps one id per distinct text and covers all docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val out = Dedup.exact(spark, dir)
    assert(out.agg(sum($"n_copies")).as[Long].head() === docs.count())
    assert(out.select($"keep_id").distinct().count() === out.count())
  }

  test("ANN candidates are a subset of brute-force ranking universe; scores agree") {
    import spark.implicits._
    val brute = Similarity.topKBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ann = Similarity.annLsh(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
    // where ANN and brute force rank the same pair, the cosine is identical
    ann.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      brute.get(k).foreach(b => assert(b === r.getDouble(2), s"cosine mismatch for $k"))
    }
  }

  test("multimodal curation = text gates intersect image-clique keepers") {
    import spark.implicits._
    val got = text.Curation.curateMultimodal(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val textGate = TextAnalysis.langId(spark, dir).filter($"pred_lang" === "en")
      .select($"doc_id")
      .join(
        TextAnalysis.quality(spark, dir)
          .filter($"quality_score" >= text.Curation.QualityMin).select($"doc_id"),
        "doc_id"
      )
      .collect().map(_.getLong(0)).toSet
    val keepers = Multimodal.phashKeepers(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === (textGate intersect keepers))
    assert(got.nonEmpty)
    assert((textGate -- keepers).nonEmpty, "fixture must actually drop some re-posted images")
  }

  test("hybrid RRF: membership is the union of both lists; score decomposes into rank terms") {
    val rows = Similarity.hybridRerank(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.isDefined || sem.isDefined, s"doc ${r.getLong(0)} in neither list")
      val want = lex.map(x => 1.0 / (x + 60.0)).getOrElse(0.0) +
        sem.map(x => 1.0 / (x + 60.0)).getOrElse(0.0)
      val want6 = math.floor(want * 1e6 + 0.5) / 1e6 // the engine's round6
      assert(r.getDouble(3) === want6, s"doc ${r.getLong(0)} rrf")
    }
    // fused_rank is exactly the (rrf desc, doc_id) total order
    val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(0)))
    assert(sorted.map(_.getLong(4)).toSeq === (1L to rows.length.toLong))
    // both sources contribute: at least one doc per source in the fusion
    assert(rows.exists(!_.isNullAt(1)) && rows.exists(!_.isNullAt(2)))
  }

  test("MMR diversification: picks are distinct pool members, pick 1 is the relevance argmax, scores never increase") {
    val rows = Similarity.mmrDiversify(spark, dir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until Similarity.NumQueries.toLong).toSet)
    // exact top-k gives the relevance ranking MMR's pool extends
    val top1 = Similarity
      .topKBruteForce(spark, dir)
      .collect()
      .filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    byQuery.foreach { case (qid, picks) =>
      val ordered = picks.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to Similarity.MmrSelect.toLong))
      // distinct selections
      assert(ordered.map(_.getLong(2)).distinct.length === Similarity.MmrSelect)
      // the first pick is pure relevance: identical to exact top-1
      assert(ordered.head.getLong(2) === top1(qid), s"query $qid pick 1")
      // its score is λ·rel exactly (empty penalty)
      val r6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
      assert(ordered.head.getDouble(4) === r6(Similarity.MmrLambda * ordered.head.getDouble(3)))
      // greedy MMR scores are monotone non-increasing: a later pick was
      // available earlier with a no-larger penalty
      val scores = ordered.map(_.getDouble(4)).toSeq
      scores.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, s"query $qid scores $scores") }
      // diversification bites: at least one pick departs from the pure
      // relevance prefix OR every pick's penalty left its score at λ·rel
      // (both legal; the oracle pins the exact trajectory either way)
    }
  }

  test("MMR quality gate: diversified picks are no more self-similar than the pure relevance top-5") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // intra-list cohesion = mean pairwise cosine of the 5 selected
    // vectors; MMR exists to lower it relative to plain top-k, and a
    // regression that quietly reverts to pure relevance (λ→1 behavior)
    // would show up as equality everywhere
    val emb = graft.Tables
      .embeddingsFanned(spark, dir)
      .select($"vec_id", $"embedding", graft.functions.Portable.norm($"embedding").as("nrm"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getDouble(2)))
      .toMap
    def cohesion(ids: Seq[Long]): Double = {
      val pairs = for { i <- ids.indices; j <- (i + 1) until ids.length } yield {
        val (a, an) = emb(ids(i)); val (b, bn) = emb(ids(j))
        var acc = 0.0; var k = 0
        while (k < a.length) { acc += a(k).toDouble * b(k).toDouble; k += 1 }
        acc / (an * bn)
      }
      pairs.sum / pairs.length
    }
    val mmr = Similarity.mmrDiversify(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    val top = Similarity.topKBruteForce(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    val deltas = mmr.keys.toSeq.sorted.map(q => cohesion(top(q)) - cohesion(mmr(q)))
    // averaged over the query set, diversification must strictly reduce
    // cohesion (per-query it may tie when the pool is already diverse)
    assert(deltas.sum / deltas.length > 0.0, s"mean cohesion delta ${deltas.sum / deltas.length}")
    assert(deltas.forall(_ >= -1e-9), s"no query may get MORE self-similar: $deltas")
  }

  test("hybrid RRF over IVF-PQ: semantic list IS the index's refined top-K; fusion decomposes") {
    val rows = Similarity.hybridRerankPq(spark, dir).collect()
    assert(rows.nonEmpty)
    // The semantic list is exactly the IVF-PQ serving list at depth
    // HybridListK for the hybrid query — not an exact-cosine scan.
    val wantSem = similarity.Pq
      .ivfPqNeighbors(spark, dir, Similarity.HybridQueryVec, Similarity.HybridListK)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotSem = rows.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotSem === wantSem)
    assert(wantSem.size === Similarity.HybridListK)
    // Same RRF decomposition contract as the exact-source fusion.
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.isDefined || sem.isDefined, s"doc ${r.getLong(0)} in neither list")
      val want = lex.map(x => 1.0 / (x + 60.0)).getOrElse(0.0) +
        sem.map(x => 1.0 / (x + 60.0)).getOrElse(0.0)
      val want6 = math.floor(want * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) === want6, s"doc ${r.getLong(0)} rrf")
    }
    val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(0)))
    assert(sorted.map(_.getLong(4)).toSeq === (1L to rows.length.toLong))
    // The lexical side is unchanged between the exact and PQ fusions.
    val exact = Similarity.hybridRerank(spark, dir).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pqLex = rows.filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pqLex === exact)
  }

  test("filtered ANN: every neighbor matches the query's label; pre-filter never widens the unfiltered candidate set") {
    import spark.implicits._
    val rows = Similarity.annIvfFiltered(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getLong(0); val lbl = r.getInt(1); val n = r.getLong(2)
      assert(labels(q) === lbl, s"query $q label column")
      assert(labels(n) === lbl, s"neighbor $n of query $q must share the label")
    }
    // ranks contiguous from 1 per query, cosine non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to sorted.length))
      val cos = sorted.map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q cosine order")
    }
    // the filtered result is a sub-ranking of the probed universe: every
    // (query, neighbor) also appears in the unfiltered probe candidates
    // ranked at-or-after its filtered rank (filtering only removes)
    val unfiltered = Similarity.annIvf(spark, dir, Similarity.IvfProbes * 4)
    val unfPairs = unfiltered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // spot check: filtered rank-1 neighbors with cosine >= the unfiltered
    // rank-3 cosine must be in the unfiltered list too
    val unfByQ = unfiltered.collect().groupBy(_.getLong(0))
    rows.filter(_.getInt(3) === 1).foreach { r =>
      val q = r.getLong(0)
      unfByQ.get(q).foreach { u =>
        val worst = u.map(_.getDouble(3)).min
        if (r.getDouble(4) > worst) // strict: tie boundaries break by id
          assert(unfPairs.contains((q, r.getLong(2))), s"query $q rank-1")
      }
    }
  }

  test("hard negatives: every neighbor differs in label; per query disjoint from the filtered positives") {
    import spark.implicits._
    val rows = Similarity.hardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getLong(0); val n = r.getLong(2)
      assert(labels(q) === r.getInt(1), s"query $q label column")
      assert(labels(n) !== labels(q), s"neighbor $n of query $q must NOT share the label")
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to sorted.length))
      val cos = sorted.map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q cosine order")
    }
    // the inverted predicate partitions the probed candidates: a vector
    // can be a positive or a hard negative for a query, never both
    val pos = Similarity.annIvfFiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.foreach(r => assert(!pos.contains((r.getLong(0), r.getLong(2))),
      "filtered positives and hard negatives must be disjoint"))
  }

  test("training triplets: pos shares the anchor label, negs don't, margin decomposes, members distinct") {
    import spark.implicits._
    val rows = Similarity.trainingTriplets(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getLong(0); val pos = r.getLong(2); val neg = r.getLong(4)
      assert(labels(pos) === labels(q), s"positive of $q must share the label")
      assert(labels(neg) !== labels(q), s"negative of $q must not share the label")
      assert(pos != neg && pos != q && neg != q, s"triplet members of $q must be distinct")
      assert(math.abs(r.getDouble(7) - (r.getDouble(3) - r.getDouble(6))) < 5e-7,
        s"margin of $q must decompose into pos_cos - neg_cos")
    }
    // one positive per anchor, at most 3 negatives
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length === 1, s"anchor $q has one rank-1 positive")
      assert(rs.length <= 3, s"anchor $q ships at most 3 negatives")
    }
  }

  test("semantic decontamination: max eval cosine exact, both arms live, eval slice excluded") {
    import spark.implicits._
    val rows = Similarity.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) >= Similarity.NumQueries), "eval vectors are not corpus members")
    val (kept, flagged) = rows.partition(_.getLong(2) === 1L)
    assert(kept.nonEmpty && flagged.nonEmpty,
      s"the fixture must exercise BOTH arms (kept=${kept.length}, flagged=${flagged.length})")
    // driver recompute of the max over the eval slice for a sample
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def dotD(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val evalQ = emb.filter(_._1 < Similarity.NumQueries)
    val byId = emb.toMap
    (rows.take(3) ++ flagged.take(2)).foreach { r =>
      val e = byId(r.getLong(0))
      val mx = evalQ.map { case (_, q) =>
        dotD(q, e) / (math.sqrt(dotD(q, q)) * math.sqrt(dotD(e, e)))
      }.max
      assert(math.abs(mx - r.getDouble(1)) < 1e-6, s"vec ${r.getLong(0)} max eval cosine")
      assert(r.getLong(2) === (if (mx >= Similarity.SemDecontamTau) 0L else 1L))
    }
    // scale shape: the per-vector max is a partial aggregate — map-side
    // combine collapses the k scored rows before the only shuffle
    val plan = Similarity.decontaminate(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"), plan.take(1500))
  }

  test("semantic pretrain: drops exactly the flagged + eval-member docs from the pretrain flow") {
    import spark.implicits._
    val base = graft.text.Curation.pretrain(spark, dir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val sem = graft.text.Curation.pretrainSemantic(spark, dir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(sem.nonEmpty)
    // survivors ride through with identical rows
    sem.foreach { case (id, row) => assert(base(id) === row, s"doc $id must pass through unchanged") }
    // the dropped set is exactly {semantically flagged} ∪ {eval members}
    val flagged = Similarity.decontaminate(spark, dir).filter($"keep" === 0L)
      .collect().map(_.getLong(0)).toSet
    val dropped = base.keySet -- sem.keySet
    dropped.foreach { id =>
      assert(flagged(id) || id < Similarity.NumQueries,
        s"doc $id dropped without a semantic flag or eval membership")
    }
    (base.keySet -- dropped).foreach { id =>
      assert(!flagged(id), s"flagged doc $id must not survive the semantic gate")
    }
  }

  test("range search: exactly the >= tau slice of the scored universe; zero-shuffle map pass") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < Similarity.NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe")).collect()
    def dotD(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val corpus = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val want = (for {
      q <- queries.map(r => (r.getLong(0), r.getSeq[Float](1)))
      (v, e) <- corpus
      if v != q._1
      cos = dotD(q._2, e) / (math.sqrt(dotD(q._2, q._2)) * math.sqrt(dotD(e, e)))
      if cos >= Similarity.RangeTau
    } yield (q._1, v)).toSet
    val got = Similarity.rangeSearch(spark, dir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // scale shape: broadcast join + filter only — no aggregation, no
    // shuffle exchange before the output sort
    val plan = Similarity.rangeSearch(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("HashAggregate"), "range search must not aggregate")
  }

  test("IVF assignment covers the corpus; probed candidates rank with exact cosines") {
    import spark.implicits._
    val nVecs = Tables.embeddings(spark, dir).count()
    val ivf = Similarity.annIvf(spark, dir).collect()
    assert(ivf.nonEmpty)
    // ranks are 1..k contiguous per query
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
    }
    // where IVF and brute force score the same pair, cosines are identical
    val brute = Similarity.topKBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      brute.get(k).foreach(b => assert(b === r.getDouble(3), s"cosine mismatch for $k"))
    }
    assert(nVecs > 0)
  }

  test("sequence packing: per-shard blocks are contiguous and start at zero") {
    import spark.implicits._
    val rows = text.Sampling
      .packBlocks(spark, dir)
      .select($"shard", $"doc_id", $"n_tokens", $"start_block", $"end_block")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { shard =>
      val inOrder = shard.sortBy(_._2)
      assert(inOrder.head._4 === 0L) // first doc starts in block 0
      inOrder.foreach { case (_, _, n, s, e) =>
        assert(s <= e && n >= 1)
      }
      // token stream is contiguous: next doc starts where the previous
      // one ended (same block or the immediately following one)
      inOrder.sliding(2).foreach {
        case Array((_, _, _, _, e1), (_, _, _, s2, _)) => assert(s2 === e1 || s2 === e1 + 1)
        case _                                         =>
      }
    }
  }

  test("multimodal batched extraction: every item decoded, feature shape fixed") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.feature.length === 8))
    assert(rows.forall(f => f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080))
    // deterministic: same payload → same features
    val twice = Multimodal.extractFeatures(media).collect().map(f => (f.media_id, f.width, f.height)).toSet
    assert(twice === rows.map(f => (f.media_id, f.width, f.height)).toSet)
  }

  test("language-ID prediction is deterministic and total") {
    import spark.implicits._
    val out = TextAnalysis.langId(spark, dir)
    assert(out.count() === Tables.documents(spark, dir).count())
    val langs = out.select($"pred_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("streaming tumbling equals batch tumbling") {
    val batch = queries.Events.tumbling(spark, dir).collect().toSeq
    val stream = streaming.StreamingQueries.tumbling(spark, dir).collect().toSeq
    assert(stream === batch)
  }

  test("dedup_clusters is the transitive closure of the minhash pair set") {
    import spark.implicits._
    val pairs = Dedup
      .minhashLsh(spark, dir)
      .select($"id_a", $"id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = Dedup.clusters(spark, dir).collect()
    val label = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a partition of the corpus: one row per doc
    assert(out.length === Tables.documents(spark, dir).count())
    // reference union-find over the pairs → expected component minima
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expectMin: Map[Long, Long] =
      members.groupBy(find).iterator.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
    expectMin.foreach { case (doc, m) => assert(label(doc) === m, s"doc $doc") }
    // singletons label themselves; keeper iff label == own id; sizes add up
    out.foreach { r =>
      if (!expectMin.contains(r.getLong(0))) assert(r.getLong(1) === r.getLong(0))
      assert((r.getLong(3) == 1L) === (r.getLong(0) == r.getLong(1)))
    }
    val sizes = out.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length.toLong }
    out.foreach(r => assert(r.getLong(2) === sizes(r.getLong(1))))
  }

  test("keep-best selects the cluster's quality argmax and agrees with the cluster partition") {
    import spark.implicits._
    val out = graft.text.Curation.keepBest(spark, dir).collect()
    // same partition of the corpus as dedup_clusters: identical labels
    val clusterOf = Dedup.clusters(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length === clusterOf.size)
    out.foreach(r => assert(r.getLong(1) === clusterOf(r.getLong(0))))
    // exactly one kept doc per cluster, and it is the (score, -id) argmax
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      val kept = rows.filter(_.getLong(5) == 1L)
      assert(kept.length === 1, s"cluster $c kept ${kept.length}")
      val winner = rows.minBy(r => (-r.getDouble(3), r.getLong(0)))
      assert(kept.head.getLong(0) === winner.getLong(0), s"cluster $c")
      // every row reports the same winner id and the true cluster size
      rows.foreach { r =>
        assert(r.getLong(4) === winner.getLong(0))
        assert(r.getLong(2) === rows.length.toLong)
      }
    }
    // the argmax must actually be exercised: the test data plants
    // near-duplicates, so multi-doc clusters exist and the winner is a
    // genuine selection, not the vacuous singleton case
    assert(byCluster.exists(_._2.length > 1), "no multi-doc cluster in test data")
  }

  test("repetition stats: map-side run-length maxima equal naive multiset counts") {
    import spark.implicits._
    val out = TextAnalysis.repetition(spark, dir).collect()
    val texts = Tables.documents(spark, dir).select($"doc_id", lower($"text")).as[(Long, String)].collect().toMap
    out.take(50).foreach { r =>
      val toks = texts(r.getLong(0)).split("[ \t]", -1).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === toks.distinct.length.toLong)
      assert(r.getLong(3) === toks.groupBy(identity).values.map(_.length).max.toLong)
      assert(r.getLong(5) === (if (bigrams.isEmpty) 0L else bigrams.groupBy(identity).values.map(_.length).max.toLong))
    }
  }

  test("knn graph: every vector with a bucket collision appears, ranked by exact cosine") {
    import spark.implicits._
    val out = Similarity.knnGraph(spark, dir).collect()
    val bySrc = out.groupBy(_.getLong(0))
    bySrc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      // ranks are 1..k and cosines non-increasing within a source
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      // no self edges
      rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
  }
}
