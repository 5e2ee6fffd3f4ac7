package graft.text

import graft.Tables
import graft.functions.Portable.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding surface for tokenizer training over the corpus.
  *
  * The 100 TB-relevant piece is [[pairStats]]: one BPE training round =
  * one count of adjacent symbol pairs across every word occurrence in
  * the corpus. The pair alphabet is bounded by (symbol vocabulary)², so
  * the shuffle moves a FIXED number of (pair, count) groups regardless
  * of corpus size — partial aggregation collapses each input split to
  * at most |alphabet|² rows before the exchange, the same shape as
  * wordcount. The driver-side part of training (argmax + merge-table
  * bookkeeping) touches only the tiny aggregated result, exactly how
  * SentencePiece/HF tokenizers train on Spark-preprocessed counts.
  *
  * The reference has no tokenizer (SURVEY.md §2c) — north-star surface
  * for the LLM-data pipeline.
  */
object Bpe {

  /** Top-K adjacent char pairs to surface in the registered query. */
  val PairTopK = 50

  /** Adjacent 2-grams (with multiplicity) of every ≥2-char token. */
  private def charPairs(w: Column): Column =
    transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2)))

  /** Registered query `text_bpe_pairs`: corpus-wide adjacent-character
    * pair frequencies — BPE merge round 1 — as the top-[[PairTopK]]
    * (rank, pair, cnt) table, count-desc / pair-asc total order so the
    * top-K boundary is engine-deterministic. Plan: map-side 2-gram
    * explode → partial count → one bounded-cardinality shuffle →
    * TakeOrdered. Merge #1 of [[train]] is by definition this table's
    * rank-1 row.
    */
  def pairStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = Tables
      .documentsFanned(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") >= 2)
      .select(explode(charPairs($"w")).as("pair"))
      .groupBy($"pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair")
      .limit(PairTopK)
    graft.functions.Portable
      .withRankLimited(topk, "rank", $"cnt", $"pair")
      .select($"rank", $"pair", $"cnt")
  }

  /** One greedy left-to-right merge pass of the adjacent pair (a, b)
    * over a symbol array — standard BPE apply: after (x, x) merges at
    * positions (i, i+1), the merged symbol does NOT re-merge with
    * position i+2 in the same pass. Pure fold, evaluated map-side.
    */
  private[text] def mergePass(arr: Column, a: String, b: String): Column =
    aggregate(
      arr,
      struct(
        array().cast("array<string>").as("out"),
        lit(false).as("justMerged")
      ),
      (st, c) => {
        val out = st.getField("out")
        val canMerge =
          !st.getField("justMerged") && size(out) > 0 &&
            element_at(out, -1) === lit(a) && c === lit(b)
        struct(
          when(canMerge, concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
            .otherwise(concat(out, array(c)))
            .as("out"),
          canMerge.as("justMerged")
        )
      },
      st => st.getField("out")
    )

  /** Symbol array of a token before any merge: its characters. */
  private[text] def symbols(w: Column): Column = split(w, "", 0)

  /** Trains `nMerges` BPE merges over the corpus' token stream. Each
    * round is ONE distributed pair-count job (the [[pairStats]] shape)
    * over the current symbolization; the argmax (count desc, pair-lex
    * asc — the deterministic tie-break) happens on the ≤|vocab|²-row
    * aggregate at the driver. Returns merges in rank order as
    * ((left, right), count-at-merge-time).
    */
  def train(
      words: DataFrame,
      col: String,
      nMerges: Int
  ): Seq[((String, String), Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    var syms = words.select(symbols(org.apache.spark.sql.functions.col(col)).as("s"))
    val merges = Seq.newBuilder[((String, String), Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val top = syms
        .filter(size($"s") >= 2)
        .select(
          explode(
            transform(
              sequence(lit(1), size($"s") - 1),
              i => struct(element_at($"s", i).as("a"), element_at($"s", i + 1).as("b"))
            )
          ).as("p")
        )
        .groupBy($"p.a", $"p.b")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += (((a, b), cnt))
        syms = syms.select(mergePass($"s", a, b).as("s")).localCheckpoint()
        round += 1
      }
    }
    merges.result()
  }

  /** Encodes a token column with a trained merge list: the merge passes
    * applied in rank order — a statically unrolled column expression, so
    * encoding N documents is one map-side projection, no shuffle, no UDF.
    */
  def encode(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols(w)) { case (arr, (a, b)) => mergePass(arr, a, b) }

  /** Merge rounds for the registered corpus-encode query, and the word
    * filter that keeps the trainable stream regex-free on the oracle
    * side (alnum-only symbols make the merge patterns literal-safe).
    */
  val EncodeMerges = 8
  val WordRe = "^[a-z0-9]+$"

  /** One greedy merge pass over a symbol sequence — the plain-Scala
    * twin of [[mergePass]] (same no-remerge fold, element for element;
    * BpeSpec pins the equivalence). Used where the input is already a
    * driver-side word dictionary, not a corpus column.
    */
  private[text] def mergePassScala(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var justMerged = false
    s.foreach { c =>
      if (!justMerged && out.nonEmpty && out.last == a && c == b) {
        out(out.length - 1) = a + b
        justMerged = true
      } else {
        out += c
        justMerged = false
      }
    }
    out.toSeq
  }

  /** Trains `nMerges` merges on a WORD-FREQUENCY dictionary — the
    * subword-nmt/SentencePiece training shape (Sennrich et al. 2016
    * train on word counts, not the raw token stream): each round's pair
    * count is Σ_w freq(w) · pairs(symbolization(w)), identical by
    * definition to [[train]]'s per-occurrence count (BpeSpec pins the
    * equality), but the loop runs over the vocabulary, not the corpus.
    * Same deterministic argmax (count desc, pair-lex asc).
    */
  private[text] def trainOnCounts(
      wordCounts: Seq[(String, Long)],
      nMerges: Int
  ): Seq[((String, String), Long)] = {
    var syms: Seq[(Seq[String], Long)] =
      wordCounts.map { case (w, f) => (w.split("").toSeq, f) }
    val merges = Seq.newBuilder[((String, String), Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += (((a, b), cnt))
        syms = syms.map { case (s, f) => (mergePassScala(s, a, b), f) }
        round += 1
      }
    }
    merges.result()
  }

  /** Registered query `text_bpe_encode` — the tokenize→pack chain made
    * real: ONE wordcount shuffle builds the word-frequency dictionary,
    * [[trainOnCounts]] learns the merges over that dictionary at driver
    * speed, every distinct word is encoded ONCE, and the corpus
    * projection is a broadcast dictionary lookup per token —
    * `element_at` on a literal map, one map-side pass, no
    * per-occurrence fold, no UDF, no extra shuffle.
    * The resulting BPE token counts feed the `text_pack_blocks`
    * packing. Output: per doc, its BPE token count, the encoded text
    * (symbols space-joined — the hash-checked proof the merges applied
    * identically), and its start/end block.
    *
    * This exact form collects the FULL distinct-word set to the driver,
    * which is only sound when the vocabulary is genuinely bounded (a
    * pre-tokenized corpus); on open-vocab web text the distinct-"word"
    * count grows with the corpus (Heap's law), so the registered 100 TB
    * path is the capped twin [[encodeDocsCapped]] — top-V dictionary,
    * character fallback, dictionary moved as broadcast DATA.
    *
    * The oracle replays training AND encoding independently in SQL —
    * per-round pair counts over the raw occurrence stream + argmax, and
    * the greedy no-remerge pass as a delimiter-doubled string replace
    * (`|a||b|` → `|ab|` — literal, overlap-safe, boundary-exact) — so
    * the dictionary factorization is itself under test: hash equality
    * proves count-weighted training ≡ occurrence training and
    * dictionary encode ≡ per-occurrence encode.
    */
  def encodeDocs(spark: SparkSession, dir: String): DataFrame =
    encodeDocs(spark, dir, EncodeVocabGuard)

  /** Fail-fast bound on the uncapped path's driver-side dictionary.
    * The collect is structurally capped at `vocabGuard + 1` rows (a
    * LIMIT above the aggregate), so the driver can never silently
    * absorb an open vocabulary: a corpus whose distinct-word count
    * exceeds the guard aborts with a pointer at the production twin
    * instead of OOMing the driver mid-collect.
    */
  val EncodeVocabGuard = 1 << 20

  private[graft] def encodeDocs(spark: SparkSession, dir: String, vocabGuard: Int): DataFrame = {
    import spark.implicits._
    val wc = Tables
      .documentsFanned(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter($"w".rlike(WordRe))
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"))
      .limit(vocabGuard + 1)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq
    if (wc.length > vocabGuard)
      throw new IllegalStateException(
        s"text_bpe_encode: distinct vocabulary exceeds $vocabGuard words — this audit twin " +
          "collects the full dictionary at the driver and is only sound on a bounded " +
          "vocabulary; use text_bpe_encode_capped (top-V dictionary, character fallback) " +
          "for open-vocabulary corpora"
      )
    val merges = trainOnCounts(wc, EncodeMerges).map(_._1)
    val dict: Map[String, Seq[String]] = wc.map { case (w, _) =>
      w -> merges.foldLeft(w.split("").toSeq) { case (s, (a, b)) => mergePassScala(s, a, b) }
    }.toMap
    val dictCol = typedLit(dict)
    val enc = Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        flatten(
          transform(
            filter(tokens($"text"), w => w.rlike(WordRe)),
            w => element_at(dictCol, w)
          )
        ).as("syms")
      )
      .select(
        $"doc_id",
        size($"syms").cast("long").as("n_tokens"),
        array_join($"syms", " ").as("bpe_text")
      )
    Sampling
      .packOver(enc)
      .select(
        $"doc_id",
        $"n_tokens".as("n_bpe_tokens"),
        $"bpe_text",
        $"shard",
        $"start_block",
        $"end_block"
      )
      .orderBy($"doc_id")
  }

  /** Vocabulary cap of the production encode path. DELIBERATELY smaller
    * than the test fixture's vocabulary, so the out-of-vocabulary
    * fallback is exercised ON the oracled path at every scale factor —
    * a cap the fixture never reaches would be dead code wearing a
    * scale argument.
    */
  val EncodeCapV = 24

  /** Registered query `text_bpe_encode_capped` — the 100 TB form of
    * [[encodeDocs]]: open-vocabulary safe end to end.
    *
    *  - The dictionary is the top-[[EncodeCapV]] words by (freq desc,
    *    word asc) — a TakeOrdered over the wordcount aggregate, so the
    *    driver holds V rows, never the distinct-word set (on web text
    *    that set grows with the corpus; V is the fixed budget every
    *    trained tokenizer publishes as its vocab size).
    *  - Merges train on the CAPPED word-frequency dictionary
    *    ([[trainOnCounts]] — the subword-nmt shape, counts weighted by
    *    word frequency).
    *  - Out-of-vocabulary words encode by CHARACTER FALLBACK (the
    *    tail's occurrence mass is Zipf-small, so per-char tokens there
    *    cost little; in-dictionary words — the bulk of occurrences —
    *    take the precomputed symbolization).
    *  - The dictionary reaches executors as broadcast DATA (a 1-row
    *    map frame crossJoined with `broadcast()`), not a plan literal:
    *    a typedLit dictionary is serialized into every task
    *    description, a broadcast ships once per executor.
    *
    * The oracle replays the cap, the capped training, and the fallback
    * independently in SQL, so hash equality proves all three: the top-V
    * selection order, count-weighted training on the capped dict, and
    * dictionary-encode ≡ char-fallback at the V boundary.
    */
  def encodeDocsCapped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wcTop = Tables
      .documentsFanned(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter($"w".rlike(WordRe))
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"w")
      .limit(EncodeCapV)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq
    val merges = trainOnCounts(wcTop, EncodeMerges).map(_._1)
    val dictDf = wcTop
      .map { case (w, _) =>
        (w, merges.foldLeft(w.split("").toSeq) { case (s, (a, b)) => mergePassScala(s, a, b) })
      }
      .toDF("w", "syms")
      .agg(map_from_entries(collect_list(struct($"w", $"syms"))).as("dict"))
    val enc = Tables
      .documents(spark, dir)
      .crossJoin(broadcast(dictDf))
      .select(
        $"doc_id",
        flatten(
          transform(
            filter(tokens($"text"), w => w.rlike(WordRe)),
            w => coalesce(try_element_at($"dict", w), split(w, "", 0))
          )
        ).as("syms")
      )
      .select(
        $"doc_id",
        size($"syms").cast("long").as("n_tokens"),
        array_join($"syms", " ").as("bpe_text")
      )
    Sampling
      .packOver(enc)
      .select(
        $"doc_id",
        $"n_tokens".as("n_bpe_tokens"),
        $"bpe_text",
        $"shard",
        $"start_block",
        $"end_block"
      )
      .orderBy($"doc_id")
  }
}
