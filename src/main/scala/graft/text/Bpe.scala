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
    import org.apache.spark.sql.expressions.Window
    Tables
      .documentsFanned(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") >= 2)
      .select(explode(charPairs($"w")).as("pair"))
      .groupBy($"pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair")
      .limit(PairTopK)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy($"cnt".desc, $"pair")).cast("long")
      )
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

  /** Registered query `text_bpe_encode` — the tokenize→pack chain made
    * real: train [[EncodeMerges]] BPE merges on the corpus word stream
    * ([[train]] — one bounded-shuffle pair-count job per round), then
    * tokenize every document with the trained list and pack the
    * resulting BPE TOKEN counts into fixed-size training blocks (the
    * `text_pack_blocks` recipe, fed by real tokenizer output instead of
    * whitespace counts). The encode itself is [[encode]] statically
    * unrolled inside a per-word lambda: one map-side projection over
    * the corpus — no shuffle, no UDF, no driver loop; only the packing
    * window (per-shard running offset, the declared pack shape) and the
    * output sort exchange anything. Output: per doc, its BPE token
    * count, the encoded text (symbols space-joined — the hash-checked
    * proof the merges applied identically), and its start/end block.
    *
    * The oracle replays training AND encoding independently in SQL:
    * per-round pair counts + argmax, and the greedy no-remerge pass as
    * a delimiter-doubled string replace (`|a||b|` → `|ab|` — literal,
    * overlap-safe, boundary-exact), then the same packing arithmetic.
    */
  def encodeDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables
      .documentsFanned(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter($"w".rlike(WordRe))
    val merges = train(words, "w", EncodeMerges).map(_._1)
    val enc = Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        flatten(
          transform(
            filter(tokens($"text"), w => w.rlike(WordRe)),
            w => encode(w, merges)
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
