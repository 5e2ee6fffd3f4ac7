package graft.text

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language-ID, quality
  * scoring, token counting, and rolling-hash fingerprinting. All pure
  * column expressions (whole-stage-codegen'd, no UDFs) with exact DuckDB
  * oracle twins.
  */
object TextAnalysis {

  // Stopword lists shared verbatim with the oracle SQL (PipelineOracles).
  val StopEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu")
  val StopFr: Seq[String] = Seq("le", "la", "et", "les", "des", "un", "est")
  val StopEs: Seq[String] = Seq("el", "los", "y", "es", "un", "una", "que")
  val FingerprintMod = 1000000007L

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit(_)): _*), t))).cast("long")

  /** n-gram/stopword-heuristic language ID with a deterministic argmax
    * (preference order en > de > fr > es on ties; 'und' when no evidence).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-token higher-order stopword scoring is per-row-heavy → fanned
    // scan (no-op at scale, parallelizes the sub-cores-split test files)
    Tables
      .documentsFanned(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .select(
        $"doc_id",
        hits($"toks", StopEn).as("en_hits"),
        hits($"toks", StopDe).as("de_hits"),
        hits($"toks", StopFr).as("fr_hits"),
        hits($"toks", StopEs).as("es_hits")
      )
      .withColumn(
        "pred_lang",
        when($"en_hits" + $"de_hits" + $"fr_hits" + $"es_hits" === 0, "und")
          .when($"en_hits" >= $"de_hits" && $"en_hits" >= $"fr_hits" && $"en_hits" >= $"es_hits", "en")
          .when($"de_hits" >= $"fr_hits" && $"de_hits" >= $"es_hits", "de")
          .when($"fr_hits" >= $"es_hits", "fr")
          .otherwise("es")
      )
      .orderBy($"doc_id")
  }

  /** Quality scoring: length, type/token ratio, stopword ratio →
    * composite score. All ratios are int/int double divisions (engine-
    * deterministic); the composite is rounded to 6dp.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // array_distinct + stopword filter per row → fanned scan (see langId)
    Tables
      .documentsFanned(spark, dir)
      .select($"doc_id", $"text", tokens($"text").as("toks"))
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars_obs"),
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_distinct"),
        hits($"toks", StopEn).as("stop_hits")
      )
      .withColumn("type_token_ratio", round($"n_distinct" / $"n_tokens", 6))
      .withColumn("stop_ratio", round($"stop_hits" / $"n_tokens", 6))
      .withColumn(
        "quality_score",
        round(
          lit(0.3) * ($"stop_hits" / $"n_tokens") +
            lit(0.4) * least(lit(1.0), $"n_tokens" / lit(100.0)) +
            lit(0.3) * ($"n_distinct" / $"n_tokens"),
          6
        )
      )
      .orderBy($"doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-alnum), chars per token.
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 \t]"), lit(0)))
          .cast("long")
          .as("bpe_tokens"),
        length($"text").cast("long").as("n_chars_obs")
      )
      .withColumn("chars_per_ws_token", round($"n_chars_obs" / $"ws_tokens", 6))
      .orderBy($"doc_id")
  }

  /** Rolling-hash document fingerprint: left fold of
    * h ← (h·31 + codepoint) mod 1e9+7 over the text's characters, seeded
    * with 7 — a distributed-friendly content id that (unlike md5) can be
    * windowed for chunk-level fingerprinting.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        graft.functions.TextExpressions
          .rollingHash($"text", 7L, FingerprintMod)
          .as("fingerprint")
      )
      .orderBy($"doc_id")
  }
}
