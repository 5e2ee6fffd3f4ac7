package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-splitting operators for training pipelines. */
object Sampling {

  /** Deterministic hash-based train/val/test split (80/10/10): the
    * assignment is a pure function of doc_id (md5-derived), so it is
    * stable across runs, machines, and engines — the property a training
    * pipeline needs for reproducible splits. Oracle-checkable exactly.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = conv(substring(md5(concat(lit("split#"), $"doc_id")), 1, 8), 16, 10)
      .cast("long") % 100
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split")
      )
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"split")
  }

  /** Seeded stratified sample by language (sampleBy): deterministic for a
    * fixed seed but engine-specific RNG, so no DuckDB oracle — the spec
    * checks determinism and per-stratum fraction tolerance instead.
    */
  def stratifiedSample(spark: SparkSession, dir: String, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.25)
    Tables
      .documents(spark, dir)
      .stat
      .sampleBy("lang", fractions, seed)
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }
}
