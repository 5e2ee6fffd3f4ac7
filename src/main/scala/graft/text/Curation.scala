package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composed flow a pretraining
  * pipeline runs over a raw crawl: language filter ∧ quality floor ∧
  * exact-dedup keeper, then the deterministic train/val/test assignment.
  * Expressed as joins of the individual oracle-checked operators, so
  * each stage shuffles exactly what that operator shuffles (doc_id-keyed
  * rows, never text past its own scan) and the whole composition remains
  * hash-checkable against one DuckDB oracle.
  */
object Curation {

  val QualityMin = 0.35

  def curate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    curateWith(spark, dir, Dedup.exact(spark, dir).select($"keep_id".as("doc_id")))
  }

  /** Near-dup-aware curation: same language/quality/split stages, but the
    * dedup stage keeps the cluster KEEPERS of the MinHash-LSH connected
    * components — every near-duplicate is dropped, not just byte-exact
    * copies (the policy production pretraining pipelines actually run).
    */
  def curateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // keepers need only the label fixpoint, not the cluster-size agg
    curateWith(
      spark,
      dir,
      Dedup.clusterLabels(spark, dir).filter($"doc_id" === $"cluster_id").select($"doc_id")
    )
  }

  /** The COMPLETE pretraining data flow, end to end: near-dup-aware
    * curation (language ∧ quality ∧ cluster keeper), benchmark
    * decontamination, train-split selection, then concat-and-chunk
    * sequence packing over exactly the documents that survived — the
    * order a production pipeline runs (packing before filtering would
    * leave holes in the block stream). One row per surviving train
    * document with its curation features and block assignment.
    *
    * Every stage is one of the individually oracle-checked operators
    * joined on doc_id, so the composition inherits their scale shapes
    * unchanged — and the whole thing stays hash-checkable against one
    * composed DuckDB oracle.
    */
  def pretrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clean = TextAnalysis
      .decontaminate(spark, dir)
      .filter($"is_clean" === 1L)
      .select($"doc_id")
    val survivors = curateFuzzy(spark, dir)
      .join(clean, "doc_id") // also drops the held-out eval docs themselves
      .filter($"split" === "train")
    val tokenCounts = graft.Tables
      .documents(spark, dir)
      .select($"doc_id", size(graft.functions.Portable.tokens($"text")).cast("long").as("n_tokens"))
    Sampling
      .packOver(survivors.join(tokenCounts, "doc_id"))
      .select(
        $"doc_id",
        $"pred_lang",
        $"quality_score",
        $"n_tokens",
        $"shard",
        $"start_block",
        $"end_block"
      )
      .orderBy($"doc_id")
  }

  private def curateWith(spark: SparkSession, dir: String, keepers: DataFrame): DataFrame = {
    import spark.implicits._
    val lang = TextAnalysis.langId(spark, dir).select($"doc_id", $"pred_lang")
    val qual = TextAnalysis.quality(spark, dir).select($"doc_id", $"quality_score")
    lang
      .filter($"pred_lang" === "en")
      .join(qual.filter($"quality_score" >= QualityMin), "doc_id")
      .join(keepers, "doc_id")
      .select(
        $"doc_id",
        $"pred_lang",
        $"quality_score",
        Sampling.splitColumn($"doc_id").as("split")
      )
      .orderBy($"doc_id")
  }
}
