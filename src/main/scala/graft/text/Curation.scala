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
    * `cap` picks the edge source exactly as [[Dedup.clusterLabels]]
    * documents: None = the exact LSH pair set (audit path), Some(c) =
    * the band-bucket-capped pair set — the production edge source at
    * 100 TB, where the uncapped candidate join's hot buckets are the
    * known quadratic term. Capped edges ⊆ uncapped edges ⇒ capped
    * components refine uncapped ones ⇒ keepers (and so survivors) can
    * only GROW under the cap — the conservative direction for a
    * curation gate (PipelineSpec pins the survivor superset).
    */
  def curateFuzzy(spark: SparkSession, dir: String, cap: Option[Int] = None): DataFrame = {
    import spark.implicits._
    // keepers need only the label fixpoint, not the cluster-size agg
    curateWith(
      spark,
      dir,
      Dedup.clusterLabels(spark, dir, cap).filter($"doc_id" === $"cluster_id").select($"doc_id")
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
  /** Registered query `pipeline_pretrain_semantic`: the pretraining
    * flow with BOTH decontamination modalities — the shape a modern
    * pipeline actually runs, because the two gates catch disjoint
    * leakage: the n-gram gate ([[TextAnalysis.decontaminate]], inside
    * [[pretrain]]) catches verbatim eval text, and the embedding gate
    * ([[graft.similarity.Similarity.decontaminate]]) catches
    * paraphrased/translated leakage that shares no shingles. The
    * semantic gate joins on the shared id space (vec_id ≡ doc_id by
    * corpus construction); eval members themselves carry no corpus
    * decontam row, so the join drops them — the same policy as the
    * n-gram gate dropping held-out eval docs. Scale shape: one extra
    * broadcast-able keep-list join over [[pretrain]]'s plan; the gate
    * itself is the sim_decontaminate map pass.
    */
  def pretrainSemantic(spark: SparkSession, dir: String, cap: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val semClean = graft.similarity.Similarity
      .decontaminate(spark, dir)
      .filter($"keep" === 1L)
      .select($"vec_id".as("doc_id"))
    pretrain(spark, dir, cap).join(semClean, "doc_id").orderBy($"doc_id")
  }

  def pretrain(spark: SparkSession, dir: String, cap: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val clean = TextAnalysis
      .decontaminate(spark, dir)
      .filter($"is_clean" === 1L)
      .select($"doc_id")
    val survivors = curateFuzzy(spark, dir, cap)
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

  /** Quality-aware canonical selection — keep the BEST document of every
    * near-duplicate cluster instead of the arbitrary min-id keeper
    * (what production dedup actually ships: min-id keeps whatever
    * happened to be crawled first; keep-best keeps the highest-quality
    * copy). Per cluster the winner is argmax(quality_score, then lowest
    * doc_id) — quality_score is the 6dp-rounded composite both engines
    * already agree on bit-for-bit (text_quality is hash-green), so the
    * argmax is engine-deterministic.
    *
    * Scale shape: the cluster labels are the session-cached fixpoint
    * artifact (built once, shared with clusters/fuzzy/pretrain),
    * quality is a map pass, the per-cluster argmax is one
    * map-side-combinable max(struct) aggregation (one row per cluster
    * out), and the winner table joins back on cluster_id — no pairwise
    * work and nothing quadratic; the whole op costs two shuffles on
    * cluster_id beyond the shared artifacts.
    */
  def keepBest(spark: SparkSession, dir: String, cap: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val labels = Dedup.clusterLabels(spark, dir, cap)
    val qual = TextAnalysis.quality(spark, dir).select($"doc_id", $"quality_score")
    val scored = labels.join(qual, "doc_id")
    val best = scored
      .groupBy($"cluster_id")
      .agg(
        max(struct($"quality_score", (-$"doc_id").as("nid"))).as("b"),
        count(lit(1)).as("cluster_size")
      )
      .select($"cluster_id", (-$"b.nid").as("kept_id"), $"cluster_size")
    scored
      .join(best, "cluster_id")
      .select(
        $"doc_id",
        $"cluster_id",
        $"cluster_size",
        $"quality_score",
        $"kept_id",
        when($"doc_id" === $"kept_id", 1L).otherwise(0L).as("is_kept")
      )
      .orderBy($"doc_id")
  }

  /** Multimodal-aware curation: the same language/quality/split gates,
    * with the dedup stage keyed on the IMAGE — a document survives only
    * if it is its image-clique keeper (first poster of that perceptual
    * hash), the policy a text+image pretraining pipeline runs against
    * re-posted media. Text stages and image collapse are each
    * individually oracled operators joined on doc_id, so the
    * composition inherits their scale shapes.
    */
  def curateMultimodal(spark: SparkSession, dir: String): DataFrame =
    curateWith(spark, dir, graft.multimodal.Multimodal.phashKeepers(spark, dir))

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
