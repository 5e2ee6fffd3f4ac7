package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-splitting operators for training pipelines. */
object Sampling {

  /** The train/val/test assignment expression — ONE definition shared by
    * hashSplit, Curation.curate, and (via the same constants) the oracle
    * SQL, so the split scheme cannot desynchronize between operators.
    */
  def splitColumn(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket = conv(substring(md5(concat(lit("split#"), docId)), 1, 8), 16, 10)
      .cast("long") % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  /** Deterministic hash-based train/val/test split (80/10/10): the
    * assignment is a pure function of doc_id (md5-derived), so it is
    * stable across runs, machines, and engines — the property a training
    * pipeline needs for reproducible splits. Oracle-checkable exactly.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select($"doc_id", splitColumn($"doc_id").as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"split")
  }

  val PackShards = 32 // parallelism knob: shards pack independently
  val PackBlockTokens = 256L

  /** Concat-and-chunk sequence packing — the standard pretraining step
    * that concatenates documents and slices the token stream into
    * fixed-size training blocks. Documents are sharded (doc_id mod
    * PackShards) and packed independently per shard: a running token
    * offset within the shard gives each document its start/end block
    * (documents may span blocks, exactly like production packing).
    * Per-shard packing is inherently sequential, so the shard count is
    * the scale knob — at 100 TB you size shards to the cluster and each
    * shard's window stays a modest, spillable sorted run.
    */
  def packBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    packOver(
      Tables
        .documents(spark, dir)
        .select(
          $"doc_id",
          size(graft.functions.Portable.tokens($"text")).cast("long").as("n_tokens")
        )
    ).select($"doc_id", $"shard", $"n_tokens", $"start_block", $"end_block").orderBy($"doc_id")
  }

  /** Packs any (doc_id, n_tokens[, …]) set — the composed pipelines pack
    * the SURVIVING documents after filtering, not the raw corpus. Extra
    * input columns pass through.
    */
  private[graft] def packOver(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard")
      .orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("shard", $"doc_id" % PackShards)
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("start_block", expr(s"(cum - n_tokens) div $PackBlockTokens"))
      .withColumn("end_block", expr(s"(cum - 1) div $PackBlockTokens"))
      .drop("cum")
  }

  // demo mixture: permille acceptance rates per source (keys replayed
  // into the oracle CASE from this same map); production passes its own
  val MixPermille: Map[String, Int] = Map("src0" -> 1000, "src1" -> 800, "src2" -> 500)
  val MixDefaultPermille = 300

  /** Domain-mixture resampling — the pretraining step that reweights
    * sources toward a target mixture (e.g. upsample books, downsample
    * crawl). Acceptance is a pure function of doc_id (md5 permille bucket
    * < the source's target rate): deterministic across runs, engines, and
    * cluster sizes — no RNG state, no coordination, embarrassingly
    * map-side. Output is the per-source summary; the kept rows themselves
    * are `bucket < rate` on the same expression.
    */
  val StratTopK = 5 // docs kept per (source, lang) stratum

  /** Deterministic stratified top-k selection — fixed-size balanced
    * eval-set construction: per (source, lang) stratum, the StratTopK
    * documents with the smallest md5-derived order key. Unlike the
    * RNG-based stratifiedSample (rows-only checkable by design), the
    * hash order makes the selection a pure function of the data —
    * stable across runs and engines, so the oracle replays it exactly.
    *
    * Scale: per-stratum k-min selection is an AGGREGATION (KMinByHash,
    * the keyed sibling of q23's KMinValues) — each partition ships at
    * most k rows per stratum, where a per-stratum window would funnel
    * whole strata through single tasks (PlanSpec pins no Window).
    */
  def stratifiedTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables
      .documents(spark, dir)
      .select(
        $"source",
        $"lang",
        conv(substring(md5(concat(lit("strat#"), $"doc_id")), 1, 8), 16, 10).cast("long").as("h"),
        $"doc_id"
      )
      .as[(String, String, Long, Long)]
    keyed
      .groupByKey { case (source, lang, _, _) => (source, lang) }
      .mapValues { case (_, _, h, id) => HashRanked(h, id) }
      .agg(new KMinByHash(StratTopK).toColumn)
      .flatMap { case ((source, lang), top) =>
        top.zipWithIndex.map { case (r, i) => (source, lang, (i + 1).toLong, r.doc_id) }
      }
      .toDF("source", "lang", "rank", "doc_id")
      .orderBy($"source", $"lang", $"rank")
  }

  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = conv(substring(md5(concat(lit("mix#"), $"doc_id")), 1, 8), 16, 10)
      .cast("long") % 1000
    val rate = MixPermille.foldLeft(lit(MixDefaultPermille)) { case (acc, (s, r)) =>
      when($"source" === s, lit(r)).otherwise(acc)
    }
    Tables
      .documents(spark, dir)
      .select($"doc_id", $"source", when(bucket < rate, 1L).otherwise(0L).as("keep"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"keep").as("n_kept"))
      .withColumn("kept_frac", TextAnalysis.round6($"n_kept" / $"n_docs"))
      .orderBy($"source")
  }

  val ShuffleShards = 8L // shard-count knob: sized to the training fleet, not the corpus

  /** Deterministic global training-data shuffle into shards — the data-
    * ordering step between curation and training: every serious
    * pretraining run shuffles its corpus once so that consecutive
    * training batches are i.i.d.-ish, and writes the permuted stream as
    * S shard files consumed round-robin by data loaders. The permutation
    * here is a pure function of doc_id (the keyed-md5 order idiom shared
    * with hashSplit/domainMix/stratifiedTopK): shard = h mod S, position
    * = rank of h within the shard. No RNG state, no coordination —
    * reproducible across runs, engines, and cluster sizes, which is what
    * makes a training run resumable and auditable.
    *
    * Scale: deliberately NOT a corpus-wide total order (a global sort by
    * h would work but serializes into one range-partitioned sort). Shard
    * assignment is map-side (hash mod S); the position is a WITHIN-shard
    * sort only, so shards shuffle-sort independently and in parallel —
    * at 100 TB, S is sized so one shard is a modest sorted run (the
    * PackShards argument), and the hash mod balances shard sizes by
    * construction (no skew: h is uniform). One shuffle, keyed by shard.
    */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard")
      .orderBy($"h", $"doc_id")
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        conv(substring(md5(concat(lit("shuffle#"), $"doc_id")), 1, 8), 16, 10).cast("long").as("h")
      )
      .withColumn("shard", $"h" % ShuffleShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"doc_id")
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
