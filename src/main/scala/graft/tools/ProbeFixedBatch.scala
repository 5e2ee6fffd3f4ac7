package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame

/** Fixed-batch admission scale probe (dev tool, feeds BASELINE.md): the
  * production ingest tick holds the ARRIVING BATCH roughly constant
  * while the stored index grows without bound, so the scale claim that
  * matters is "per-tick admission cost is flat (bucket-df-bounded) at
  * fixed batch as the index grows" — not the registered fixture's
  * coupled shape (batch = corpus/5, so batch and index grow together
  * and the tick cost legitimately grows with sf). This probe measures
  * the production claim directly: the batch comes from ONE dir
  * (default /tmp/sf1, gen_sf.py output) and stays byte-identical
  * across every decade, while the index/corpus side walks
  * sf1→sf3→sf10→sf30.
  *
  * Methodology matches Bench: noop sink, min-of-N, loadavg sampled at
  * each run with a bounded quiet-wait gate before every timed pass;
  * index build time is reported as context but NOT part of the per-tick
  * claim (ticks serve against an existing index). One PROBE JSON line
  * per (query, index decade); the row-count invariant (output rows ==
  * fixed batch rows at every decade) is asserted in-run.
  *
  * Env: SPARK_GRAFT_PROBE_BATCH_DIR, SPARK_GRAFT_PROBE_INDEX_DIRS
  * (comma-separated), SPARK_GRAFT_PROBE_RUNS, SPARK_GRAFT_LOAD_GATE,
  * SPARK_GRAFT_LOAD_GATE_MAX_WAIT.
  */
object ProbeFixedBatch {
  def main(args: Array[String]): Unit = {
    val batchDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_BATCH_DIR", "/tmp/sf1")
    val indexDirs = sys.env
      .getOrElse("SPARK_GRAFT_PROBE_INDEX_DIRS", "/tmp/sf1,/tmp/sf3,/tmp/sf10,/tmp/sf30")
      .split(",")
      .map(_.trim)
      .filter(_.nonEmpty)
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val gate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "16.0").toDouble
    val gateWait = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE_MAX_WAIT", "600").toInt
    val spark = GraftSession.local(32, "graft-probe-fixed-batch")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadavg: Double = os.getSystemLoadAverage
    def waitQuiet(): Double = {
      val t0 = System.nanoTime()
      while (loadavg >= gate && (System.nanoTime() - t0) / 1e9 < gateWait) Thread.sleep(5000)
      loadavg
    }
    def fmt(v: Double, dec: Int): String = String.format(java.util.Locale.ROOT, s"%.${dec}f", v)

    // the FIXED batches, off the batch dir — identical at every decade
    def fixedBatch: DataFrame =
      Tables.documentsFanned(spark, batchDir).filter($"doc_id" % Dedup.NewBatchMod === 0)
    def fixedArrivals: DataFrame = Dedup.admitArrivals(spark, batchDir)
    val batchRows = fixedBatch.count()
    val arrivalRows = fixedArrivals.count()

    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warmup

    for (idxDir <- indexDirs) {
      val tb0 = System.nanoTime()
      val idxTable = Dedup.incrementalIndexTable(spark, idxDir)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val idx = spark.table(idxTable)
      val idxRows = idx.count()
      def corpus: DataFrame =
        Tables.documentsFanned(spark, idxDir).filter($"doc_id" % Dedup.NewBatchMod =!= 0)

      def timed(name: String, mk: () => DataFrame, expectRows: Long): Unit = {
        val runs = (1 to runsPer).map { _ =>
          val l = waitQuiet()
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, l)
        }
        val got = mk().count()
        require(
          got == expectRows,
          s"$name over $idxDir: $got rows, expected $expectRows (fixed batch must bound the output)"
        )
        println(
          s"""PROBE {"probe":"fixed_batch","query":"$name","batch_dir":"$batchDir",""" +
            s""""index_dir":"$idxDir","index_rows":$idxRows,"batch_rows":$expectRows,""" +
            s""""build_sec":${fmt(buildSec, 2)},""" +
            s""""runs_sec":[${runs.map(r => fmt(r._1, 3)).mkString(",")}],""" +
            s""""loads":[${runs.map(r => fmt(r._2, 1)).mkString(",")}],""" +
            s""""min_sec":${fmt(runs.map(_._1).min, 3)}}"""
        )
      }

      timed(
        "dedup_incremental_capped_fixed",
        () =>
          Dedup.dedupBatchAgainstIndexDf(
            spark,
            idx,
            fixedBatch,
            corpus,
            materializeCandidates = true,
            indexBucketCap = Some(Dedup.MinhashBucketCap)
          ),
        batchRows
      )
      timed(
        "dedup_batch_admit_fixed",
        () => Dedup.batchAdmitOn(spark, idx, fixedArrivals, corpus),
        arrivalRows
      )

      // delete-family serves at FIXED batch: the sf30 coupled-fixture
      // band growth (168–197 s) was attributed to batch = corpus/5 by
      // analogy with the admission probe — these rows measure it. The
      // serve under test is the CAPPED admission arm over (index ∖ DV)
      // / the compacted live table; DV and compaction builds are
      // context (build_sec above covers the index; the DV/compact
      // tables build lazily on first reference inside run 1, so min-of-N
      // still isolates the steady serve).
      val dv = spark.table(Dedup.indexDvTable(spark, idxDir))
      def liveIdx: DataFrame =
        idx.join(org.apache.spark.sql.functions.broadcast(dv), Seq("doc_id"), "left_anti")
      timed(
        "dedup_index_delete_fixed",
        () =>
          Dedup.dedupBatchAgainstIndexDf(
            spark,
            liveIdx,
            fixedBatch,
            corpus,
            indexBucketCap = Some(Dedup.MinhashBucketCap)
          ),
        batchRows
      )
      val streamDv = spark.table(Dedup.indexStreamDvTable(spark, idxDir))
      timed(
        "stream_dedup_takedown_fixed",
        () =>
          Dedup.dedupBatchAgainstIndexDf(
            spark,
            idx.join(org.apache.spark.sql.functions.broadcast(streamDv), Seq("doc_id"), "left_anti"),
            fixedBatch,
            corpus,
            indexBucketCap = Some(Dedup.MinhashBucketCap)
          ),
        batchRows
      )
      val compacted = spark.table(Dedup.compactedIndexTable(spark, idxDir))
      timed(
        "dedup_index_compact_fixed",
        () =>
          Dedup.dedupBatchAgainstIndexDf(
            spark,
            compacted,
            fixedBatch,
            corpus,
            indexBucketCap = Some(Dedup.MinhashBucketCap)
          ),
        batchRows
      )
    }
    spark.stop()
  }
}
