package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe streaming drain for the takedown-queue DV builders.
  *
  * The naive drain (`foreachBatch { _.write.mode("append").saveAsTable(dvt) }`)
  * has two failure windows the build-once guard can't see: (a) the DV
  * table is created by the FIRST micro-batch, so an exception mid-drain
  * leaves a partial tombstone table that satisfies the catalog-existence
  * check on the next call in this JVM — silently under-deleting; and
  * (b) a replayed micro-batch appends its slice twice (append is not
  * idempotent per batchId). The layout twin (`Layout.streamTakedownRoot`)
  * avoids both by writing its root `_SUCCESS` last; this is the
  * catalog-table edition of the same discipline:
  *
  *   - each micro-batch writes its slice to a per-batchId staging dir
  *     with `overwrite` — a replayed batch clobbers its own slice, so
  *     the staged union is exactly-once by construction;
  *   - the catalog table is written ONCE, after `processAllAvailable`
  *     returns — table existence IS the completion marker, so a partial
  *     drain leaves nothing for build-once to trust.
  *
  * The staged slices stay additive artifacts: N partial takedowns union
  * to the one-shot DV exactly (the spec pin carries over unchanged).
  */
object StreamDrain {

  /** Drains the parquet file-source at `frag` (a bounded takedown queue)
    * through Structured Streaming into catalog table `table`, committing
    * the table only after a complete drain. Returns the number of
    * non-empty micro-batches.
    */
  def drainToTable(
      spark: SparkSession,
      frag: String,
      table: String,
      maxFilesPerTrigger: Int = 2
  ): Int = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val stg = java.nio.file.Files.createTempDirectory("graft_dvstage_").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_dvchk_").toString
    val schema = spark.read.parquet(frag).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(frag)
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, batchId: java.lang.Long) =>
        if (!df.isEmpty) {
          df.coalesce(1).write.mode("overwrite").parquet(s"$stg/b$batchId")
        }
        ()
      }
      .option("checkpointLocation", s"$chk/_chk")
      .start()
    // the batch count is derived at commit time from the DISTINCT staged
    // b<batchId> dirs, never a foreachBatch invocation counter: a
    // replayed/retried micro-batch re-enters foreachBatch (which the
    // staged overwrite absorbs for DATA) but must not inflate the count
    // the ledgers and CrashSafetySpec compare across drains
    def stagedBatches: Int =
      Option(new java.io.File(stg).listFiles())
        .map(_.count(f => f.isDirectory && f.getName.startsWith("b")))
        .getOrElse(0)
    val n =
      try {
        q.processAllAvailable()
        // the commit point: only a COMPLETE drain materializes the table
        val count = stagedBatches
        val union =
          if (count == 0)
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else spark.read.parquet(s"$stg/b*")
        union.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(table)
        count
      } finally {
        q.stop()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chk))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stg))
      }
    n
  }

  /** Drains the parquet file-source at `frag` running `tick` once per
    * NON-EMPTY micro-batch — the shared shape of every append-tick
    * stream build (IVF postings, PQ codes, BM25 postings and takedown).
    * The tick is guarded idempotent per batchId: the append-mode
    * saveAsTable inside a tick is not idempotent, so a replayed/retried
    * micro-batch (same batchId, the micro-batch-retry window the staged
    * DV drains already close) must not run its tick twice — the guard
    * set admits each batchId exactly once for the build's lifetime.
    * The build-once done-sentinel callers write AFTER this returns
    * covers the cross-JVM half (a crashed drain rebuilds from batch 0
    * with a fresh guard set), so in-memory is exactly the right scope.
    * Returns the number of ticked batches — derived from the guard set,
    * so a replay can't inflate the ledgers either.
    */
  /** The replayed-batch guard around a drain tick, factored out of
    * [[drainTicks]] so the spec can drive a DUPLICATE batchId through
    * the exact foreachBatch lambda the production drains install
    * (CrashSafetySpec) instead of asserting the guard by reading it.
    * Admits each batchId's tick exactly once for the guard's lifetime
    * (one drain = one guard instance); empty batches never tick and
    * never consume their batchId — a replay that delivers the data on
    * the retry still gets its tick.
    */
  private[streaming] final class BatchGuard(tick: DataFrame => Unit)
      extends ((DataFrame, Long) => Unit)
      with Serializable {
    private val ticked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    override def apply(df: DataFrame, batchId: Long): Unit = {
      if (!df.isEmpty && ticked.add(batchId)) tick(df)
      ()
    }

    /** Number of batchIds whose tick ran — the drain's ledger count. */
    def count: Int = ticked.size
  }

  def drainTicks(
      spark: SparkSession,
      frag: String,
      chkPrefix: String,
      maxFilesPerTrigger: Int = 2
  )(tick: DataFrame => Unit): Int = {
    val chk = java.nio.file.Files.createTempDirectory(chkPrefix).toString
    val schema = spark.read.parquet(frag).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(frag)
    val guard = new BatchGuard(tick)
    val q = stream.writeStream
      .foreachBatch(guard)
      .option("checkpointLocation", s"$chk/_chk")
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chk))
    }
    guard.count
  }
}
