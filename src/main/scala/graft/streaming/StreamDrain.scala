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
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, batchId: java.lang.Long) =>
        if (!df.isEmpty) {
          df.coalesce(1).write.mode("overwrite").parquet(s"$stg/b$batchId")
          batches.incrementAndGet()
        }
        ()
      }
      .option("checkpointLocation", s"$chk/_chk")
      .start()
    try {
      q.processAllAvailable()
      // the commit point: only a COMPLETE drain materializes the table
      val union =
        if (batches.get == 0) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.parquet(s"$stg/b*")
      union.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(table)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chk))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stg))
    }
    batches.get
  }
}
