package graft

import graft.streaming.StreamingQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Real streaming machinery beyond the complete-mode smoke queries:
  * multi-batch watermark advancement with append output, and stateful
  * sessionization with event-time timeouts.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "streaming-spec")
  private val dir = "/root/testdata/sf0.001"

  /** Writes one single-file parquet batch named `name` into `src`.
    * The stream schema expects raw nanos long for ts (Tables.events
    * converts); `df` carries a real timestamp ts column.
    */
  private def writeOne(src: String, df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-stage").toString
    df.select($"event_id", unix_micros($"ts").*(1000L).as("ts"), $"user_id", $"event_type", $"value", $"props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(src, name))
  }

  /** Splits events into `n` single-file batches by time quantile into a
    * temp dir — micro-batch arrival in event-time order.
    */
  private def nBatchDir(n: Int): String = {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-stream-src").toString
    val ev = Tables.events(spark, dir)
    val qs = (1 until n).map(i => i.toDouble / n)
    val cuts = ev
      .agg(expr(s"percentile(unix_micros(ts), array(${qs.mkString(",")}))"))
      .head()
      .getSeq[Double](0)
      .map(_.toLong)
    val bounds = (Long.MinValue +: cuts).zip(cuts :+ Long.MaxValue)
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      if (i > 0) Thread.sleep(1100) // file-source orders batches by modification time
      writeOne(src, ev.filter(unix_micros($"ts") >= lo && unix_micros($"ts") < hi), s"batch$i.parquet")
    }
    src
  }

  private def twoBatchDir(): String = nBatchDir(2)

  test("append-mode tumbling windows close as the watermark advances across batches") {
    import spark.implicits._
    val src = twoBatchDir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$src/batch0.parquet").schema
    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.format("memory").queryName("wm_append").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("wm_append")
      .select($"window.start".as("ws"), $"event_type", $"n_events")
    // every emitted (closed) window must agree exactly with the batch result
    val batch = Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"window.start".as("ws"), $"event_type", $"n_events")
    assert(emitted.count() > 0, "watermark should have closed at least one window")
    assert(emitted.except(batch).count() === 0, "closed windows must match batch counts exactly")
    assert(emitted.count() < batch.count(), "windows beyond the watermark must be withheld")
  }

  test("streaming anomaly scorer carries ring state across batches and equals batch") {
    import spark.implicits._
    val src = twoBatchDir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$src/batch0.parquet").schema
    // two triggers split at the median timestamp: every user's ring
    // buffer must survive the batch boundary for the result to match
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val got = graft.streaming.StreamingQueries
      .anomalyOnStream(stream)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val want = graft.queries.Events
      .anomaly(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.sameElements(want))
  }

  test("streaming sessionization (flatMapGroupsWithState + event-time timeout) matches batch sessions") {
    import spark.implicits._
    val emitted = StreamingQueries.sessionize(spark, dir)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val batch = queries.Events.sessions(spark, dir)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(emitted.nonEmpty, "event-time timeouts should have closed sessions")
    // every emitted session must be exactly a batch session
    emitted.foreach(s => assert(batch.contains(s), s"emitted session $s not in batch result"))
  }

  test("drained streaming sessionization (sentinel watermark push) EQUALS batch sessions") {
    import spark.implicits._
    val emitted = StreamingQueries.sessionizeComplete(spark, dir)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = queries.Events.sessions(spark, dir)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(emitted === batch)
  }

  test("drained streaming SCD2 EQUALS the batch dimension build row-for-row") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5))
    val emitted = StreamingQueries.scd2Stream(spark, dir).collect().map(key).toSet
    val batch = queries.Events.scd2(spark, dir).collect().map(key).toSet
    assert(emitted.nonEmpty)
    assert(emitted === batch)
    // one open (is_current) version per user in the drained stream
    val opens = emitted.groupBy(_._1).map { case (_, vs) => vs.count(_._6) }
    assert(opens.forall(_ == 1))
  }

  test("session state evicts with the watermark: bounded numRowsTotal over 4 batches, drained by timeouts") {
    import spark.implicits._
    val src = nBatchDir(4)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$src/batch0.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = StreamingQueries
      .sessionAgg(spark, stream, 30)
      .writeStream
      .format("memory")
      .queryName("evict_sessions")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    // sentinel far past the data pushes the watermark beyond every
    // session's gap-extended end, so event-time timeouts must REMOVE
    // all remaining per-user state (the production idle-key drain)
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max(unix_micros($"ts"))).head().getLong(0)
    val sentinel = ev
      .limit(1)
      .select(
        lit(-1L).as("event_id"),
        timestamp_micros(lit(maxTs + 10L * 86400L * 1000000L)).as("ts"),
        lit(-1L).as("user_id"),
        lit("sentinel").as("event_type"),
        lit(0.0).as("value"),
        $"props"
      )
    writeOne(src, sentinel, "sentinel.parquet")
    q.processAllAvailable()
    val rows = q.recentProgress.filter(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
    val removed = q.recentProgress.filter(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsRemoved).sum
    q.stop()
    val nUsers = ev.select($"user_id").distinct().count()
    assert(rows.length >= 4, s"expected ≥4 micro-batches, got ${rows.length}")
    // keyed state: bounded by user cardinality in EVERY batch, never by
    // event volume (4 batches of events, ≤1 open session entry per user)
    assert(rows.max <= nUsers + 1, s"state rows ${rows.max} exceed user count $nUsers")
    assert(removed > 0, "watermark timeouts must remove session state")
    // after the sentinel advances the watermark, only the sentinel's own
    // open session may remain — everything else evicted
    assert(rows.last <= 2, s"state not drained: ${rows.mkString(",")}")
    assert(rows.last < rows.max, s"no eviction observed: ${rows.mkString(",")}")
  }

  test("anomaly ring state is key-bounded: rows track distinct users, not event volume, over 4 batches") {
    import spark.implicits._
    val src = nBatchDir(4)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$src/batch0.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = graft.streaming.StreamingQueries
      .anomalyAgg(stream)
      .writeStream
      .format("memory")
      .queryName("evict_anomaly")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val progs = q.recentProgress.filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
    q.stop()
    val rows = progs.map(_.stateOperators.head.numRowsTotal)
    val nUsers = Tables.events(spark, dir).select($"user_id").distinct().count()
    assert(rows.length >= 3, s"expected ≥3 data micro-batches, got ${rows.length}")
    // the documented O(users × window) bound: state rows never exceed
    // key cardinality and saturate at it — thousands of further events
    // add ZERO state rows once every user has a ring
    assert(rows.max <= nUsers, s"state rows ${rows.max} exceed user count $nUsers")
    assert(rows.last === nUsers, s"state should saturate at $nUsers users: ${rows.mkString(",")}")
  }

  test("ingest gate is stateless: state store stays EMPTY over a 3-batch drain; verdicts equal the batch gate") {
    import spark.implicits._
    import graft.dedup.Dedup
    val t = Dedup.incrementalIndexTable(spark, dir)
    val batchDocs = Tables.documents(spark, dir).filter($"doc_id" % Dedup.NewBatchMod === 0)
    // 3 single-file arrival batches of the new-doc split
    val src = Files.createTempDirectory("graft-ingest-stream").toString
    (0 until 3).foreach { i =>
      val stage = Files.createTempDirectory("graft-ingest-stage").toString
      batchDocs.filter($"doc_id" % 3 === i).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(src, s"batch$i.parquet"))
    }
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = StreamingQueries
      .ingestDedupOn(spark, t, stream)
      .writeStream
      .format("memory")
      .queryName("ingest_gate")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val progs = q.recentProgress.filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
    q.stop()
    assert(progs.length >= 3, s"expected ≥3 data micro-batches, got ${progs.length}")
    // the whole point of the scalar-signature design: NOTHING is ever
    // stored — the gate's state is empty in every batch, so the stream
    // keeps up with ingest regardless of how many documents have passed
    progs.foreach(p =>
      assert(p.stateOperators.head.numRowsTotal === 0L, s"gate stored state: ${p.stateOperators.head}")
    )
    // and the multi-batch drained verdicts equal the one-shot batch gate
    // (flatMapGroupsWithState composes on batch Datasets too)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    val streamed = canon(spark.table("ingest_gate").collect())
    val batch = canon(StreamingQueries.ingestDedupOn(spark, t, batchDocs).collect())
    assert(streamed === batch)
  }

  test("semantic admission gate runs with NO stateful operators over a 3-batch drain; equals the batch replay") {
    import spark.implicits._
    import graft.similarity.Similarity
    val cells = Similarity.admitArtifact(spark, dir)
    assert(cells.nonEmpty && cells.length <= Similarity.IvfMaxCells, "artifact must be k-bounded")
    assert(cells.map(_.cid).toSeq === cells.map(_.cid).sorted.toSeq, "cid-ascending for the tie rule")
    val thr = graft.dedup.Dedup.EmbedCosThreshold
    val batchVecs = Tables
      .embeddings(spark, dir)
      .filter($"vec_id" % Similarity.StreamAdmitMod === 0)
    // 3 single-file arrival batches of the streamed slice
    val src = Files.createTempDirectory("graft-admit-stream").toString
    (0 until 3).foreach { i =>
      val stage = Files.createTempDirectory("graft-admit-stage").toString
      batchVecs.filter($"vec_id" % 3 === i).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(src, s"batch$i.parquet"))
    }
    val stream = spark.readStream
      .schema(batchVecs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = StreamingQueries
      .semanticAdmitOn(cells, thr, stream)
      .writeStream
      .format("memory")
      .queryName("admit_gate")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(progs.length >= 3, s"expected ≥3 data micro-batches, got ${progs.length}")
    // stronger than an empty state store: the plan has no stateful
    // operator AT ALL — the verdict is a pure function of (row, static
    // artifact), so ingest volume never grows state
    progs.foreach(p => assert(p.stateOperators.isEmpty, s"gate has state operators: ${p.stateOperators.toSeq}"))
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    val streamed = canon(spark.table("admit_gate").collect())
    val batch = canon(StreamingQueries.semanticAdmitOn(cells, thr, batchVecs).toDF.collect())
    assert(streamed === batch)
    // sanity on the semantics: prototypes admit themselves; anything
    // rejected names a rep other than itself
    spark.table("admit_gate").collect().foreach { r =>
      if (r.getLong(0) == r.getLong(2)) assert(r.getLong(4) === 1L, s"prototype ${r.getLong(0)} must self-admit")
      if (r.getLong(4) == 0L) assert(r.getLong(0) !== r.getLong(2))
    }
  }

  test("checkpointed parquet sink resumes exactly-once across restarts") {
    import spark.implicits._
    // incremental ingestion: drain 4 document shards, land 4 more, drain
    // again from the SAME checkpoint — the second run must process only
    // the new files, and the final sink must equal the batch result with
    // no duplicates (file-sink exactly-once via the sink's commit log)
    val srcDir = Files.createTempDirectory("graft-sink-src").toString
    val outDir = Files.createTempDirectory("graft-sink-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val docs = Tables.documents(spark, dir)
    val schema = docs.schema
    def land(half: Int): Unit = {
      val stage = Files.createTempDirectory("graft-sink-stage").toString
      docs.filter($"doc_id" % 2 === half).repartition(4).write.mode("overwrite").parquet(stage)
      Files.list(Paths.get(stage)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex
        .foreach { case (p, i) => Files.move(p, Paths.get(srcDir, s"half$half-$i.parquet")) }
    }
    def drain(): Unit = {
      val q = spark.readStream
        .schema(schema)
        .parquet(srcDir)
        .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars_obs"))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(0); drain()
    val afterFirst = spark.read.parquet(outDir).count()
    land(1); drain()
    val result = spark.read.parquet(outDir)
    assert(afterFirst < result.count(), "second drain must add rows")
    val expected = docs
      .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars_obs"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = result.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === expected.size, "no duplicate rows across restarts")
    assert(got.toSet === expected)
  }

  test("streaming CMS: state stays cell-bounded over multi-batch ingest and equals the batch sketch") {
    import spark.implicits._
    import graft.text.{TextAnalysis => TA}
    // split documents into 3 arrival batches
    val src = Files.createTempDirectory("graft-cms-src").toString
    val docs = Tables.documents(spark, dir)
    (0 until 3).foreach { i =>
      if (i > 0) Thread.sleep(1100)
      val stage = Files.createTempDirectory("graft-cms-stage").toString
      docs.filter($"doc_id" % 3 === i).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(src, s"batch$i.parquet"))
    }
    val schema = spark.read.parquet(s"$src/batch0.parquet").schema
    val tok = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .select(explode(graft.functions.Portable.tokens($"text")).as("tok"))
    val cells = tok
      .select($"tok", explode(sequence(lit(0), lit(TA.CmsDepth - 1))).as("d"))
      .groupBy(
        $"d",
        (conv(substring(md5(concat($"tok", lit("#"), $"d")), 1, 8), 16, 10)
          .cast("long") % TA.CmsWidth).as("cell")
      )
      .agg(count(lit(1)).as("cn"))
    val q = cells.writeStream.format("memory").queryName("cms_cells").outputMode("complete").start()
    q.processAllAvailable()
    val stateRows = q.recentProgress.filter(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
    q.stop()
    assert(stateRows.nonEmpty)
    assert(
      stateRows.forall(_ <= TA.CmsDepth * TA.CmsWidth),
      s"sketch state exceeded depth*width: ${stateRows.mkString(",")}"
    )
    // drained cells equal the batch-computed sketch exactly
    val got = spark.table("cms_cells")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val want = docs
      .select(explode(graft.functions.Portable.tokens($"text")).as("tok"))
      .select($"tok", explode(sequence(lit(0), lit(TA.CmsDepth - 1))).as("d"))
      .groupBy(
        $"d",
        (conv(substring(md5(concat($"tok", lit("#"), $"d")), 1, 8), 16, 10)
          .cast("long") % TA.CmsWidth).as("cell")
      )
      .agg(count(lit(1)).as("cn"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === want)
  }
}
