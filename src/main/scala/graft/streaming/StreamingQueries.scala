package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.GroupState

/** Typed state for StreamingQueries.userStats (top-level so Spark's
  * encoder codegen can instantiate it).
  */
case class UserStat(n_events: Long, sum_value: Double)

/** Structured Streaming surface: the same event-time aggregations as
  * graft.queries.Events, executed through readStream → writeStream with
  * an in-memory sink (a parquet batch drives the stream synchronously via
  * processAllAvailable — the local-mode analog of a Kafka-fed job).
  * Output equals the batch queries, so the DuckDB oracles apply
  * unchanged.
  */
object StreamingQueries {

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // source dirs hold one file per table
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  /** Streaming tumbling-window counts (complete mode): same result —
    * and same oracle — as Events.tumbling. Watermarking is exercised in
    * the spec (append mode needs it to close windows).
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventStream(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    runToMemory(agg, s"stream_tumbling_${System.nanoTime()}", "complete")
      .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** Arbitrary stateful aggregation via mapGroupsWithState: per-user
    * running totals held in typed GroupState. With the whole batch in one
    * trigger this equals the batch groupBy — oracle-checkable — while
    * the state plumbing (update/exists/timeout API) is the real thing a
    * continuous pipeline would run.
    */
  def userStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val updateFn = (userId: Long, events: Iterator[(Long, Double)], state: GroupState[UserStat]) => {
      val prev = state.getOption.getOrElse(UserStat(0L, 0.0))
      var n = prev.n_events
      var s = prev.sum_value
      events.foreach { case (_, v) => n += 1; s += v }
      state.update(UserStat(n, s))
      (userId, n, s)
    }
    val agg = eventStream(spark, dir)
      .select($"user_id".as[Long], $"value".as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn)
      .toDF("user_id", "n_events", "sum_raw")
    runToMemory(agg, s"stream_user_stats_${System.nanoTime()}", "update")
      .select($"user_id", $"n_events", round($"sum_raw", 4).as("sum_value"))
      .orderBy($"user_id")
  }
}
