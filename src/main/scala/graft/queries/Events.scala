package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (batch DataFrames here;
  * graft.streaming.StreamingQueries runs the same aggregations through
  * Structured Streaming). The reference has no time concept (SURVEY.md
  * §2c) — this is north-star surface.
  */
object Events {

  /** Tumbling 1-hour windows per event type. `window()` on a naturally
    * time-ordered source shuffles only (window,type) groups — at 100 TB
    * the partial aggregation collapses each input partition to
    * #hours × #types rows before the exchange.
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** As-of join via the custom AsOfJoin operator (graft.plans): each
    * click event picks up the user's most recent purchase at-or-before
    * it. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def asofPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    graft.plans.AsOf
      .joinAsOf(clicks, purchases, "user_id", "p_user", "ts", "purchase_ts")
      .select($"event_id", $"user_id", $"purchase_ts", $"purchase_value")
      .orderBy($"event_id")
  }

  /** Session windows with a 30-minute inactivity gap, per user.
    * session_window merges events whose gap to the previous event is
    * < 30 min; the oracle reproduces this with lag()+cumulative-sum
    * session ids (identical semantics: a gap ≥ 30 min starts a new
    * session).
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .select(
        $"user_id",
        $"session_window.start".as("session_start"),
        $"n_events",
        $"sum_value"
      )
      .orderBy($"user_id", $"session_start")
  }
}
