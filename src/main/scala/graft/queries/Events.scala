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

  /** Conversion-funnel analysis (view → click → purchase), the classic
    * product-analytics operator: per user with at least one view, the
    * earliest view, the earliest click strictly after it, the earliest
    * purchase strictly after that click, and the funnel stage reached
    * (1–3). Expressed as three chained filtered min-aggregations joined
    * on user_id — every step is a partial-aggregated shuffle on the
    * funnel key (no windows over raw events, no per-user sort), so the
    * plan is one narrow join chain at any corpus size; AQE broadcasts
    * the shrinking stage sides when they fit.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val views = ev
      .filter($"event_type" === "view")
      .groupBy($"user_id")
      .agg(min($"ts").as("first_view_ts"))
    val clicks = ev
      .filter($"event_type" === "click")
      .join(views, "user_id")
      .filter($"ts" > $"first_view_ts")
      .groupBy($"user_id")
      .agg(min($"ts").as("first_click_ts"))
    val purchases = ev
      .filter($"event_type" === "purchase")
      .join(clicks, "user_id")
      .filter($"ts" > $"first_click_ts")
      .groupBy($"user_id")
      .agg(min($"ts").as("first_purchase_ts"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(
        $"user_id",
        $"first_view_ts",
        $"first_click_ts",
        $"first_purchase_ts",
        (lit(1L)
          + when($"first_click_ts".isNotNull, 1L).otherwise(0L)
          + when($"first_purchase_ts".isNotNull, 1L).otherwise(0L)).as("stage")
      )
      .orderBy($"user_id")
  }

  /** Gap-filled resampling: 15-minute buckets per event type over the
    * corpus's full time span, with empty buckets zero-filled — the
    * standard time-series densification a monitoring/feature pipeline
    * needs before windowed models. The dense grid is generated from the
    * (types × bucket-range) cross of two tiny broadcast sides; the event
    * table itself only partial-aggregates per (type, bucket). Bucketing
    * is integer µs arithmetic so both engines derive identical keys.
    */
  def resample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketUs = 900000000L // 15 min in µs
    val ev = Tables
      .events(spark, dir)
      .select($"event_type", expr(s"(unix_micros(ts) div $bucketUs) * $bucketUs").as("b"), $"value")
    val agg = ev
      .groupBy($"event_type", $"b")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    val bounds = ev.agg(min($"b").as("lo"), max($"b").as("hi"))
    val grid = ev
      .select($"event_type")
      .distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr(s"sequence(lo, hi, $bucketUs)")).as("b"))
    grid
      .join(agg, Seq("event_type", "b"), "left")
      .select(
        $"event_type",
        expr("timestamp_micros(b)").as("bucket_start"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"sum_value", lit(0.0)).as("sum_value")
      )
      .orderBy($"event_type", $"bucket_start")
  }

  /** Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    * event lands in exactly width/slide = 2 windows. The oracle expands
    * the same two epoch-aligned window starts per event; Spark's
    * `window(ts, width, slide)` generates the identical set.
    */
  def hopping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("hop_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"hop_start", $"event_type")
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
      .select(
        $"event_id".as("p_event"),
        $"user_id".as("p_user"),
        $"ts".as("purchase_ts"),
        $"value".as("purchase_value")
      )
    graft.plans.AsOf
      .joinAsOf(clicks, purchases, "user_id", "p_user", "ts", "purchase_ts", Some("p_event"))
      .select($"event_id", $"user_id", $"purchase_ts", $"purchase_value")
      .orderBy($"event_id")
  }

  /** Binned range join (composition of built-ins — custom-operator ladder
    * rung (a)): pairs of events by the same user within 5 minutes of each
    * other. Naive formulation is an equi-join on user + |Δt| filter; at
    * scale the standard technique is to ALSO bucket time into
    * range-width bins and join on (user, bin)∪(user, bin+1), which keeps
    * each join group O(events-per-bin) instead of O(events-per-user).
    * Binning is candidate-complete for |Δt| ≤ width, so results are
    * exact — the DuckDB oracle is the plain inequality join.
    */
  def rangeJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val widthUs = 5L * 60 * 1000000
    val ev = Tables
      .events(spark, dir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    // orient pairs forward in time (ties by id): the later event then sits
    // in bin or bin+1 of the earlier one — binning is candidate-complete
    val a = ev.select($"event_id".as("id_a"), $"user_id", $"us".as("us_a"))
      .withColumn("bin", expr(s"us_a div $widthUs"))
    val b = ev.select($"event_id".as("id_b"), $"user_id".as("user_b"), $"us".as("us_b"))
      .withColumn("bin_b", expr(s"us_b div $widthUs"))
    a.withColumn("probe", explode(array($"bin", $"bin" + 1)))
      .join(
        b,
        $"user_id" === $"user_b" && $"probe" === $"bin_b" &&
          ($"us_a" < $"us_b" || ($"us_a" === $"us_b" && $"id_a" < $"id_b"))
      )
      .filter($"us_b" - $"us_a" <= widthUs)
      .select($"id_a", $"id_b", $"user_id", ($"us_b" - $"us_a").as("dt_us"))
      .orderBy($"id_a", $"id_b")
  }

  /** Weekly cohort retention — the standard growth-analytics operator:
    * users grouped by their first-active week, then for each (cohort,
    * week-offset) the distinct users still active. Weeks are epoch-
    * aligned integer-µs buckets (the resample() convention) so both
    * engines derive identical keys with no date_trunc dialect risk.
    * Plan: the corpus collapses to distinct (user_id, week) pairs in
    * one partial-aggregated shuffle; everything downstream (cohort min,
    * the user_id join, the (cohort, offset) aggregate) moves only that
    * pair set — bounded by users × weeks, orders of magnitude below the
    * event count at any scale. count(*) suffices for
    * count-distinct-users because (user, week) is already distinct.
    * The retention fraction divides identical BIGINTs in both engines.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekUs = 7L * 86400L * 1000000L
    val active = Tables
      .events(spark, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $weekUs").as("wk"))
      .distinct()
    val cohort = active.groupBy($"user_id").agg(min($"wk").as("cwk"))
    val sizes = cohort.groupBy($"cwk").agg(count(lit(1)).as("cohort_size"))
    active
      .join(cohort, "user_id")
      .groupBy($"cwk", ($"wk" - $"cwk").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cwk")
      .select(
        expr(s"timestamp_micros(cwk * $weekUs)").as("cohort_start"),
        $"week_offset",
        $"n_active",
        $"cohort_size",
        graft.text.TextAnalysis.round6($"n_active" / $"cohort_size").as("retention")
      )
      .orderBy($"cohort_start", $"week_offset")
  }

  val AnomWindow = 10 // trailing window (events) the baseline is fit on
  val AnomMinPrior = 5 // minimum prior events before an event is scored
  val AnomZ = 3.0 // |z| flag threshold

  /** Fixed-point scale for anomaly values — shared by the batch operator,
    * the streaming scorer, and the oracle. Domain bound: Σv² over the
    * window must stay inside a long, i.e. |value| ≲ 9.6e4 at this scale
    * (beyond it DuckDB errors loudly on BIGINT overflow while Spark
    * wraps silently) — lower the scale for wider value domains.
    */
  val AnomScale = 10000.0

  /** Trailing-window z-score anomaly detection — the telemetry-stream
    * outlier flagger: each event is scored against the mean/std of its
    * user's previous [[AnomWindow]] event values, and events with
    * |z| > [[AnomZ]] (given ≥ [[AnomMinPrior]] priors and nonzero
    * variance) are emitted.
    *
    * Values are fixed-point scaled (×10⁴, round-half-up) so the window
    * sums Σv and Σv² are EXACT integers: Spark evaluates sliding frames
    * incrementally while DuckDB uses segment trees, and a double-sum
    * window would diverge between those summation orders — integer
    * sums cannot. The mean/var/z doubles then derive from exact
    * integers through one fixed op sequence each.
    *
    * Scale shape: one shuffle on user_id; per-user partitions are
    * bounded by a user's own history; the frame is O(window) per row.
    * No global window, no unbounded frame (the running-total frame in
    * q11 is the contrasting case).
    */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"tu", $"event_id")
      .rowsBetween(-AnomWindow, -1)
    Tables
      .events(spark, dir)
      .select(
        $"event_id",
        $"user_id",
        unix_micros($"ts").as("tu"),
        floor($"value" * lit(AnomScale) + lit(0.5)).cast("long").as("v")
      )
      // all three aggregates in ONE projection over the SAME spec, so
      // Catalyst plans a single Window (one sort, one pass)
      .select(
        $"event_id",
        $"user_id",
        $"v",
        count($"v").over(w).as("n_prior"),
        sum($"v").over(w).as("s"),
        sum($"v" * $"v").over(w).as("ss")
      )
      .withColumn("mean", $"s".cast("double") / $"n_prior".cast("double"))
      .withColumn("varr", $"ss".cast("double") / $"n_prior".cast("double") - $"mean" * $"mean")
      .filter($"n_prior" >= AnomMinPrior && $"varr" > 0)
      .withColumn("z", ($"v".cast("double") - $"mean") / sqrt($"varr"))
      .filter(abs($"z") > AnomZ)
      .select(
        $"event_id",
        $"user_id",
        $"v".as("value_scaled"),
        $"n_prior",
        graft.text.TextAnalysis.round6($"z").as("z")
      )
      .orderBy($"event_id")
  }

  val PathsTopK = 20 // transition pairs kept

  /** Top event-type transitions (the Markov-path / user-journey
    * operator behind "what do users do after X" product analytics):
    * per user, consecutive events ordered by (event-time, event_id)
    * form (from_type, to_type) transitions; the corpus-wide transition
    * counts are ranked and the top [[PathsTopK]] emitted.
    *
    * Scale shape: one shuffle on user_id for the lead() window (frames
    * are per-user, bounded by a user's own history); the transition
    * aggregate partial-combines to at most #types² rows before its
    * exchange; the final cut is TakeOrdered. Counts are exact integers —
    * nothing here needs a rounding contract.
    */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"tu", $"event_id")
    Tables
      .events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("tu"), $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy($"n_transitions".desc, $"from_type", $"to_type")
      .limit(PathsTopK)
  }

  /** Semi-structured extraction: parse the JSON `props` payload with a
    * declared schema (`from_json`) and aggregate the extracted field per
    * event type — the schema-on-read path every telemetry pipeline
    * needs. Extraction is a map-side codegen'd expression; the aggregate
    * partial-combines to #event_types rows before the only exchange.
    * Malformed/missing keys become NULL in both engines (count_k counts
    * the survivors); the integer field sums exactly.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .select(
        $"event_type",
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k")
          .as("k")
      )
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count($"k").as("count_k"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k")
      )
      .select(
        $"event_type", $"n_events", $"count_k", $"sum_k", $"min_k", $"max_k",
        graft.text.TextAnalysis.round6($"sum_k" / $"count_k").as("avg_k")
      )
      .orderBy($"event_type")
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

  /** Type-2 slowly-changing dimension built from the event log — the
    * CDC shape every warehouse maintains: per user, one versioned row
    * per run of consecutive equal `event_type` values, with
    * [valid_from, valid_to) effectivity and `is_current` on the open
    * row. Two window passes over the SAME (user_id, (ts, event_id))
    * ordering: a lag() marks change points, then row_number()/lead()
    * over the surviving change rows assign version numbers and close
    * each interval with the next version's start. Catalyst plans ONE
    * exchange — the second Window reuses the hashpartitioning(user_id)
    * the first produced, so at 100 TB this is a single user-keyed
    * shuffle followed by two in-partition sorts (the second over the
    * already-filtered change points, a small fraction of the log).
    * event_id breaks ts ties, so versioning is total-order
    * deterministic on both engines.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables
      .events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(byTime))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("version", row_number().over(byTime).cast("long"))
      .withColumn("valid_to", lead($"ts", 1).over(byTime))
      .select(
        $"user_id",
        $"version",
        $"event_type",
        $"ts".as("valid_from"),
        $"valid_to",
        $"valid_to".isNull.as("is_current")
      )
      .orderBy($"user_id", $"version")
  }
}
