package graft.plans

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoin operator vs an independent window-function
  * formulation of the same semantics, plus physical-plan shape.
  */
class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "asof-spec")
  private val dir = "/root/testdata/sf0.01"

  private def viaWindow() = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // purchases sort before clicks at equal ts — matches ASOF's `>=`
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"ts", when($"event_type" === "purchase", 0).otherwise(1), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("purchase_ts", last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true).over(w))
      .withColumn(
        "purchase_value",
        last(when($"event_type" === "purchase", $"value"), ignoreNulls = true).over(w)
      )
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"purchase_ts", $"purchase_value")
      .orderBy($"event_id")
  }

  test("AsOfJoin matches the window-function formulation row-for-row") {
    import spark.implicits._
    val custom = graft.queries.Events.asofPurchase(spark, dir).collect().toSeq
    val window = viaWindow().collect().toSeq
    assert(custom.length === window.length)
    custom.zip(window).foreach { case (c, w) => assert(c === w) }
    // sanity: some clicks matched, some (before any purchase) did not
    val matched = custom.count(_.get(2) != null)
    assert(matched > 0 && matched < custom.length)
  }

  test("physical plan uses AsOfJoinExec with clustered+sorted children") {
    val df = graft.queries.Events.asofPurchase(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips the Exec suffix
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("string by-keys and string on-keys join via interpreted orderings (no Long casts)") {
    import spark.implicits._
    val quotes = Seq(
      ("aapl", "09:00", 10.0),
      ("aapl", "09:30", 11.0),
      ("msft", "09:10", 20.0)
    ).toDF("q_sym", "q_time", "px")
    val trades = Seq(
      ("aapl", "09:15", 1L),
      ("aapl", "09:45", 2L),
      ("msft", "09:05", 3L),
      ("goog", "09:20", 4L)
    ).toDF("sym", "time", "trade_id")
    val out = AsOf
      .joinAsOf(trades, quotes, "sym", "q_sym", "time", "q_time")
      .select($"trade_id", $"px")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
      .toMap
    assert(out === Map(1L -> Some(10.0), 2L -> Some(11.0), 3L -> None, 4L -> None))
  }

  test("empty right side null-extends every left row") {
    import spark.implicits._
    val left = Seq((1L, 5L), (2L, 6L)).toDF("k", "t")
    val right = Seq
      .empty[(Long, Long, Double)]
      .toDF("rk", "rt", "v")
    val out = AsOf.joinAsOf(left, right, "k", "rk", "t", "rt").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(4)))
  }

  test("left-only filters push below the as-of join; right-referencing filters stay above") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val left = Seq((1L, 5L), (2L, 6L), (3L, 7L)).toDF("k", "t")
    val right = Seq((1L, 4L, 10.0), (3L, 5L, 30.0)).toDF("rk", "rt", "v")
    val joined = AsOf.joinAsOf(left, right, "k", "rk", "t", "rt")

    val pushedPlan = joined.filter($"k" <= 2).queryExecution.optimizedPlan
    val joinNode = pushedPlan.collectFirst { case j: AsOfJoin => j }.get
    // the k<=2 predicate sits INSIDE the join's left subtree (or reached
    // the scan), never above the join
    assert(pushedPlan.collectFirst { case f: Filter => f }.forall(_.find(_.isInstanceOf[AsOfJoin]).isEmpty))
    assert(joinNode.left.toString.contains("2") || joinNode.left.collectFirst { case f: Filter => f }.nonEmpty)
    assert(joined.filter($"k" <= 2).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    // a predicate on the null-extended right side must NOT push
    val abovePlan = joined.filter($"v" > 20.0).queryExecution.optimizedPlan
    val above = abovePlan.collectFirst { case f: Filter => f }
    assert(above.exists(_.find(_.isInstanceOf[AsOfJoin]).nonEmpty))
    assert(joined.filter($"v" > 20.0).collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("equal (by, on) right rows resolve deterministically to the greatest tie key") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (1L, 100L, 7L, "first"),
      (1L, 100L, 9L, "last"),
      (1L, 100L, 8L, "middle")
    ).toDF("rk", "rt", "tie", "tag")
    (1 to 3).foreach { _ =>
      val out = AsOf
        .joinAsOf(left, right.repartition(3), "k", "rk", "t", "rt", Some("tie"))
        .select($"tag")
        .collect()
      assert(out.map(_.getString(0)).toSeq === Seq("last"))
    }
  }
}
