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
}
