package graft.queries

import graft.{GraftSession, SparkEntry}
import graft.oracle.Oracles
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SQL-string surface: the ANSI statements (the same text the
  * DuckDB oracle runs) produce row-identical results to the DataFrame
  * builder twins, and Catalyst gives the parsed plans the same physical
  * treatment (TakeOrdered for the top-k, no extra shuffles).
  */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "sql-surface")
  private val dir = "/root/testdata/sf0.001"

  private val twins = Seq(
    "sql_q1_pricing" -> "q1_pricing_summary",
    "sql_q3_segment" -> "q3_segment_revenue",
    "sql_q4_region" -> "q4_region_revenue",
    "sql_q8_topk" -> "q8_topk",
    "sql_q10_window" -> "q10_window_rank"
  )

  test("each spark.sql twin returns exactly the builder query's rows and columns") {
    twins.foreach { case (sqlName, builderName) =>
      val viaSql = SparkEntry.queries(sqlName)(spark, dir)
      val viaBuilder = SparkEntry.queries(builderName)(spark, dir)
      assert(viaSql.columns.toSeq === viaBuilder.columns.toSeq, sqlName)
      assert(viaSql.collect().toSeq === viaBuilder.collect().toSeq, sqlName)
    }
  }

  test("parsed plans get the builders' physical treatment: same operator skeleton per twin") {
    // exact canonical equality is too strong (the builder and the SQL
    // text commute some arithmetic operands), but the OPERATOR tree —
    // every scan, aggregate, join, exchange, window, sort — must match
    // node-for-node: that is where pushdown, partial aggregation and
    // join strategy live
    def skeleton(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    twins.foreach { case (sqlName, builderName) =>
      val parsed = skeleton(SparkEntry.queries(sqlName)(spark, dir))
      val built = skeleton(SparkEntry.queries(builderName)(spark, dir))
      assert(parsed === built, s"$sqlName vs $builderName")
    }
  }

  test("the parsed top-k plan gets the same TakeOrdered physical treatment as the builder") {
    val plan = SparkEntry
      .queries("sql_q8_topk")(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("view registration is metadata-only and idempotent") {
    SqlSurface.registerViews(spark, dir)
    SqlSurface.registerViews(spark, dir) // second call must not throw
    assert(spark.catalog.tableExists("lineitem"))
    // the SQL surface sees the same schema the reader surface does
    assert(
      spark.table("lineitem").schema === graft.Tables.lineitem(spark, dir).schema
    )
  }

  test("every sql_* registry entry uses the oracle string verbatim") {
    val expect = Map(
      "sql_q1_pricing" -> Oracles.q1PricingSummary,
      "sql_q3_segment" -> Oracles.q3SegmentRevenue,
      "sql_q4_region" -> Oracles.q4RegionRevenue,
      "sql_q8_topk" -> Oracles.q8TopK,
      "sql_q10_window" -> Oracles.q10WindowRank
    )
    expect.foreach { case (name, sql) =>
      assert(SparkEntry.oracleSql(name) === sql, name)
    }
  }
}
