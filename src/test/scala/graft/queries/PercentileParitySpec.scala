package graft.queries

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that the rank-based percentile plan is BIT-IDENTICAL to the
  * exact `percentile` aggregate it replaced (same (n−1)·p convention,
  * same (hi−pos)·v_lo + (pos−lo)·v_hi interpolation) — so swapping the
  * scale-safe plan in changed no output anywhere.
  */
class PercentileParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "pct-parity")
  private val dir = "/root/testdata/sf0.01"

  test("grouped rankPercentiles == exact percentile aggregate, bit for bit") {
    import spark.implicits._
    val vals = Tables
      .lineitem(spark, dir)
      .select($"l_returnflag".as("g"), $"l_extendedprice".as("v"))
    val got = Relational
      .rankPercentiles(vals, Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .orderBy($"g")
      .collect()
    val want = vals
      .groupBy($"g")
      .agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90")
      )
      .orderBy($"g")
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 3).foreach { i =>
        assert(a.getDouble(i) == b.getDouble(i), s"col $i of group ${a.getString(0)}")
      }
    }
  }

  test("global (constant-group) rankPercentiles == exact percentile, bit for bit") {
    import spark.implicits._
    val vals = Tables
      .orders(spark, dir)
      .select(lit("all").as("g"), $"o_totalprice".as("v"))
    val got = Relational
      .rankPercentiles(vals, Seq("c1" -> 0.25, "c2" -> 0.50, "c3" -> 0.75))
      .collect()
    val want = vals
      .agg(
        expr("percentile(v, 0.25)").as("c1"),
        expr("percentile(v, 0.50)").as("c2"),
        expr("percentile(v, 0.75)").as("c3")
      )
      .collect()
    assert(got.length == 1 && want.length == 1)
    (1 to 3).foreach(i => assert(got.head.getDouble(i) == want.head.getDouble(i - 1), s"cut $i"))
  }
}
