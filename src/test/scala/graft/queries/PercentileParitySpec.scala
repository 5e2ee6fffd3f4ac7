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

  test("rankPercentiles == exact percentile on random duplicate-heavy multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // duplicate-heavy grids (2dp values) across groups of uneven size,
      // including a 1-row group — the edge shapes for index straddling
      // spans negative values too: unit buckets floor toward -∞, so the
      // bucketed cumulative rank must handle b = -1 vs 0 boundaries
      val rows = (1 to 400 + trial * 100).map { _ =>
        val g = s"g${rnd.nextInt(4)}"
        (g, math.floor(rnd.nextDouble() * 10000 - 5000) / 100.0)
      } :+ ("solo", 42.42)
      val vals = rows.toDF("g", "v")
      val pcts = Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99)
      val got = Relational
        .rankPercentiles(vals, pcts)
        .orderBy($"g")
        .collect()
      val want = vals
        .groupBy($"g")
        .agg(
          expr("percentile(v, 0.1)").as("p10"),
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.99)").as("p99")
        )
        .orderBy($"g")
        .collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (a, b) =>
        assert(a.getString(0) == b.getString(0))
        (1 to 3).foreach { i =>
          assert(a.getDouble(i) == b.getDouble(i), s"trial $trial col $i group ${a.getString(0)}")
        }
      }
      // each trial persists a fresh histogram (per-input cache entry);
      // drop them so the loop doesn't accumulate cached blocks
      spark.catalog.clearCache()
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
