package graft.queries

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** stats_profile is the ANALYZE pass: one row of (n, nulls, exact NDV,
  * min/max, sketch-vs-exact gate) per profiled column. The spec pins
  * the exact columns against independent per-column aggregates, the
  * sketch gate against the HLL error contract, and the scale shape:
  * each branch's scan must prune to exactly its one profiled column.
  */
class StatsProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "stats-profile")
  private val dir = "/root/testdata/sf0.001"

  test("per-column stats equal independent exact aggregates; sketch gate holds") {
    import spark.implicits._
    val got = Relational
      .statsProfile(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(got.keySet === Relational.StatsProfileCols.toSet)
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    for (c <- Relational.StatsProfileCols) {
      val row = got(c)
      assert(row.getLong(1) === n, s"$c n_rows")
      assert(row.getLong(2) === n - li.filter(col(c).isNotNull).count(), s"$c n_null")
      val ndv = li.select(col(c)).distinct().filter(col(c).isNotNull).count()
      assert(row.getLong(3) === ndv, s"$c ndv")
      assert(row.getBoolean(6), s"$c sketch outside 3-sigma of exact ndv=$ndv")
    }
    // min/max round-trip: the string forms parse back to the true extremes
    val qMin = got("l_quantity").getString(4).toDouble
    val qMax = got("l_quantity").getString(5).toDouble
    val Array(lo, hi) = li.agg(min($"l_quantity"), max($"l_quantity")).collect()(0) match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    assert(qMin === lo && qMax === hi)
  }

  test("each per-column branch scans only its own column (ReadSchema pruned)") {
    val plan = Relational
      .statsProfile(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    // every FileScan in the union must carry a single-field ReadSchema;
    // a scan reading the full 11-column struct would defeat the
    // columnar ideal the operator exists to demonstrate
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty, plan.take(2000))
    assert(
      reads.forall(s => s.count(_ == ',') == 0),
      s"unpruned scan found: $reads"
    )
  }

  test("correlation matrix: one corpus scan, values in [-1,1], pair recompute agrees") {
    val df = Relational.statsCorr(spark, dir)
    val rows = df.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet === Relational.CorrPairs.toSet)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0, s"${r.getString(0)}/${r.getString(1)}")
    }
    // single scan: exactly ONE parquet scan node in the physical plan
    // (count Location: lines — each scan node prints exactly one)
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(
      "Location: InMemoryFileIndex".r.findAllIn(plan).length === 1,
      "corr matrix must be one corpus pass"
    )
    // independent recompute of one pair from raw rows (exact integer moments)
    val data = Tables
      .lineitem(spark, dir)
      .select(col("l_quantity"), col("l_discount"))
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100), math.round(r.getDouble(1) * 100)))
    val n = data.length.toDouble
    val (sx, sy) = (data.map(_._1).sum.toDouble, data.map(_._2).sum.toDouble)
    val sxx = data.map(d => d._1 * d._1).sum.toDouble
    val syy = data.map(d => d._2 * d._2).sum.toDouble
    val sxy = data.map(d => d._1 * d._2).sum.toDouble
    val want = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(r => r.getString(0) == "l_quantity" && r.getString(1) == "l_discount").get
    assert(math.abs(got.getDouble(3) - want) < 1e-6, s"corr ${got.getDouble(3)} vs $want")
  }
}
