package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVF cell-rebalance audit's contract: the census covers every
  * posting exactly once, the per-cell retrain flag and the summary row's
  * priced trigger both recompute from the audit's own output, and the
  * audit serves off the stored catalog artifacts (postings ⋈ broadcast
  * centroids) — no Lloyd job, no corpus-wide re-derivation.
  */
class IvfBalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivf-balance-spec")
  private val dir = "/root/testdata/sf0.001"

  test("sim_ivf_balance: census total == corpus; flags and priced trigger recompute from output") {
    import spark.implicits._
    val df = Similarity.ivfBalance(spark, dir)
    val out = df.collect()
    val (smryRows, cells) = out.partition(_.getLong(0) == -1L)
    assert(smryRows.length === 1, "exactly one summary row (cid = -1)")
    val smry = smryRows.head
    assert(cells.nonEmpty)

    // census: every posting counted once, cohorts partition each cell
    cells.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === r.getLong(3), s"base+ticked != total in $r")
    }
    assert(cells.map(_.getLong(1)).sum === smry.getLong(1))
    assert(cells.map(_.getLong(2)).sum === smry.getLong(2))
    val n = cells.map(_.getLong(3)).sum
    assert(n === smry.getLong(3))
    assert(n === graft.Tables.embeddingsFanned(spark, dir).count(), "census covers the whole corpus")

    // per-cell retrain flag == (ticked outnumber base), from the output itself
    cells.foreach { r =>
      val want = if (r.getLong(2) > r.getLong(1)) 1L else 0L
      assert(r.getLong(9) === want, s"per-cell retrain flag wrong in $r")
    }

    // drift column == base_cos - tick_cos wherever both cohorts exist
    cells.filter(r => !r.isNullAt(5) && !r.isNullAt(6)).foreach { r =>
      assert(
        math.abs(r.getDouble(7) - (r.getDouble(5) - r.getDouble(6))) <= 2e-6,
        s"drift must be the cohort-mean gap in $r"
      )
    }

    // summary pricing recomputes from the per-cell census: trigger fires
    // iff serveBudget × probes × (Σpop²/N² − 1/C) buys a full
    // reassignment pass
    val (ct, _) = Similarity.ivfAppendTables(spark, dir)
    val c = spark.table(ct).count()
    val sp = cells.map(r => r.getLong(3) * r.getLong(3)).sum
    val tax = sp.toDouble / (n.toDouble * n.toDouble) - 1.0 / c.toDouble
    val want =
      if ((Similarity.RebalanceServeBudget * Similarity.IvfProbes).toDouble * tax >= 1.0) 1L else 0L
    assert(smry.getLong(9) === want, "summary retrain trigger must match the read-tax pricing")
    assert(tax >= -1e-12, "population-weighted scan fraction is never under the balanced 1/C")

    // excess_frac recomputes from the census under the balanced ceiling
    val bal = (n + c - 1) / c
    val excess = cells.map(r => math.max(r.getLong(3) - bal, 0L)).sum
    assert(
      math.abs(smry.getDouble(8) - excess.toDouble / n.toDouble) <= 2e-6,
      "summary excess mass must equal the census recompute"
    )

    // the audit reads the stored artifacts — no training in the plan
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_ivfapp_asg_"), "must serve off the stored postings")
    assert(analyzed.contains("graft_ivfapp_cents_"), "must join the stored quantizer")
  }
}
