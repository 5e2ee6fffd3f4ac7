package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the composed IVF-PQ takedown serve (`sim_ivf_pq_delete`): the
  * shared corpus DV applies on the PROBED posting lists (one broadcast
  * anti-join before any code row is ADC-scored), so victims are absent
  * at any rank, live candidates shrink accordingly, and the plan keeps
  * all three scale mechanisms (probes bound WHICH, codes bound BYTES,
  * DV bounds to LIVE) in one pass. Value-level equality with the
  * victim-filtered replay is the DuckDB oracle's job.
  */
class IvfPqDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivfpq-delete-spec")
  private val dir = "/root/testdata/sf0.001"

  private def isVictim(id: Long): Boolean =
    id % Similarity.IvfDeleteMod == Similarity.IvfDeleteRem && id >= Similarity.NumQueries

  test("victims absent at any rank; ranks contiguous; live probe counts shrink") {
    import spark.implicits._
    val del = Pq.ivfPqTopKDeleted(spark, dir)
    val rows = del.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!isVictim(r.getAs[Long]("neighbor_id")), s"victim served: $r")
    }
    // per query: ranks are 1..k contiguous
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rs.length), s"query $q")
    }
    // the DV shrank the probed-candidate pool wherever victims were probed;
    // it can never grow it
    val base = Pq.ivfPqTopK(spark, dir).select($"query_id", $"n_probed").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val live = del.select($"query_id", $"n_probed").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live.keySet === base.keySet)
    live.foreach { case (q, n) => assert(n <= base(q), s"query $q: live $n > base ${base(q)}") }
    assert(live.exists { case (q, n) => n < base(q) },
      "fixture must probe at least one victim so the DV is load-bearing")
  }

  test("plan: broadcast DV anti-join on the probed lists, no shuffle join for the DV") {
    val plan = Pq.ivfPqTopKDeleted(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan.take(2000))
    // the DV probe must not degrade to a shuffle join
    assert(!plan.contains("SortMergeJoin LeftAnti"), plan.take(2000))
  }
}
