package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the vector index's COMPACTION contract: (stored ∪ pending tick)
  * ∖ DV is materialized once as the new posting table — survivors ride
  * through bit-identical (no re-assignment, no Lloyd work), victims
  * vanish, the quantizer stays the append family's stored centroid
  * table untouched — and the compacted serve answers the MoR delete
  * serve's exact ranking with no DV probe in the plan.
  */
class IvfCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivf-compact")
  private val dir = "/root/testdata/sf0.001"

  test("compacted serve == MoR delete serve; no DV probe in the plan") {
    val want = Similarity.annIvfDeleted(spark, dir).collect().map(_.toSeq).toSeq
    val served = Similarity.annIvfCompacted(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq === want,
      "compaction must not change the answer — it materializes the MoR serve's live set")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivfcmp_asg_"), plan.take(1500))
    assert(!plan.contains("graft_ivfapp_dv_"), "the compacted serve must not probe a DV")
  }

  test("compaction preserves survivor rows verbatim and drops exactly the victims") {
    import spark.implicits._
    val ct = Similarity.ivfCompactTable(spark, dir)
    val (centT, asgT) = Similarity.ivfAppendTables(spark, dir)
    val dv = spark.table(Similarity.ivfDvTable(spark, dir))
    val victimIds = dv.collect().map(_.getLong(0)).toSet
    assert(victimIds.nonEmpty, "the fixture must exercise the delete")

    val compacted = spark.table(ct)
    assert(compacted.filter($"vec_id".isin(victimIds.toSeq: _*)).count() === 0L)

    // stored survivors appear bit-identical — compaction consolidates,
    // it never re-assigns (a changed cid/embedding would betray a
    // recompute of work the build already paid for)
    val storedLive = spark.table(asgT).join(dv, Seq("vec_id"), "left_anti")
    val compactedRows = compacted.collect().map(_.toSeq).toSet
    assert(storedLive.collect().map(_.toSeq).forall(compactedRows.contains),
      "every stored survivor must ride through compaction verbatim")

    // the pending tick folded in: the compacted table covers every live
    // corpus vector (stored base + ticked slice), not just the stored ones
    val liveCorpus = graft.Tables
      .embeddings(spark, dir)
      .filter(!$"vec_id".isin(victimIds.toSeq: _*))
      .count()
    assert(compacted.count() === liveCorpus,
      "compaction must fold the pending tick into the base")

    // the quantizer is shared with the append family and untouched
    val centsBefore = spark.table(centT).collect().map(_.toSeq).toSet
    Similarity.annIvfCompacted(spark, dir).collect()
    assert(spark.table(centT).collect().map(_.toSeq).toSet === centsBefore,
      "compaction must never retrain the quantizer")
  }
}
