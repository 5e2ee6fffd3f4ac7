package graft.text

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the lexical index's COMPACTION contract — the fourth lifecycle
  * verb: the surviving postings are rewritten once (stored ∖ DV, no
  * text rescan), the whole delta history folds to ONE summed stats row,
  * the compacted serve reads no DV and answers the MoR serve's exact
  * ranking, and the compacted family is build-once like every other
  * warehouse artifact.
  */
class Bm25CompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "bm25-compact")
  private val dir = "/root/testdata/sf0.001"

  test("compaction: live-only postings, one stats row, DV-free serve == MoR serve") {
    import spark.implicits._
    val want = TextAnalysis.bm25Deleted(spark, dir).collect().map(_.toSeq).toSeq
    val served = TextAnalysis.bm25Compacted(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq === want,
      "compaction must not change the answer — it materializes the MoR serve's live set")

    val (cbt, cst) = TextAnalysis.bm25CompactTables(spark, dir)
    val (dbt, dst, dvt) = TextAnalysis.bm25DeleteTables(spark, dir)

    // the delta history (base + tick + negative takedown) folds to ONE row
    assert(spark.table(cst).count() === 1L, "compaction folds all stats deltas to one row")
    assert(spark.table(dst).count() === 3L, "the MoR family keeps its delta history")

    // postings: exactly the survivors, each row bit-identical to its
    // stored MoR counterpart (compaction drops victims, never recomputes)
    val live = spark.table(dbt).join(spark.table(dvt), Seq("doc_id"), "left_anti")
    assert(spark.table(cbt).count() === live.count())
    assert(spark.table(cbt).collect().map(_.toSeq).toSet === live.collect().map(_.toSeq).toSet,
      "compacted postings must be the stored survivors verbatim")
    val victimIds = spark.table(dvt).collect().map(_.getLong(0)).toSet
    assert(spark.table(cbt).filter($"doc_id".isin(victimIds.toSeq: _*)).count() === 0L)

    // the compacted serve carries no DV probe and never touches the corpus
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bm25c_post_"), plan.take(1500))
    assert(!plan.contains("graft_bm25d_dv_"), "the compacted serve must not probe a DV")
    assert(!plan.contains("documents.parquet"), "compaction serve must not rescan the corpus")
  }

  test("compaction is build-once: a repeat serve reuses the compacted tables") {
    val (cbt, cst) = TextAnalysis.bm25CompactTables(spark, dir)
    val before = (spark.table(cbt).count(), spark.table(cst).count())
    TextAnalysis.bm25Compacted(spark, dir).collect()
    assert((spark.table(cbt).count(), spark.table(cst).count()) === before,
      "a serve after compaction must not re-compact")
  }
}
