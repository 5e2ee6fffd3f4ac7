package graft.text

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the durable lexical index's maintenance contract (the BM25 cell
  * of the index-maintenance matrix): serve == from-scratch ranking, the
  * serving plan reads catalog artifacts (never the corpus), the build
  * happens once per fingerprint, and an ingest tick appends narrow
  * postings plus ONE additive stats-delta row without touching any
  * existing row.
  */
class Bm25AppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "bm25-append")
  private val dir = "/root/testdata/sf0.001"

  test("serve == from-scratch; the serving plan reads the stored index, not the corpus") {
    val want = TextAnalysis.bm25(spark, dir).collect().map(_.toSeq).toSeq
    val served = TextAnalysis.bm25Append(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq === want,
      "the durable index must answer the identical ranking contract")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bm25_post_"), plan.take(1500))
    assert(!plan.contains("documents.parquet"), "serve must not rescan the corpus")

    // build-once: a repeat serve adds no stats rows; the stored postings
    // cover exactly the corpus (base slice + the build-time tick)
    val (bt, st) = TextAnalysis.bm25IndexTables(spark, dir)
    val statsRows = spark.table(st).count()
    assert(statsRows === 2L, "base build + build-time tick = two stats deltas")
    TextAnalysis.bm25Append(spark, dir).collect()
    assert(spark.table(st).count() === statsRows, "a serve must not rebuild or re-tick")
    assert(spark.table(bt).count() === graft.Tables.documents(spark, dir).count())
  }

  test("append tick: postings + ONE additive stats row per batch, existing rows untouched") {
    import spark.implicits._
    // isolated table names: the tick API is the whole build path
    val bt = "graft_bm25t_post_spec"
    val st = "graft_bm25t_stats_spec"
    Seq(bt, st).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val docs = graft.Tables.documents(spark, dir)
    val base = docs.filter($"doc_id" % TextAnalysis.Bm25NewMod =!= 0)
    val batch = docs.filter($"doc_id" % TextAnalysis.Bm25NewMod === 0)

    TextAnalysis.bm25AppendTick(spark, bt, st, base)
    assert(spark.table(bt).count() === base.count())
    assert(spark.table(st).count() === 1L)
    val beforeRows = spark.table(bt).collect().map(_.toSeq).toSet

    TextAnalysis.bm25AppendTick(spark, bt, st, batch)
    assert(spark.table(bt).count() === docs.count())
    assert(spark.table(st).count() === 2L, "one stats delta per tick")
    // append-only: every pre-tick posting row survives bit-identical
    val afterRows = spark.table(bt).collect().map(_.toSeq).toSet
    assert(beforeRows.subsetOf(afterRows), "a tick must never rewrite existing postings")

    // the additive contract: summed deltas == the fingerprinted index's
    // whole-corpus stats (what the serve's scoring constants derive from)
    val (_, refSt) = TextAnalysis.bm25IndexTables(spark, dir)
    def sums(t: String): Seq[Long] = {
      val cols = spark.table(t).columns.toSeq
      spark.table(t).agg(sum(col(cols.head)), cols.tail.map(c => sum(col(c))): _*)
        .collect().head.toSeq.map(_.asInstanceOf[Long])
    }
    assert(sums(st) === sums(refSt), "stats deltas must merge by addition to corpus stats")
    Seq(bt, st).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("stream ingest: foreachBatch ticks the index; one additive delta per batch; serve == from-scratch") {
    val want = TextAnalysis.bm25(spark, dir).collect().map(_.toSeq).toSeq
    assert(TextAnalysis.bm25StreamServe(spark, dir).collect().map(_.toSeq).toSeq === want,
      "the stream-maintained index must answer the identical ranking contract")
    val (batches, statsRows) = TextAnalysis.lastStreamBm25.get()
    assert(batches >= 2, s"the 6-file / 2-per-trigger source must drain in ≥2 micro-batches ($batches)")
    assert(statsRows === batches.toLong, "exactly ONE additive stats delta per non-empty batch")
    val (bt, _) = TextAnalysis.bm25StreamTables(spark, dir)
    assert(spark.table(bt).count() === graft.Tables.documents(spark, dir).count(),
      "the stream must index exactly the corpus it drained")
    // a repeat serve is catalog-only: no re-ingest, ledger unchanged
    TextAnalysis.bm25StreamServe(spark, dir).collect()
    assert(TextAnalysis.lastStreamBm25.get() === ((batches, statsRows)))
  }

  test("streaming takedown: partial retractions sum to the one-shot delete; one negative delta per batch") {
    import spark.implicits._
    val want = TextAnalysis.bm25Deleted(spark, dir).collect().map(_.toSeq).toSeq
    assert(TextAnalysis.bm25StreamDeleted(spark, dir).collect().map(_.toSeq).toSeq === want,
      "the streamed takedown must answer the one-shot delete's exact ranking")
    val (batches, negRows) = TextAnalysis.lastStreamBm25Del.get()
    assert(batches >= 2, s"the 6-file / 2-per-trigger victim queue must drain in ≥2 micro-batches ($batches)")
    assert(negRows === batches.toLong, "exactly ONE negative stats delta per drained batch")

    val (bt, st, dvt) = TextAnalysis.bm25StreamDeleteTables(spark, dir)
    // postings never rewritten: every doc's row still stored
    assert(spark.table(bt).count() === graft.Tables.documents(spark, dir).count())
    // the accumulated DV is the one-shot victim set
    val victims = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % TextAnalysis.Bm25DeleteMod === TextAnalysis.Bm25DeleteRem)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(spark.table(dvt).collect().map(_.getLong(0)).toSet === victims)
    // pure sums: the N partial retractions equal the one-shot retraction
    val n = TextAnalysis.Bm25Query.length
    def summed(t: String) = spark.table(t)
      .agg(sum($"n_docs"), (sum($"sum_dl") +: (1 to n).map(i => sum(col(s"df$i")))): _*)
      .collect().head.toSeq
    val (_, oneShotSt, _) = TextAnalysis.bm25DeleteTables(spark, dir)
    assert(summed(st) === summed(oneShotSt), "streamed deltas must sum to the one-shot delete's stats")
    // a repeat serve is catalog-only
    TextAnalysis.bm25StreamDeleted(spark, dir).collect()
    assert(TextAnalysis.lastStreamBm25Del.get() === ((batches, negRows)))
  }

  test("delete tick: DV + negative stats delta, postings never rewritten, survivors-only serve") {
    import spark.implicits._
    val (bt, st, dvt) = TextAnalysis.bm25DeleteTables(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
    val nDocs = docs.count()
    val victims = docs
      .filter($"doc_id" % TextAnalysis.Bm25DeleteMod === TextAnalysis.Bm25DeleteRem)
    val nVictims = victims.count()
    assert(nVictims > 0, "the fixture must exercise the delete")

    // merge-on-read: the postings table still holds EVERY doc's row
    // (no rewrite); the DV holds exactly the victim ids
    assert(spark.table(bt).count() === nDocs)
    assert(
      spark.table(dvt).orderBy($"doc_id").collect().map(_.getLong(0)).toSeq ===
        victims.orderBy($"doc_id").collect().map(_.getLong(0)).toSeq
    )

    // the negative delta retracts the victims EXACTLY: summed stats ==
    // stats recomputed over the live posting rows
    val n = TextAnalysis.Bm25Query.length
    val live = spark.table(bt).join(spark.table(dvt), Seq("doc_id"), "left_anti")
    val liveStats = live
      .agg(
        count(lit(1)).as("n_docs"),
        (sum($"dl").as("sum_dl") +:
          (1 to n).map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*
      )
      .collect().head.toSeq
    val summed = spark.table(st)
      .agg(
        sum($"n_docs").as("n_docs"),
        (sum($"sum_dl").as("sum_dl") +: (1 to n).map(i => sum(col(s"df$i")).as(s"df$i"))): _*
      )
      .collect().head.toSeq
    assert(summed === liveStats, "summed deltas must equal fresh stats over survivors")

    // no deleted doc can rank
    val servedIds = TextAnalysis.bm25Deleted(spark, dir).collect().map(_.getLong(0)).toSet
    val victimIds = victims.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(servedIds.intersect(victimIds).isEmpty, "a deleted doc must never be served")
  }
}
