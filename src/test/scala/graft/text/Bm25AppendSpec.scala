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
}
