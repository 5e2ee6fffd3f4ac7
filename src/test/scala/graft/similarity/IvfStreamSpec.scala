package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream-maintained vector index's contract: the quantizer is
  * the OFFLINE-trained append-family centroid table copied verbatim
  * (streaming never runs a Lloyd job), every micro-batch ticks the
  * posting table through the same ivfAppendTick API any batch ingest
  * uses, the drained postings cover exactly the corpus, and the serve
  * answers sim_ivf_append's identical ranking from catalog artifacts.
  */
class IvfStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivf-stream")
  private val dir = "/root/testdata/sf0.001"

  test("stream ingest: foreachBatch ticks the index; serve == the batch-maintained serve") {
    val want = Similarity.annIvfAppended(spark, dir).collect().map(_.toSeq).toSeq
    val served = Similarity.ivfStreamServe(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq === want,
      "the stream-maintained index must answer the identical top-k contract")
    val (batches, postRows) = Similarity.lastStreamIvf.get()
    assert(batches >= 2, s"the 6-file / 2-per-trigger source must drain in ≥2 micro-batches ($batches)")

    val (ct, at) = Similarity.ivfStreamTables(spark, dir)
    assert(postRows === spark.table(at).count())
    assert(spark.table(at).count() === graft.Tables.embeddings(spark, dir).count(),
      "the stream must index exactly the corpus it drained")

    // the quantizer is the offline trainer's table verbatim — streaming
    // assigned, it never trained
    val (act, _) = Similarity.ivfAppendTables(spark, dir)
    assert(spark.table(ct).collect().map(_.toSeq).toSet ===
      spark.table(act).collect().map(_.toSeq).toSet,
      "stream-family centroids must be the offline-trained quantizer verbatim")

    // a repeat serve is catalog-only: no re-ingest, ledger unchanged
    Similarity.ivfStreamServe(spark, dir).collect()
    assert(Similarity.lastStreamIvf.get() === ((batches, postRows)))
  }

  test("stream takedown: per-batch tombstone slices, index untouched, N partials == one-shot") {
    import spark.implicits._
    val (ct, at) = Similarity.ivfAppendTables(spark, dir)
    val centsBefore = spark.table(ct).collect().map(_.toString).sorted.toSeq
    val postBefore = spark.table(at).count()

    val served = Similarity.annIvfStreamDeleted(spark, dir).collect().map(_.toSeq).toSeq
    val (batches, dvRows) = Similarity.lastStreamIvfDel.get()
    assert(batches >= 3, s"the 6-file / 2-per-trigger queue must drain in >=3 micro-batches ($batches)")

    // no takedown commit touched the quantizer or the stored postings
    assert(spark.table(ct).collect().map(_.toString).sorted.toSeq === centsBefore)
    assert(spark.table(at).count() === postBefore, "takedown must never rewrite postings")

    // the accumulated tombstone slices union to the one-shot victim set
    val oneShot = spark.table(Similarity.ivfDvTable(spark, dir)).select($"vec_id")
    val streamed = spark.table(Similarity.ivfStreamDvTable(spark, dir)).select($"vec_id")
    assert(dvRows === oneShot.count())
    assert(streamed.except(oneShot).isEmpty && oneShot.except(streamed).isEmpty)

    // the streamed serve answers exactly the one-shot delete serve
    val want = Similarity.annIvfDeleted(spark, dir).collect().map(_.toSeq).toSeq
    assert(served === want)

    // a repeat serve is catalog-only: the drain never re-runs
    Similarity.annIvfStreamDeleted(spark, dir).collect()
    assert(Similarity.lastStreamIvfDel.get() === ((batches, dvRows)))
  }
}
