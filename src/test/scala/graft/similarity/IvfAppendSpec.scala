package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the incrementally-maintained IVF index end-to-end: build the
  * persisted (centroids, postings) pair once, run two ingest ticks
  * through [[Similarity.ivfAppendTick]], and pin that (a) ticks append
  * exactly the batch's postings, (b) the quantizer is NEVER retrained by
  * a tick, (c) build-once reuses the appended table, and (d) the served
  * result equals a from-scratch recompute — maintenance loses nothing.
  */
class IvfAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivf-append-spec")

  private val Dim = 64

  private def vec(i: Long): Array[Float] =
    Array.tabulate(Dim)(j => (((i * 31 + j * 7) % 13).toFloat - 6.0f) / 6.0f + 0.01f)

  private def writeCorpus(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-").toString
    (0 until n)
      .map(i => (i.toLong, vec(i.toLong)))
      .toDF("vec_id", "embedding")
      .write
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("ticks append postings without retraining; build-once reuses; serving equals from-scratch") {
    import spark.implicits._
    val dir = writeCorpus(60)
    val (ct, at) = Similarity.ivfAppendTables(spark, dir)
    val nBase = 60 - 60 / Similarity.IvfNewMod // vec_id % 5 != 0
    assert(spark.table(at).count() === nBase.toLong, "base postings cover exactly the base slice")
    val centsBefore = spark.table(ct).collect().map(_.toString).sorted

    // two ingest ticks with fresh vectors (ids outside the corpus file)
    def batch(ids: Seq[Long]) =
      ids
        .map(i => (i, vec(i)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding", graft.functions.Portable.norm($"embedding").as("nrm"))
    Similarity.ivfAppendTick(spark, ct, at, batch(Seq(100L, 105L)))
    assert(spark.table(at).count() === nBase + 2L, "tick 1 appends exactly its batch")
    Similarity.ivfAppendTick(spark, ct, at, batch(Seq(110L)))
    assert(spark.table(at).count() === nBase + 3L, "tick 2 appends exactly its batch")
    val centsAfter = spark.table(ct).collect().map(_.toString).sorted
    assert(centsBefore.sameElements(centsAfter), "a tick must never retrain the quantizer")
    // every appended posting points at a stored centroid
    val cids = spark.table(ct).select($"cid").collect().map(_.getLong(0)).toSet
    val newPost = spark.table(at).filter($"vec_id" >= 100L).collect()
    assert(newPost.length === 3 && newPost.forall(r => cids.contains(r.getLong(1))))

    // build-once must hand back the SAME appended table, rows intact
    assert(Similarity.ivfAppendTables(spark, dir) === ((ct, at)))
    assert(spark.table(at).count() === nBase + 3L, "build-once must not clobber appended rows")

    // the serving plan reads the catalog artifacts (no training jobs)
    val served = Similarity.annIvfAppended(spark, dir)
    assert(served.queryExecution.analyzed.toString.contains("graft_ivfapp_asg_"))
    // maintenance loses nothing, INCLUDING out-of-corpus ingested
    // vectors: stored-postings ∪ in-flight tick == from-scratch
    // assignment of (corpus ∪ ticked batches) against the same stored
    // centroids — ticked ids are first-class serve candidates because
    // the postings carry their vectors
    val emb = graft.Tables
      .embeddingsFanned(spark, dir)
      .select($"vec_id", $"embedding", graft.functions.Portable.norm($"embedding").as("nrm"))
    val embAll = emb.unionByName(batch(Seq(100L, 105L, 110L)))
    val postAll = Similarity
      .assignCells(embAll, spark.table(ct))
      .join(embAll.select($"vec_id", $"embedding", $"nrm"), "vec_id")
    val scratch = Similarity
      .ivfServeFromPostings(emb, spark.table(ct), postAll, Similarity.IvfProbes)
    assert(
      served.collect().map(_.toString).sameElements(scratch.collect().map(_.toString)),
      "served result must equal the from-scratch recompute over corpus + ticked vectors"
    )
    assert(served.count() > 0, "the probe path must return neighbors")

    // direct servability proof: restrict the postings to the ticked
    // rows alone — neighbors can then ONLY be ticked ids, which
    // requires their stored vectors to drive the exact re-rank
    val tickedOnly = Similarity.ivfServeFromPostings(
      emb,
      spark.table(ct),
      spark.table(at).filter($"vec_id" >= 100L),
      Similarity.IvfProbes
    )
    val tickedRows = tickedOnly.collect()
    assert(tickedRows.nonEmpty, "ticked postings must be servable")
    assert(tickedRows.forall(r => r.getLong(1) >= 100L))

    // a re-played (already persisted) batch is NOT recomputed in-flight:
    // the serve plan's pending tick excludes persisted ids, and a
    // duplicate posting row cannot double-surface a neighbor
    Similarity.ivfAppendTick(spark, ct, at, batch(Seq(110L)))
    val afterDup = Similarity.annIvfAppended(spark, dir).collect()
    assert(afterDup.map(_.toString).sameElements(scratch.collect().map(_.toString)),
      "duplicate postings must not change the served result")
  }

  test("delete: DV tombstones exclude victims; centroids and postings untouched; exact re-rank over survivors") {
    import spark.implicits._
    val dir = writeCorpus(60)
    val victims = (0L until 60L)
      .filter(i => i % Similarity.IvfDeleteMod == Similarity.IvfDeleteRem && i >= Similarity.NumQueries)
      .toSet
    assert(victims.nonEmpty, "the fixture must exercise the delete")

    val (ct, at) = Similarity.ivfAppendTables(spark, dir)
    val postBefore = spark.table(at).count()
    val centsBefore = spark.table(ct).collect().map(_.toString).sorted

    val served = Similarity.annIvfDeleted(spark, dir).collect()
    // the DV holds exactly the victim ids (non-query id space only)
    val dvt = Similarity.ivfDvTable(spark, dir)
    assert(spark.table(dvt).collect().map(_.getLong(0)).toSet === victims)
    // merge-on-read: a delete never touches the quantizer or postings
    assert(spark.table(at).count() === postBefore, "postings must not be rewritten")
    assert(spark.table(ct).collect().map(_.toString).sorted.sameElements(centsBefore),
      "the quantizer must not retrain")
    // no victim can serve as a neighbor
    assert(served.nonEmpty && served.forall(r => !victims.contains(r.getLong(1))))

    // exactness: the post-delete serve equals a from-scratch probe over
    // the surviving candidate set (removal can PROMOTE new neighbors
    // into the top-3 — a result filter would not be equivalent)
    val emb = graft.Tables
      .embeddingsFanned(spark, dir)
      .select($"vec_id", $"embedding", graft.functions.Portable.norm($"embedding").as("nrm"))
    val postAll = Similarity
      .assignCells(emb, spark.table(ct))
      .join(emb.select($"vec_id", $"embedding", $"nrm"), "vec_id")
    val live = postAll.filter(
      !($"vec_id" % Similarity.IvfDeleteMod === Similarity.IvfDeleteRem &&
        $"vec_id" >= Similarity.NumQueries)
    )
    val scratch = Similarity
      .ivfServeFromPostings(emb, spark.table(ct), live, Similarity.IvfProbes)
      .collect()
    assert(served.map(_.toString).sameElements(scratch.map(_.toString)),
      "post-delete serve must equal the from-scratch probe over survivors")
  }
}
