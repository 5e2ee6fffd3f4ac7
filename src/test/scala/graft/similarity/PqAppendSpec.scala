package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the incrementally-maintained PQ index end-to-end: build the
  * persisted (codebooks, codes, vector store) triple once, run two
  * ingest ticks through [[Pq.pqAppendTick]], and pin that (a) ticks
  * append exactly 8 code rows + 1 vector row per batch vector, (b) the
  * codebooks are NEVER retrained by a tick, (c) build-once reuses the
  * appended tables, (d) the served result equals a from-scratch
  * encode-everything recompute against the same stored codebooks, and
  * (e) ticked out-of-corpus vectors are servable from the maintained
  * vector store alone.
  */
class PqAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "pq-append-spec")

  private val Dim = 64

  private def vec(i: Long): Array[Float] =
    Array.tabulate(Dim)(j => (((i * 29 + j * 11) % 17).toFloat - 8.0f) / 8.0f + 0.01f)

  private def writeCorpus(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqapp-").toString
    (0 until n)
      .map(i => (i.toLong, vec(i.toLong)))
      .toDF("vec_id", "embedding")
      .write
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("ticks append codes without retraining; serving equals from-scratch; ticked vectors servable") {
    import spark.implicits._
    val dir = writeCorpus(60)
    val (ct, kt, vt) = Pq.pqAppendTables(spark, dir)
    val nBase = 60 - 60 / Similarity.IvfNewMod
    assert(spark.table(kt).count() === nBase.toLong * Pq.PqSubspaces, "8 code rows per base vector")
    assert(spark.table(vt).count() === nBase.toLong, "vector store covers the base slice")
    // the init class stays inside the base slice by construction
    assert(Pq.PqAppendStride % Similarity.IvfNewMod === 0)
    assert(Pq.PqAppendOffset % Similarity.IvfNewMod != 0)
    val centsBefore = spark.table(ct).collect().map(_.toString).sorted

    def batch(ids: Seq[Long]) = ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    Pq.pqAppendTick(spark, ct, kt, vt, batch(Seq(100L, 105L)))
    assert(spark.table(kt).count() === (nBase + 2L) * Pq.PqSubspaces, "tick 1 appends its batch's codes")
    Pq.pqAppendTick(spark, ct, kt, vt, batch(Seq(110L)))
    assert(spark.table(kt).count() === (nBase + 3L) * Pq.PqSubspaces, "tick 2 appends its batch's codes")
    assert(spark.table(vt).count() === nBase + 3L)
    val centsAfter = spark.table(ct).collect().map(_.toString).sorted
    assert(centsBefore.sameElements(centsAfter), "a tick must never retrain the codebooks")
    // every appended code addresses a stored codebook entry
    val codeSet = spark.table(ct).select($"m", $"code").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val newCodes = spark.table(kt).filter($"vec_id" >= 100L).collect()
    assert(newCodes.length === 3 * Pq.PqSubspaces)
    assert(newCodes.forall(r => codeSet.contains((r.getInt(1), r.getInt(2)))))

    // build-once must hand back the SAME appended tables, rows intact
    assert(Pq.pqAppendTables(spark, dir) === ((ct, kt, vt)))
    assert(spark.table(kt).count() === (nBase + 3L) * Pq.PqSubspaces)

    // served == from-scratch: encode (corpus ∪ ticked) against the same
    // stored codebooks, serve off the full vector set
    val served = Pq.adcTopKAppended(spark, dir)
    assert(served.queryExecution.analyzed.toString.contains("graft_pqa_codes_"))
    val emb = graft.Tables.embeddingsFanned(spark, dir).select($"vec_id", $"embedding")
    val embAll = emb.unionByName(batch(Seq(100L, 105L, 110L)))
    val cents = spark.table(ct)
    val scratch = Pq.adcServeFrom(
      Pq.pqEncode(Pq.subvectors(embAll), cents),
      Pq.queryLut(emb, cents),
      emb.filter($"vec_id" < Similarity.NumQueries).select($"vec_id".as("query_id"), $"embedding".as("qe")),
      embAll
    )
    assert(
      served.collect().map(_.toString).sameElements(scratch.collect().map(_.toString)),
      "maintained index must serve exactly the from-scratch recompute"
    )
    assert(served.count() > 0)

    // ticked-only servability: restrict codes to the appended rows —
    // neighbors can then ONLY be ticked ids, so the exact-refine tail
    // must be reading their vectors from the maintained store
    val tickedOnly = Pq.adcServeFrom(
      spark.table(kt).filter($"vec_id" >= 100L),
      Pq.queryLut(emb, cents),
      emb.filter($"vec_id" < Similarity.NumQueries).select($"vec_id".as("query_id"), $"embedding".as("qe")),
      spark.table(vt)
    )
    val tickedRows = tickedOnly.collect()
    assert(tickedRows.nonEmpty, "ticked codes must be servable")
    assert(tickedRows.forall(_.getLong(1) >= 100L))

    // a replayed (already corpus-resident) pending batch cannot occur:
    // the serve's anti-join sources pending ids from the corpus file
    // only, and out-of-corpus ticks were persisted above — a second
    // serve returns the identical result
    val again = Pq.adcTopKAppended(spark, dir).collect()
    assert(again.map(_.toString).sameElements(served.collect().map(_.toString)))
  }

  test("stream ingest: foreachBatch ticks the code table; serve == the batch-maintained serve") {
    val dir = "/root/testdata/sf0.001"
    val want = Pq.adcTopKAppended(spark, dir).collect().map(_.toSeq).toSeq
    assert(Pq.adcTopKStreamed(spark, dir).collect().map(_.toSeq).toSeq === want,
      "the stream-maintained PQ index must answer the identical ranking contract")
    val (batches, codeRows) = Pq.lastStreamPq.get()
    assert(batches >= 2, s"the 6-file / 2-per-trigger source must drain in ≥2 micro-batches ($batches)")

    val (ct, kt, vt) = Pq.pqStreamTables(spark, dir)
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(codeRows === spark.table(kt).count())
    assert(spark.table(kt).count() === n * Pq.PqSubspaces,
      "8 code rows per drained vector — the stream indexed exactly the corpus")
    assert(spark.table(vt).count() === n, "the vector store covers the drained corpus")

    // the codebooks are the offline trainer's table verbatim — the
    // stream encoded, it never trained
    val (act, _, _) = Pq.pqAppendTables(spark, dir)
    assert(spark.table(ct).collect().map(_.toSeq).toSet ===
      spark.table(act).collect().map(_.toSeq).toSet,
      "stream-family codebooks must be the offline-trained ones verbatim")

    // a repeat serve is catalog-only: no re-ingest, ledger unchanged
    Pq.adcTopKStreamed(spark, dir).collect()
    assert(Pq.lastStreamPq.get() === ((batches, codeRows)))
  }

  test("delete: the shared tombstone list excludes victims from ADC and refine; tables untouched") {
    import spark.implicits._
    val dir = writeCorpus(60)
    val victims = (0L until 60L)
      .filter(i => i % Similarity.IvfDeleteMod == Similarity.IvfDeleteRem && i >= Similarity.NumQueries)
      .toSet
    assert(victims.nonEmpty)
    val (ct, kt, vt) = Pq.pqAppendTables(spark, dir)
    val (codes0, vecs0) = (spark.table(kt).count(), spark.table(vt).count())
    val cents0 = spark.table(ct).collect().map(_.toString).sorted

    val served = Pq.adcTopKDeleted(spark, dir).collect()
    // no victim can be served; merge-on-read leaves every table intact
    assert(served.nonEmpty && served.forall(r => !victims.contains(r.getLong(1))))
    assert(spark.table(kt).count() === codes0, "codes never rewritten by a delete")
    assert(spark.table(vt).count() === vecs0, "vector store never rewritten by a delete")
    assert(spark.table(ct).collect().map(_.toString).sorted.sameElements(cents0),
      "codebooks never retrained by a delete")

    // the DV is the SAME table sim_ivf_delete honors — one takedown
    // list for every vector index over this corpus
    assert(
      spark.table(Similarity.ivfDvTable(spark, dir)).collect().map(_.getLong(0)).toSet === victims
    )
  }

  test("stream takedown: the shared streamed tombstone feed drives the PQ serve == one-shot delete") {
    val dir = "/root/testdata/sf0.001"
    val got = Pq.adcTopKStreamDeleted(spark, dir).collect().map(_.toSeq).toSeq
    val want = Pq.adcTopKDeleted(spark, dir).collect().map(_.toSeq).toSeq
    assert(got === want, "the streamed tombstone union must serve the one-shot delete's ranking")
    // ONE takedown feed per corpus: the streamed DV the PQ serve honors
    // is the vector family's shared queue, and it equals the one-shot DV
    val ivfDv = spark.table(Similarity.ivfDvTable(spark, dir)).collect().map(_.getLong(0)).toSet
    val sDv = spark.table(Similarity.ivfStreamDvTable(spark, dir)).collect().map(_.getLong(0)).toSet
    assert(sDv === ivfDv)
  }

  test("compact: survivors ride through verbatim; DV-free serve == the MoR delete serve") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (kt, vt) = Pq.pqCompactTables(spark, dir)

    // row-level preservation: compacted codes == live codes exactly
    // (compaction drops victims, it never re-encodes survivors)
    val (codes, _, _, vecs) = Pq.adcAppendParts(spark, dir)
    val dv = spark.table(Similarity.ivfDvTable(spark, dir))
    val liveCodes = codes.join(dv, Seq("vec_id"), "left_anti")
    assert(spark.table(kt).except(liveCodes).isEmpty && liveCodes.except(spark.table(kt)).isEmpty)
    val liveVecIds = vecs.join(dv, Seq("vec_id"), "left_anti").select($"vec_id")
    val cmpVecIds = spark.table(vt).select($"vec_id")
    assert(cmpVecIds.except(liveVecIds).isEmpty && liveVecIds.except(cmpVecIds).isEmpty)
    assert(spark.table(vt).join(dv, Seq("vec_id"), "left_semi").isEmpty, "no victim survives compaction")

    // serve equality with the MoR delete serve; the compacted plan has
    // no DV anti-join anywhere
    val served = Pq.adcTopKCompacted(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq ===
      Pq.adcTopKDeleted(spark, dir).collect().map(_.toSeq).toSeq)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), "the compacted serve must be DV-free")
    val analyzed = served.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_pqcmp_codes_") && analyzed.contains("graft_pqcmp_vecs_"))
  }
}
