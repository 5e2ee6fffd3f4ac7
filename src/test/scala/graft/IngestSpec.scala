package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the production ingest-tick loop end-to-end: build the
  * persisted signature index once, run two sequential batches through
  * [[Dedup.dedupBatchAgainstIndex]], append each tick's survivors with
  * [[Dedup.appendToIndex]], and pin that (a) tick 2 dedups against
  * tick-1 survivors purely via the index, and (b) the build-once
  * machinery REUSES the appended table instead of rebuilding it.
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ingest-spec")

  test("two ingest ticks: tick 2 dedups against tick-1 survivors via the appended index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-").toString
    // corpus ids avoid doc_id % NewBatchMod == 0 so the builder indexes all three
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different corpus document speaking about spark shuffles and partitions"),
      (3L, "third corpus document full of ordinary words that do not match the batches")
    )
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val t = Dedup.incrementalIndexTable(spark, dir)
    assert(spark.table(t).count() === 3L)

    val store1 = corpus.toDF("doc_id", "text")
    val dup100 = "a brand new page about catalyst expressions codegen and tungsten memory formats"
    val near101 = "another brand new page with its own unique vocabulary of streaming watermarks"
    val batch1 = Seq(
      (100L, dup100),
      (101L, near101),
      (102L, "ok bye") // zero-shingle survivor — must still be appendable and findable
    ).toDF("doc_id", "text")
    val v1 = Dedup
      .dedupBatchAgainstIndex(spark, t, batch1, store1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap
    assert(v1 === Map(100L -> 1L, 101L -> 1L, 102L -> 1L), s"fresh batch must be kept: $v1")
    val accepted1 = batch1.join(
      Dedup.dedupBatchAgainstIndex(spark, t, batch1, store1).filter($"keep" === 1L).select($"doc_id"),
      Seq("doc_id"),
      "left_semi"
    )
    Dedup.appendToIndex(spark, t, accepted1)
    assert(spark.table(t).count() === 6L, "append must add exactly the accepted docs")

    // tick 2: a byte-dup of tick-1 doc 100, a near-dup (one word changed)
    // of 101, a byte-dup of the zero-shingle 102, and a fresh doc
    val batch2 = Seq(
      (200L, dup100),
      (201L, near101.replace("watermarks", "checkpoints")),
      (203L, "ok bye"),
      (202L, "a totally fresh document about graph pagerank and triangle counting at scale")
    ).toDF("doc_id", "text")
    val store2 = store1.union(batch1) // the doc store after tick-1 accepts
    val v2 = Dedup
      .dedupBatchAgainstIndex(spark, t, batch2, store2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))))
      .toMap
    // a byte-dup is also an LSH near-dup (jaccard 1.0), so both flags fire
    assert(v2(200L) === ((1L, 100L, 0L)), s"byte-dup of a tick-1 survivor must be exact-flagged: $v2")
    assert(v2(201L)._2 === 101L, s"near-dup of a tick-1 survivor must be LSH-flagged via the index: $v2")
    assert(v2(201L)._3 === 0L, v2.toString)
    assert(v2(203L) === ((1L, -1L, 0L)), s"byte-dup of the zero-shingle survivor must be caught: $v2")
    assert(v2(202L) === ((0L, -1L, 1L)), s"fresh doc must be kept: $v2")

    // reuse, not rebuild: a fresh build-once call for the same corpus
    // fingerprint returns the SAME table, appended rows intact
    assert(Dedup.incrementalIndexTable(spark, dir) === t)
    assert(spark.table(t).count() === 6L, "build-once must not clobber appended rows")
  }

  test("index takedown: a forgotten doc's content re-admits; index rows never rewritten") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget-").toString
    val keptText = "an ordinary corpus page about columnar storage footers and row group statistics"
    val forgottenText = "the exact page that will be forgotten speaks of retention policies and purges"
    // doc 11 is the victim-to-be (11 % 10 == IndexDeleteRem == 1); doc 2 stays
    val corpus = Seq((2L, keptText), (11L, forgottenText))
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val t = Dedup.incrementalIndexTable(spark, dir)

    // batch: byte-dups of BOTH corpus docs
    val batch = Seq((100L, keptText), (105L, forgottenText)).toDF("doc_id", "text")
    val store = corpus.toDF("doc_id", "text")
    def verdicts(index: org.apache.spark.sql.DataFrame) = Dedup
      .dedupBatchAgainstIndexDf(spark, index, batch, store)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap

    // before the takedown: both batch docs are duplicates → dropped
    assert(verdicts(spark.table(t)) === Map(100L -> 0L, 105L -> 0L))

    // takedown of doc 11, merge-on-read: stored index ∖ DV
    val dv = Seq(11L).toDF("doc_id")
    val live = spark.table(t).join(dv, Seq("doc_id"), "left_anti")
    val after = verdicts(live)
    assert(after(105L) === 1L,
      "the forgotten doc's content must RE-ADMIT — its only duplicate source is gone")
    assert(after(100L) === 0L, "other admission decisions must not change")
    // the stored index itself is untouched by the takedown
    assert(spark.table(t).count() === 2L, "a takedown must never rewrite index rows")
  }

  test("index compaction: survivors ride through verbatim; admission == the MoR delete serve, DV-free plan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val want = Dedup.indexDeleted(spark, dir).collect().map(_.toSeq).toSeq
    val served = Dedup.indexCompacted(spark, dir)
    assert(served.collect().map(_.toSeq).toSeq === want,
      "compaction must not change admission verdicts — it materializes the MoR live view")

    val ct = Dedup.compactedIndexTable(spark, dir)
    val idx = spark.table(Dedup.incrementalIndexTable(spark, dir))
    val dv = spark.table(Dedup.indexDvTable(spark, dir))
    val victimIds = dv.collect().map(_.getLong(0)).toSet
    assert(victimIds.nonEmpty, "the fixture must exercise the takedown")
    assert(spark.table(ct).filter($"doc_id".isin(victimIds.toSeq: _*)).count() === 0L)
    // one narrow pass, no re-signing: survivors bit-identical
    val live = idx.join(dv, Seq("doc_id"), "left_anti")
    assert(spark.table(ct).collect().map(_.toSeq).toSet === live.collect().map(_.toSeq).toSet,
      "compacted index rows must be the stored survivors verbatim")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dedup_cidx_"), plan.take(1500))
    assert(!plan.contains("graft_dedup_dv_"), "the compacted admission must not probe a DV")
  }

  test("batch self-dedup: planted twins drop to their min-id source; real docs match dedup_incremental") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // columns: doc_id, batch_dup_of, is_exact_dup, near_dup_of, keep
    val out = Dedup.batchAdmit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(4)))
      .toMap
    val realIds = out.keys.filter(_ < Dedup.BatchTwinBase).toSeq
    // an exact twin shares its source's text byte-for-byte, so its
    // duplicate candidates are {source} ∪ {the source's own verified
    // dups} — the min-id collapse therefore lands on the source's own
    // representative when the source has one (the fixture's docs 0 and
    // 50 are genuine 0.95-jaccard near-dups, so twin(50) → 0, not 50)
    val exactSources = realIds.filter(_ % Dedup.BatchTwinMod == 0)
    assert(exactSources.nonEmpty, "the fixture must plant exact twins")
    exactSources.foreach { x =>
      val (dupOf, keep) = out(x + Dedup.BatchTwinBase)
      val expected = if (out(x)._1 >= 0L) out(x)._1 else x
      assert(dupOf === expected, s"exact twin of $x must collapse to $expected")
      assert(keep === 0L, "a twin never passes admission")
    }
    // near twins: guaranteed above threshold only when the source has
    // enough shingles (jaccard = n/(n+2) ≥ ½ needs n ≥ 2); the min-id
    // collapse may land below the source (transitive near-dups), never
    // at-or-above the twin
    val longDocs = graft.Tables.documents(spark, dir)
      .filter(size(split(lower($"text"), "[ \t]", -1)) >= 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val nearSources = realIds.filter(x => x % Dedup.BatchTwinMod == Dedup.BatchNearTwinRem && longDocs(x))
    assert(nearSources.nonEmpty, "the fixture must plant near twins on long docs")
    nearSources.foreach { x =>
      val (dupOf, keep) = out(x + Dedup.BatchTwinBase)
      assert(dupOf >= 0L && dupOf <= x, s"near twin of $x must collapse to an id ≤ $x (got $dupOf)")
      assert(keep === 0L)
    }
    // a real doc with NO intra-batch duplicate keeps the capped ingest
    // path's verdict exactly (the index arm IS dedup_incremental_capped's);
    // one WITH an intra-batch duplicate always drops
    val inc = Dedup.incrementalCapped(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    var unaffected = 0
    inc.foreach { case (id, keep) =>
      if (out(id)._1 === -1L) { assert(out(id)._2 === keep, s"real doc $id"); unaffected += 1 }
      else assert(out(id)._2 === 0L, s"real doc $id with an intra-batch dup must drop")
    }
    assert(unaffected > 0, "some real docs must be untouched by the intra-batch arm")
  }

  test("capped ingest admission is conservative: exact arm unchanged, verdicts only flip toward ADMIT") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    def verdicts(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))))
      .toMap
    val unc = verdicts(Dedup.incremental(spark, dir))
    val cap = verdicts(Dedup.incrementalCapped(spark, dir))
    assert(cap.keySet === unc.keySet, "same batch docs judged")
    cap.foreach { case (id, (exact, nearOf, keep)) =>
      val (uExact, uNearOf, uKeep) = unc(id)
      assert(exact === uExact, s"doc $id: the exact md5 admission arm must not be capped")
      // capped candidates ⊆ uncapped: a capped near-dup flag implies the
      // uncapped one (same minimum source when both flag — the min is
      // over a SUBSET, so it can only be ≥; equality when bucket kept)
      if (nearOf >= 0L) assert(uNearOf >= 0L, s"doc $id: capped near-dup not found uncapped")
      assert(keep >= uKeep, s"doc $id: a capped verdict can only flip toward ADMIT")
    }
  }

  test("stream takedown: tombstone slices accumulate; admission == the one-shot takedown") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = Dedup.incrementalIndexTable(spark, dir)
    val rowsBefore = spark.table(idx).count()

    val got = Dedup.indexStreamDeleted(spark, dir).collect().map(_.toSeq).toSeq
    val (batches, dvRows) = Dedup.lastStreamDedupDel.get()
    assert(batches >= 3, s"the 6-file / 2-per-trigger queue must drain in >=3 micro-batches ($batches)")
    assert(spark.table(idx).count() === rowsBefore, "takedown must never rewrite index rows")

    // the accumulated tombstone slices union to the one-shot victim set
    val oneShot = spark.table(Dedup.indexDvTable(spark, dir)).select($"doc_id")
    val streamed = spark.table(Dedup.indexStreamDvTable(spark, dir)).select($"doc_id")
    assert(dvRows === oneShot.count())
    assert(streamed.except(oneShot).isEmpty && oneShot.except(streamed).isEmpty)

    // admission over index \ streamed-DV == the one-shot takedown's verdicts
    val want = Dedup.indexDeleted(spark, dir).collect().map(_.toSeq).toSeq
    assert(got === want)

    // a repeat serve is catalog-only: the drain never re-runs
    Dedup.indexStreamDeleted(spark, dir).collect()
    assert(Dedup.lastStreamDedupDel.get() === ((batches, dvRows)))
  }
}
