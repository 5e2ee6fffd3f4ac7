package graft.dedup

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bloom-gated admission's three contracts: exactness (the
  * verify join removes every false positive, so the admitted set
  * equals the plain anti-join), the no-false-negative invariant (every
  * true duplicate is bloom-positive), and the scale shape (both verify
  * joins broadcast the maybe-set side; the corpus index never
  * shuffles).
  */
class BloomAdmitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "bloom-admit")
  private val dir = "/root/testdata/sf0.001"

  private def batchWithProbe() = {
    import spark.implicits._
    val indexTable = Dedup.incrementalIndexTable(spark, dir)
    val bloom = Dedup.corpusBloom(spark, dir, indexTable)
    Tables
      .documents(spark, dir)
      .filter($"doc_id" % Dedup.NewBatchMod === 0)
      .select($"doc_id", md5($"text").as("h"))
      .withColumn("maybe", graft.functions.BloomExpressions.mightContain($"h", bloom))
  }

  test("admitted set equals the exact anti-join; duplicates are never admitted") {
    import spark.implicits._
    val got = Dedup.bloomAdmit(spark, dir).select($"doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, dir)
    val batchH = docs
      .filter($"doc_id" % Dedup.NewBatchMod === 0)
      .select($"doc_id", md5($"text").as("h"))
    val corpusH = docs
      .filter($"doc_id" % Dedup.NewBatchMod =!= 0)
      .select(md5($"text").as("h"))
    val want = batchH
      .join(corpusH, Seq("h"), "left_anti")
      .select($"doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(got === want)
  }

  test("no false negatives: every batch doc whose hash is in the corpus is bloom-positive") {
    import spark.implicits._
    val probe = batchWithProbe()
    val corpusHashes = Tables
      .documents(spark, dir)
      .filter($"doc_id" % Dedup.NewBatchMod =!= 0)
      .select(md5($"text").as("h"))
      .distinct()
    val missed = probe
      .filter(!$"maybe")
      .join(corpusHashes, Seq("h"), "left_semi")
      .count()
    assert(missed === 0L, "bloom claimed 'definitely new' for a true duplicate")
  }

  test("the gate prunes: the verify path sees only dups + ~fpp of the novel docs") {
    import spark.implicits._
    val probe = batchWithProbe().cache()
    try {
      val total = probe.count()
      val maybe = probe.filter($"maybe").count()
      val trueDups = probe
        .join(
          Tables.documents(spark, dir).filter($"doc_id" % Dedup.NewBatchMod =!= 0)
            .select(md5($"text").as("h")).distinct(),
          Seq("h"),
          "left_semi"
        )
        .count()
      val novel = total - trueDups
      // maybe-set = true dups + false positives; FPs are binomial(novel,
      // fpp=0.01) — 10x slack keeps the bound sharp but non-flaky (the
      // bloom is deterministic for fixed data, so this pins the built
      // artifact, not a random draw)
      assert(maybe >= trueDups, s"maybe=$maybe < trueDups=$trueDups")
      assert(
        maybe - trueDups <= math.max(10L, (novel * Dedup.BloomFpp * 10).toLong),
        s"false-positive volume ${maybe - trueDups} of $novel novel docs exceeds 10x fpp"
      )
      assert(maybe < total, "the fast path admitted nothing - the gate is not pruning")
    } finally probe.unpersist()
  }

  test("plan: both verify joins broadcast; the admitted union stays sort-free until the final orderBy") {
    val plan = Dedup.bloomAdmit(spark, dir).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
