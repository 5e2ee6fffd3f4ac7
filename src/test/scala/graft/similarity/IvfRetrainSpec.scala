package graft.similarity

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the retrain generation's contract: the new index is trained and
  * assigned over exactly the live set (deletes folded in, no victim
  * postings), the OLD append-family generation is a byte-identical
  * bystander, and the retrained serve equals an independent from-scratch
  * recompute over the same live vectors.
  */
class IvfRetrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "ivf-retrain-spec")
  private val dir = "/root/testdata/sf0.001"

  test("sim_ivf_retrain: generation isolation, live-set reassignment, serve == from-scratch") {
    import spark.implicits._
    val (oldCt, oldAt) = Similarity.ivfAppendTables(spark, dir)
    val centsBefore = spark.table(oldCt).collect().map(_.toString).sorted.toSeq
    val postBefore = spark.table(oldAt).count()

    val (ct, at) = Similarity.ivfRetrainTables(spark, dir)

    // the old generation is untouched by the retrain build
    assert(spark.table(oldCt).collect().map(_.toString).sorted.toSeq === centsBefore)
    assert(spark.table(oldAt).count() === postBefore, "retrain must not rewrite old postings")

    // live-set reassignment: exactly one posting per live vector, none
    // for a delete victim, every cid points at a retrained centroid
    val emb = graft.Tables.embeddingsFanned(spark, dir)
    val nLive = emb
      .filter(
        !($"vec_id" % Similarity.IvfDeleteMod === Similarity.IvfDeleteRem &&
          $"vec_id" >= Similarity.NumQueries)
      )
      .count()
    val post = spark.table(at)
    assert(post.count() === nLive, "one posting per live vector")
    assert(post.select($"vec_id").distinct().count() === nLive)
    val victims = post.filter(
      $"vec_id" % Similarity.IvfDeleteMod === Similarity.IvfDeleteRem &&
        $"vec_id" >= Similarity.NumQueries
    )
    assert(victims.isEmpty, "deletes are folded into the new generation")
    val newCids = spark.table(ct).select($"cid").collect().map(_.getLong(0)).toSet
    assert(post.select($"cid").distinct().collect().forall(r => newCids.contains(r.getLong(0))))

    // the retrain actually changed the quantizer (drift/deletes folded)
    val newCents = spark.table(ct).collect().map(_.toString).sorted.toSeq
    assert(newCents !== centsBefore, "retrained quantizer must differ from the frozen one")

    // serve equality with an independent from-scratch recompute over the
    // same live vectors (training input read from the corpus, not the
    // stored postings — the two paths must agree exactly)
    val liveSrc = emb
      .filter(
        !($"vec_id" % Similarity.IvfDeleteMod === Similarity.IvfDeleteRem &&
          $"vec_id" >= Similarity.NumQueries)
      )
      .select($"vec_id", $"embedding", graft.functions.Portable.norm($"embedding").as("nrm"))
    val scratchCents = Similarity.lloydCentroids(liveSrc, Similarity.IvfAppendInitOffset)
    assert(
      scratchCents.collect().map(_.toString).sorted.toSeq === newCents,
      "stored-posting training must equal corpus training on the same live set"
    )

    val served = Similarity.annIvfRetrained(spark, dir).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty)
    // the serving plan reads the new generation's catalog artifacts
    val analyzed = Similarity.annIvfRetrained(spark, dir).queryExecution.analyzed.toString
    assert(analyzed.contains("graft_ivfrt_asg_") && analyzed.contains("graft_ivfrt_cents_"))
  }
}
