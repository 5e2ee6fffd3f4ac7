package graft.text

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the trained pooled-NB classifier (`text_classifier`) against a
  * hand-computed closed form, including the alphabetical tie-break, and
  * the deterministic shard shuffle (`text_shuffle_shards`) against its
  * structural contract (partition + contiguous positions + determinism).
  */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "classifier-spec")

  private def tinyCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cls-").toString
    // train (doc_id % 5 != 0): two clean classes with disjoint vocab;
    // held-out (doc_id % 5 == 0): one doc per class + one unseen-vocab doc
    Seq(
      (1L, "aa bb", "en", "src0", 5L),
      (2L, "aa bb", "en", "src0", 5L),
      (3L, "cc dd", "de", "src0", 5L),
      (4L, "cc dd", "de", "src0", 5L),
      (5L, "aa bb", "en", "src0", 5L),
      (10L, "cc dd", "de", "src0", 5L),
      (15L, "ee", "en", "src0", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("pooled-NB scores and predictions match the closed form; ties break to the first class") {
    val dir = tinyCorpus()
    val rows = TextAnalysis
      .classify(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // model: df_en(aa)=df_en(bb)=2, df_de(cc)=df_de(dd)=2; N_en=N_de=2; V=4
    // doc 5 {aa,bb}: p_en = (3+3)/(2*(2+4)) = 0.5; p_de = (1+1)/12
    assert(rows(5L) === (("en", "en", 0.5, 1L)), rows.toString)
    assert(rows(10L) === (("de", "de", 0.5, 1L)), rows.toString)
    // doc 15 {ee}: unseen token → p_en = p_de = 1/6 — the tie must go to
    // the alphabetically first class (de), so the en label reads wrong
    assert(rows(15L)._2 === "de", s"tie must break alphabetically: $rows")
    assert(rows(15L)._3 === math.floor(1.0 / 6.0 * 1e6 + 0.5) / 1e6, rows.toString)
    assert(rows(15L)._4 === 0L, rows.toString)
    assert(rows.size === 3, "exactly the held-out docs are scored")
  }

  test("shard shuffle partitions the corpus with contiguous per-shard positions, deterministically") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val a = Sampling.shuffleShards(spark, dir)
    val rowsA = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rowsB = Sampling.shuffleShards(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rowsA.sameElements(rowsB), "pure function of doc_id: two runs must agree")
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rowsA.length.toLong === nDocs, "every doc lands in exactly one shard")
    assert(rowsA.map(_._1).distinct.length === rowsA.length)
    assert(rowsA.forall(t => t._2 >= 0 && t._2 < Sampling.ShuffleShards))
    // positions are 1..n within each shard (a valid within-shard order)
    rowsA.groupBy(_._2).foreach { case (shard, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.head === 1L && ps.last === ps.length.toLong && ps.distinct.length === ps.length,
        s"shard $shard positions must be contiguous 1..n: ${ps.take(10).mkString(",")}")
    }
    // hash-mod balance: no shard grossly over the mean (uniform md5 keys)
    val sizes = rowsA.groupBy(_._2).values.map(_.length).toSeq
    assert(sizes.max <= 3 * (nDocs / Sampling.ShuffleShards).max(1L),
      s"shard sizes should be hash-balanced: $sizes")
  }
}
