package graft.text

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the char-entropy quality signal: known-entropy
  * strings, the empty-text guard, and agreement between the map-side
  * run-fold and a driver-side recompute on real corpus rows.
  */
class EntropySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "entropy")

  private def ent(s: String): Double = {
    import spark.implicits._
    Seq(s)
      .toDF("text")
      .select(TextAnalysis.entropyBits(TextAnalysis.sortedChars($"text")).as("e"))
      .collect()
      .head
      .getDouble(0)
  }

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def refEntropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val n = s.length.toDouble
    val terms = s
      .groupBy(identity)
      .toSeq
      .sortBy(_._1) // ascending-char order, matching the fold
      .map { case (_, run) =>
        val p = run.length / n
        p * (math.log(p) / math.log(2.0))
      }
    round6(-terms.foldLeft(0.0)(_ + _))
  }

  test("known-entropy strings") {
    assert(ent("") === 0.0)
    assert(ent("aaaa") === 0.0)
    assert(ent("aabb") === 1.0)
    assert(ent("abab") === 1.0) // order-free: same histogram as aabb
    assert(ent("abcd") === 2.0)
    assert(ent("aaab") === refEntropy("aaab"))
    assert(ent("mississippi") === refEntropy("mississippi"))
  }

  test("native expression equals the declarative run-fold to the ULP on corpus rows") {
    import spark.implicits._
    val mismatches = graft.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(
        TextAnalysis.round6(
          graft.functions.TextExpressions.charEntropyBits($"text")
        ).as("native"),
        TextAnalysis.entropyBits(TextAnalysis.sortedChars($"text")).as("declarative"),
        graft.functions.TextExpressions.distinctChars($"text").as("nd_native"),
        size(array_distinct(TextAnalysis.sortedChars($"text"))).as("nd_declarative")
      )
      .filter($"native" =!= $"declarative" || $"nd_native" =!= $"nd_declarative")
      .count()
    assert(mismatches === 0L)
  }

  test("corpus rows match a driver-side recompute exactly") {
    val rows = TextAnalysis
      .charEntropy(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      assert(r.getLong(1) === t.length.toLong)
      assert(r.getLong(2) === t.toSeq.distinct.length.toLong)
      assert(r.getDouble(3) === refEntropy(t), s"doc ${r.getLong(0)}")
    }
  }
}
