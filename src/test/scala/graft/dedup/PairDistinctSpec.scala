package graft.dedup

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distinctness precondition the single-pass recall gates rest
  * on: `Dedup.lshRecall` and `Pq.adcRecall` count each side of a
  * full-outer join on the pair id with `count(side)`, which equals the
  * old count/count/semi-join formulation ONLY while both producers emit
  * pair sets DISTINCT on the id pair — a future producer emitting a
  * duplicate pair would silently inflate the counts via join
  * multiplication instead of failing. This spec makes that precondition
  * a hard contract on every producer the gates consume.
  */
class PairDistinctSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "pair-distinct-spec")
  private val dir = "/root/testdata/sf0.001"

  private def assertDistinct(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val n = df.count()
    val d = df.selectExpr(cols: _*).distinct().count()
    assert(n > 0, s"$what: fixture must produce at least one pair")
    assert(n === d, s"$what must be distinct on (${cols.mkString(", ")}): $n rows, $d distinct")
  }

  test("lshRecall producers emit pair sets distinct on (id_a, id_b)") {
    // the exact inverted-index truth and the verified LSH pair set —
    // the two sides of lshRecall's full-outer join
    assertDistinct(Dedup.ngramJaccard(spark, dir), Seq("id_a", "id_b"), "ngramJaccard")
    assertDistinct(Dedup.minhashLsh(spark, dir), Seq("id_a", "id_b"), "minhashLsh")
  }

  test("adcRecall producers emit sets distinct on (query_id, vec_id)") {
    import graft.similarity.{Pq, Similarity}
    // the ADC side of adcRecall's full-outer join; the exact side is a
    // row_number()-filtered top-k (distinct on the pair by construction
    // of rank uniqueness), pinned here through the same serving query
    assertDistinct(
      Pq.adcTopK(spark, dir).select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"),
      "adcTopK"
    )
    // brute-force exact top-k — the truth side's serving twin
    assertDistinct(
      Similarity.topKBruteForce(spark, dir).select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"),
      "topKBruteForce"
    )
  }
}
