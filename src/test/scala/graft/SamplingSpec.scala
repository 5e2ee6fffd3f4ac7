package graft

import graft.text.Sampling
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the sampling/splitting operators. */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "sampling-spec")
  private val dir = "/root/testdata/sf0.01"

  test("hash split is a partition of all docs with ~80/10/10 proportions") {
    import spark.implicits._
    val rows = Sampling.hashSplit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, dir).count()
    assert(rows.values.sum === total)
    assert(math.abs(rows("train").toDouble / total - 0.8) < 0.06)
    assert(math.abs(rows("val").toDouble / total - 0.1) < 0.05)
    assert(math.abs(rows("test").toDouble / total - 0.1) < 0.05)
  }

  test("stratified sample is deterministic for a seed and respects strata fractions") {
    import spark.implicits._
    val s1 = Sampling.stratifiedSample(spark, dir).collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.stratifiedSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(s1 === s2, "same seed must give the same sample")
    val byLang = Sampling.stratifiedSample(spark, dir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, dir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enFrac - 0.5) < 0.15, s"en fraction $enFrac")
    val deFrac = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(math.abs(deFrac - 0.25) < 0.15, s"de fraction $deFrac")
  }
}
