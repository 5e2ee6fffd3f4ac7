package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling — SCALING.md's stated mitigations, demonstrated
  * mechanically: AQE splits a skewed join partition at runtime, and the
  * salted two-phase aggregation (the mitigation for one giant group key)
  * produces results identical to the direct aggregation.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8, "skew-spec")

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // 99% of fact rows share one key — the classic hot-key join. The
      // payload is md5-derived so shuffle compression can't shrink the
      // skewed partition below the detection threshold.
      val fact = spark
        .range(1000000)
        .select(
          when($"id" % 100 =!= 0, lit(7L)).otherwise($"id" % 1000).as("k"),
          concat(md5(concat(lit("x"), $"id")), md5(concat(lit("y"), $"id"))).as("payload")
        )
      val dim = spark.range(1000).select($"id".as("k"), concat(lit("d"), $"id").as("dv"))
      val joined = fact.join(dim, "k").groupBy($"dv").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum === 1000000L)
      // after execution AQE has re-planned; the skewed SMJ partition must
      // have been split (marked skew=true in the final plan)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salted two-phase aggregation equals direct aggregation on a hot key") {
    import spark.implicits._
    val words = spark
      .range(100000)
      .select(when($"id" % 10 =!= 0, lit("the")).otherwise(concat(lit("w"), $"id" % 97)).as("word"))
    val direct = words.groupBy($"word").agg(count(lit(1)).as("n"))
    // phase 1: aggregate on (word, salt) to spread the hot key over 16
    // partitions; phase 2: sum the partial counts per word
    val salted = words
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(16)))
      .groupBy($"word", $"salt")
      .agg(count(lit(1)).as("pn"))
      .groupBy($"word")
      .agg(sum($"pn").as("n"))
    val d = direct.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(s === d)
  }
}
