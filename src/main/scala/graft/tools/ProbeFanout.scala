package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Partitioning experiment for the signature pass (dev tool): times the
  * minhash aggregate over the corpus with the fan-out width taken from
  * SPARK_GRAFT_PROBE_PARTS, to separate "the stage is starved of
  * parallel tasks" from "the per-row work is slow" at the fourth
  * decade. Env: SPARK_GRAFT_PROBE_DIR, SPARK_GRAFT_PROBE_PARTS,
  * SPARK_GRAFT_PROBE_RUNS.
  */
object ProbeFanout {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/sf30")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32").toInt
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = GraftSession.local(32, "graft-probe-fanout")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)

    // SPARK_GRAFT_PROBE_FANNED=1 routes through Tables.documentsFanned
    // (the engine's path) instead of a plain repartition — the two
    // SHOULD be identical; this probe exists because they measured 9×
    // apart at sf30
    val fanned = sys.env.get("SPARK_GRAFT_PROBE_FANNED").contains("1")
    def base =
      if (fanned) graft.Tables.documentsFanned(spark, dir)
      else spark.read.parquet(s"$dir/documents.parquet").repartition(parts)
    def sh =
      base
        .filter($"doc_id" % Dedup.NewBatchMod =!= 0)
        .select(
          $"doc_id",
          explode(graft.functions.TextExpressions.wordShingles(lower($"text"))).as("sh")
        )
    if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1")) {
      println(
        sh.groupBy($"doc_id")
          .agg(graft.functions.MinhashAgg.minhashes($"sh", Dedup.MinhashSeeds).as("mh"))
          .queryExecution.executedPlan.toString.take(4000)
      )
      spark.stop()
      return
    }
    val runs = (1 to runsPer).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      sh.groupBy($"doc_id")
        .agg(graft.functions.MinhashAgg.minhashes($"sh", Dedup.MinhashSeeds).as("mh"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(
      s"""PROBE {"probe":"fanout","dir":"$dir","parts":$parts,""" +
        s""""runs_sec":[${runs.map(fmt).mkString(",")}],"min_sec":${fmt(runs.min)}}"""
    )
    spark.stop()
  }
}
