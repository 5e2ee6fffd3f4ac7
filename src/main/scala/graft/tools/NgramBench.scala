package graft.tools

import graft.{GraftSession, SparkEntry}

/** Focused re-measure of the dedup_ngram_jaccard bench anomaly (dev tool,
  * not part of the driver contract): 3 back-to-back runs under the exact
  * Bench methodology (warmup + noop sink) so min/max spread separates host
  * noise from a real regression.
  */
object NgramBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_ngram_jaccard", "dedup_ngram_capped")
    val spark = GraftSession.local(32, "ngram-bench")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"NGRAMBENCH $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
