package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Stage-split attribution for the signature-index build (dev tool,
  * feeds BASELINE.md): ProbeBuilds measured the whole
  * [[Dedup.incrementalIndexTable]] build superlinear into the fourth
  * decade with NO in-JVM rerun improvement — so the term is steady, not
  * JIT/page-cache. This splits the build into its constituent stages,
  * timed separately on a fresh cache each pass, to localize it:
  *
  *   1. shingle explode + count     (the corpus scan + tokenize term)
  *   2. minhash signature aggregate (the 4-MD5-per-shingle + object-agg
  *                                   sort term)
  *   3. per-doc shingle counts      (plain long hash agg on the same
  *                                   exploded rows)
  *   4. the full build              (adds md5 + joins + parquet write)
  *
  * Env: SPARK_GRAFT_PROBE_DIR, SPARK_GRAFT_PROBE_RUNS.
  */
object ProbeSigStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/sf10")
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = GraftSession.local(32, "graft-probe-sig-stages")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def corpus = Tables.documentsFanned(spark, dir).filter($"doc_id" % Dedup.NewBatchMod =!= 0)
    def sh =
      corpus.select(
        $"doc_id",
        explode(graft.functions.TextExpressions.wordShingles(lower($"text"))).as("sh")
      )

    def timed(name: String)(f: => Unit): Unit = {
      val runs = (1 to runsPer).map { _ =>
        spark.catalog.clearCache()
        spark.catalog
          .listTables()
          .collect()
          .map(_.name)
          .filter(_.startsWith("graft_dedup_index_"))
          .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(
        s"""PROBE {"probe":"sig_stage","stage":"$name","dir":"$dir",""" +
          s""""runs_sec":[${runs.map(fmt).mkString(",")}],""" +
          s""""min_sec":${fmt(runs.min)}}"""
      )
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("shingle_explode")(sh.count(): Unit)
    timed("minhash_agg")(
      noop(
        sh.groupBy($"doc_id")
          .agg(graft.functions.MinhashAgg.minhashes($"sh", Dedup.MinhashSeeds).as("mh"))
      )
    )
    timed("shingle_counts")(noop(sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))))
    timed("full_build")(spark.table(Dedup.incrementalIndexTable(spark, dir)).count(): Unit)
    spark.stop()
  }
}
