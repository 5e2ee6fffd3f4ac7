package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hot path (dev tool, not part of
  * the driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "probe")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documentsFanned(spark, dir) // match the production dedup scan
    t("tokens+shingles explode")(
      docs.select($"doc_id", explode(shingles(tokens($"text"))).as("sh")).count()
    )
    val sh = docs.select($"doc_id", explode(shingles(tokens($"text"))).as("sh"))
    t("sh cached")(sh.persist().count())
    t("minhash signatures")(Dedup.minhashSignatures(spark, dir).count())
    val hexCols = col("doc_id") +: (0 until 4).map(s => md5(concat($"sh", lit(s"#$s"))).as(s"hx$s"))
    t("md5 hex only (on cached sh)")(sh.select(hexCols: _*).count())
    val hashCols = for (s <- 0 until 4; c <- 0 until 4)
      yield min(conv(substring(col(s"hx$s"), 1 + 8 * c, 8), 16, 10).cast("long")).as(s"mh${s * 4 + c}")
    t("minhash sig on cached sh")(
      sh.select(hexCols: _*).groupBy($"doc_id").agg(hashCols.head, hashCols.tail: _*).count()
    )
    t("pair common counts (self-join)")(
      sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter")).count()
    )
    t("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    t("full ngram")(Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}
