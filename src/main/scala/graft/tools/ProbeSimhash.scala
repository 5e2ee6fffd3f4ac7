package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Stage probe for the capped simhash family (dev tool, feeds
  * BASELINE.md) — decomposes one cold dedup_simhash_capped run into:
  * signature production (distinct-token explode + md5 + SimhashAgg),
  * capped candidate production (the 4×16-bit band self-join under the
  * bucket cap), and the full query (verification = bit_count XOR +
  * distinct + sort). Reconstructs the banding with the same shared
  * constants the operator uses, so candidate counts line up with the
  * documented O(n²/65536)-per-band law.
  * Env: SPARK_GRAFT_PROBE_DIR.
  */
object ProbeSimhash {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/sf1")
    val spark = GraftSession.local(32, "graft-probe-simhash")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)

    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup

    var t0 = System.nanoTime()
    val sig = Dedup.simhashSignatures(spark, dir).localCheckpoint()
    val nSig = sig.count()
    println(
      s"""PROBE {"probe":"simhash_stage","stage":"signatures","dir":"$dir","rows":$nSig,""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9)}}"""
    )

    // banding identical to Dedup.simhash (shared constants)
    val banded0 = sig.select(
      $"doc_id",
      posexplode(
        array(
          (0 until Dedup.SimhashBands).map(b =>
            shiftright($"simhash", b * Dedup.SimhashBandBits)
              .bitwiseAND(lit((1L << Dedup.SimhashBandBits) - 1))
          ): _*
        )
      ).as(Seq("band", "bucket"))
    )
    t0 = System.nanoTime()
    val keep = banded0
      .groupBy($"band", $"bucket")
      .agg(count(lit(1)).as("df"))
      .filter($"df" <= Dedup.SimhashBucketCap)
      .select($"band", $"bucket")
    val banded = banded0.join(keep, Seq("band", "bucket"), "left_semi")
    val nCand = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .count()
    println(
      s"""PROBE {"probe":"simhash_stage","stage":"cand","dir":"$dir","rows":$nCand,""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9)}}"""
    )

    t0 = System.nanoTime()
    Dedup
      .simhash(spark, dir, Some(Dedup.SimhashBucketCap))
      .write
      .format("noop")
      .mode("overwrite")
      .save()
    println(
      s"""PROBE {"probe":"simhash_stage","stage":"full","dir":"$dir",""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9)}}"""
    )
    spark.stop()
  }
}
