package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Stage probe for the capped cluster-label FIXPOINT (dev tool, feeds
  * BASELINE.md) — the r18 after-fix table left this as the last
  * superlinear one-time build term (31.3 s sf10 → 155.2 s sf30, 5× at
  * 3×), attributed to "the CC fixpoint's own edge shuffle" without a
  * decade law. This probe decomposes one labels build into:
  *
  *   1. pair production — the capped band-bucket join ([[Dedup.minhashLsh]]),
  *      timed over a warm signature cache (like the build probe);
  *   2. per-round star telemetry — edges in/out, star-construction
  *      seconds, convergence-check seconds, partition count — via the
  *      [[Dedup.connectedComponents]] probe hook.
  *
  * If edges/round or rounds grow superlinearly across decades it's a
  * data/algorithm term (candidates: large-star edge inflation before
  * contraction, round count, skewed star centers); if per-round seconds
  * grow faster than the round's edge count it's another engine cliff
  * (the r18 pattern). Env: SPARK_GRAFT_PROBE_DIR, SPARK_GRAFT_LOAD_GATE,
  * SPARK_GRAFT_LOAD_GATE_MAX_WAIT.
  */
object ProbeLabelStages {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/sf1")
    val gate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "5.0").toDouble
    val gateWait = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE_MAX_WAIT", "600").toInt
    val spark = GraftSession.local(32, "graft-probe-label-stages")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadavg: Double = os.getSystemLoadAverage
    def waitQuiet(): Double = {
      val t0 = System.nanoTime()
      while (loadavg >= gate && (System.nanoTime() - t0) / 1e9 < gateWait) Thread.sleep(5000)
      loadavg
    }
    def fmt(v: Double, dec: Int): String = String.format(java.util.Locale.ROOT, s"%.${dec}f", v)

    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warmup

    // warm the signature cache (context — identical to ProbeBuilds'
    // labels family, so rows here line up with its build_ctx rows)
    var t0 = System.nanoTime()
    val nSig = Dedup.minhashSignatures(spark, dir).count()
    println(
      s"""PROBE {"probe":"label_stage","stage":"sig_warm","dir":"$dir","rows":$nSig,""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9, 2)}}"""
    )

    val load = waitQuiet()

    // stage 1a: pre-verification candidate production (banded self-join
    // under the cap) — materialized separately so pairs_sec - cand_sec
    // attributes the verification join. NOTE this stage is NOT paid
    // twice by the real path (stage 1b recomputes it inside one query);
    // the decomposition trades one extra pass for the attribution.
    t0 = System.nanoTime()
    val nCand =
      Dedup.lshCandidates(spark, dir, Some(Dedup.MinhashBucketCap)).localCheckpoint().count()
    println(
      s"""PROBE {"probe":"label_stage","stage":"cand","dir":"$dir","rows":$nCand,""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9, 2)},"load":${fmt(load, 1)}}"""
    )

    // stage 1b: full pair production, materialized EXACTLY the way the
    // fixpoint consumes it (distinct() before the checkpoint, so
    // Catalyst's EliminateSorts removes minhashLsh's tail orderBy — the
    // raw frame would pay the global sort's range-sampling double
    // execution, which the real path never does)
    t0 = System.nanoTime()
    val pairsCk = Dedup
      .minhashLsh(spark, dir, Some(Dedup.MinhashBucketCap))
      .select($"id_a", $"id_b")
      .distinct()
      .localCheckpoint()
    val nPairs = pairsCk.count()
    println(
      s"""PROBE {"probe":"label_stage","stage":"pairs","dir":"$dir","rows":$nPairs,""" +
        s""""sec":${fmt((System.nanoTime() - t0) / 1e9, 2)},"load":${fmt(loadavg, 1)}}"""
    )

    // stage 2: the fixpoint, per-round telemetry through the probe hook
    t0 = System.nanoTime()
    val (labels, rounds) = Dedup.connectedComponents(
      pairsCk,
      r =>
        println(
          s"""PROBE {"probe":"label_stage","stage":"round","dir":"$dir","round":${r.round},""" +
            s""""edges_in":${r.edgesIn},"edges_out":${r.edgesOut},""" +
            s""""star_sec":${fmt(r.starSec, 2)},"check_sec":${fmt(r.checkSec, 2)},""" +
            s""""parts":${r.parts}}"""
        )
    )
    val nLabels = labels.count()
    println(
      s"""PROBE {"probe":"label_stage","stage":"fixpoint_total","dir":"$dir","rounds":$rounds,""" +
        s""""labeled":$nLabels,"sec":${fmt((System.nanoTime() - t0) / 1e9, 2)}}"""
    )
    spark.stop()
  }
}
