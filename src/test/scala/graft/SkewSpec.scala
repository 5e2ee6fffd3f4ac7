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

  test("hot near-dup cluster: AQE splits the skewed band-bucket join inside the REAL minhash plan") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds scaled down so test-sized data exercises the same
      // mechanism production relies on at real partition sizes
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // 600 of 800 docs are copies of one boilerplate page (crawl-mirror
      // hot cluster): identical minhash signatures put all 600 into the
      // SAME 16 band buckets, so the banded candidate join's shuffle has
      // a few giant key partitions next to thousands of singletons —
      // the genuine skew shape SCALING.md's dedup posture cites
      val dir = java.nio.file.Files.createTempDirectory("graft-hotcluster-").toString
      spark
        .range(800)
        .select(
          $"id".as("doc_id"),
          when(
            $"id" < 600,
            lit("the same boilerplate navigation text repeated across every mirror of the crawl")
          ).otherwise(
            concat(lit("unique page "), $"id", lit(" body "), md5($"id".cast("string")), lit(" tail "), md5(concat(lit("s"), $"id")))
          ).as("text")
        )
        .write
        .parquet(s"$dir/documents.parquet")
      val df = graft.dedup.Dedup.minhashLsh(spark, dir)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      // the skew mechanism by name: AQE's OptimizeSkewedJoin marks the
      // split reader — the engine's dedup plans inherit it unmodified
      assert(finalPlan.contains("skew=true"), finalPlan.take(6000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("stop-shingle cap bounds every join in the pruned-index dedup plan at Σ min(df,cap)²") {
    import spark.implicits._
    import graft.dedup.Dedup
    import org.apache.spark.sql.execution.joins.BaseJoinExec

    // hot-shingle corpus: two shingles appear in ALL n docs (the web-scale
    // boilerplate case); every other shingle is unique to its doc
    val n = 200
    val cap = 10
    val dir = java.nio.file.Files.createTempDirectory("graft-hotshingle-").toString
    spark
      .range(n)
      .select(
        $"id".as("doc_id"),
        concat(
          lit("common hot shingle here unique"),
          $"id",
          lit(" token"),
          $"id",
          lit(" word"),
          $"id"
        ).as("text")
      )
      .write
      .parquet(s"$dir/documents.parquet")

    // the declared contract: shuffle work of the capped variant is bounded
    // by Σ_sh min(df(sh), cap)² — here 2·cap² + 3n·1
    val bound = 2L * cap * cap + 3L * n

    def maxJoinRows(df: org.apache.spark.sql.DataFrame): (Long, Seq[Long]) = {
      df.collect()
      val joins = df.queryExecution.executedPlan.collect { case j: BaseJoinExec => j }
      assert(joins.nonEmpty, "expected join nodes in the dedup plan")
      val rows = joins.map(_.metrics("numOutputRows").value)
      (rows.max, rows)
    }

    // AQE off so the executed plan is a plain tree whose join metrics are
    // directly collectible (AQE wraps stages in leaf nodes)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (cappedMax, cappedAll) = maxJoinRows(Dedup.ngramJaccard(spark, dir, Some(cap)))
      assert(
        cappedAll.forall(_ <= bound),
        s"a join in the capped plan exceeded Σ min(df,cap)² = $bound: $cappedAll"
      )
      // and the cap is load-bearing: the uncapped inverted-index self-join
      // pays the hot shingles' full df² ≈ 2·C(n,2) pair rows
      val (uncappedMax, _) = maxJoinRows(Dedup.ngramJaccard(spark, dir, None))
      assert(uncappedMax > bound, s"uncapped max join rows $uncappedMax should exceed $bound")
      assert(uncappedMax >= n.toLong * (n - 1) / 2, s"hot shingle should drive ~C(n,2) pair rows")
      assert(cappedMax <= bound)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("band-bucket cap bounds the LSH candidate join on a hot cluster, keeping small-group recall") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // hot cluster: 300 exact mirrors of one page (one giant band bucket
    // per band) + unique docs + ONE planted small near-dup pair that the
    // cap must keep finding (its buckets hold 2 docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-hotbucket-").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    spark
      .range(400)
      .select(
        $"id".as("doc_id"),
        when($"id" < 300, lit("mirror boilerplate page body repeated across the crawl again and again and again"))
          .when($"id" === 398, lit(base + " rho"))
          .when($"id" === 399, lit(base + " sigma"))
          .otherwise(concat(lit("unique page "), $"id", lit(" "), md5($"id".cast("string")), lit(" "), md5(concat(lit("t"), $"id"))))
          .as("text")
      )
      .write
      .parquet(s"$dir/documents.parquet")

    def maxJoinRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val joins = df.queryExecution.executedPlan.collect { case j: BaseJoinExec => j }
      joins.map(_.metrics("numOutputRows").value).max
    }
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cap = graft.dedup.Dedup.MinhashBucketCap
      val capped = graft.dedup.Dedup.minhashLsh(spark, dir, Some(cap))
      val cappedMax = maxJoinRows(capped)
      val uncappedMax = maxJoinRows(graft.dedup.Dedup.minhashLsh(spark, dir, None))
      // the hot bucket costs ~300²×16 band-pair rows uncapped; capped,
      // every surviving bucket contributes ≤ cap² per band
      assert(uncappedMax >= 300L * 299 / 2, s"hot bucket should drive ~C(300,2) pairs, got $uncappedMax")
      assert(cappedMax < uncappedMax / 10, s"cap not load-bearing: capped=$cappedMax uncapped=$uncappedMax")
      // and the planted small near-dup group survives the cap
      val pairs = capped.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.contains((398L, 399L)), s"planted pair lost by the cap: ${pairs.take(20).mkString(",")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("simhash band cap bounds the candidate join on a boilerplate cluster, keeping small-pair recall") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // 300 byte-identical boilerplate mirrors share one simhash → one
    // 300-doc bucket in every band (the C(300,2)-pair hot spot the cap
    // exists for) + unique docs + ONE planted identical pair whose
    // buckets hold exactly 2 docs — the cap must keep finding it
    val dir = java.nio.file.Files.createTempDirectory("graft-simhash-hot-").toString
    val planted = "planted near duplicate page about spark catalyst expressions and shuffles"
    spark
      .range(400)
      .select(
        $"id".as("doc_id"),
        when($"id" < 300, lit("mirror boilerplate page body repeated across the crawl again and again and again"))
          .when($"id" >= 398, lit(planted))
          .otherwise(concat(lit("unique page "), $"id", lit(" "), md5($"id".cast("string")), lit(" "), md5(concat(lit("t"), $"id"))))
          .as("text")
      )
      .write
      .parquet(s"$dir/documents.parquet")

    def maxJoinRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val joins = df.queryExecution.executedPlan.collect { case j: BaseJoinExec => j }
      joins.map(_.metrics("numOutputRows").value).max
    }
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val capped = graft.dedup.Dedup.simhash(spark, dir, Some(graft.dedup.Dedup.SimhashBucketCap))
      val cappedMax = maxJoinRows(capped)
      val uncappedMax = maxJoinRows(graft.dedup.Dedup.simhash(spark, dir, None))
      // uncapped: the mirror bucket alone yields C(300,2) pairs per band;
      // capped: every surviving bucket contributes ≤ cap² per band
      assert(uncappedMax >= 300L * 299 / 2, s"mirror bucket should drive ~C(300,2) pairs, got $uncappedMax")
      assert(cappedMax < uncappedMax / 10, s"cap not load-bearing: capped=$cappedMax uncapped=$uncappedMax")
      val pairs = capped.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.contains((398L, 399L)), s"planted pair lost by the cap: ${pairs.take(20).mkString(",")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("connected components converge in O(log n) rounds on the worst-case chain topology") {
    import spark.implicits._
    // a 512-node path (crawl mirrors of mirrors) is the adversarial shape
    // for min-label propagation: its eccentricity is 511, so propagation
    // needs 511 rounds; large-star/small-star must finish in ~log n
    val n = 512
    val chain = spark
      .range(n - 1)
      .select(($"id" + 1000L).as("id_a"), ($"id" + 1001L).as("id_b"))
    // plus two shallow star components to mix shapes
    val stars = spark
      .range(20)
      .select(
        (lit(5000L) + ($"id" % 2) * 100L).as("id_a"),
        (lit(5001L) + ($"id" % 2) * 100L + ($"id" / 2).cast("long")).as("id_b")
      )
    val (labels, rounds) = graft.dedup.Dedup.connectedComponents(chain.union(stars))
    val byLabel = labels.groupBy($"lbl").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain: every node except the min (1000) labels to 1000
    assert(byLabel(1000L) === (n - 1).toLong, byLabel)
    // stars: members label to their min node
    assert(byLabel.contains(5000L) && byLabel.contains(5100L), byLabel)
    assert(rounds <= 12, s"expected O(log n) rounds for a $n-chain, got $rounds")
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
