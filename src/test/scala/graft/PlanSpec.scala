package graft

import graft.queries.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB design contracts (filters reach
  * the parquet scan, projections prune columns, small dims broadcast,
  * top-k never globally sorts). These are the properties that keep the
  * plans scale-safe, checked mechanically so regressions fail CI.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "plan-spec")
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private def scans(df: org.apache.spark.sql.DataFrame) = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan // AQE hides the tree pre-execution
      case other                    => other
    }
    root.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
  }

  test("q2 pushes filters and prunes columns at the parquet scan") {
    val scan = scans(Relational.q2FilterPushdown(spark, dir)).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
    // pruned read schema: only the 6 referenced columns of 11
    val cols = scan.requiredSchema.fieldNames.toSet
    assert(cols.size === 6, cols)
    assert(!cols.contains("l_returnflag") && !cols.contains("l_tax"), cols)
  }

  test("q3 plans a broadcast join for the small dimension (no shuffle of orders)") {
    val plan = planString(Relational.q3SegmentRevenue(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q1 aggregates with map-side partial aggregation and prunes the scan") {
    val plan = planString(Relational.q1PricingSummary(spark, dir))
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_sum"), plan) // map-side combine before the exchange
    val scan = scans(Relational.q1PricingSummary(spark, dir)).head
    assert(scan.requiredSchema.fieldNames.length === 6, scan.requiredSchema)
  }

  test("q8 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planString(Relational.q8TopK(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("+- Sort ["), plan)
  }

  test("q4 multi-join: SF-scaled tables shuffle-join at scale, fixed dims still broadcast") {
    // at sf0.001 every table fits the auto-broadcast threshold; disabling
    // it simulates SF-scaled tables out-growing it at real scale — the
    // explicit broadcast() hint on the fixed-cardinality nation dim must
    // survive while customer (SF-scaled, deliberately hint-free) falls
    // back to a shuffle join instead of OOMing on a forced broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planString(Relational.q4RegionRevenue(spark, dir))
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(broadcasts >= 1, s"expected the hinted nation broadcast to survive, plan:\n$plan")
      val shuffleJoins =
        "SortMergeJoin".r.findAllIn(plan).size + "ShuffledHashJoin".r.findAllIn(plan).size
      assert(shuffleJoins >= 2, s"expected shuffle joins for lineitem⋈orders and ⋈customer, plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("wordcount shuffles pre-aggregated words (partial_count before the exchange)") {
    val df = queries.Reference.wordcount(spark, dir)
    val plan = planString(df)
    assert(plan.contains("partial_count"), plan)
  }

  /** Joins whose condition is the Σ df² inverted-index self-join shape:
    * shingle-equality plus a doc_id inequality (`a.sh = b.sh AND
    * a.doc_id < b.doc_id`). The candidate-scoped verification join pairs
    * shingle equality with doc-id EQUALITY instead, so it doesn't match.
    */
  private def shingleSelfJoins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan
      .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
      }
      .count(c => "sh#\\d+L? = sh#\\d+".r.findFirstIn(c).isDefined && c.contains(" < "))

  test("dedup_ngram_jaccard runs the inverted-index self-join exactly once (no double compute)") {
    assert(shingleSelfJoins(graft.dedup.Dedup.ngramJaccard(spark, dir)) === 1)
  }

  test("dedup_minhash verification is candidate-scoped (no full shingle self-join)") {
    assert(shingleSelfJoins(graft.dedup.Dedup.minhashLsh(spark, dir)) === 0)
  }

  test("q22 bucketed join plans sort-merge with ZERO shuffle exchanges") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val root = Relational.q22BucketedJoin(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    val smjs = root.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, root.toString)
    // co-located bucket reads: no exchange anywhere under the join
    smjs.foreach { smj =>
      val exchanges = smj.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty, smj.toString)
    }
  }

  test("q19 windows over raw rows are partitioned (no single-task full-table funnel)") {
    // empty-partition windows are allowed ONLY over aggregated input
    // (the global percentile's bucket-summary pass — bounded by the
    // price grid's bucket count, not the row count); any window that
    // consumes raw table rows must carry a partition key
    val windows = Relational
      .q19LagLead(spark, dir)
      .queryExecution
      .optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    // sound check: every scan feeding an unpartitioned window must sit
    // BELOW an Aggregate on its path to the window — an aggregate merely
    // somewhere in the subtree (e.g. a broadcast 1-row side) must not
    // excuse raw rows flowing into the single partition
    def scansAboveAggregates(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => 0
        case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
          if (l.toString.contains("Relation")) 1 else 0
        case other => other.children.map(scansAboveAggregates).sum
      }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(scansAboveAggregates(w.child) === 0, s"unpartitioned window over raw rows:\n$w")
    }
  }

  test("q23 KMV selects k-mins via bounded aggregation — no per-group Window funnel") {
    val df = Relational.q23KmvDistinct(spark, dir)
    val windows = df.queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, df.queryExecution.optimizedPlan.toString)
    // the typed buffer aggregates map-side (partial before the exchange)
    assert(planString(df).contains("ObjectHashAggregate"), planString(df))
  }

  test("q20/q19 plans contain no exact percentile aggregate (no full-group value buffer)") {
    Seq(Relational.q20Percentiles(spark, dir), Relational.q19LagLead(spark, dir)).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"), plan)
    }
  }

  test("stats_histogram holds the q20 guarantee: fences without a percentile aggregate, fence frame broadcast") {
    val df = Relational.statsHistogram(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    // fences come from the rank-based plan, never a full-column buffer
    assert(!plan.toLowerCase.contains("percentile"), plan)
    // the per-column 1-row fence frame joins back via broadcast — the
    // corpus-side assignment pass never shuffles for the fences
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastNestedLoopJoin") || physical.contains("BroadcastExchange"), physical)
    // the serve plan contains NO file scan at all: fences and bucket
    // stats both read the shared persisted (g, v) histogram (one
    // cache-deduped entry; its populate scan — the query's only table
    // pass — lives inside the InMemoryRelation) — adding a column to
    // ANALYZE must not add a table scan
    assert(scans(df).isEmpty, physical)
  }

  test("q21_sketch_gate verifies the sketch median by rank counting, not an exact percentile buffer") {
    val plan = Relational.q21SketchGate(spark, dir).queryExecution.optimizedPlan.toString
    // percentile_approx (the sketch under test) is allowed; the exact
    // Percentile aggregate (per-group value buffer) is not
    val exactPercentiles = "(?i)\\bpercentile\\(".r.findAllIn(plan).size
    assert(exactPercentiles === 0, plan)
    assert(plan.toLowerCase.contains("percentile_approx"), plan)
  }

  test("q25 grouping sets plan one Expand over one scan (no per-set re-scan)") {
    val df = Relational.q25GroupingSets(spark, dir)
    val plan = planString(df)
    assert(plan.contains("Expand"), plan)
    assert(scans(df).size === 1, plan)
  }

  test("events_funnel is a pure aggregate/join chain — no windows over raw events") {
    val plan = graft.queries.Events.funnel(spark, dir).queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, plan.toString)
  }

  test("dedup_incremental pairs batch bands against corpus bands only (no cartesian)") {
    // materializeCandidates = false keeps the candidate subtree in the
    // logical plan so the banded join is inspectable
    val plan =
      graft.dedup.Dedup.incremental(spark, dir, materializeCandidates = false).queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach(j => assert(j.condition.nonEmpty || j.joinType.toString.contains("Semi"), j.toString))
    // the NewBatchMod split must survive optimization on both candidate sides
    assert(s"% ${graft.dedup.Dedup.NewBatchMod}".r.findAllIn(plan.toString).size >= 2, plan.toString)
  }

  test("dedup_incremental reads the persisted index — the corpus is never re-signatured") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    // lazy-candidate variant: the build-once index still triggers, and
    // the signature/shingle subtrees stay inspectable
    val df = graft.dedup.Dedup.incremental(spark, dir, materializeCandidates = false)
    val plan = df.queryExecution.optimizedPlan
    // corpus-side hashes + signatures come from the fingerprinted
    // warehouse table, not a recompute
    assert(plan.toString.contains("graft_dedup_index_"), plan.toString.take(3000))
    val batchFilter = s"% ${graft.dedup.Dedup.NewBatchMod}) = 0"
    // every minhash aggregate is batch-bounded (no corpus-wide signature pass)
    val mhAggs = plan.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.exists(_.isInstanceOf[graft.functions.MinhashAgg])) =>
        a
    }
    assert(mhAggs.nonEmpty, plan.toString.take(3000))
    mhAggs.foreach(a => assert(a.toString.contains(batchFilter), a.toString.take(2000)))
    // every shingle generator is batch-bounded or candidate-semi-join-bounded
    val gens = plan.collect {
      case g: Generate if g.generator.exists(_.isInstanceOf[graft.functions.WordShingles]) => g
    }
    assert(gens.nonEmpty, plan.toString.take(3000))
    gens.foreach { g =>
      val sub = g.toString
      assert(sub.contains(batchFilter) || sub.contains("LeftSemi"), sub.take(2000))
    }
  }

  test("dedup_incremental materializes the candidate pair set once per tick") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = graft.dedup.Dedup.incremental(spark, dir).queryExecution.optimizedPlan
    // fetch and verify must both read ONE checkpointed candidate RDD —
    // the banded join ran exactly once, inside the checkpoint
    val rddIds = plan.collect { case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id }
    assert(rddIds.size >= 2, s"expected both candidate references checkpointed, got $rddIds\n$plan")
    assert(rddIds.distinct.size === 1, s"expected one materialized candidate set, got $rddIds")
    // and no minhash aggregate survives in the outer plan (the one
    // signature pass happened inside the checkpointed subtree)
    val mhAggs = plan.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.exists(_.isInstanceOf[graft.functions.MinhashAgg])) =>
        a
    }
    assert(mhAggs.isEmpty, mhAggs.mkString("\n"))
  }

  test("dedup_cap_profile is two bounded aggregations + a broadcast cap grid — no windows, no data joins") {
    val df = graft.dedup.Dedup.capProfile(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, plan.toString)
    val phys = planString(df)
    // the only join is the |CapGrid|-row broadcast; the shingle df table
    // aggregates with map-side combine before any shuffle
    assert(!phys.contains("SortMergeJoin") && !phys.contains("ShuffledHashJoin"), phys)
    assert(phys.contains("partial_count") || phys.contains("partial_sum"), phys)
  }

  test("stream_ingest_dedup's gate never re-signatures the corpus: index scan + scalar batch signature") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val t = graft.dedup.Dedup.incrementalIndexTable(spark, dir)
    val batch = graft.Tables
      .documentsFanned(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % graft.dedup.Dedup.NewBatchMod === 0)
    val plan = graft.streaming.StreamingQueries
      .ingestDedupOn(spark, t, batch)
      .queryExecution
      .optimizedPlan
    // corpus signatures come from the persisted index table
    assert(plan.toString.contains("graft_dedup_index_"), plan.toString.take(3000))
    // the batch side uses the scalar MinhashArray — NO signature
    // aggregate anywhere (the stateless-streaming requirement)
    val mhAggs = plan.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.exists(_.isInstanceOf[graft.functions.MinhashAgg])) =>
        a
    }
    assert(mhAggs.isEmpty, mhAggs.mkString("\n"))
    assert(
      plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[graft.functions.MinhashArray]))),
      plan.toString.take(3000)
    )
  }

  test("sim_prototypes is argmax aggregation all the way down — no windows, bounded centroid broadcast only") {
    val df = graft.similarity.Similarity.prototypes(spark, dir)
    val windows = df.queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, df.queryExecution.optimizedPlan.toString)
    val phys = planString(df)
    assert(phys.contains("partial_max") || phys.contains("partial_count"), phys)
    assert(!phys.contains("SortMergeJoin") && !phys.contains("ShuffledHashJoin"), phys)
  }

  test("dedup_semantic pairs vectors within clusters only — the pair join carries the cid equi-condition") {
    val df = graft.similarity.Similarity.semanticDedup(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    // the vector-pair join is cid-bounded (never corpus × corpus)
    assert(
      joins.exists(j => j.condition.exists(c => c.toString.contains("cid") && c.toString.contains("vec_id"))),
      plan.toString.take(3000)
    )
    // conditionless joins are only the bounded centroid broadcasts
    // (≤ IvfMaxCells rows) feeding cell assignment
    joins.filter(_.condition.isEmpty).foreach { j =>
      assert(
        j.left.toString.contains("cid") || j.right.toString.contains("cid"),
        s"unexpected unconditioned join:\n${j.toString.take(1000)}"
      )
    }
  }

  test("text_lm_score scores map-side: model tables broadcast, corpus bigrams never shuffle-join") {
    val plan = planString(graft.text.TextAnalysis.lmScore(spark, dir))
    // bigram-df, unigram-df, and V all broadcast (vocabulary-sized
    // model tables; feature hashing bounds them at web scale)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 1, plan) // the 1-row V
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan) // map-side combine per doc
  }

  test("text_stratified_topk selects per-stratum k-mins via bounded aggregation — no Window funnel") {
    val df = graft.text.Sampling.stratifiedTopK(spark, dir)
    val windows = df.queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, df.queryExecution.optimizedPlan.toString)
    assert(planString(df).contains("ObjectHashAggregate"), planString(df))
  }

  test("text_decontaminate broadcasts the eval shingle set (corpus never shuffles on shingles)") {
    val df = graft.text.TextAnalysis.decontaminate(spark, dir)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // and the training corpus side must not run the Σ df² inverted-index
    // self-join shape anywhere
    assert(shingleSelfJoins(df) === 0)
  }

  test("sim_knn_graph: corpus×corpus candidates are an equi-join, never a cartesian product") {
    // pin the BUILD plan: the public knnGraph serves the session-cached
    // artifact, whose own plan is substituted by its InMemoryRelation
    val plan = graft.similarity.Similarity.knnGraphUncached(spark, dir).queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach(j => assert(j.condition.nonEmpty, j.toString))
    // and every per-source window ranks within a partition key
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
  }

  test("events_anomaly: one user-keyed window, bounded frame, pushdown-friendly scan") {
    val df = graft.queries.Events.anomaly(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    // all three aggregates share ONE window (one sort, one pass) …
    assert(windows.size === 1, plan.toString)
    // … partitioned on user_id — never a global (single-task) window …
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
    // … with the bounded trailing row frame, not an unbounded one
    assert(plan.toString.contains("RowFrame, -10, -1"), plan.toString)
    assert(!plan.toString.toLowerCase.contains("unboundedpreceding"), plan.toString)
  }

  test("events_top_paths: user-keyed lead window, partial-agg transitions, TakeOrdered cut") {
    val df = graft.queries.Events.topPaths(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.size === 1, plan.toString)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
    val physical = planString(df)
    assert(physical.contains("TakeOrderedAndProject"), physical)
    assert(physical.contains("partial_count"), physical) // map-side combine before the exchange
  }

  test("sim_quantized: top-k via the bounded aggregator, no raw-score window") {
    val df = graft.similarity.Similarity.topKQuantized(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    // the per-query top-k is the TopKByCosine Aggregator (k rows per
    // partition ship) — a Window here would shuffle every scored row
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, plan.toString)
    // 1-row quantization stats and the query set broadcast; the corpus
    // side never sits under a broadcast exchange
    val physical = planString(df)
    assert(physical.contains("BroadcastExchange"), physical)
  }

  test("text_repetition is map-side: no exchange before the final result sort") {
    val root = graft.text.TextAnalysis.repetition(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    // allowed exchanges: the test-scale fanOut round-robin (no-op on
    // multi-split inputs) and the ORDER BY range partitioning — but never
    // a hash exchange, which would mean a per-token groupBy snuck in
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 2, root.toString)
    exchanges.foreach(e =>
      assert(
        !e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning],
        e.toString
      )
    )
  }

  test("sim_pq_adc: LUT scoring joins broadcast, never cartesian") {
    val plan = planString(graft.similarity.Pq.adcTopK(spark, dir))
    // the serving scan must join the code table against the broadcast
    // LUT/codebook — a cartesian (or a shuffle of the corpus keyed on
    // raw vectors) would mean ADC stopped being a lookup pass
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sim_ivf_pq: probe gate and LUT both broadcast, never cartesian") {
    val plan = planString(graft.similarity.Pq.ivfPqTopK(spark, dir))
    // the composed index must keep both scale mechanisms intact: the
    // cell gate is an equi-join against the broadcast probe set and the
    // ADC scoring joins the broadcast LUT — a cartesian anywhere (or a
    // shuffle keyed on raw embeddings) breaks the probes/cells ×
    // code-bytes cost model that makes this the 100 TB latency path
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("phash pair generation is a banded equi-join, never cartesian") {
    // both the exact enumeration and the collapsed scale path must
    // generate candidates through the (band, bv) equi-join — a
    // cartesian (or nested-loop) fallback would be the all-pairs
    // comparison the banding exists to avoid
    for (
      df <- Seq(
        graft.multimodal.Multimodal.phashPairs(spark, dir),
        graft.multimodal.Multimodal.phashDedup(spark, dir)
      )
    ) {
      val plan = planString(df)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoop"), plan)
    }
  }

  test("text_pii_redact is a pure map pass: pruned scan, no hash exchange") {
    val df = graft.text.TextAnalysis.piiRedact(spark, dir)
    // only doc_id + text read, even though documents has 5 columns
    val scan = scans(df).head
    assert(scan.requiredSchema.fieldNames.toSet === Set("doc_id", "text"), scan.requiredSchema)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    // allowed exchanges: test-scale fanOut round-robin + ORDER BY range
    // partitioning; a hash exchange would mean the scrub stopped being
    // per-row (the property that makes it free at 100 TB)
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 2, root.toString)
    exchanges.foreach(e =>
      assert(
        !e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning],
        e.toString
      )
    )
  }

  test("text_vocab plans TakeOrdered per arity, not a global vocabulary sort") {
    val root = graft.text.TextAnalysis.vocab(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    val takeOrdered = root.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takeOrdered.size === 2, root.toString)
  }

  test("text_bm25: no corpus explode, rank derived WINDOWLESS over the TakeOrdered top-k") {
    val df = graft.text.TextAnalysis.bm25(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    val plan = root.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // rank comes from the sorted-array posexplode (withRankLimited) —
    // no WindowExec anywhere, so the unpartitioned-window warning stays
    // signal across the engine
    val windows = root.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, plan)
    // the ONLY Generate is that posexplode, fed by the K-row TakeOrdered
    // output — per-doc tf is an array-filter count, so the corpus never
    // explodes to (doc, term) rows and never shuffles on terms
    val gens = root.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty, plan)
    gens.foreach { g =>
      val bounded = g.collectFirst {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(bounded.nonEmpty, g.toString)
    }
  }

  test("q27 ranking suite shares one window exchange across both specs") {
    val root = Relational.q27WindowSuite(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    // both window specs partition by c_mktsegment: at most ONE exchange
    // may hash-partition on it — a second would mean the two specs
    // stopped sharing their shuffle (zero is legal at test scale, where
    // a single-split input satisfies any clustering)
    val segExchanges = root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] &&
            e.outputPartitioning.toString.contains("c_mktsegment") =>
        e
    }
    assert(segExchanges.size <= 1, root.toString)
    val windows = root.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size === 2, root.toString)
  }

  test("events_retention: the corpus collapses to (user, week) pairs before any join") {
    val plan = graft.queries.Events.retention(spark, dir).queryExecution.optimizedPlan
    // the (user_id, wk) distinct must sit on the SCAN side — a regression
    // that pushes it above a join would shuffle raw events through the
    // join, the exact hazard SCALING.md says this operator avoids
    val aggs = plan.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    val pairAggs = aggs.filter { a =>
      val keys = a.groupingExpressions.map(_.toString).mkString(",")
      a.groupingExpressions.size == 2 && keys.contains("user_id") && keys.contains("wk")
    }
    assert(pairAggs.nonEmpty, plan.toString)
    pairAggs.foreach { a =>
      assert(
        a.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.isEmpty,
        s"pair-distinct aggregate contains a join beneath it:\n$a"
      )
    }
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    joins.foreach(j => assert(j.condition.nonEmpty, j.toString))
  }

  test("events_json_props extracts map-side: one aggregate exchange, pruned scan") {
    val df = graft.queries.Events.jsonProps(spark, dir)
    val cols = scans(df).head.requiredSchema.fieldNames.toSet
    assert(cols === Set("event_type", "props"), cols)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    // the extraction stays inside the scan's project (map-side); the only
    // permissible hash exchange is the per-type aggregate's (zero at test
    // scale, where the single-split input already satisfies the clustering)
    val hashEx = root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
        e
    }
    assert(hashEx.size <= 1, root.toString)
    assert(root.toString.contains("partial_sum"), root.toString)
  }

  test("text_seg_dedup joins the df side on 16-byte hashes, never on segment text") {
    val plan = graft.text.TextAnalysis.segDedup(spark, dir).queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    val dfJoin = joins.filter(_.condition.exists(_.toString.contains("h#")))
    assert(dfJoin.nonEmpty, plan.toString)
    dfJoin.foreach(j => assert(!j.condition.get.toString.contains("seg_text"), j.condition.get.toString))
  }

  test("q28 unpivot plans a zero-shuffle Expand into one aggregate exchange") {
    val root = Relational.q28Unpivot(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    assert(root.toString.contains("Expand"), root.toString)
    val hashEx = root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
        e
    }
    assert(hashEx.size <= 1, root.toString)
    assert(root.toString.contains("partial"), root.toString)
    // the scan reads exactly the four measures — no id column rides along
    val cols = scans(Relational.q28Unpivot(spark, dir)).head.requiredSchema.fieldNames.toSet
    assert(cols === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"), cols)
  }

  test("q29 correlated scalar subquery decorrelates to an aggregate + join") {
    val df = Relational.q29ScalarSubquery(spark, dir)
    val optimized = df.queryExecution.optimizedPlan
    // decorrelation must leave NO subquery expression behind — a
    // surviving scalar subquery would execute per outer row
    assert(
      optimized.collectWithSubqueries { case p => p }.forall(p =>
        !p.expressions.exists(_.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery]))
      ),
      optimized.toString
    )
    val aggs = optimized.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    val joins = optimized.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(aggs.nonEmpty && joins.nonEmpty, optimized.toString)
    joins.foreach(j => assert(j.condition.nonEmpty, j.toString))
  }

  test("q31 partition pruning: the year filter is a PartitionFilter, not a data filter") {
    val scan = scans(Relational.q31PartitionPruning(spark, dir)).head
    val pf = scan.partitionFilters.map(_.toString).mkString(",")
    assert(pf.contains("o_year"), s"expected the year predicate in PartitionFilters, got: $pf")
    // pruning happens at file listing: the data-side schema carries only
    // the two referenced payload columns, never o_orderdate or o_year
    val cols = scan.requiredSchema.fieldNames.toSet
    assert(cols === Set("o_orderpriority", "o_totalprice"), cols)
  }

  test("q33 dynamic partition pruning: the dim filter reaches the fact scan at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Relational.q33DynamicPruning(spark, dir)
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // expression on o_year — the runtime filter DPP derives from the
    // broadcast dim — NOT a static year literal (none exists at compile
    // time: the filter arrives through epoch_label on the dim)
    val fact = scans(df).filter(_.requiredSchema.fieldNames.contains("o_orderpriority"))
    assert(fact.nonEmpty, scans(df).map(_.toString).mkString("\n"))
    val pf = fact.head.partitionFilters.map(_.toString).mkString(",")
    assert(pf.toLowerCase.contains("dynamicpruning"), s"PartitionFilters: $pf")
    // result invariance: identical to the statically-filtered aggregate
    val got = df.collect().map(_.toSeq).toSeq
    val want = spark
      .table(Relational.ordersByYearTable(spark, dir))
      .filter($"o_year".between(1997, 1999))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue")
      )
      .orderBy($"o_orderpriority")
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(got === want)
  }

  test("sim_ivf_pq serves from the persisted index artifacts, never a rebuild") {
    val df = graft.similarity.Pq.ivfPqTopK(spark, dir)
    val locations = scans(df).map(_.relation.location.rootPaths.mkString(","))
    // the serve must READ the four stored index artifacts: trained
    // centroids, full-corpus postings, subspace codebooks, code table —
    // re-deriving any of them would put the build's corpus-wide
    // assignment/encoding passes back into the query path
    Seq("graft_ivf_cents_", "graft_ivf_cells_", "graft_pq_cents_", "graft_pq_codes_")
      .foreach { t =>
        assert(locations.exists(_.contains(t)), s"expected a scan of $t in:\n${locations.mkString("\n")}")
      }
  }

  test("sql_q33_window (parsed surface) inherits BOTH runtime treatments: DPP + WindowGroupLimit") {
    val df = Relational.sqlQ33Window(spark, dir)
    // the parsed text's fact scan must carry the runtime dynamicpruning
    // partition filter exactly like the q33 builder plan — the epoch
    // filter only exists on the calendar dim
    val fact = scans(df).filter(_.requiredSchema.fieldNames.contains("o_orderpriority"))
    assert(fact.nonEmpty, scans(df).map(_.toString).mkString("\n"))
    val pf = fact.head.partitionFilters.map(_.toString).mkString(",")
    assert(pf.toLowerCase.contains("dynamicpruning"), s"PartitionFilters: $pf")
    // and the rank predicate must be pushed into the window as a group
    // limit, the q34 treatment — one SQL string, both optimizations
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("sql_native_text (parsed surface) binds the injected expressions — builder physical treatment") {
    val df = graft.queries.SqlSurface.nativeText(spark, dir)
    // the parsed graft_* function names must resolve to the SAME native
    // Catalyst expression classes the DataFrame builders construct
    // (GraftExtensions injection — not a UDF, not a rewrite)
    val exprClasses = df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }
      .flatten
      .flatMap(_.collect {
        case _: graft.functions.WordShingles   => "WordShingles"
        case _: graft.functions.DistinctTokens => "DistinctTokens"
        case _: graft.functions.RollingHash    => "RollingHash"
      })
      .toSet
    assert(
      exprClasses === Set("WordShingles", "DistinctTokens", "RollingHash"),
      s"parsed plan must contain all three native expressions, got $exprClasses:\n" +
        df.queryExecution.optimizedPlan
    )
    // builder treatment: ONE scan, pruned to exactly (doc_id, text) —
    // the per-doc profile is a single map pass over the corpus
    val sc = scans(df)
    assert(sc.size === 1, sc.map(_.toString).mkString("\n"))
    assert(
      sc.head.requiredSchema.fieldNames.toSet === Set("doc_id", "text"),
      sc.head.requiredSchema.treeString
    )
    // and no shuffle beyond the output sort's range exchange
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the sort exchange, found $exchanges:\n$plan")
  }

  test("q34 window top-k: the rank limit is pushed into the window as a group limit") {
    val plan = Relational.q34WindowTopK(spark, dir).queryExecution.executedPlan.toString
    // Partial group-limit on the map side (bounded top-k per group
    // before the exchange) + Final after — the shuffle carries
    // O(groups × k) rows, never the corpus
    val hits = "WindowGroupLimit".r.findAllIn(plan).size
    assert(hits >= 2, s"expected partial+final WindowGroupLimit, found $hits in:\n$plan")
  }

  test("q30 merge applies the change feed with one key join and no cartesian") {
    val plan = Relational.q30MergeUpsert(spark, dir).queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    // exactly ONE join: updates and deletes fold through a single
    // key-partitioned left join — a per-change-type join (or a join-based
    // anti filter) would multiply the snapshot shuffles
    assert(joins.size === 1, plan.toString)
    joins.foreach(j => assert(j.condition.nonEmpty, j.toString))
  }

  test("dedup_clusters: label propagation never re-derives pairs from text") {
    // the iterative phase must run on the checkpointed EDGE list alone —
    // the final plan re-reads documents only for singleton assignment
    // (+ its size-count reuse), never the shingle/minhash pipeline
    val df = graft.dedup.Dedup.clusters(spark, dir)
    // the plan must read EITHER the persisted assignment artifact (the
    // cached path) or documents-only file scans — never be scan-free
    // AND artifact-free, which would make this check vacuous
    val s = scans(df)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(s.nonEmpty || plan.contains("InMemoryRelation"), plan)
    assert(s.forall(_.metadata("Location").contains("documents.parquet")), s.mkString("\n"))
    assert(!plan.contains("wordshingles") && !plan.contains("minhash"), plan)
  }
}
