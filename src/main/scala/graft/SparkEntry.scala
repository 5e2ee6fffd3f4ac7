package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.oracle.{Oracles, PipelineOracles}
import graft.queries.{Events, Reference, Relational}
import graft.similarity.{Pq, Similarity}
import graft.streaming.StreamingQueries
import graft.text.{Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in `queries` that is SQL-expressible has a DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names; non-SQL-expressible
  * entries (q21_approx_sketches: engine-internal HLL/KLL;
  * text_stratified_sample: engine RNG) are rows-only checked, with
  * ApproxSpec/SamplingSpec bounding them instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count is the reference's own flagship workload
    * (reference tests/test_integration_02.py) — it exercises the entire
    * reference DAG: scan → flatMap → shuffle → agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Reference.wordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 superset). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference workloads (SURVEY.md §2b) + engine core
    "wordcount" -> ((s, d) => Reference.wordcount(s, d)),
    "mr_wordcount" -> ((s, d) => Reference.mrWordcount(s, d)),
    "grep" -> ((s, d) => Reference.grep(s, d, "customer")),
    // Relational superset (SURVEY.md §7 step 4)
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q2_filter_pushdown" -> ((s, d) => Relational.q2FilterPushdown(s, d)),
    "q3_segment_revenue" -> ((s, d) => Relational.q3SegmentRevenue(s, d)),
    "q4_region_revenue" -> ((s, d) => Relational.q4RegionRevenue(s, d)),
    "q5_semi_join" -> ((s, d) => Relational.q5SemiJoin(s, d)),
    "q6_anti_join" -> ((s, d) => Relational.q6AntiJoin(s, d)),
    "q7_distinct_counts" -> ((s, d) => Relational.q7DistinctCounts(s, d)),
    "q8_topk" -> ((s, d) => Relational.q8TopK(s, d)),
    "q9_union" -> ((s, d) => Relational.q9Union(s, d)),
    "q10_window_rank" -> ((s, d) => Relational.q10WindowRank(s, d)),
    "q11_window_running" -> ((s, d) => Relational.q11WindowRunning(s, d)),
    "q12_scalar_funcs" -> ((s, d) => Relational.q12ScalarFuncs(s, d)),
    "q13_rollup" -> ((s, d) => Relational.q13Rollup(s, d)),
    "q14_cube" -> ((s, d) => Relational.q14Cube(s, d)),
    "q15_max_per_group" -> ((s, d) => Relational.q15MaxPerGroup(s, d)),
    "q16_pivot" -> ((s, d) => Relational.q16Pivot(s, d)),
    "q17_json_extract" -> ((s, d) => Relational.q17JsonExtract(s, d)),
    "q18_collect_list" -> ((s, d) => Relational.q18CollectList(s, d)),
    "q19_lag_lead" -> ((s, d) => Relational.q19LagLead(s, d)),
    "q20_percentiles" -> ((s, d) => Relational.q20Percentiles(s, d)),
    "q21_approx_sketches" -> ((s, d) => Relational.q21ApproxSketches(s, d)),
    "q21_sketch_gate" -> ((s, d) => Relational.q21SketchGate(s, d)),
    "q22_bucketed_join" -> ((s, d) => Relational.q22BucketedJoin(s, d)),
    "q23_kmv_distinct" -> ((s, d) => Relational.q23KmvDistinct(s, d)),
    "q24_set_ops" -> ((s, d) => Relational.q24SetOps(s, d)),
    "q25_grouping_sets" -> ((s, d) => Relational.q25GroupingSets(s, d)),
    "q26_range_frame" -> ((s, d) => Relational.q26RangeFrame(s, d)),
    "q27_window_suite" -> ((s, d) => Relational.q27WindowSuite(s, d)),
    "q28_unpivot" -> ((s, d) => Relational.q28Unpivot(s, d)),
    "q29_scalar_subquery" -> ((s, d) => Relational.q29ScalarSubquery(s, d)),
    "q30_merge_upsert" -> ((s, d) => Relational.q30MergeUpsert(s, d)),
    "q31_partition_pruning" -> ((s, d) => Relational.q31PartitionPruning(s, d)),
    "q33_dynamic_pruning" -> ((s, d) => Relational.q33DynamicPruning(s, d)),
    "q34_window_topk" -> ((s, d) => Relational.q34WindowTopK(s, d)),
    "q32_salted_join" -> ((s, d) => Relational.q32SaltedJoin(s, d)),
    "stats_profile" -> ((s, d) => Relational.statsProfile(s, d)),
    "stats_corr" -> ((s, d) => Relational.statsCorr(s, d)),
    "stats_histogram" -> ((s, d) => Relational.statsHistogram(s, d)),
    // SQL-string surface: the SAME ANSI text the DuckDB oracle runs,
    // executed by Catalyst over temp views (graft.queries.SqlSurface)
    "sql_q1_pricing" -> ((s, d) => graft.queries.SqlSurface.sql(s, d, Oracles.q1PricingSummary)),
    "sql_q3_segment" -> ((s, d) => graft.queries.SqlSurface.sql(s, d, Oracles.q3SegmentRevenue)),
    "sql_q4_region" -> ((s, d) => graft.queries.SqlSurface.sql(s, d, Oracles.q4RegionRevenue)),
    "sql_q8_topk" -> ((s, d) => graft.queries.SqlSurface.sql(s, d, Oracles.q8TopK)),
    "sql_q10_window" -> ((s, d) => graft.queries.SqlSurface.sql(s, d, Oracles.q10WindowRank)),
    // parsed-surface DPP + WindowGroupLimit in one SQL string
    "sql_q33_window" -> ((s, d) => Relational.sqlQ33Window(s, d)),
    // raw SQL text through the INJECTED native expressions
    "sql_native_text" -> ((s, d) => graft.queries.SqlSurface.nativeText(s, d)),
    "layout_zorder" -> ((s, d) => graft.queries.Layout.zorderScan(s, d)),
    "layout_compact" -> ((s, d) => graft.queries.Layout.compactScan(s, d)),
    "layout_pruned_scan" -> ((s, d) => graft.queries.Layout.prunedScan(s, d)),
    "layout_incremental" -> ((s, d) => graft.queries.Layout.incrementalScan(s, d)),
    "layout_snapshot" -> ((s, d) => graft.queries.Layout.snapshotScan(s, d)),
    "layout_vacuum" -> ((s, d) => graft.queries.Layout.vacuumScan(s, d)),
    "layout_deletes" -> ((s, d) => graft.queries.Layout.morScan(s, d)),
    "stream_layout_takedown" -> ((s, d) => graft.queries.Layout.streamTakedownScan(s, d)),
    "stream_layout_takedown_pruned" -> ((s, d) => graft.queries.Layout.streamTakedownPrunedScan(s, d)),
    "mv_incremental" -> ((s, d) => graft.queries.Layout.mvServe(s, d)),
    "mv_snapshot" -> ((s, d) => graft.queries.Layout.mvSnapshotServe(s, d)),
    "mv_vacuum" -> ((s, d) => graft.queries.Layout.mvVacuumServe(s, d)),
    "layout_schema_evolution" -> ((s, d) => graft.queries.Layout.schemaEvolutionScan(s, d)),
    "layout_spec_evolution" -> ((s, d) => graft.queries.Layout.specEvolutionScan(s, d)),
    "layout_changes" -> ((s, d) => graft.queries.Layout.changesScan(s, d)),
    "layout_snapshot_deletes" -> ((s, d) => graft.queries.Layout.snapshotDeletesScan(s, d)),
    "sim_ivf_delete" -> ((s, d) => graft.similarity.Similarity.annIvfDeleted(s, d)),
    "sim_ivf_balance" -> ((s, d) => graft.similarity.Similarity.ivfBalance(s, d)),
    "sim_ivf_retrain" -> ((s, d) => graft.similarity.Similarity.annIvfRetrained(s, d)),
    "stream_ivf_takedown" -> ((s, d) => graft.similarity.Similarity.annIvfStreamDeleted(s, d)),
    "sim_ivf_compact" -> ((s, d) => graft.similarity.Similarity.annIvfCompacted(s, d)),
    "stream_ivf_ingest" -> ((s, d) => graft.similarity.Similarity.ivfStreamServe(s, d)),
    "sim_hard_negatives" -> ((s, d) => graft.similarity.Similarity.hardNegatives(s, d)),
    "sim_decontaminate" -> ((s, d) => graft.similarity.Similarity.decontaminate(s, d)),
    "pipeline_triplets" -> ((s, d) => graft.similarity.Similarity.trainingTriplets(s, d)),
    "mv_from_changes" -> ((s, d) => graft.queries.Layout.mvFromChangesServe(s, d)),
    // Iterative graph computation
    "graph_pagerank" -> ((s, d) => graft.graph.PageRank.pagerank(s, d)),
    "graph_triangles" -> ((s, d) => graft.graph.Triangles.triangles(s, d)),
    // Event-time windowing
    "events_tumbling" -> ((s, d) => Events.tumbling(s, d)),
    "events_hopping" -> ((s, d) => Events.hopping(s, d)),
    "events_sessions" -> ((s, d) => Events.sessions(s, d)),
    "events_asof" -> ((s, d) => Events.asofPurchase(s, d)),
    "events_range_join" -> ((s, d) => Events.rangeJoinPairs(s, d)),
    "events_resample" -> ((s, d) => Events.resample(s, d)),
    "events_funnel" -> ((s, d) => Events.funnel(s, d)),
    "events_retention" -> ((s, d) => Events.retention(s, d)),
    "events_json_props" -> ((s, d) => Events.jsonProps(s, d)),
    "events_anomaly" -> ((s, d) => Events.anomaly(s, d)),
    "events_top_paths" -> ((s, d) => Events.topPaths(s, d)),
    "events_scd2" -> ((s, d) => Events.scd2(s, d)),
    // Structured Streaming surface
    "stream_tumbling" -> ((s, d) => StreamingQueries.tumbling(s, d)),
    "stream_user_stats" -> ((s, d) => StreamingQueries.userStats(s, d)),
    "stream_sessions" -> ((s, d) => StreamingQueries.sessionizeComplete(s, d)),
    "stream_interval_join" -> ((s, d) => StreamingQueries.intervalJoin(s, d)),
    "stream_dedup" -> ((s, d) => StreamingQueries.dedupStream(s, d)),
    "stream_curate" -> ((s, d) => StreamingQueries.curateStream(s, d)),
    "stream_enrich" -> ((s, d) => StreamingQueries.enrichStream(s, d)),
    "stream_anomaly" -> ((s, d) => StreamingQueries.anomalyStream(s, d)),
    "stream_ingest_dedup" -> ((s, d) => StreamingQueries.ingestDedupStream(s, d)),
    "stream_heavy_hitters" -> ((s, d) => StreamingQueries.heavyHittersStream(s, d)),
    "stream_semantic_admit" -> ((s, d) => StreamingQueries.semanticAdmitStream(s, d)),
    "stream_scd2" -> ((s, d) => StreamingQueries.scd2Stream(s, d)),
    "stream_layout_ingest" -> ((s, d) => graft.queries.Layout.streamIngestScan(s, d)),
    "stream_mv_ingest" -> ((s, d) => graft.queries.Layout.streamMvServe(s, d)),
    // Deduplication (LLM-pipeline north star)
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_incremental" -> ((s, d) => Dedup.incremental(s, d)),
    "dedup_index_delete" -> ((s, d) => Dedup.indexDeleted(s, d)),
    "stream_dedup_takedown" -> ((s, d) => Dedup.indexStreamDeleted(s, d)),
    "dedup_incremental_capped" -> ((s, d) => Dedup.incrementalCapped(s, d)),
    "dedup_batch_admit" -> ((s, d) => Dedup.batchAdmit(s, d)),
    "dedup_index_compact" -> ((s, d) => Dedup.indexCompacted(s, d)),
    "dedup_bloom_admit" -> ((s, d) => Dedup.bloomAdmit(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "dedup_containment_capped" -> ((s, d) => Dedup.containment(s, d, Some(Dedup.NgramDfCap))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_ngram_capped" -> ((s, d) => Dedup.ngramJaccard(s, d, maxShingleDf = Some(Dedup.NgramDfCap))),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_minhash_capped" -> ((s, d) => Dedup.minhashLsh(s, d, Some(Dedup.MinhashBucketCap))),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_simhash_capped" -> ((s, d) => Dedup.simhash(s, d, Some(Dedup.SimhashBucketCap))),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_clusters_capped" -> ((s, d) => Dedup.clusters(s, d, Some(Dedup.MinhashBucketCap))),
    "dedup_keep_best" -> ((s, d) => graft.text.Curation.keepBest(s, d)),
    "dedup_keep_best_capped" -> ((s, d) =>
      graft.text.Curation.keepBest(s, d, Some(Dedup.MinhashBucketCap))),
    "dedup_lsh_recall" -> ((s, d) => Dedup.lshRecall(s, d)),
    "dedup_cap_profile" -> ((s, d) => Dedup.capProfile(s, d)),
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "dedup_semantic_capped" -> ((s, d) => Similarity.semanticDedup(s, d, Some(Similarity.SemanticCellCap))),
    // Similarity search
    "sim_topk" -> ((s, d) => Similarity.topKBruteForce(s, d)),
    "sim_topk_agg" -> ((s, d) => Similarity.topKAggregated(s, d)),
    "sim_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "sim_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "sim_ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "sim_ivf_persisted" -> ((s, d) => Similarity.annIvfPersisted(s, d)),
    "sim_ivf_append" -> ((s, d) => Similarity.annIvfAppended(s, d)),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "sim_prototypes" -> ((s, d) => Similarity.prototypes(s, d)),
    "sim_quantized" -> ((s, d) => Similarity.topKQuantized(s, d)),
    "sim_pq_adc" -> ((s, d) => Pq.adcTopK(s, d)),
    "sim_pq_recall" -> ((s, d) => Pq.adcRecall(s, d)),
    "sim_ivf_pq" -> ((s, d) => Pq.ivfPqTopK(s, d)),
    "sim_ivf_pq_delete" -> ((s, d) => Pq.ivfPqTopKDeleted(s, d)),
    "sim_hybrid_rerank" -> ((s, d) => Similarity.hybridRerank(s, d)),
    "sim_hybrid_rerank_pq" -> ((s, d) => Similarity.hybridRerankPq(s, d)),
    "sim_ann_filtered" -> ((s, d) => Similarity.annIvfFiltered(s, d)),
    "sim_mmr_diversify" -> ((s, d) => Similarity.mmrDiversify(s, d)),
    "sim_pq_append" -> ((s, d) => graft.similarity.Pq.adcTopKAppended(s, d)),
    "stream_pq_ingest" -> ((s, d) => graft.similarity.Pq.adcTopKStreamed(s, d)),
    "sim_pq_delete" -> ((s, d) => graft.similarity.Pq.adcTopKDeleted(s, d)),
    "stream_pq_takedown" -> ((s, d) => graft.similarity.Pq.adcTopKStreamDeleted(s, d)),
    "sim_pq_compact" -> ((s, d) => graft.similarity.Pq.adcTopKCompacted(s, d)),
    // Text analysis
    "text_langid" -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "text_pii_redact" -> ((s, d) => TextAnalysis.piiRedact(s, d)),
    "text_repetition" -> ((s, d) => TextAnalysis.repetition(s, d)),
    "text_dup_spans" -> ((s, d) => TextAnalysis.dupSpans(s, d)),
    "text_seg_dedup" -> ((s, d) => TextAnalysis.segDedup(s, d)),
    "text_decontaminate" -> ((s, d) => TextAnalysis.decontaminate(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "text_lm_score" -> ((s, d) => TextAnalysis.lmScore(s, d)),
    "text_bm25" -> ((s, d) => TextAnalysis.bm25(s, d)),
    "text_bm25_append" -> ((s, d) => TextAnalysis.bm25Append(s, d)),
    "text_bm25_delete" -> ((s, d) => TextAnalysis.bm25Deleted(s, d)),
    "text_bm25_compact" -> ((s, d) => TextAnalysis.bm25Compacted(s, d)),
    "stream_bm25_takedown" -> ((s, d) => TextAnalysis.bm25StreamDeleted(s, d)),
    "stream_bm25_ingest" -> ((s, d) => TextAnalysis.bm25StreamServe(s, d)),
    "text_cdc_chunks" -> ((s, d) => TextAnalysis.cdcChunks(s, d)),
    "text_vocab" -> ((s, d) => TextAnalysis.vocab(s, d)),
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "text_entropy" -> ((s, d) => TextAnalysis.charEntropy(s, d)),
    "text_bpe_pairs" -> ((s, d) => graft.text.Bpe.pairStats(s, d)),
    "text_bpe_encode" -> ((s, d) => graft.text.Bpe.encodeDocs(s, d)),
    "text_bpe_encode_capped" -> ((s, d) => graft.text.Bpe.encodeDocsCapped(s, d)),
    "text_classifier" -> ((s, d) => TextAnalysis.classify(s, d)),
    "text_hash_split" -> ((s, d) => Sampling.hashSplit(s, d)),
    "text_shuffle_shards" -> ((s, d) => Sampling.shuffleShards(s, d)),
    "text_domain_mix" -> ((s, d) => Sampling.domainMix(s, d)),
    "pipeline_curate" -> ((s, d) => graft.text.Curation.curate(s, d)),
    "pipeline_curate_fuzzy" -> ((s, d) => graft.text.Curation.curateFuzzy(s, d)),
    // capped twins: the SAME composed flows on the band-bucket-capped
    // cluster-label edge source — the production (100 TB) path, where
    // the uncapped LSH fixpoint is the known quadratic term
    "pipeline_curate_fuzzy_capped" -> ((s, d) =>
      graft.text.Curation.curateFuzzy(s, d, Some(Dedup.MinhashBucketCap))),
    "pipeline_multimodal" -> ((s, d) => graft.text.Curation.curateMultimodal(s, d)),
    "pipeline_pretrain" -> ((s, d) => graft.text.Curation.pretrain(s, d)),
    "pipeline_pretrain_capped" -> ((s, d) =>
      graft.text.Curation.pretrain(s, d, Some(Dedup.MinhashBucketCap))),
    "pipeline_pretrain_semantic" -> ((s, d) => graft.text.Curation.pretrainSemantic(s, d)),
    "pipeline_pretrain_semantic_capped" -> ((s, d) =>
      graft.text.Curation.pretrainSemantic(s, d, Some(Dedup.MinhashBucketCap))),
    "text_pack_blocks" -> ((s, d) => Sampling.packBlocks(s, d)),
    "text_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "text_stratified_topk" -> ((s, d) => Sampling.stratifiedTopK(s, d)),
    // Multimodal binary-column plumbing
    "mm_meta" -> ((s, d) => Multimodal.meta(s, d)),
    "mm_extract" -> ((s, d) => Multimodal.extract(s, d)),
    "mm_phash" -> ((s, d) => Multimodal.phash(s, d)),
    "mm_phash_png" -> ((s, d) => Multimodal.phashPng(s, d)),
    "mm_phash_jpeg" -> ((s, d) => Multimodal.phashJpeg(s, d)),
    "mm_phash_gif" -> ((s, d) => Multimodal.phashGif(s, d)),
    "mm_phash_pairs" -> ((s, d) => Multimodal.phashPairs(s, d)),
    "mm_phash_dedup" -> ((s, d) => Multimodal.phashDedup(s, d)),
    "mm_audio_energy" -> ((s, d) => Multimodal.audioEnergy(s, d)),
    "mm_frames" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_resize" -> ((s, d) => Multimodal.resizePlan(s, d))
  )

  /** DuckDB-equivalent SQL per query (column names match the Spark side). */
  def oracleSql: Map[String, String] = Map(
    "wordcount" -> Oracles.wordcount,
    "mr_wordcount" -> Oracles.mrWordcount,
    "grep" -> Oracles.grep("customer"),
    "q1_pricing_summary" -> Oracles.q1PricingSummary,
    "q2_filter_pushdown" -> Oracles.q2FilterPushdown,
    "q3_segment_revenue" -> Oracles.q3SegmentRevenue,
    "q4_region_revenue" -> Oracles.q4RegionRevenue,
    "q5_semi_join" -> Oracles.q5SemiJoin,
    "q6_anti_join" -> Oracles.q6AntiJoin,
    "q7_distinct_counts" -> Oracles.q7DistinctCounts,
    "q8_topk" -> Oracles.q8TopK,
    "q9_union" -> Oracles.q9Union,
    "q10_window_rank" -> Oracles.q10WindowRank,
    "q11_window_running" -> Oracles.q11WindowRunning,
    "q12_scalar_funcs" -> Oracles.q12ScalarFuncs,
    "q13_rollup" -> Oracles.q13Rollup,
    "q14_cube" -> Oracles.q14Cube,
    "q15_max_per_group" -> Oracles.q15MaxPerGroup,
    "q16_pivot" -> Oracles.q16Pivot,
    "q17_json_extract" -> Oracles.q17JsonExtract,
    "q18_collect_list" -> Oracles.q18CollectList,
    "q19_lag_lead" -> Oracles.q19LagLead,
    "q20_percentiles" -> Oracles.q20Percentiles,
    "q21_sketch_gate" -> Oracles.q21SketchGate,
    "q22_bucketed_join" -> Oracles.q22BucketedJoin,
    "q23_kmv_distinct" -> Oracles.q23KmvDistinct,
    "q24_set_ops" -> Oracles.q24SetOps,
    "q25_grouping_sets" -> Oracles.q25GroupingSets,
    "q26_range_frame" -> Oracles.q26RangeFrame,
    "q27_window_suite" -> Oracles.q27WindowSuite,
    "q28_unpivot" -> Oracles.q28Unpivot,
    "q29_scalar_subquery" -> Oracles.q29ScalarSubquery,
    "q30_merge_upsert" -> Oracles.q30MergeUpsert,
    "q31_partition_pruning" -> Oracles.q31PartitionPruning,
    // DPP changes which partitions are read, never the result: the
    // oracle replays the dim-filtered star join from the raw tables
    "q33_dynamic_pruning" -> Oracles.q33DynamicPruning,
    "q34_window_topk" -> Oracles.q34WindowTopK,
    // the oracle is the UNSALTED join: salting must be result-invariant
    "q32_salted_join" -> Oracles.q32SaltedJoin,
    "stats_profile" -> Oracles.statsProfile,
    "stats_corr" -> Oracles.statsCorr,
    "stats_histogram" -> Oracles.statsHistogram,
    // one query text, two engines: the oracle IS the statement
    "sql_q1_pricing" -> Oracles.q1PricingSummary,
    "sql_q3_segment" -> Oracles.q3SegmentRevenue,
    "sql_q4_region" -> Oracles.q4RegionRevenue,
    "sql_q8_topk" -> Oracles.q8TopK,
    "sql_q10_window" -> Oracles.q10WindowRank,
    "sql_q33_window" -> Oracles.sqlQ33Window,
    "sql_native_text" -> PipelineOracles.sqlNativeText,
    "layout_zorder" -> Oracles.layoutZorder,
    "layout_compact" -> Oracles.layoutCompact,
    // same result contract as the unpruned clustered scan
    "layout_pruned_scan" -> Oracles.layoutZorder,
    // the incrementally-maintained layout answers with the identical
    // full-table contract — maintenance must lose nothing
    "layout_incremental" -> Oracles.layoutZorder,
    // snapshot v replayed from the raw table via the tick predicates
    "layout_snapshot" -> Oracles.layoutSnapshot,
    // post-vacuum reads replayed from the raw table — expiry must
    // delete nothing a retained snapshot references
    "layout_vacuum" -> Oracles.layoutVacuum,
    // both serve paths (DV anti-join, post-purge layout) answer the
    // equality-delete live set the oracle computes from the raw table
    "layout_deletes" -> Oracles.layoutDeletes,
    // N streamed partial DV commits == the one-shot delete's live set
    "stream_layout_takedown" -> Oracles.streamLayoutTakedown,
    "stream_layout_takedown_pruned" -> Oracles.streamLayoutTakedownPruned,
    // tick-maintained MV must answer the full-table aggregate exactly
    "mv_incremental" -> Oracles.mvIncremental,
    // every stored MV version == a full refresh at that commit
    "mv_snapshot" -> Oracles.mvSnapshot,
    // retained versions after expiry == full refreshes at those commits
    "mv_vacuum" -> Oracles.mvVacuum,
    // evolved-column presence replayed through the tick predicates
    "layout_schema_evolution" -> Oracles.layoutSchemaEvolution,
    // per-segment-spec pruning + residual == the raw-table date window
    "layout_spec_evolution" -> Oracles.layoutSpecEvolution,
    // the stream-maintained MV answers the same full-table contract
    "stream_mv_ingest" -> Oracles.mvIncremental,
    // per-commit change rows replayed via the slice/delete predicates
    "layout_changes" -> Oracles.layoutChanges,
    // as-of v applies only delete commits ≤ v (v2 still serves the
    // rows v3's DV drops)
    "layout_snapshot_deletes" -> Oracles.layoutSnapshotDeletes,
    // CDF-driven MV (delete commit as negative deltas) must equal the
    // net-of-commits aggregate on the raw table
    "mv_from_changes" -> Oracles.mvFromChanges,
    "graph_pagerank" -> Oracles.graphPagerank(
      graft.graph.PageRank.Iterations,
      graft.graph.PageRank.Scale
    ),
    "graph_triangles" -> PipelineOracles.graphTriangles,
    // q21_approx_sketches intentionally has no oracle: HLL/KLL sketch
    // internals are engine-specific (rows-only check; ApproxSpec bounds
    // the error against exact counts, and q21_sketch_gate hash-checks
    // the exact columns + the error-bound invariants).
    "events_tumbling" -> Oracles.eventsTumbling,
    "events_hopping" -> Oracles.eventsHopping,
    "events_sessions" -> Oracles.eventsSessions,
    "events_asof" -> Oracles.eventsAsof,
    "events_range_join" -> Oracles.eventsRangeJoin,
    "events_resample" -> Oracles.eventsResample,
    "events_funnel" -> Oracles.eventsFunnel,
    "events_retention" -> Oracles.eventsRetention,
    "events_json_props" -> Oracles.eventsJsonProps,
    "events_anomaly" -> Oracles.eventsAnomaly(Events.AnomWindow, Events.AnomMinPrior, Events.AnomZ, Events.AnomScale),
    "events_top_paths" -> Oracles.eventsTopPaths(Events.PathsTopK),
    "events_scd2" -> Oracles.eventsScd2,
    // the streaming build emits the identical dimension (same oracle)
    "stream_scd2" -> Oracles.eventsScd2,
    // the stream-committed layout answers the same box-scan contract
    "stream_layout_ingest" -> Oracles.layoutZorder,
    "stream_tumbling" -> PipelineOracles.streamTumbling,
    "stream_user_stats" -> PipelineOracles.streamUserStats,
    // the drained streaming sessionizer equals the batch session_window
    "stream_sessions" -> Oracles.eventsSessions,
    "stream_interval_join" -> PipelineOracles.streamIntervalJoin,
    "stream_dedup" -> PipelineOracles.streamDedup,
    "stream_curate" -> PipelineOracles.streamCurate,
    "stream_enrich" -> PipelineOracles.streamEnrich,
    "stream_ingest_dedup" -> PipelineOracles.streamIngestDedup,
    // identical output contract to the batch CMS query
    "stream_heavy_hitters" -> PipelineOracles.textHeavyHitters,
    "stream_semantic_admit" -> PipelineOracles.streamSemanticAdmit,
    // the drained streaming scorer equals the batch anomaly operator
    "stream_anomaly" -> Oracles.eventsAnomaly(Events.AnomWindow, Events.AnomMinPrior, Events.AnomZ, Events.AnomScale),
    "dedup_exact" -> PipelineOracles.dedupExact,
    "dedup_incremental" -> PipelineOracles.dedupIncremental,
    // admission replayed with victims absent from both duplicate sources
    "dedup_index_delete" -> PipelineOracles.dedupIndexDelete,
    // N streamed forget slices == the one-shot takedown's admission
    "stream_dedup_takedown" -> PipelineOracles.dedupIndexDelete,
    // compaction materializes index ∖ DV: identical verdicts, identical oracle
    "dedup_index_compact" -> PipelineOracles.dedupIndexDelete,
    // hot index buckets leave before the batch×index candidate join
    "dedup_incremental_capped" -> PipelineOracles.dedupIncrementalCapped,
    // intra-batch exact + verified-near arms replayed over the same
    // planted arrivals, then the capped index checks
    "dedup_batch_admit" -> PipelineOracles.dedupBatchAdmit,
    "dedup_bloom_admit" -> PipelineOracles.dedupBloomAdmit,
    "dedup_containment" -> PipelineOracles.dedupContainment,
    "dedup_containment_capped" -> PipelineOracles.dedupContainmentCapped(Dedup.NgramDfCap),
    "dedup_ngram_jaccard" -> PipelineOracles.dedupNgramJaccard,
    // the extreme-scale stop-shingle-capped path, verified uncapped
    "dedup_ngram_capped" -> PipelineOracles.dedupNgramCapped(Dedup.NgramDfCap),
    "dedup_minhash" -> PipelineOracles.dedupMinhash,
    "dedup_minhash_capped" -> PipelineOracles.dedupMinhashCapped,
    "dedup_simhash" -> PipelineOracles.dedupSimhash,
    "dedup_simhash_capped" -> PipelineOracles.dedupSimhashCapped,
    "dedup_embedding" -> PipelineOracles.dedupEmbedding,
    "dedup_clusters" -> PipelineOracles.dedupClusters,
    "dedup_clusters_capped" -> PipelineOracles.dedupClustersCapped,
    "dedup_keep_best" -> PipelineOracles.dedupKeepBest,
    "dedup_keep_best_capped" -> PipelineOracles.dedupKeepBestCapped,
    "dedup_lsh_recall" -> PipelineOracles.dedupLshRecall,
    "dedup_cap_profile" -> PipelineOracles.dedupCapProfile,
    "dedup_semantic" -> PipelineOracles.dedupSemantic,
    "dedup_semantic_capped" -> PipelineOracles.dedupSemanticCapped(Similarity.SemanticCellCap),
    "sim_topk" -> PipelineOracles.simTopK,
    "sim_topk_agg" -> PipelineOracles.simTopK, // identical output contract
    "sim_range_search" -> PipelineOracles.simRangeSearch,
    "sim_ann_lsh" -> PipelineOracles.simAnnLsh,
    "sim_ann_ivf" -> PipelineOracles.simAnnIvf,
    // served from the stored quantizer: same trained centroids, same
    // result, same oracle — durability must not change the answer
    "sim_ivf_persisted" -> PipelineOracles.simAnnIvf,
    "sim_ivf_append" -> PipelineOracles.simIvfAppend,
    // post-delete serve: same index replay, victims excluded from the
    // candidate set only
    "sim_ivf_delete" -> PipelineOracles.simIvfDelete,
    // cell census + drift + priced retrain trigger off the stored postings
    "sim_ivf_balance" -> PipelineOracles.simIvfBalance,
    // fresh quantizer over the live set; old generation untouched
    "sim_ivf_retrain" -> PipelineOracles.simIvfRetrain,
    // N streamed tombstone slices == the one-shot delete's serve
    "stream_ivf_takedown" -> PipelineOracles.simIvfDelete,
    // the compacted table IS the MoR serve's live set materialized:
    // identical answer, identical oracle
    "sim_ivf_compact" -> PipelineOracles.simIvfDelete,
    // the stream-maintained index answers the identical top-k contract
    "stream_ivf_ingest" -> PipelineOracles.simIvfAppend,
    "sim_knn_graph" -> PipelineOracles.simKnnGraph,
    "sim_prototypes" -> PipelineOracles.simPrototypes,
    "sim_quantized" -> PipelineOracles.simQuantized,
    "sim_pq_adc" -> PipelineOracles.simPqAdc,
    "sim_pq_recall" -> PipelineOracles.simPqRecall,
    "sim_ivf_pq" -> PipelineOracles.simIvfPq,
    "sim_ivf_pq_delete" -> PipelineOracles.simIvfPqDeleted,
    "sim_hybrid_rerank" -> PipelineOracles.simHybridRerank,
    "sim_hybrid_rerank_pq" -> PipelineOracles.simHybridRerankPq,
    "sim_ann_filtered" -> PipelineOracles.simAnnFiltered,
    // the same probed chain with the label predicate inverted
    "sim_hard_negatives" -> PipelineOracles.simHardNegatives,
    // per-vector max eval cosine; τ compared on the unrounded value
    "sim_decontaminate" -> PipelineOracles.simDecontaminate,
    // rank-1 positive × top-3 inverted-label negatives, rounded-margin audit
    "pipeline_triplets" -> PipelineOracles.pipelineTriplets,
    // greedy MMR unrolled CTE-per-pick; identical IEEE trajectory
    "sim_mmr_diversify" -> PipelineOracles.simMmrDiversify,
    // maintained code table must equal the from-scratch index
    "sim_pq_append" -> PipelineOracles.simPqAppend,
    // the stream-maintained code table answers the identical ranking contract
    "stream_pq_ingest" -> PipelineOracles.simPqAppend,
    // same replay, tombstoned victims excluded from the scored codes
    "sim_pq_delete" -> PipelineOracles.simPqDelete,
    // the shared streamed tombstone feed, honored by the PQ serve
    "stream_pq_takedown" -> PipelineOracles.simPqDelete,
    // live codes/vectors rewritten once; DV-free serve, same replay
    "sim_pq_compact" -> PipelineOracles.simPqDelete,
    "text_langid" -> PipelineOracles.textLangId,
    "text_quality" -> PipelineOracles.textQuality,
    "text_tokens" -> PipelineOracles.textTokens,
    "text_fingerprint" -> PipelineOracles.textFingerprint,
    "text_pii_redact" -> PipelineOracles.textPiiRedact,
    "text_repetition" -> PipelineOracles.textRepetition,
    "text_dup_spans" -> PipelineOracles.textDupSpans,
    "text_seg_dedup" -> PipelineOracles.textSegDedup(TextAnalysis.SegWords, TextAnalysis.SegMaxDf),
    "text_decontaminate" -> PipelineOracles.textDecontaminate,
    "text_tfidf" -> PipelineOracles.textTfidf,
    "text_lm_score" -> PipelineOracles.textLmScore,
    "text_bm25" -> PipelineOracles.textBm25,
    // the durable-index serve answers the identical ranking contract
    "text_bm25_append" -> PipelineOracles.textBm25,
    // post-delete serve == BM25 built fresh on the surviving corpus
    "text_bm25_delete" -> PipelineOracles.textBm25Deleted,
    // compaction materializes postings ∖ DV + the summed stats row:
    // identical answer to the MoR serve, identical oracle
    "text_bm25_compact" -> PipelineOracles.textBm25Deleted,
    // N partial retractions sum to the one-shot retraction exactly
    "stream_bm25_takedown" -> PipelineOracles.textBm25Deleted,
    // the stream-maintained index answers the identical ranking contract
    "stream_bm25_ingest" -> PipelineOracles.textBm25,
    "text_cdc_chunks" -> PipelineOracles.textCdcChunks,
    "text_vocab" -> PipelineOracles.textVocab,
    "text_heavy_hitters" -> PipelineOracles.textHeavyHitters,
    "text_entropy" -> PipelineOracles.textEntropy,
    "text_bpe_pairs" -> PipelineOracles.textBpePairs,
    "text_bpe_encode" -> PipelineOracles.textBpeEncode,
    "text_bpe_encode_capped" -> PipelineOracles.textBpeEncodeCapped,
    "text_classifier" -> PipelineOracles.textClassifier,
    "text_hash_split" -> PipelineOracles.textHashSplit,
    "text_shuffle_shards" -> PipelineOracles.textShuffleShards,
    "text_domain_mix" -> PipelineOracles.textDomainMix,
    "pipeline_curate" -> PipelineOracles.pipelineCurate,
    "pipeline_curate_fuzzy" -> PipelineOracles.pipelineCurateFuzzy,
    "pipeline_curate_fuzzy_capped" -> PipelineOracles.pipelineCurateFuzzyCapped,
    "pipeline_multimodal" -> PipelineOracles.pipelineMultimodal,
    "pipeline_pretrain" -> PipelineOracles.pipelinePretrain,
    "pipeline_pretrain_capped" -> PipelineOracles.pipelinePretrainCapped,
    // both decontamination modalities: n-gram gate inside pretrain,
    // the semantic keep-list joined on the shared id space
    "pipeline_pretrain_semantic" -> PipelineOracles.pipelinePretrainSemantic(PipelineOracles.pipelinePretrain),
    "pipeline_pretrain_semantic_capped" -> PipelineOracles.pipelinePretrainSemantic(
      PipelineOracles.pipelinePretrainCapped),
    "text_pack_blocks" -> PipelineOracles.textPackBlocks,
    "text_stratified_topk" -> PipelineOracles.textStratifiedTopK,
    // text_stratified_sample: engine-specific RNG, rows-only check;
    // SamplingSpec pins determinism + stratum fractions.
    "mm_meta" -> PipelineOracles.mmMeta,
    "mm_extract" -> PipelineOracles.mmExtract,
    "mm_phash" -> PipelineOracles.mmPhash,
    // pixel-identical by construction: the PNG round-trip must land on
    // the same closed-form hash the BMP round-trip does
    "mm_phash_png" -> PipelineOracles.mmPhash,
    "mm_phash_jpeg" -> PipelineOracles.mmPhashJpeg,
    // GIF is lossless on palette images: same pixels, same closed form
    "mm_phash_gif" -> PipelineOracles.mmPhash,
    "mm_phash_pairs" -> PipelineOracles.mmPhashPairs,
    "mm_phash_dedup" -> PipelineOracles.mmPhashDedup,
    "mm_audio_energy" -> PipelineOracles.mmAudioEnergy,
    "mm_frames" -> PipelineOracles.mmFrames,
    "mm_resize" -> PipelineOracles.mmResize
  )
}
