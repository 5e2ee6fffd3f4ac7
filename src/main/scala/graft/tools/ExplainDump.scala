package graft.tools

import graft.SparkEntry
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: formatted physical plans of the showcase
  * queries, committed as evidence for the scale-design claims in
  * SCALING.md (pushdown/pruning, partial aggregation, broadcast vs
  * shuffle joins, zero-shuffle bucketed join, candidate-scoped dedup,
  * the custom as-of operator with its pushed filter).
  *
  * Usage: sbt "runMain graft.tools.ExplainDump [sfDir] [outFile]"
  */
object ExplainDump {

  private val Showcase = Seq(
    "q1_pricing_summary" -> "map-side partial aggregation; 6-of-11-column pruned scan",
    "q2_filter_pushdown" -> "predicates reach the parquet reader (PushedFilters)",
    "q3_segment_revenue" -> "small dimension broadcasts; fact never shuffles for the join",
    "q8_topk" -> "TakeOrderedAndProject — k rows per partition, no global sort",
    "q19_lag_lead" -> "raw-row windows all partitioned; quartile cutoffs from the rank-based percentile plan (no full-table aggregation buffer)",
    "q20_percentiles" -> "rank-based exact percentiles: distinct-value histogram + two-level cumulative rank — no percentile aggregate, no full-group buffer",
    "q23_kmv_distinct" -> "typed k-min Aggregator (ObjectHashAggregate with partial merge) — no per-group Window funnel",
    "q22_bucketed_join" -> "bucketed sort-merge join with ZERO shuffle exchanges",
    "text_decontaminate" -> "eval shingle set broadcasts; training corpus never shuffles on shingles",
    "dedup_minhash" -> "LSH banding + candidate-scoped verification (no shingle self-join)",
    "sim_topk_agg" -> "typed map-side top-k aggregation (partial_topkbycosine)",
    "events_asof" -> "custom AsOfJoin node: clustered+sorted children, filter pushed by AsOfJoinPushdown",
    "sim_knn_graph" -> "served from the session-cached kNN artifact (built once per corpus fingerprint); the BUILD plan — band-bucket equi-join, no cartesian — is pinned by PlanSpec on knnGraphUncached",
    "text_repetition" -> "per-doc multiset maxima map-side: scan → project → sort, no mid-plan exchange",
    "text_vocab" -> "per-arity partial-aggregated counts + TakeOrdered top-k (no global vocab sort)",
    "pipeline_pretrain" -> "end-to-end flow composes doc_id-keyed joins of the per-operator plans; text never shuffles past its own scan",
    "q27_window_suite" -> "both window specs share one c_mktsegment exchange; ntile's tiebreak is a local sort",
    "q28_unpivot" -> "UNPIVOT is a zero-shuffle Expand; the per-measure aggregate partial-combines before its one exchange",
    "events_retention" -> "corpus collapses to distinct (user, week) pairs map-side; joins move only the pair set",
    "text_seg_dedup" -> "segment df aggregate and join back key on md5 hashes, never segment text",
    "graph_pagerank" -> "final round's plan: checkpointed degree-annotated edges ⋈ ranks + dst-keyed partial-aggregated sum",
    "q29_scalar_subquery" -> "correlated scalar subquery decorrelated: per-customer aggregate joined back, no per-row subquery",
    "q30_merge_upsert" -> "CDC-apply: one key join folds updates/deletes, inserts union in",
    "q31_partition_pruning" -> "year predicate in PartitionFilters — pruning at file listing, 2-column data schema",
    "text_bm25" -> "no corpus shuffle at all: [dl, tf..] from one native single-pass expression (no token array, no interpreted lambdas), 1-row stats collected and inlined as literals (no session-lived cache), TakeOrdered top-k; rank derived windowless from the K-row sorted array",
    "text_bm25_append" -> "serve reads the stored narrow postings + additive stats tables from the catalog — no corpus scan, no text decode, no tokenization in the query path; scoring is map-side literal math over [dl, tf..] longs, TakeOrdered top-k",
    "text_bm25_delete" -> "merge-on-read on a serving index: live postings = stored ∖ DV via one broadcast LeftAnti probe per row; the negative stats delta already retracted the victims, so scoring constants equal a fresh build on the survivors — no postings rewrite, no corpus scan",
    "sim_ivf_delete" -> "vector-store takedown: the kilobyte DV anti-joins the probed posting lists (broadcast LeftAnti), centroids and stored postings untouched — the serve differs from sim_ivf_append by exactly one predicate, no retrain, no rewrite",
    "dedup_index_delete" -> "right-to-be-forgotten on the signature index: stored index ∖ DV feeds the CAPPED admission pipeline (hot LIVE buckets leave before the batch×index band join, the dedup_incremental_capped arm) — victims stop sourcing exact-hash hits AND banded candidates, so a forgotten doc's content re-admits; index rows never rewritten",
    "dedup_incremental_capped" -> "ingest admission with hot index buckets dropped BEFORE the batch×index band join (population counted index-side, profile-able offline); exact md5 admission stays uncapped; candidate volume bounded at #buckets·cap·batch_df",
    "sim_pq_delete" -> "the ONE corpus takedown list (shared with sim_ivf_delete) anti-joins the 6-byte code table before the ADC aggregate and the vector store before the refine; codebooks/codes/vectors untouched",
    "stream_bm25_ingest" -> "foreachBatch IS the index tick: each micro-batch runs bm25AppendTick verbatim (narrow postings + ONE additive stats delta); the serve is the same catalog-only narrow scan as text_bm25_append",
    "dedup_batch_admit" -> "the batch dedups against ITSELF before the index (two copies arriving together must not both pass): intra-batch md5 groups + banded self-candidates collapse to min-id representatives — batch-bounded, the smallest join in the pipeline — then the CAPPED index checks (the dedup_incremental_capped arm), the full 100 TB admission composition",
    "sim_hard_negatives" -> "hard-negative mining for retriever training: the filtered-ANN machinery with the label predicate INVERTED — per anchor, the top near-misses with a different label off the probed inverted lists; one index pass per anchor batch, never corpus×corpus",
    "pipeline_triplets" -> "the training-pair miner end-to-end: rank-1 same-label positive × top-3 inverted-label negatives off ONE probed candidate partition, margin column as the curriculum audit; one index pass per anchor batch",
    "sim_decontaminate" -> "embedding-level eval decontamination: k broadcast eval dots per corpus vector map-side, per-vector max as a partial aggregate (the only shuffle carries one row per vector), keep thresholded on the unrounded max",
    "dedup_index_compact" -> "the signature index's compaction: stored ∖ DV rewritten once in a narrow pass (no re-shingling, survivors bit-identical); every ingest tick after it runs the fresh-build admission plan with no DV probe",
    "text_bm25_compact" -> "compaction pays the MoR debt once: postings ∖ DV rewritten in one narrow pass (no text rescan), the delta history folded to ONE summed stats row; the serve is back to the scan-only shape — no DV probe, no stats fold",
    "sim_ivf_compact" -> "(stored ∪ pending tick) ∖ DV materialized once as the new posting table — survivors ride through bit-identical, no re-assignment, quantizer shared with the append family untouched; the serve reads ONE table with no anti-join",
    "stream_bm25_takedown" -> "the delete verb streams because its artifacts are additive: each micro-batch of victim keys lands DV rows + ONE negative stats delta, and N partial retractions sum to the one-shot retraction exactly; per-trigger cost ∝ that batch's victims",
    "pipeline_pretrain_semantic" -> "both decontamination modalities in one flow: the n-gram gate catches verbatim eval text, the embedding keep-list (joined on the shared id space) catches paraphrase/translation leakage; one broadcast-able join over the pretrain plan",
    "mv_snapshot" -> "MV time travel: every stored version is an immutable groups-sized artifact, so the as-of read (and the all-versions audit) is metadata + artifact reads — the fact table never appears in the plan",
    "stream_pq_ingest" -> "the last cell of the streaming column: codebooks offline-trained (copied narrow), foreachBatch runs pqAppendTick verbatim — 8 code rows + 1 vector-store row per drained vector; the serve is the same catalog-only codes + vector read as sim_pq_append",
    "stream_ivf_ingest" -> "the continuous write path of the embedding store: quantizer trained OFFLINE (the append family's stored centroids, copied narrow), foreachBatch IS the tick — each micro-batch runs ivfAppendTick verbatim; the serve is the same catalog-only posting scan",
    "sim_quantized" -> "int8 quantization map-side under a 1-row broadcast scale; exact integer dots; top-k via the bounded aggregator (no Window)",
    "graph_triangles" -> "degree-ordered wedge join over the persisted oriented edge list (kNN edges read from the session-cached artifact) — O(m^1.5) wedges on any skew, equi-joins only",
    "events_anomaly" -> "one user-partitioned bounded-frame Window computes all three integer sums; no global window, no unbounded frame",
    "stats_profile" -> "ANALYZE pass: one single-row aggregate per column, each over a single-field pruned scan; HLL sketch gated by the exact NDV",
    "dedup_bloom_admit" -> "codegen'd Bloom probe inlined next to the md5; fast path admits map-side, verify joins broadcast the maybe-sliver — the index never shuffles",
    "layout_pruned_scan" -> "manifest-pruned box scan: the path list is filtered by the per-file (min,max) table before the reader — skipped files never open",
    "mm_phash_dedup" -> "clique-collapsed image near-dup: identical hashes group to keeper+count, then the 8×8-bit banded equi-join pairs distinct hashes only",
    "sim_range_search" -> "ε-ball retrieval: broadcast queries, codegen'd dot + threshold filter map-side — no aggregation state anywhere",
    "text_heavy_hitters" -> "count-min sketch: explode ×depth partial-combines to ≤4096 cells, so the shuffle is sketch-sized at any corpus",
    "sql_q1_pricing" -> "the ANSI string the oracle runs, parsed by Catalyst into the SAME partial-agg pruned-scan plan as the q1 builder",
    "layout_incremental" -> "segmented-manifest pruned scan: per-tick manifest segments union (metadata-scale), survivors read directly — stats maintenance per tick touched only that tick's files",
    "dedup_semantic_capped" -> "SemDeDup with the cell-population cap: hot cells leave via the broadcast ok-cell filter BEFORE the within-cell pair join — the Σ cell² term is cap-bounded",
    "mm_phash_png" -> "identical partition-local shape to mm_phash: scan → batched encode→inflate→defilter→hash iterator → sort; compression never adds a shuffle",
    "mm_phash_jpeg" -> "identical partition-local shape: scan → batched encode→Huffman-decode→IDCT→YCbCr→hash iterator → sort; the whole entropy/transform stack runs on the scan partition, bytes never shuffle",
    "mm_phash_gif" -> "identical partition-local shape: scan → batched encode→LZW-decode→palette-map→hash iterator → sort; variable-width code handling runs on the scan partition, bytes never shuffle",
    "q32_salted_join" -> "salted sort-merge join: both exchanges hash on (key, salt), so one hot key spreads over SaltFactor reducers; no broadcast — the demo exercises the shuffle path salting exists for",
    "events_scd2" -> "both window passes (lag mark, version/lead close) share ONE user-keyed exchange; the second sort sees only surviving change points",
    "layout_snapshot" -> "all snapshots audited in one pass over the tick files: explode(sequence(tick, latest)) fans rows to their versions, partial-aggregated to #versions rows before the only exchange",
    "layout_vacuum" -> "expiry is O(expired files) metadata + deletes — no data pass; the post-vacuum reads are the ordinary compacted scan and manifest-pruned box scan, costing exactly what they cost before vacuum",
    "stream_layout_ingest" -> "foreachBatch commits one z-clustered tick + one manifest segment per micro-batch (work per commit bounded by the batch); the serve is the segmented-manifest pruned scan — readers never rescan history",
    "layout_deletes" -> "merge-on-read: the DELETE is a kilobyte lineage-key file, data files untouched; serving adds one broadcast LeftAnti hash probe per row (no shuffle), and purge rewrites only the semi-join-identified affected files",
    "q33_dynamic_pruning" -> "the broadcast of the filtered calendar dim is REUSED as a dynamicpruningexpression in the fact scan's PartitionFilters — only the matching year directories are listed or read, derived at runtime from the join itself",
    "stats_histogram" -> "fences from the q20 rank-based percentile plan (1-row frame, broadcast back); bucket assignment is a codegen'd when-chain per row; per-bucket count/NDV/min-max partial-aggregate — no full-column buffer anywhere",
    "q34_window_topk" -> "partial WindowGroupLimit on the map side bounds each group to k rows BEFORE the exchange; the shuffle carries O(groups x k) rows, never the corpus",
    "mv_incremental" -> "the serve is a groups-sized artifact read — zero corpus scan; each maintenance tick aggregated only its slice and merged groups-sized partials",
    "sim_mmr_diversify" -> "pool via the bounded top-K aggregator (map-side k per query), embeddings back via one broadcast join; the greedy re-rank is flatMapGroups with MmrPool x dim state per query — O(S^2*K) dots, parallel across queries, never a corpus pass",
    "layout_schema_evolution" -> "widening is metadata: mergeSchema unions per-file schemas at planning time, the reader nulls columns a file predates — zero data rewrite, one aggregate pass over the unchanged files",
    "stream_mv_ingest" -> "foreachBatch merges a batch-only delta aggregate into the previous groups-sized MV version — O(batch)+O(groups) per trigger; the serve reads the _latest pointer and a groups-sized parquet, never the corpus",
    "sim_pq_append" -> "serve reads the stored codebooks/codes/vector-store tables; only the pending batch encodes in-flight (anti-joined on ticked ids) and the exact-refine tail reads the maintained vector store — no Lloyd, no corpus-wide encoding, no corpus join in the query path",
    "layout_changes" -> "each commit's change rows come off that commit's own immutable artifact (insert commits ARE their files; the delete commit is a broadcast semi-join of its key file) — O(changed rows), never a table diff",
    "text_entropy" -> "zero per-char shuffle: the char histogram + entropy fold run inside the projection; the only exchange is the final doc_id sort",
    "text_bpe_pairs" -> "pair counts partial-combine to ≤|alphabet|² groups before the one exchange — the shuffle is alphabet-sized at any corpus; TakeOrdered caps the top-K",
    "text_bpe_encode" -> "one vocabulary-bounded wordcount shuffle trains the merges (count-weighted dict, the subword-nmt shape); the corpus encode is a broadcast-dictionary element_at lookup per token in one map pass; only the per-shard packing window and the output sort exchange rows",
    "text_bpe_encode_capped" -> "top-V dictionary via TakeOrdered (driver holds V rows, never the Heap's-law distinct-word set); dictionary ships as broadcast DATA (1-row map frame, BroadcastNestedLoopJoin of one row) not a plan literal; per-token try_element_at with char-split fallback for OOV — one map pass, then the packing window",
    "mv_from_changes" -> "each commit's signed change rows come off its own CDF artifact (delete commit = broadcast semi-join of the key file, aggregated as NEGATIVE deltas); delta and previous MV version are both groups-sized; the serve reads one groups-sized parquet",
    "layout_snapshot_deletes" -> "one scan over base∪insert commits; the DV applies as a broadcast left join on the (commit, rid) lineage pair; per-row visibility range explodes to ≤3 version tags and partial-aggregates before the only exchange",
    "sim_ann_filtered" -> "metadata-constrained ANN with the predicate PRE-applied at the index: probed posting candidates drop non-matching labels when they fetch their metadata row, before any distance math — a selective filter shrinks the scored set instead of starving a post-filtered top-k",
    "stats_corr" -> "the whole correlation matrix from ONE corpus pass: every moment (n, Σx, Σx², Σxy) is an exact-decimal partial-aggregated sum; the 6 matrix rows explode out of the single moment row",
    "sim_hybrid_rerank" -> "RRF fusion of two K-bounded source lists: cost lives in the source plans (BM25 map pass, broadcast-query cosine), the fusion is a K-row full-outer join",
    "sim_hybrid_rerank_pq" -> "same K-row RRF fusion, semantic source swapped to the IVF-PQ index: probed posting lists bound WHICH vectors are ADC-scored, stored 6-byte codes bound the BYTES, fixed 50-row exact tail — the hybrid serve inherits sim_ivf_pq's bounded-scan shape",
    "text_classifier" -> "trained pooled-NB scoring: vocab-bounded model broadcasts, held-out token rows score map-side, per-doc argmax partial-combines (one row per doc shuffles) — the corpus text never shuffles",
    "text_shuffle_shards" -> "deterministic shard shuffle: map-side shard = md5 mod S, position from a WITHIN-shard window — the only exchange is shard-keyed; no corpus-wide total order",
    "sim_ivf_append" -> "serving over the maintained index: centroids AND postings are catalog table scans (no Lloyd jobs); only the not-yet-persisted slice of the arriving batch is assigned in-flight (anti-join vs the ticked ids), and the exact re-rank reads vectors stored IN the postings — no corpus join, so out-of-corpus ingested vectors are servable",
    "stream_layout_takedown" -> "the GDPR queue's continuous form: each micro-batch commits its own kilobyte key-delete file, data files byte-identical across the drain; the serve is scan ∖ union(DV commits) via ONE broadcast LeftAnti probe, identical to the one-shot MoR serve",
    "mv_vacuum" -> "MV retention: expire all but the last K versions, physically delete only version dirs no retained snapshot references (live-set discipline); retained time travel reads are unchanged groups-sized artifact selections",
    "layout_spec_evolution" -> "partition-spec evolution as metadata: each segment records its own spec in the _spec ledger, and scan planning prunes every segment under ITS spec before the residual predicate — old files never rewritten",
    "sim_ivf_balance" -> "the index-health audit over the serving posting view (stored ∪ pending tick — the same ivfAppendServeParts derivation every append-family serve pays; stored-only once the tick persists): postings ⋈ broadcast centroids, per-cell census + integer-quantized drift partial-aggregated; the priced retrain trigger (Σpop²/N² vs 1/C read-tax) computes from the census — no Lloyd, no pairwise work",
    "sim_ivf_retrain" -> "the blue/green rollover the balance audit prices: fresh quantizer over the LIVE set read from the stored postings (no corpus re-scan), one broadcast reassignment pass, new catalog generation; the serve is an ordinary two-table IVF probe plan",
    "stream_ivf_takedown" -> "the vector takedown queue streamed: each trigger appends a kilobyte tombstone slice; the serve anti-joins the accumulated union over the probed posting lists exactly like the one-shot DV — quantizer and postings untouched by any number of commits",
    "stream_dedup_takedown" -> "the forget queue streamed into the signature index: per-trigger tombstone slices accumulate, and the CAPPED admission pipeline (the dedup_incremental_capped arm over the live bucket census) runs over index ∖ union(slices) — takedown changes future admission decisions, never index rows",
    "sim_pq_compact" -> "the PQ compaction: live 6-byte codes and live vector-store rows rewritten once each (no re-encode, survivors verbatim); the compacted serve reads two catalog tables with no DV anti-join and no pending-tick encode anywhere",
    "stream_layout_takedown_pruned" -> "the BOUNDED read over the takedown-maintained layout: the per-file (min,max) manifest filters the path list before the reader (skipped files never open), and the accumulated kilobyte DV commits apply as ONE broadcast LeftAnti probe on the pruned rows — the box straddles the victim range so both mechanisms are load-bearing",
    "sim_ivf_pq_delete" -> "takedown on the composed production index: the shared corpus DV anti-joins the PROBED posting lists before any code row is ADC-scored — probes bound WHICH, codes bound BYTES, the DV bounds to LIVE; per query the delete costs a probe-set filter, never a corpus pass",
    "sql_q33_window" -> "ONE parsed SQL string inherits BOTH runtime treatments: the epoch filter arrives through the calendar dim and reappears as a dynamicpruningexpression in the fact scan's PartitionFilters (DPP), and the rank predicate pushes into the window as a WindowGroupLimit — the analyst's ad-hoc text gets the 3-years-not-30 scan and bounded window state with no rewrite",
    "pipeline_curate_fuzzy_capped" -> "the fuzzy-curation flow on the CAPPED cluster-label artifact: hot LSH buckets leave before the edge join, so the label fixpoint is the production edge source (capped keepers ⊇ uncapped, spec-pinned); per-run cost is the langid+quality corpus map passes, doc_id-keyed joins compose the plan",
    "pipeline_pretrain_capped" -> "pretrain assembly riding the capped label artifact: decontamination gate + quality keeper + packing joins, all doc_id-keyed over map-pass scores — the n² uncapped fixpoint is out of every registered flow's build path",
    "pipeline_pretrain_semantic_capped" -> "both decontamination modalities over the capped labels: n-gram gate for verbatim leakage, broadcast embedding keep-list for paraphrase leakage — one broadcast-able join over the capped pretrain plan"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = graft.GraftSession.local(8, "explain-dump")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the showcase queries\n\n")
    sb.append(s"Generated by `graft.tools.ExplainDump` at `$sfDir` (AQE initial plans;\n")
    sb.append("regenerate with `sbt \"runMain graft.tools.ExplainDump\"`).\n")
    Showcase.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[explain-dump] wrote $out")
    spark.stop()
  }
}
