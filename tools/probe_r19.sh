#!/bin/bash
# Round-19 probe record (dev tool, feeds BASELINE.md). The sequence as
# actually run (logs: /tmp/probe_r19_part1.log, _labels3, _labelsh,
# _prefilter, _big):
#   1. 3x-back-to-back quiet re-probe of the r18 anchor drift's top
#      regressors + the ArgBestVector serve guard (sim_ann_ivf,
#      dedup_semantic)
#   2. ProbeLabelStages sf3/sf10/sf30 — decomposes the capped label
#      build into candidate production / exact-Jaccard verification /
#      per-round fixpoint telemetry (the r18 "5x-at-3x fixpoint term")
#   3. ProbeLabelStages sf1h/sf3h/sf10h — Heap's-law grounding of the
#      candidate-volume law (sf10h generated this round)
#   4. same probes after the size-ratio prefilter (before/after rows)
#   5. fifth decade: ProbeBuilds sig/ivfpq sf100 min-of-3, labels
#      sf10/sf30 min-of-3 (r18-methodology confirmation) + sf100
#      single-run; flagship serves at sf100; sf10h capped families
# Heap: 64g like every prior sf30+ probe (8g local-mode OOMs there).
cd /root/repo || exit 1
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx64g"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

stamp() { echo "=== $1 : $(date +%T) loadavg $(cut -d' ' -f1 /proc/loadavg)"; }

stamp "drift regressors + ArgBestVector serve guard (sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java $JOPTS -cp "$CP" graft.tools.NgramBench \
  dedup_batch_admit pipeline_triplets q19_lag_lead dedup_index_delete \
  q21_sketch_gate dedup_containment_capped sim_ann_ivf dedup_semantic 2>/dev/null | grep NGRAMBENCH

for d in /tmp/sf3 /tmp/sf10 /tmp/sf30 /tmp/sf1h /tmp/sf3h /tmp/sf10h; do
  stamp "label stage probe $d"
  SPARK_GRAFT_PROBE_DIR=$d \
    java $JOPTS -cp "$CP" graft.tools.ProbeLabelStages 2>/dev/null | grep PROBE
done

for fam in sig ivfpq; do
  stamp "build probe $fam sf100"
  SPARK_GRAFT_PROBE_DIR=/tmp/sf100 SPARK_GRAFT_PROBE_FAMILY=$fam SPARK_GRAFT_PROBE_RUNS=3 \
    java $JOPTS -cp "$CP" graft.tools.ProbeBuilds 2>/dev/null | grep PROBE
done
for d in /tmp/sf10 /tmp/sf30; do
  stamp "build probe labels $d (post-prefilter, r18 methodology)"
  SPARK_GRAFT_PROBE_DIR=$d SPARK_GRAFT_PROBE_FAMILY=labels SPARK_GRAFT_PROBE_RUNS=3 \
    java $JOPTS -cp "$CP" graft.tools.ProbeBuilds 2>/dev/null | grep PROBE
done
stamp "build probe labels sf100 (single run: fixed-vocab candidate law)"
SPARK_GRAFT_PROBE_DIR=/tmp/sf100 SPARK_GRAFT_PROBE_FAMILY=labels SPARK_GRAFT_PROBE_RUNS=1 \
  java $JOPTS -cp "$CP" graft.tools.ProbeBuilds 2>/dev/null | grep PROBE

stamp "flagship serves sf100"
SPARK_GRAFT_SF_DIR=/tmp/sf100 \
  java $JOPTS -cp "$CP" graft.tools.NgramBench \
  sql_q33_window sim_ivf_pq stream_layout_takedown_pruned 2>/dev/null | grep NGRAMBENCH

stamp "heaps capped families /tmp/sf10h"
SPARK_GRAFT_SF_DIR=/tmp/sf10h \
  java $JOPTS -cp "$CP" graft.tools.NgramBench \
  dedup_simhash_capped dedup_containment_capped dedup_semantic_capped \
  dedup_clusters_capped dedup_minhash_capped dedup_ngram_capped 2>/dev/null | grep NGRAMBENCH
stamp "done"
