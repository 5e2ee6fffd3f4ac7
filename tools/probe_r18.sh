#!/bin/bash
# Round-18 probe sequence (dev tool, feeds BASELINE.md):
#   1. 3x-back-to-back quiet re-probe of the four r17 driver-window
#      regressions (byte-identical code -> expected window contention)
#   2. one-time BUILD path probes (sig / labels / ivfpq) across four
#      decades, fresh JVM per (family, decade), min-of-3 in-JVM
#   3. sql_q33_window sf30 steady row
#   4. Heap's-law corpus rows for the remaining capped dedup families
# Heap: 64g like every prior sf30 probe (8g local-mode OOMs there).
cd /root/repo || exit 1
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx64g"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

stamp() { echo "=== $1 : $(date +%T) loadavg $(cut -d' ' -f1 /proc/loadavg)"; }

stamp "regression quiet probe sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java $JOPTS -cp "$CP" graft.tools.NgramBench \
  dedup_batch_admit dedup_ngram_jaccard dedup_simhash mm_audio_energy 2>/dev/null | grep NGRAMBENCH

for fam in sig labels ivfpq; do
  for d in /tmp/sf1 /tmp/sf3 /tmp/sf10 /tmp/sf30; do
    stamp "build probe $fam $d"
    SPARK_GRAFT_PROBE_DIR=$d SPARK_GRAFT_PROBE_FAMILY=$fam SPARK_GRAFT_PROBE_RUNS=3 \
      java $JOPTS -cp "$CP" graft.tools.ProbeBuilds 2>/dev/null | grep PROBE
  done
done

stamp "sql_q33_window sf30"
SPARK_GRAFT_SF_DIR=/tmp/sf30 \
  java $JOPTS -cp "$CP" graft.tools.NgramBench sql_q33_window 2>/dev/null | grep NGRAMBENCH

for d in /tmp/sf1h /tmp/sf3h; do
  stamp "heaps capped families $d"
  SPARK_GRAFT_SF_DIR=$d \
    java $JOPTS -cp "$CP" graft.tools.NgramBench \
    dedup_simhash dedup_simhash_capped dedup_containment dedup_containment_capped \
    dedup_semantic dedup_semantic_capped dedup_clusters_capped 2>/dev/null | grep NGRAMBENCH
done
stamp "done"
