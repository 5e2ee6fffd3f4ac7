#!/bin/bash
# Round-18 AFTER-fix build re-probe: same ProbeBuilds methodology on the
# hash-threshold + narrow-argmax + checkpointed-Lloyd code.
cd /root/repo || exit 1
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx64g"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
stamp() { echo "=== $1 : $(date +%T) loadavg $(cut -d' ' -f1 /proc/loadavg)"; }

for fam in sig ivfpq labels; do
  for d in /tmp/sf10 /tmp/sf30; do
    stamp "after-fix build probe $fam $d"
    SPARK_GRAFT_PROBE_DIR=$d SPARK_GRAFT_PROBE_FAMILY=$fam SPARK_GRAFT_PROBE_RUNS=3 \
      java $JOPTS -cp "$CP" graft.tools.ProbeBuilds 2>/tmp/probe_r18b_err.log | grep PROBE
  done
done
stamp "done"
