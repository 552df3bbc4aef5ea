#!/bin/bash
# MULTI-PROCESS commit storm — the cross-JVM CAS contention ritual
# (round-14 verdict item 6). LogStoreContractSpec races writers as
# threads in ONE JVM; this script races them as separate PROCESSES
# (own SparkSession, own FileSystem instance, one table), which is the
# only shape that can catch a commit point accidentally synchronized
# by in-process state. Roles and the replay-to-model verification live
# in src/main/scala/graft/MultiProcStorm.scala.
#
# Usage: tools/multiproc_storm.sh [writers] [appends-per-writer]
set -euo pipefail
cd "$(dirname "$0")/.."

WRITERS="${1:-3}"
PER_WRITER="${2:-6}"
CHURNERS=2
PER_CHURNER=4

echo "[storm] compiling…"
sbt -batch compile > /dev/null 2>&1

CP="target/scala-2.13/classes"
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done

WORK="$(mktemp -d /tmp/graft_storm_XXXXXX)"
LAKE="$WORK/lake"
trap 'rm -rf "$WORK"' EXIT

run() { java -XX:+IgnoreUnrecognizedVMOptions --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  -Xmx2g -cp "$CP" graft.MultiProcStorm "$@"; }

run setup "$LAKE"

echo "[storm] launching $WRITERS writer JVMs + $CHURNERS churner JVMs + 1 merger JVM…"
PIDS=()
for i in $(seq 1 "$WRITERS"); do
  run writer "$LAKE" "$i" "$PER_WRITER" & PIDS+=($!)
done
for i in $(seq 1 "$CHURNERS"); do
  run churner "$LAKE" "$i" "$PER_CHURNER" & PIDS+=($!)
done
sleep 2   # let main start advancing so the merge must truly rebase
run merger "$LAKE" & PIDS+=($!)

FAIL=0
for p in "${PIDS[@]}"; do wait "$p" || FAIL=1; done
if [ "$FAIL" -ne 0 ]; then
  echo "[storm] FAILED: a role exited non-zero"; exit 1
fi

run verify "$LAKE" "$WRITERS" "$PER_WRITER" "$CHURNERS" "$PER_CHURNER"
echo "[storm] PASS"
