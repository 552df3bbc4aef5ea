#!/usr/bin/env bash
# Randomized-order stability gate (round-9 ritual, VERDICT r8 ask #1a):
# run the FULL query registry in several seeded-shuffled orders and
# oracle-check every run. Any cross-query coupling through JVM-global
# state (catalogs, cached fixtures, session hygiene) shows up as an
# oracle failure or a run-to-run diff under different seeds.
#
# Usage: tools/stability_gate.sh [seeds...]   (default: 1 2 3)
set -u
cd "$(dirname "$0")/.."
SEEDS=("$@")
if [ $# -eq 0 ]; then SEEDS=(1 2 3); fi
SF=${SPARK_GRAFT_SF_DIR_VERIFY:-/root/testdata/sf0.01}
fails=0
for seed in "${SEEDS[@]}"; do
  out="/tmp/v_stab_$seed"
  rm -rf "$out"
  echo "== stability gate: seed $seed =="
  if ! SPARK_GRAFT_SHUFFLE_SEED=$seed SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
      sbt -batch "runMain graft.Verify $SF $out" >"/tmp/v_stab_$seed.log" 2>&1
  then
    echo "VERIFY CRASHED (see /tmp/v_stab_$seed.log)"
    fails=1
    continue
  fi
  tail_line=$(python3 tools/oracle_check.py "$out" "$SF" | tail -1)
  echo "$tail_line"
  case "$tail_line" in *" 0 fail"*) ;; *) fails=1;; esac
done
exit $fails
