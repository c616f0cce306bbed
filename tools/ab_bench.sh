#!/usr/bin/env bash
# Same-window interleaved A/B (r19/r20 methodology): run the named entries
# through graft.Bench alternately from the BASE worktree's classes and this
# repo's classes (A-B-B-A), min-of-2 per side, so bursty host contention
# cannot masquerade as a code delta. Compare with tools/ab_diff.py.
#
#   tools/ab_bench.sh <base_worktree> <out_prefix> <entry ...>
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="$1"; OUT="$2"; shift 2

JARS="$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$m=ALL-UNNAMED"
done

run() { # run <classes_dir> <out_json> <entry ...>
  local cls="$1" out="$2"
  shift 2
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_OUT="$out" \
    java -Xmx48g $OPENS -cp "$cls:$JARS" graft.Bench "$@" 2>/dev/null | tail -1
}

b0=$(awk '/^cpu /{print $9}' /proc/stat)
echo "== A (base) leg 1 =="
run "$BASE/target/scala-2.13/classes" "${OUT}_A1.json" "$@"
echo "== B (head) leg 1 =="
run "target/scala-2.13/classes" "${OUT}_B1.json" "$@"
echo "== B (head) leg 2 =="
run "target/scala-2.13/classes" "${OUT}_B2.json" "$@"
echo "== A (base) leg 2 =="
run "$BASE/target/scala-2.13/classes" "${OUT}_A2.json" "$@"
b1=$(awk '/^cpu /{print $9}' /proc/stat)
echo "== steal bracket across all four legs: $((b1 - b0)) ticks =="
