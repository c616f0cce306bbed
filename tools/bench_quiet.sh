#!/usr/bin/env bash
# Quiet, steal-bracketed graft.Bench run — the round-closing drill
# (BASELINE.md "Round-12 definitive record" methodology) as one command.
#
#   tools/bench_quiet.sh [out.json] [entry ...]
#
# 1. waits until a 2-minute /proc/stat steal sample reads ~0 (the bursty
#    hypervisor steal that invalidates suite runs while loadavg and the
#    single-thread probe both look quiet);
# 2. runs graft.Bench (full suite, or the named entries) from the
#    compiled classes with the bracket recorded;
# 3. verdicts the bracket: <2k ticks over the run = QUIET (recordable),
#    >30k = DISCARD, between = gray zone (judge-level adjudication).
#
# Run `sbt -batch compile` first so classes match HEAD.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/bench_quiet.json}"
shift || true

steal() { awk '/^cpu /{print $9}' /proc/stat; }

echo "== waiting for a quiet host (2-min steal sample < 200 ticks) =="
for attempt in 1 2 3 4 5 6 7 8 9 10; do
  s0=$(steal); sleep 120; s1=$(steal)
  d=$((s1 - s0))
  echo "  sample $attempt: $d steal ticks / 2 min (loadavg: $(cut -d' ' -f1-3 /proc/loadavg))"
  if [ "$d" -lt 200 ]; then break; fi
  if [ "$attempt" = 10 ]; then echo "host never went quiet; aborting" >&2; exit 1; fi
done

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$m=ALL-UNNAMED"
done

b0=$(steal)
echo "== bench starting (steal-before: $b0) =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  java -Xmx48g $OPENS -cp "$CP" graft.Bench "$@" 2>/dev/null | tail -1
b1=$(steal)
d=$((b1 - b0))
echo "== steal bracket: $d ticks =="
if [ "$d" -lt 2000 ]; then echo "VERDICT: QUIET — recordable"
elif [ "$d" -gt 30000 ]; then echo "VERDICT: CONTAMINATED — discard and re-run"; exit 2
else echo "VERDICT: GRAY ZONE ($d ticks) — adjudicate per-entry against BANDS"
fi
echo "full per-pass record: $OUT"
