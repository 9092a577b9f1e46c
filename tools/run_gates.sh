#!/usr/bin/env bash
# One-shot local replica of every correctness/determinism gate, for a
# given scale factor (default sf0.01). Builds, dumps all queries, then
# runs: DuckDB oracle diff, -0.0 cell lint, DuckDB thread-sweep
# stability, and (if a second CPU count is given) the Spark
# parallelism-sweep diff between two dumps.
#
# Usage: tools/run_gates.sh [sfDir] [cpusA] [cpusB]
#   tools/run_gates.sh                          # sf0.01, single 4-way dump
#   tools/run_gates.sh /root/testdata/sf0.1     # sf0.1
#   tools/run_gates.sh /root/testdata/sf0.01 4 32   # + 4-vs-32 Spark sweep
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
CPUS_A="${2:-4}"
CPUS_B="${3:-}"
TAG="$(basename "$SF")"
OUT_A="/tmp/graft_gates_${TAG}_${CPUS_A}"

echo "== build =="
sbt -batch compile | tail -1

echo "== verify dump ($TAG, local[$CPUS_A]) =="
rm -rf "$OUT_A"
SPARK_GRAFT_CPUS="$CPUS_A" sbt -batch \
  "runMain graft.Verify $SF $OUT_A" 2>&1 \
  | grep -E '\[verify\].*failed' && exit 1 || true

echo "== oracle diff =="
python3 tools/oracle_check.py "$SF" "$OUT_A" | tail -1

echo "== -0.0 lint =="
python3 tools/negzero_oracle_lint.py "$SF" "$OUT_A" | tail -1

echo "== DuckDB thread sweep =="
python3 tools/oracle_stability.py "$SF" "$OUT_A" | tail -1

if [[ -n "$CPUS_B" ]]; then
  OUT_B="/tmp/graft_gates_${TAG}_${CPUS_B}"
  echo "== verify dump ($TAG, local[$CPUS_B]) =="
  rm -rf "$OUT_B"
  SPARK_GRAFT_CPUS="$CPUS_B" sbt -batch \
    "runMain graft.Verify $SF $OUT_B" 2>&1 \
    | grep -E '\[verify\].*failed' && exit 1 || true
  echo "== Spark parallelism sweep ($CPUS_A vs $CPUS_B) =="
  python3 tools/spark_stability.py "$OUT_A" "$OUT_B" | tail -1
fi

echo "== all gates done =="
