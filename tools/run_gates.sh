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

# Run a Verify dump; fail on a per-query failure line OR a non-zero
# sbt/Verify exit (a crash that prints no '[verify]...failed' line must
# not slip through as a partial dump — ADVICE r11: the old
# `| grep ... && exit 1 || true` masked PIPESTATUS under pipefail).
run_verify() {
  local cpus="$1" out="$2" rc=0
  rm -rf "$out"
  SPARK_GRAFT_CPUS="$cpus" sbt -batch "runMain graft.Verify $SF $out" \
    >/tmp/graft_gates_verify.log 2>&1 || rc=$?
  grep -E '\[verify\]' /tmp/graft_gates_verify.log || true
  if [[ "$rc" != 0 ]]; then
    echo "Verify exited rc=$rc (see /tmp/graft_gates_verify.log)" >&2
    exit "$rc"
  fi
  if grep -qE '\[verify\].*failed' /tmp/graft_gates_verify.log; then
    echo "Verify reported per-query failures" >&2
    exit 1
  fi
}

echo "== verify dump ($TAG, local[$CPUS_A]) =="
run_verify "$CPUS_A" "$OUT_A"

echo "== oracle diff =="
python3 tools/oracle_check.py "$SF" "$OUT_A" | tail -1

echo "== -0.0 lint =="
python3 tools/negzero_oracle_lint.py "$SF" "$OUT_A" | tail -1

echo "== DuckDB thread sweep =="
python3 tools/oracle_stability.py "$SF" "$OUT_A" | tail -1

if [[ -n "$CPUS_B" ]]; then
  OUT_B="/tmp/graft_gates_${TAG}_${CPUS_B}"
  echo "== verify dump ($TAG, local[$CPUS_B]) =="
  run_verify "$CPUS_B" "$OUT_B"
  echo "== Spark parallelism sweep ($CPUS_A vs $CPUS_B) =="
  python3 tools/spark_stability.py "$OUT_A" "$OUT_B" | tail -1
fi

echo "== all gates done =="
