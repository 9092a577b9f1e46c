#!/usr/bin/env bash
# Scale-growth probe (r11 verdict ask #1): synthesize a mult-x copy of
# sf0.1 in scratch (word-permuted docs, jittered embeddings, key-shifted
# facts — see ScaleGen.scala), then time ~45 shuffle-heavy keys at both
# sizes and report per-key scaling exponents alpha (t ~ n^alpha).
# Flags alpha >= 1.3 on keys that are not intrinsically iterative.
#
# Usage: tools/scale_probe.sh [mult] [baseSfDir] [keysCsv]
#   tools/scale_probe.sh            # 10x sf0.1 (sf1-equivalent)
#   tools/scale_probe.sh 4          # quicker 4x probe
set -euo pipefail
cd "$(dirname "$0")/.."

MULT="${1:-10}"
BASE="${2:-/root/testdata/sf0.1}"
KEYS="${3:-}"
OUT="/tmp/graft_scale_$(basename "$BASE")_x${MULT}"

echo "== build =="
sbt -batch compile | tail -1

if [[ ! -d "$OUT/lineitem.parquet" ]]; then
  echo "== generate ${MULT}x corpus at $OUT =="
  sbt -batch "runMain graft.ScaleGen $BASE $OUT $MULT" 2>&1 \
    | grep -E '\[scalegen\]' || { echo "ScaleGen failed" >&2; exit 1; }
else
  echo "== reusing existing ${MULT}x corpus at $OUT =="
fi

echo "== probe (base vs ${MULT}x) =="
sbt -batch "runMain graft.ScaleProbe $BASE $OUT $MULT $KEYS" 2>&1 \
  | grep -E '^\{' | tee /tmp/graft_scale_probe.jsonl

echo "== done: per-key lines in /tmp/graft_scale_probe.jsonl =="
