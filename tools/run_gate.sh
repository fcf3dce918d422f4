#!/bin/bash
# Local wholesale gate: Verify dump + DuckDB compare.
#   tools/run_gate.sh SF_DIR [q_a,q_b,...]
# Writes to target/gate/<sf-name>/ and prints per-query verdicts.
set -e
SF_DIR="${1:-/root/testdata/sf0.01}"
SUBSET="$2"
OUT="target/gate/$(basename "$SF_DIR")"
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt -batch \
  "runMain graft.Verify $SF_DIR $OUT $SUBSET" 2>&1 | \
  grep -E "\[verify\]|error\]" | head -50 || true
python3 tools/gate.py "$SF_DIR" "$OUT" $SUBSET
