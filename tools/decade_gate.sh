#!/usr/bin/env bash
# Close-of-round decade gate (r16, VERDICT r15 item 6): the unified
# full-registry sf10 sweep as ONE command, so every round's last commit
# includes a freshly-attested CORRECTNESS_sf10.json produced mechanically
# rather than as a remembered ritual.
#
# Recipe = the r15 unified sweep (BASELINE.md "Round-15: the UNIFIED
# full-registry sf10 sweep"): parallel multi-file Verify dump
# (SPARK_GRAFT_VERIFY_COALESCE=0 — multi-file parquet loses ORDER BY, so
# the compare runs --sort-rows: sorting both sides by ALL columns is a
# total order over full rows, exact), then tools/check.py with wide DuckDB
# parallelism, a memory limit, and a temp spill dir (in-memory DuckDB has
# operator spill DISABLED without one — big oracles hard-OOM instead of
# spilling). ~90 min Verify + ~105 min compare at local[32] on the r15
# registry; budget ~3.5 h.
#
# Usage: tools/decade_gate.sh [sfDir] [outDir] [artifact]
#   defaults: /tmp/graft_sf10  /tmp/vout_sf10_gate  CORRECTNESS_sf10.json
# Regenerate the fixture first if absent:
#   tools/run.sh graft.GenFixtures /root/testdata/sf0.1 /tmp/graft_sf10 100
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/tmp/graft_sf10}"
OUT_DIR="${2:-/tmp/vout_sf10_gate}"
ARTIFACT="${3:-CORRECTNESS_sf10.json}"

[ -d "$SF_DIR" ] || { echo "fixture $SF_DIR missing — see header for GenFixtures recipe" >&2; exit 2; }

echo "[decade_gate] Verify dump: $SF_DIR -> $OUT_DIR"
SPARK_GRAFT_VERIFY_COALESCE=0 SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
  tools/run.sh graft.Verify "$SF_DIR" "$OUT_DIR"

echo "[decade_gate] DuckDB oracle compare -> $ARTIFACT"
GRAFT_DUCKDB_TMPDIR="${GRAFT_DUCKDB_TMPDIR:-/tmp/duck_spill}"
mkdir -p "$GRAFT_DUCKDB_TMPDIR"
GRAFT_DUCKDB_THREADS="${GRAFT_DUCKDB_THREADS:-24}" \
GRAFT_DUCKDB_MEMLIMIT="${GRAFT_DUCKDB_MEMLIMIT:-90GB}" \
GRAFT_DUCKDB_TMPDIR="$GRAFT_DUCKDB_TMPDIR" \
  python3 tools/check.py --sort-rows --json "$ARTIFACT" "$SF_DIR" "$OUT_DIR"

echo "[decade_gate] done — artifact: $ARTIFACT"
