#!/usr/bin/env bash
# sf1 FULL oracle-gate replay (VERDICT r14 ask #2): the q66 class —
# constants valid only at small scale — was caught by the r14 sf0.1
# full replay; this extends the scripted replay to ALL 107 gates one
# decade above the driver's sf0.1 bench scale. Builds the sf1 fixture
# (ScaleUp x10 of sf0.1, FK-consistent) if missing, runs the full
# graft.Verify, and hash-checks every oracle SQL in DuckDB over the
# sf1 parquet. The 10-gate numeric-risk subset stays available as the
# cheap re-run (tools/sf1_numeric_replay.sh).
#
# Usage: tools/sf1_full_replay.sh [sf1Dir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/sf1_full}

if [ ! -d "$SF1/lineitem.parquet" ] && [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "[sf1-full] building $SF1 (ScaleUp x10 of sf0.1)"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SF1 10"
fi

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Verify $SF1 $OUT"
python3 tools/oracle_check.py "$SF1" "$OUT"
