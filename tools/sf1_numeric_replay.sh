#!/usr/bin/env bash
# sf1 DuckDB-oracle replay of the numeric-risk gates (VERDICT r13 ask
# #8): the decimal-ulp class (BASELINE r4) was invisible at sf0.01 and
# only surfaced at sf0.1 — so the float/decimal-heavy gates get a
# scripted replay one decade ABOVE the driver's gate scale. Builds the
# sf1 fixture (ScaleUp x10 of sf0.1, FK-consistent) if missing, runs
# graft.Verify restricted to the numeric gates, and hash-checks the
# same oracle SQL in DuckDB over the sf1 parquet.
#
# Gate set: decimal aggregation (q01), BM25 float scoring (q22),
# windowed money (q61), ppl bucketing (q89), DSIR log-weights (q97),
# stupid-backoff LM (q100), classifier train/score (q106/q107),
# temperature mixture weights (q111), quality metrics (q36).
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/sf1_numeric}
GATES="q01,q22,q61,q89,q97,q100,q106,q107,q111,q36"

if [ ! -d "$SF1/lineitem.parquet" ] && [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "[sf1-replay] building $SF1 (ScaleUp x10 of sf0.1)"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SF1 10"
fi

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF1 $OUT $GATES"
python3 tools/oracle_check.py "$SF1" "$OUT"
