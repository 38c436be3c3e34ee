#!/usr/bin/env bash
# Full oracle-gate suite under a REAL multi-JVM master (VERDICT r13
# ask #1): every CORRECTNESS hash so far was produced on local[32],
# where one shared JVM masks broadcast transport, task serialization
# and executor-resident block management. This runs graft.Verify —
# all 107 gates — under local-cluster[2,16,8192] (2 SEPARATE executor
# JVMs) and checks the same DuckDB oracles.
#
# Usage: tools/cluster_verify.sh [sfDir] [outDir] [prefixFilter]
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/cluster_verify}
ONLY=${3:-}

CP="$PWD/target/scala-2.13/classes"

SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,16,8192]' \
SPARK_GRAFT_EXEC_CP="$CP" \
SPARK_GRAFT_CPUS=32 \
sbt -batch "runMain graft.Verify $SF $OUT $ONLY"

python3 tools/oracle_check.py "$SF" "$OUT"
