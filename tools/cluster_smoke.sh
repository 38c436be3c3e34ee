#!/usr/bin/env bash
# Multi-executor smoke: run the store/stream suites under
# local-cluster[2,8,4096] — two SEPARATE executor JVMs — to catch
# single-JVM assumptions (driver-only memos are fine by design;
# executor-resident localCheckpoint blocks, broadcast sizing and store
# metadata IO are the real risks). See BASELINE.md "Round 11".
#
# Usage: tools/cluster_smoke.sh [suite ...]
set -euo pipefail
cd "$(dirname "$0")/.."

SUITES=${*:-"graft.QueryServiceSpec graft.CurateServeStreamSpec graft.CurationStreamSpec graft.StateCompactionSpec"}

# executors are launched by the in-process Worker from the Spark dist:
# they need the dist's scala version hint plus the repo classes and the
# scalatest/scalacheck jars on their classpath (test closures reference
# suite classes)
CP="$PWD/target/scala-2.13/classes:$PWD/target/scala-2.13/test-classes"
CP="$CP:$(find "$HOME/.cache/coursier" \
  \( -name '*_2.13-3.2.19.jar' -o -name 'scalatest-compatible-3.2.19.jar' \
     -o -name 'scalacheck_2.13-1.18.0.jar' \) 2>/dev/null | tr '\n' ':')"

SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_TEST_MASTER='local-cluster[2,8,4096]' \
SPARK_GRAFT_TEST_EXEC_CP="$CP" \
exec sbt -batch "testOnly $SUITES"
