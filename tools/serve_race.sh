#!/usr/bin/env bash
# Cross-process SERVING race: two separate JVM QueryService instances
# ingest concurrently into ONE store root. The `_store.lock` mutation
# lease + pre-mutation rebase must compose every flip — the pinned
# expectation is zero lost documents (both writers' full doc sets
# searchable from a fresh third instance) and no lock residue. See
# BASELINE.md "Round 12" and MultiInstanceSpec for the in-JVM twin.
#
# Usage: tools/serve_race.sh [nBatchesPerWriter]
set -euo pipefail
cd "$(dirname "$0")/.."

N_BATCHES=${1:-6}

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

STORE=$(mktemp -d /tmp/graft_serve_race.XXXXXX)
echo "[serve-race] shared store: $STORE"

run() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx4g -cp "$CP" graft.tools.CrossProcessRace "$STORE" "$@"
}

run serve "$N_BATCHES" writera > /tmp/srace_a.json &
PID_A=$!
run serve "$N_BATCHES" writerb > /tmp/srace_b.json &
PID_B=$!
set +e
wait "$PID_A"; ST_A=$?
wait "$PID_B"; ST_B=$?
set -e
cat /tmp/srace_a.json /tmp/srace_b.json

# every doc is unique (writer tag + batch + id in the filename), so the
# composed store must hold exactly 2 * N_BATCHES * 20 documents
WANT=$((2 * N_BATCHES * 20))
run serveverify "$WANT" writera writerb > /tmp/srace_verify.json
cat /tmp/srace_verify.json

fail=0
[ "$ST_A" -eq 0 ] || { echo "FAIL: writer A exited $ST_A"; fail=1; }
[ "$ST_B" -eq 0 ] || { echo "FAIL: writer B exited $ST_B"; fail=1; }
grep -q '"docs_match":true' /tmp/srace_verify.json || { echo "FAIL: expected $WANT docs — a flip was lost"; fail=1; }
grep -q '"found_a":true' /tmp/srace_verify.json || { echo "FAIL: writer A's docs unsearchable"; fail=1; }
grep -q '"found_b":true' /tmp/srace_verify.json || { echo "FAIL: writer B's docs unsearchable"; fail=1; }
grep -q '"lock_left":false' /tmp/srace_verify.json || { echo "FAIL: store lock left behind"; fail=1; }
[ "$fail" -eq 0 ] && echo "[serve-race] PASS — no flip lost across two writer JVMs"
exit "$fail"
