#!/usr/bin/env bash
# Cross-process single-writer rehearsal: two SEPARATE JVM drivers race
# curateBatch (auto-compaction on) and compactState against ONE shared
# curation-state dir — exercising the _compaction.lock layer that the
# in-process CyclicBarrier spec cannot (same-JVM registry). The local
# FS create is NIO O_EXCL (atomic), so the pinned expectation is: zero
# "unexpected" outcomes, every lease denial clean, and the post-race
# verify invariants all true. See BASELINE.md "Round 12".
#
# Usage: tools/cross_process_race.sh [nBatches] [nCompactAttempts]
set -euo pipefail
cd "$(dirname "$0")/.."

N_BATCHES=${1:-12}
N_COMPACT=${2:-20}

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

STATE=$(mktemp -d /tmp/graft_xproc_race.XXXXXX)
echo "[race] shared state: $STATE"

run() { # role args...
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx4g -cp "$CP" graft.tools.CrossProcessRace "$STATE" "$@"
}

# seed one batch so the racing compactor has state to fold from the start
run curate 1 1000000 > /tmp/xproc_seed.json
cat /tmp/xproc_seed.json

# the race: one JVM streaming batches (each attempting auto-compaction),
# one JVM hammering compactState directly
run curate "$N_BATCHES" 2000000 > /tmp/xproc_curate.json &
PID_A=$!
run compact "$N_COMPACT" > /tmp/xproc_compact.json &
PID_B=$!
# wait each pid SEPARATELY — `wait A B` returns only the last status,
# which silently swallowed a crashed curate process in the first run
set +e
wait "$PID_A"; ST_A=$?
wait "$PID_B"; ST_B=$?
set -e
cat /tmp/xproc_curate.json /tmp/xproc_compact.json

# post-race invariants (single process, quiesced state)
run verify > /tmp/xproc_verify.json
cat /tmp/xproc_verify.json

fail=0
[ "$ST_A" -eq 0 ] || { echo "FAIL: curate process exited $ST_A"; fail=1; }
[ "$ST_B" -eq 0 ] || { echo "FAIL: compact process exited $ST_B"; fail=1; }
# all synthetic docs are unique → every batch's 40 rows must survive
WANT_DOCS=$((40 * (1 + N_BATCHES)))
grep -q "\"docs\":$WANT_DOCS," /tmp/xproc_verify.json || { echo "FAIL: expected $WANT_DOCS docs"; fail=1; }
grep -q '"unexpected":0' /tmp/xproc_compact.json || { echo "FAIL: compactor saw unexpected errors"; fail=1; }
grep -q '"keys_match_docs":true' /tmp/xproc_verify.json || { echo "FAIL: keys view diverged from docs"; fail=1; }
grep -q '"dup_dropped":true' /tmp/xproc_verify.json || { echo "FAIL: dedup semantics broken post-race"; fail=1; }
grep -q '"lock_left":false' /tmp/xproc_verify.json || { echo "FAIL: lock file left behind"; fail=1; }
[ "$fail" -eq 0 ] && echo "[race] PASS — cross-process single-writer contract held"
exit "$fail"
