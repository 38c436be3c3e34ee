#!/usr/bin/env bash
# THREE-contender single-writer rehearsal: one JVM streaming
# curateBatches (auto-compaction on) and TWO independent JVMs hammering
# compactState against the same state dir — the three-contender
# interleaving the lease doc calls out as the residual takeover window
# (claim-by-rename + verify + restore is supposed to heal the two-deep
# case; this drives it for real). Pinned expectations match
# cross_process_race.sh: zero unexpected compactor errors in BOTH
# hammers, every unique doc survives, no lock residue.
#
# Usage: tools/cross_process_race3.sh [nBatches] [nCompactAttempts]
set -euo pipefail
cd "$(dirname "$0")/.."

N_BATCHES=${1:-12}
N_COMPACT=${2:-20}

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

STATE=$(mktemp -d /tmp/graft_xproc_race3.XXXXXX)
echo "[race3] shared state: $STATE"

run() { # role args...
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx4g -cp "$CP" graft.tools.CrossProcessRace "$STATE" "$@"
}

# seed one batch so the racing compactors have state to fold from the start
run curate 1 1000000 > /tmp/xproc3_seed.json
cat /tmp/xproc3_seed.json

run curate "$N_BATCHES" 2000000 > /tmp/xproc3_curate.json &
PID_A=$!
run compact "$N_COMPACT" > /tmp/xproc3_compact_b.json &
PID_B=$!
run compact "$N_COMPACT" > /tmp/xproc3_compact_c.json &
PID_C=$!
# wait each pid SEPARATELY — `wait A B` returns only the last status
set +e
wait "$PID_A"; ST_A=$?
wait "$PID_B"; ST_B=$?
wait "$PID_C"; ST_C=$?
set -e
cat /tmp/xproc3_curate.json /tmp/xproc3_compact_b.json /tmp/xproc3_compact_c.json

# post-race invariants (single process, quiesced state)
run verify > /tmp/xproc3_verify.json
cat /tmp/xproc3_verify.json

fail=0
[ "$ST_A" -eq 0 ] || { echo "FAIL: curate process exited $ST_A"; fail=1; }
[ "$ST_B" -eq 0 ] || { echo "FAIL: compactor B exited $ST_B"; fail=1; }
[ "$ST_C" -eq 0 ] || { echo "FAIL: compactor C exited $ST_C"; fail=1; }
WANT_DOCS=$((40 * (1 + N_BATCHES)))
grep -q "\"docs\":$WANT_DOCS," /tmp/xproc3_verify.json || { echo "FAIL: expected $WANT_DOCS docs"; fail=1; }
grep -q '"unexpected":0' /tmp/xproc3_compact_b.json || { echo "FAIL: compactor B saw unexpected errors"; fail=1; }
grep -q '"unexpected":0' /tmp/xproc3_compact_c.json || { echo "FAIL: compactor C saw unexpected errors"; fail=1; }
grep -q '"keys_match_docs":true' /tmp/xproc3_verify.json || { echo "FAIL: keys view diverged from docs"; fail=1; }
grep -q '"dup_dropped":true' /tmp/xproc3_verify.json || { echo "FAIL: dedup semantics broken post-race"; fail=1; }
grep -q '"lock_left":false' /tmp/xproc3_verify.json || { echo "FAIL: lock file left behind"; fail=1; }
[ "$fail" -eq 0 ] && echo "[race3] PASS — three-contender single-writer contract held"
exit "$fail"
