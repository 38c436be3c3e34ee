#!/usr/bin/env bash
# Crash-mid-fold rehearsal: SIGKILL a REAL compactor JVM while it is
# writing tier generation v2 (after the fold starts, before the
# manifest flip), then drive recovery end-to-end with the production
# code paths:
#   1. the killed holder's lock is left behind with a dead heartbeat;
#   2. a curateBatch lands fine against the old manifest (the partial
#      v2 dirs are invisible — reads go via the manifest's gen);
#   3. a recovery compactState with a short lockTtl TAKES OVER the
#      stale lock, overwrites the partial v2, flips the manifest, and
#      the self-healing tier sweep leaves only the in-grace
#      generations on disk;
#   4. post-recovery invariants: keys view ≡ docs, an exact dup still
#      drops, no lock residue.
#
# The kill is timed by polling for the v2 tier dir's creation; if the
# fold wins the race (manifest already flipped when the kill lands)
# the phase RETRIES with a fresh state — the assertion is about what
# recovery does with a genuinely torn fold, so a torn fold is a
# precondition, not a flake.
#
# Usage: tools/compaction_crash_rehearsal.sh [seedDocs] [maxTries]
set -euo pipefail
cd "$(dirname "$0")/.."

SEED_DOCS=${1:-20000}
MAX_TRIES=${2:-5}

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { # args...
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

# for the VICTIM: exec so the backgrounded PID is the JVM itself —
# `run ... &` backgrounds a SUBSHELL, and killing that leaves the java
# child alive to finish the fold (the rehearsal's first run caught
# exactly that: the "torn" fold completed underneath the assertions)
run_exec() {
  # shellcheck disable=SC2086
  exec java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

try_one() {
  local STATE
  STATE=$(mktemp -d /tmp/graft_crash_rehearsal.XXXXXX)
  echo "[crash] state: $STATE (seed $SEED_DOCS docs)"

  # seed + first compaction so the torn fold is a RE-compaction (the
  # recovery must rebuild from tier v1 ∪ fresh deltas, not from deltas
  # alone)
  run "$STATE" seed "$SEED_DOCS" 1000000 > /tmp/crash_seed.json
  run "$STATE" compactonce > /tmp/crash_c1.json
  grep -q '"result":"ok","gen":1' /tmp/crash_c1.json || { echo "FAIL: first compaction"; return 2; }
  # fresh deltas so the second fold has real work
  run "$STATE" seed $((SEED_DOCS / 2)) 5000000 > /tmp/crash_seed2.json

  # start the victim compactor and SIGKILL it as soon as tier v2
  # appears on disk (mid-fold: after the write begins, before the flip)
  run_exec "$STATE" compactonce > /tmp/crash_victim.json 2>/dev/null &
  local PID=$!
  local KILLED=0
  for _ in $(seq 1 6000); do
    if [ -d "$STATE/_compacted/v2" ]; then
      kill -9 "$PID" 2>/dev/null || true
      KILLED=1
      break
    fi
    kill -0 "$PID" 2>/dev/null || break
    sleep 0.02
  done
  set +e; wait "$PID" 2>/dev/null; set -e
  if [ "$KILLED" -ne 1 ]; then echo "[crash] victim exited before v2 appeared; retrying"; return 1; fi

  # precondition: the fold must actually be TORN — manifest still gen 1,
  # partial v2 litter on disk, the dead holder's lock left behind
  python3 - "$STATE" <<'EOF' || return 1
import json, sys, os
state = sys.argv[1]
m = json.load(open(os.path.join(state, "COMPACTED")))
if m["gen"] != 1:
    print(f"[crash] kill landed after the flip (gen={m['gen']}); retrying")
    sys.exit(1)
EOF
  [ -d "$STATE/_compacted/v2" ] || { echo "[crash] no partial v2 litter; retrying"; return 1; }
  [ -f "$STATE/_compaction.lock" ] || { echo "[crash] victim released the lock before dying; retrying"; return 1; }
  echo "[crash] torn fold achieved: manifest gen 1, partial v2 on disk, stale lock left"

  # 2. ingestion proceeds against the torn state (reads go via the
  # manifest; the partial v2 is invisible) — 40 synthetic docs
  run "$STATE" curate 1 7000000 > /tmp/crash_curate.json
  grep -q '"appended":40' /tmp/crash_curate.json || { echo "FAIL: post-crash curateBatch"; return 2; }

  # 3. recovery: a short-TTL compactState takes over the stale lock
  # (the heartbeat died with the victim, so the lock ages past the TTL)
  sleep 4
  run "$STATE" compactonce 2000 > /tmp/crash_recover.json
  cat /tmp/crash_recover.json
  grep -q '"result":"ok","gen":2' /tmp/crash_recover.json || { echo "FAIL: recovery compaction did not take over / flip"; return 2; }

  # 4. post-recovery invariants
  run "$STATE" verify > /tmp/crash_verify.json
  cat /tmp/crash_verify.json
  local fail=0
  grep -q '"keys_match_docs":true' /tmp/crash_verify.json || { echo "FAIL: keys view diverged from docs"; fail=1; }
  grep -q '"dup_dropped":true' /tmp/crash_verify.json || { echo "FAIL: dedup semantics broken post-recovery"; fail=1; }
  grep -q '"lock_left":false' /tmp/crash_verify.json || { echo "FAIL: lock residue"; fail=1; }
  # self-healing sweep: only the in-grace generations remain (v1 grace,
  # v2 live — the torn v2 was overwritten in place by the recovery)
  local GENS
  GENS=$(ls "$STATE/_compacted" | sort | tr '\n' ' ' | sed 's/ $//')
  [ "$GENS" = "v1 v2" ] || { echo "FAIL: unexpected tier dirs: $GENS"; fail=1; }
  [ "$fail" -eq 0 ] || return 2
  echo "[crash] PASS — torn fold recovered: takeover, overwrite, flip, sweep, semantics intact"
  return 0
}

for attempt in $(seq 1 "$MAX_TRIES"); do
  echo "[crash] attempt $attempt/$MAX_TRIES"
  set +e; try_one; rc=$?; set -e
  case $rc in
    0) exit 0 ;;
    2) echo "[crash] FAIL (real assertion failure)"; exit 1 ;;
    *) ;; # timing retry
  esac
done
echo "[crash] could not achieve a torn fold in $MAX_TRIES attempts (kill window too narrow on this host)"
exit 1
