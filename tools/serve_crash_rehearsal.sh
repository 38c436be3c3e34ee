#!/usr/bin/env bash
# Serving-store crash rehearsal: SIGKILL a REAL QueryService JVM while
# its ingestBatch is writing segment dirs (after the mutation lease is
# held and dirs appear, before the CURRENT flip), then recover with
# production code only:
#   1. the killed writer's `_store.lock` is left behind (dead
#      heartbeat) and unreferenced segment litter sits on disk;
#   2. a fresh instance started with a short SPARK_GRAFT_STORE_LOCK_TTL_MS
#      takes over the stale lock at construction, startup-GCs the
#      litter, and ingests normally;
#   3. post-recovery: CURRENT holds exactly the committed docs (the
#      torn batch is invisible — nothing partial served), both writers'
#      content is searchable, the litter dirs are gone, no lock residue.
#
# Retries with a fresh store when the kill loses the race to the flip
# (a torn mutation is the precondition under test, not a flake source).
#
# Usage: tools/serve_crash_rehearsal.sh [bigDocs] [maxTries]
set -euo pipefail
cd "$(dirname "$0")/.."

BIG_DOCS=${1:-4000}
MAX_TRIES=${2:-5}

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { # args...
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

run_exec() { # victim: exec so the backgrounded PID IS the JVM
  # shellcheck disable=SC2086
  exec java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

try_one() {
  local STORE
  STORE=$(mktemp -d /tmp/graft_serve_crash.XXXXXX)
  echo "[serve-crash] store: $STORE (big batch $BIG_DOCS docs)"

  # seed: 3 committed batches of 20 docs from writer A
  run "$STORE" serve 3 crashseed > /tmp/scrash_seed.json
  grep -q '"chunks"' /tmp/scrash_seed.json || { echo "FAIL: seed"; return 2; }
  cp "$STORE/CURRENT" /tmp/scrash_current_before
  ls "$STORE" | sort > /tmp/scrash_dirs_before

  # victim: bulk ingest, killed as soon as a NEW dir appears under the
  # root (segment/derived writes precede the CURRENT flip)
  run_exec "$STORE" servebig "$BIG_DOCS" crashvictim > /tmp/scrash_victim.json 2>/dev/null &
  local PID=$!
  local KILLED=0
  local NEW
  for _ in $(seq 1 9000); do
    # trigger on new SEGMENT/DERIVED litter only — the victim's own
    # _store.lock (and a transient CURRENT.tmp) appear first and would
    # fire the kill before any data dir exists
    NEW=$(ls "$STORE" | sort | comm -13 /tmp/scrash_dirs_before - |
      grep -Ev '^(_store.lock|CURRENT)' || true)
    if [ -n "$NEW" ]; then
      kill -9 "$PID" 2>/dev/null || true
      KILLED=1
      break
    fi
    kill -0 "$PID" 2>/dev/null || break
    sleep 0.02
  done
  set +e; wait "$PID" 2>/dev/null; set -e
  if [ "$KILLED" -ne 1 ]; then echo "[serve-crash] victim finished before litter appeared; retrying"; return 1; fi

  # precondition: the mutation must be TORN — CURRENT unchanged, new
  # unreferenced dirs on disk, the dead writer's lock left behind
  cmp -s /tmp/scrash_current_before "$STORE/CURRENT" || { echo "[serve-crash] kill landed after the flip; retrying"; return 1; }
  ls "$STORE" | sort > /tmp/scrash_dirs_torn
  local LITTER
  LITTER=$(comm -13 /tmp/scrash_dirs_before /tmp/scrash_dirs_torn | grep -v '^_store.lock$' || true)
  [ -n "$LITTER" ] || { echo "[serve-crash] no litter dirs; retrying"; return 1; }
  [ -f "$STORE/_store.lock" ] || { echo "[serve-crash] victim released the lock before dying; retrying"; return 1; }
  echo "[serve-crash] torn mutation achieved: CURRENT unchanged, litter [$(echo "$LITTER" | tr '\n' ' ')], stale lock left"

  # recovery: a fresh instance with a 3 s lock TTL (the clamp floor) — construction takes
  # over the stale lock, startup-GCs the litter, then ingests 1 batch
  sleep 4
  SPARK_GRAFT_STORE_LOCK_TTL_MS=3000 run "$STORE" serve 1 crashrec > /tmp/scrash_recover.json
  grep -q '"chunks"' /tmp/scrash_recover.json || { echo "FAIL: recovery ingest"; return 2; }

  # post-recovery invariants: 3×20 committed + 1×20 recovery = 80 docs,
  # the torn batch invisible, both writers searchable, litter gone,
  # no lock residue
  SPARK_GRAFT_STORE_LOCK_TTL_MS=3000 run "$STORE" serveverify 80 crashseed crashrec > /tmp/scrash_verify.json
  cat /tmp/scrash_verify.json
  local fail=0
  grep -q '"docs_match":true' /tmp/scrash_verify.json || { echo "FAIL: doc count (torn batch leaked or commits lost)"; fail=1; }
  grep -q '"found_a":true' /tmp/scrash_verify.json || { echo "FAIL: seed writer's docs unsearchable"; fail=1; }
  grep -q '"found_b":true' /tmp/scrash_verify.json || { echo "FAIL: recovery writer's docs unsearchable"; fail=1; }
  grep -q '"lock_left":false' /tmp/scrash_verify.json || { echo "FAIL: lock residue"; fail=1; }
  # every dir on disk must be referenced by CURRENT — NOTE: the litter
  # names themselves may legitimately reappear (startup GC removes the
  # victim's segN/derivedN, then the recovery mutation rebases to the
  # same next-seq and re-writes those names as live data; the first run
  # of this rehearsal tripped over exactly that), so the assertion is
  # "no unreferenced dir", not "litter name absent"
  python3 - "$STORE" <<'EOF' || fail=1
import json, os, sys
store = sys.argv[1]
m = json.load(open(os.path.join(store, "CURRENT")))
referenced = {m["base"], m["derived"], *m["segments"]}
on_disk = {d for d in os.listdir(store)
           if os.path.isdir(os.path.join(store, d))}
orphans = on_disk - referenced
if orphans:
    print(f"FAIL: unreferenced dirs survived recovery: {sorted(orphans)}")
    sys.exit(1)
print(f"[serve-crash] store clean: {sorted(on_disk)} all referenced by CURRENT")
EOF
  [ "$fail" -eq 0 ] || return 2
  echo "[serve-crash] PASS — torn serving mutation recovered: takeover, startup GC, commit integrity, search intact"
  return 0
}

for attempt in $(seq 1 "$MAX_TRIES"); do
  echo "[serve-crash] attempt $attempt/$MAX_TRIES"
  set +e; try_one; rc=$?; set -e
  case $rc in
    0) exit 0 ;;
    2) echo "[serve-crash] FAIL (real assertion failure)"; exit 1 ;;
    *) ;;
  esac
done
echo "[serve-crash] could not achieve a torn mutation in $MAX_TRIES attempts"
exit 1
