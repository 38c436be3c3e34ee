#!/usr/bin/env bash
# Streaming crash rehearsal: SIGKILL a REAL JVM running the COMPOSED
# curate→serve stream (foreachBatch: tenant-scoped curation → serving
# ingest → deferred curation-state commit) mid-micro-batch, restart a
# fresh JVM on the SAME checkpoint, and prove the replay seam
# end-to-end:
#   - Spark's checkpoint replays the torn batch;
#   - the replay re-derives survivors against the UN-mutated curation
#     state (ingest runs BEFORE the state commit — the ordering that
#     makes a torn batch re-derivable instead of self-exact-dropping);
#   - ingestBatch upserts by content-derived id, so a batch whose
#     serving ingest DID land before the kill is not double-indexed;
#   - cross-org copies still survive (tenant isolation), same-org
#     exact redeliveries still drop.
# Exactly-once is asserted by COUNTS: per-org store doc counts, the
# curation state's docs ≡ keys views, and state ≡ store.
#
# Fixture (one JSONL file = one micro-batch, maxFilesPerTrigger=1):
#   seed (drained pre-kill, separate run): f1 s01..s20 org_a,
#                                          f2 t01..t20 org_a
#   crash window: f3 u01..u20 org_a (fresh)
#                 f4 s01..s10 org_a EXACT redeliveries (drop) + v01..v10 fresh
#                 f5 w01..w20 org_a (fresh)
#                 f6 s01..s10 text under ORG_B (survive — tenant isolation)
#   expected: org_a 90 (s20+t20+u20+v10+w20), org_b 10, state 100
#
# Usage: tools/stream_crash_rehearsal.sh [maxTries]
set -euo pipefail
cd "$(dirname "$0")/.."

MAX_TRIES=${1:-5}

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

# one JSONL doc line: unique body per (org, name) with a shared marker
# token, ≥3 words per line and terminal punctuation (the C4 line rule)
emit_docs() { # file prefix from to org marker
  local file=$1 prefix=$2 from=$3 to=$4 org=$5 marker=$6
  python3 - "$file" "$prefix" "$from" "$to" "$org" "$marker" <<'EOF'
import json, sys
f, prefix, lo, hi, org, marker = sys.argv[1:7]
with open(f, "a") as out:
    for i in range(int(lo), int(hi) + 1):
        words = " ".join(f"{prefix}body{i}word{j}" for j in range(1, 9))
        out.write(json.dumps({
            "filename": f"{prefix}{i:02d}.md",
            "text": f"Document {prefix}{i:02d} carries marker {marker} and body {words} "
                    f"with enough steady vocabulary to index cleanly.",
            "organization_id": org}) + "\n")
EOF
}

EXPECT_A=90  # s20 + t20 + u20 + v10 + w20 (f4's s-redeliveries drop)
EXPECT_B=10  # f6's cross-org copies of s01..s10 SURVIVE

try_one() {
  local BASE DOCS STATE CKPT STORE
  BASE=$(mktemp -d /tmp/graft_stream_crash.XXXXXX)
  DOCS="$BASE/docs"; STATE="$BASE/state"; CKPT="$BASE/ckpt"; STORE="$BASE/store"
  mkdir -p "$DOCS"
  echo "[stream-crash] base: $BASE"

  # seed: two files drained to completion by run 1 (clean shutdown)
  emit_docs "$DOCS/f1.jsonl" s 1 20 org_a seedmarker
  emit_docs "$DOCS/f2.jsonl" t 1 20 org_a tmarker
  run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" > /tmp/stcrash_seed.json
  grep -q '"done":true' /tmp/stcrash_seed.json || { echo "FAIL: seed drain"; return 2; }
  local SEED_COMMITS
  SEED_COMMITS=$(ls "$CKPT/commits" | grep -c '^[0-9]*$' || true)

  # four more files: fresh, exact-redelivery+fresh, fresh, cross-org
  emit_docs "$DOCS/f3.jsonl" u 1 20 org_a umarker
  # f4: exact redeliveries of s01..s10 (same filename/text/org) + fresh v
  python3 - "$DOCS/f1.jsonl" "$DOCS/f4.jsonl" <<'EOF'
import sys
src, dst = sys.argv[1:3]
lines = open(src).read().splitlines()[:10]
open(dst, "a").write("\n".join(lines) + "\n")
EOF
  emit_docs "$DOCS/f4.jsonl" v 1 10 org_a vmarker
  emit_docs "$DOCS/f5.jsonl" w 1 20 org_a wmarker
  # f6: s01..s10 text under ORG_B (tenant isolation: must survive)
  python3 - "$DOCS/f1.jsonl" "$DOCS/f6.jsonl" <<'EOF'
import json, sys
src, dst = sys.argv[1:3]
with open(dst, "a") as out:
    for line in open(src).read().splitlines()[:10]:
        d = json.loads(line)
        d["organization_id"] = "org_b"
        out.write(json.dumps(d) + "\n")
EOF

  # victim: drain the 4 new files; kill once the FIRST new batch commits
  # (so the kill lands inside a later batch's curate/ingest/commit span)
  run_exec "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" > /tmp/stcrash_victim.json 2>/dev/null &
  local PID=$!
  local KILLED=0
  for _ in $(seq 1 9000); do
    local C
    C=$(ls "$CKPT/commits" 2>/dev/null | grep -c '^[0-9]*$' || true)
    if [ "$C" -gt "$SEED_COMMITS" ]; then
      sleep 1.5  # land inside the NEXT batch's span
      kill -9 "$PID" 2>/dev/null || true
      KILLED=1
      break
    fi
    kill -0 "$PID" 2>/dev/null || break
    sleep 0.02
  done
  set +e; wait "$PID" 2>/dev/null; set -e
  if [ "$KILLED" -ne 1 ]; then echo "[stream-crash] victim finished before a new commit; retrying"; return 1; fi

  # precondition: the drain must be TORN — fewer commits than files
  local COMMITS
  COMMITS=$(ls "$CKPT/commits" | grep -c '^[0-9]*$' || true)
  if [ "$COMMITS" -ge $((SEED_COMMITS + 4)) ]; then
    echo "[stream-crash] all batches committed before the kill; retrying"; return 1
  fi
  echo "[stream-crash] torn drain achieved: $COMMITS/$((SEED_COMMITS + 4)) batches committed"

  # restart on the SAME checkpoint: Spark replays the torn batch, the
  # replay seam re-derives survivors, the drain completes. SHORT lock
  # TTLs: a kill landing while the victim's ingestBatch held
  # _store.lock (the widest window in a batch span) — or inside an
  # auto-compaction holding _compaction.lock — leaves a dead lock the
  # restart must reclaim in seconds, not the production 30 min
  sleep 4
  SPARK_GRAFT_STORE_LOCK_TTL_MS=3000 SPARK_GRAFT_COMPACTION_LOCK_TTL_MS=3000 \
    run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" > /tmp/stcrash_restart.json
  grep -q '"done":true' /tmp/stcrash_restart.json || { echo "FAIL: restart drain"; return 2; }

  SPARK_GRAFT_STORE_LOCK_TTL_MS=3000 SPARK_GRAFT_COMPACTION_LOCK_TTL_MS=3000 \
    run "$STATE" streamverify "$STORE" "$EXPECT_A" "$EXPECT_B" wmarker seedmarker > /tmp/stcrash_verify.json
  cat /tmp/stcrash_verify.json
  local fail=0
  grep -q '"counts_match":true' /tmp/stcrash_verify.json || { echo "FAIL: per-org doc counts (lost or double-indexed batch)"; fail=1; }
  grep -q '"found_a":true' /tmp/stcrash_verify.json || { echo "FAIL: post-kill org_a content unsearchable"; fail=1; }
  grep -q '"found_b":true' /tmp/stcrash_verify.json || { echo "FAIL: cross-org survivor unsearchable"; fail=1; }
  grep -q '"keys_match_docs":true' /tmp/stcrash_verify.json || { echo "FAIL: curation state torn (distinct keys ≠ distinct docs)"; fail=1; }
  grep -q '"state_match_store":true' /tmp/stcrash_verify.json || { echo "FAIL: curation state diverged from store"; fail=1; }
  grep -q '"store_lock_left":false' /tmp/stcrash_verify.json || { echo "FAIL: store lock residue"; fail=1; }
  # a stale _compaction.lock is the DOCUMENTED degrade when the kill
  # lands inside maybeAutoCompact and no later batch re-triggers the
  # fold (lease-denied skips are bounded by the TTL, not by this run) —
  # retry for a cleaner kill point rather than failing the contract
  if grep -q '"compaction_lock_left":true' /tmp/stcrash_verify.json; then
    echo "[stream-crash] kill landed inside auto-compaction (stale _compaction.lock residue — the documented bounded degrade); retrying for a mid-batch kill"
    return 1
  fi
  [ "$fail" -eq 0 ] || return 2
  echo "[stream-crash] PASS — torn micro-batch replayed exactly-once: counts, tenant isolation, state ≡ store"
  return 0
}

for attempt in $(seq 1 "$MAX_TRIES"); do
  echo "[stream-crash] attempt $attempt/$MAX_TRIES"
  set +e; try_one; rc=$?; set -e
  case $rc in
    0) exit 0 ;;
    2) echo "[stream-crash] FAIL (real assertion failure)"; exit 1 ;;
    *) ;;
  esac
done
echo "[stream-crash] could not achieve a torn drain in $MAX_TRIES attempts"
exit 1
