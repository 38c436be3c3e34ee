#!/usr/bin/env bash
# Streaming UPGRADE-COMPATIBILITY rehearsal (VERDICT r13 ask #5): the
# crash triplet proves recovery on the SAME code; this proves the
# checkpoint/state compatibility contract across a CODE/CONFIG CHANGE
# (the Spark state-schema-evolution trap, in this engine's terms — the
# persisted dedup state's band_key layout):
#
#   A. seed: drain two files through the composed curate→serve stream
#      (identity bands=4), clean stop.
#   B. COMPATIBLE upgrade: fresh JVM, SAME checkpoint + state + store,
#      changed BEHAVIOR knobs (Gopher quality gate 5..50 words added).
#      New files: fresh docs (index), EXACT redeliveries of seed docs
#      (must still drop against the pre-upgrade state), an over-long
#      junk doc (the new gate must drop it). Exactly-once by counts.
#   C. STATE-BREAKING change: fresh JVM, same everything, bands=8.
#      The identity fence must FAIL the stream LOUDLY (persisted
#      band_key space reshaped — continuing would silently stop
#      matching near-dups against pre-change state); store counts
#      unchanged.
#
# Contract (CurationStream.identityJson scaladoc): minhashK/bands/rows
# are state-breaking (fresh stateDir required); jaccardThreshold /
# minWordsPerLine / gopherWordBounds are behavior knobs, compatible;
# prune/auto-compact are operational, compatible; foreachBatch logic
# changes are opaque to Spark's checkpoint.
#
# Usage: tools/stream_upgrade_rehearsal.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

emit_docs() { # file prefix from to org marker [words]
  local file=$1 prefix=$2 from=$3 to=$4 org=$5 marker=$6 words=${7:-8}
  python3 - "$file" "$prefix" "$from" "$to" "$org" "$marker" "$words" <<'EOF'
import json, sys
f, prefix, lo, hi, org, marker, words = sys.argv[1:8]
with open(f, "a") as out:
    for i in range(int(lo), int(hi) + 1):
        body = " ".join(f"{prefix}body{i}word{j}" for j in range(1, int(words) + 1))
        out.write(json.dumps({
            "filename": f"{prefix}{i:02d}.md",
            "text": f"Document {prefix}{i:02d} carries marker {marker} and body {body} "
                    f"with enough steady vocabulary to index cleanly.",
            "organization_id": org}) + "\n")
EOF
}

BASE=$(mktemp -d /tmp/graft_stream_upgrade.XXXXXX)
DOCS="$BASE/docs"; STATE="$BASE/state"; CKPT="$BASE/ckpt"; STORE="$BASE/store"
mkdir -p "$DOCS"
echo "[upgrade] base: $BASE"

# ---- phase A: seed with identity bands=4 -------------------------------
emit_docs "$DOCS/f1.jsonl" s 1 20 org_a seedmarker
emit_docs "$DOCS/f2.jsonl" t 1 20 org_a tmarker
run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" 4 - > /tmp/upg_seed.json
grep -q '"done":true' /tmp/upg_seed.json || { echo "FAIL: seed drain"; exit 1; }
run "$STATE" streamverify "$STORE" 40 0 seedmarker none > /tmp/upg_a.json
grep -q '"org_a":40' /tmp/upg_a.json || { echo "FAIL: phase A counts"; cat /tmp/upg_a.json; exit 1; }
test -f "$STATE/_identity" || { echo "FAIL: no identity stamp"; exit 1; }
echo "[upgrade] phase A ok: 40 docs, identity stamped: $(cat "$STATE/_identity")"

# ---- phase B: compatible upgrade (gopher gate added) -------------------
emit_docs "$DOCS/f3.jsonl" u 1 10 org_a umarker            # fresh
emit_docs "$DOCS/f3.jsonl" s 1 10 org_a seedmarker         # exact redelivery -> drop
emit_docs "$DOCS/f4.jsonl" j 1 3  org_a junkmarker 60      # >50 words -> gopher drops
run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" 4 5:50 > /tmp/upg_b.json
grep -q '"done":true' /tmp/upg_b.json || { echo "FAIL: phase B drain"; exit 1; }
run "$STATE" streamverify "$STORE" 50 0 umarker none > /tmp/upg_bv.json
grep -q '"counts_match":true' /tmp/upg_bv.json || {
  echo "FAIL: phase B exactly-once counts"; cat /tmp/upg_bv.json; exit 1; }
grep -q '"found_a":true' /tmp/upg_bv.json || { echo "FAIL: fresh docs lost"; exit 1; }
echo "[upgrade] phase B ok: behavior-knob upgrade on the same checkpoint" \
  "— redeliveries dropped via pre-upgrade state, gate enforced, 50 docs"

# ---- phase C: state-breaking change must fail loudly -------------------
emit_docs "$DOCS/f5.jsonl" x 1 5 org_a xmarker
set +e
run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" 8 - > /tmp/upg_c.json 2>/tmp/upg_c.err
RC=$?
set -e
if [ "$RC" -eq 0 ]; then
  echo "FAIL: bands=8 restart on a bands=4 state did not fail"; exit 1
fi
grep -q "built with dedup identity" /tmp/upg_c.err || {
  echo "FAIL: failure is not the identity fence"; tail -5 /tmp/upg_c.err; exit 1; }
run "$STATE" streamverify "$STORE" 50 0 umarker none > /tmp/upg_cv.json
grep -q '"counts_match":true' /tmp/upg_cv.json || {
  echo "FAIL: store mutated by the refused run"; cat /tmp/upg_cv.json; exit 1; }
echo "[upgrade] phase C ok: identity fence refused bands=4→8 on the live" \
  "state; store unchanged"

rm -rf "$BASE"
echo "[upgrade] PASS — compatible knobs upgrade in place on the same" \
  "checkpoint+state; state-breaking knobs are refused loudly"
