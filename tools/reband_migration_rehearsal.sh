#!/usr/bin/env bash
# RE-BAND MIGRATION rehearsal (VERDICT r14 ask #4): the identity fence
# correctly REFUSES a changed bands/rows layout on an existing state
# (stream_upgrade_rehearsal.sh phase C), but the production answer to
# "we need more near-dup recall" cannot be "discard all dedup state".
# CurationStream.migrateIdentity rebuilds the band index offline under
# the new layout into a fresh stamped stateDir; this rehearsal proves
# the full lifecycle across SEPARATE JVMs:
#
#   A. seed: drain two files through the composed curate→serve stream
#      at bands=4 rows=4, clean stop. (File f2 uses long bodies so its
#      near-dups in phase C sit safely above the 0.8 Jaccard bar.)
#   B. migrate: offline re-band into a FRESH stateDir at bands=8
#      rows=2 (same minhashK=16), scope prefixes preserved.
#   C. resume: same checkpoint + serving store, NEW stateDir, bands=8
#      rows=2. New files carry fresh docs (must index), EXACT
#      redeliveries of seed docs (must drop via the migrated keys) and
#      NEAR-DUP redeliveries of seed docs (must drop via the
#      re-derived band index at the new layout). Exactly-once by
#      counts; state-vs-store reconciliation via streamverify.
#
# Usage: tools/reband_migration_rehearsal.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx6g -cp "$CP" graft.tools.CrossProcessRace "$@"
}

emit_docs() { # file prefix from to org marker [words] [tail]
  local file=$1 prefix=$2 from=$3 to=$4 org=$5 marker=$6 words=${7:-8} tail=${8:-}
  python3 - "$file" "$prefix" "$from" "$to" "$org" "$marker" "$words" "$tail" <<'EOF'
import json, sys
f, prefix, lo, hi, org, marker, words, tail = sys.argv[1:9]
with open(f, "a") as out:
    for i in range(int(lo), int(hi) + 1):
        body = " ".join(f"{prefix}body{i}word{j}" for j in range(1, int(words) + 1))
        text = (f"Document {prefix}{i:02d} carries marker {marker} and body {body} "
                f"with enough steady vocabulary to index cleanly.")
        name = f"{prefix}{i:02d}.md"
        if tail:
            text += f" {tail}"
            name = f"{prefix}near{i:02d}.md"
        out.write(json.dumps({"filename": name, "text": text,
                              "organization_id": org}) + "\n")
EOF
}

BASE=$(mktemp -d /tmp/graft_reband.XXXXXX)
DOCS="$BASE/docs"; STATE="$BASE/state"; STATE2="$BASE/state_8x2"
CKPT="$BASE/ckpt"; STORE="$BASE/store"
mkdir -p "$DOCS"
echo "[reband] base: $BASE"

# ---- phase A: seed at bands=4 rows=4 ------------------------------------
emit_docs "$DOCS/f1.jsonl" s 1 20 org_a seedmarker
emit_docs "$DOCS/f2.jsonl" t 1 20 org_a tmarker 24
run "$STATE" streamdrain "$DOCS" "$CKPT" "$STORE" 4 - 4 > /tmp/reband_seed.json
grep -q '"done":true' /tmp/reband_seed.json || { echo "FAIL: seed drain"; exit 1; }
run "$STATE" streamverify "$STORE" 40 0 seedmarker none > /tmp/reband_a.json
grep -q '"org_a":40' /tmp/reband_a.json || { echo "FAIL: phase A counts"; cat /tmp/reband_a.json; exit 1; }
echo "[reband] phase A ok: 40 docs at $(cat "$STATE/_identity")"

# ---- phase B: offline re-band migration ---------------------------------
run "$STATE" migrate "$STATE2" 8 2 > /tmp/reband_migrate.json
grep -q '"banded_docs":40' /tmp/reband_migrate.json || {
  echo "FAIL: migration banded-doc count"; cat /tmp/reband_migrate.json; exit 1; }
grep -q '"bands":8' "$STATE2/_identity" || { echo "FAIL: new identity stamp"; exit 1; }
echo "[reband] phase B ok: migrated to $(cat "$STATE2/_identity")"

# ---- phase C: resume at bands=8 rows=2 on the migrated state ------------
emit_docs "$DOCS/f3.jsonl" u 1 10 org_a umarker             # fresh -> index
emit_docs "$DOCS/f3.jsonl" s 1 10 org_a seedmarker          # exact redelivery -> drop
emit_docs "$DOCS/f4.jsonl" t 1 10 org_a tmarker 24 "near dup tail" # near-dup -> drop
run "$STATE2" streamdrain "$DOCS" "$CKPT" "$STORE" 8 - 2 > /tmp/reband_c.json
grep -q '"done":true' /tmp/reband_c.json || { echo "FAIL: phase C drain"; exit 1; }
run "$STATE2" streamverify "$STORE" 50 0 umarker none > /tmp/reband_cv.json
grep -q '"counts_match":true' /tmp/reband_cv.json || {
  echo "FAIL: exactly-once counts after migration (exact or near"
  echo "      redeliveries re-entered, or fresh docs lost)"
  cat /tmp/reband_cv.json; exit 1; }
grep -q '"found_a":true' /tmp/reband_cv.json || { echo "FAIL: fresh docs lost"; exit 1; }
grep -q '"keys_match_docs":true' /tmp/reband_cv.json || {
  echo "FAIL: migrated state keys/docs diverged"; cat /tmp/reband_cv.json; exit 1; }
echo "[reband] phase C ok: fresh docs indexed; exact redeliveries dropped" \
  "via migrated keys; near-dups dropped via the re-derived 8x2 band index"

rm -rf "$BASE"
echo "[reband] PASS — bands=4x4 state migrated offline to 8x2 and resumed" \
  "on the same checkpoint with exactly-once counts preserved"
