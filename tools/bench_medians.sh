#!/bin/bash
# n-run quiet-protocol bench (BASELINE.md measurement protocol, VERDICT
# r3 ask #7): run graft.Bench N times back-to-back on SF_DIR, write one
# JSON line per run to OUT, then print per-query medians.
set -e
cd "$(dirname "$0")/.."
N="${N:-3}"
SF_DIR="${SF_DIR:-/root/testdata/sf0.1}"
OUT="${OUT:-/tmp/bench_runs.jsonl}"
: > "$OUT"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR="$SF_DIR" java -Xmx96g -cp "$CP" \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    graft.Bench 2>/dev/null | tail -1 >> "$OUT"
  echo "run $i done" >&2
done
python3 - "$OUT" <<'EOF'
import json, statistics, sys
runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
qs = runs[0]["queries"].keys()
med = {q: round(statistics.median(r["queries"][q] for r in runs), 2) for q in qs}
print(json.dumps({"n": len(runs), "sf": runs[0]["sf"],
                  "total_median": round(statistics.median(r["value"] for r in runs), 1),
                  "queries": med}))
EOF
