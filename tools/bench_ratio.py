#!/usr/bin/env python3
"""Per-entry ratio table between two Bench JSON artifacts.

Usage: tools/bench_ratio.py BASE.json NUM.json
Prints median/quartile per-entry ratio (NUM/BASE) and the biggest
movers — the r15 cluster-vs-local sf1 adjudication helper.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


base, num = load(sys.argv[1]), load(sys.argv[2])
qb, qn = base["queries"], num["queries"]
common = [k for k in qb if k in qn and qb[k] > 0 and qn[k] > 0]
ratios = sorted((qn[k] / qb[k], k) for k in common)
vals = [r for r, _ in ratios]
print(json.dumps({
    "entries": len(common),
    "total_base": round(sum(qb[k] for k in common), 1),
    "total_num": round(sum(qn[k] for k in common), 1),
    "ratio_median": round(statistics.median(vals), 3),
    "ratio_p25": round(vals[len(vals) // 4], 3),
    "ratio_p75": round(vals[3 * len(vals) // 4], 3),
    "worst5": [{"q": k, "ratio": round(r, 2), "base": qb[k], "num": qn[k]}
               for r, k in ratios[-5:]],
    "best5": [{"q": k, "ratio": round(r, 2), "base": qb[k], "num": qn[k]}
              for r, k in ratios[:5]],
}))
