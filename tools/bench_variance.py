#!/usr/bin/env python3
"""Aggregate N BENCH_TIMES.json-shaped runs into BENCH_VARIANCE.json.

Usage: python3 tools/bench_variance.py run1.json run2.json [run3.json ...]

Writes BENCH_VARIANCE.json at the repo root: per-query mean/stddev/min/max
over the runs plus the same stats for the total. stddev is the sample
standard deviation (n-1); with the bench's own best-of-2 inside each run,
this measures run-to-run box noise, the number regression triage needs.
"""
import json
import math
import os
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert len(runs) >= 3, "need at least 3 runs for a variance artifact"
names = set(runs[0]["queries"])
for r in runs[1:]:
    assert set(r["queries"]) == names, "runs cover different query sets"
assert all(r.get("failed") in ([], None) for r in runs), "a run had failures"


def stats(xs):
    m = sum(xs) / len(xs)
    sd = math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))
    return {
        "mean": round(m, 4),
        "stddev": round(sd, 4),
        "min": round(min(xs), 4),
        "max": round(max(xs), 4),
        "times": [round(x, 4) for x in xs],
    }


out = {
    "metric": "bench_variance",
    "unit": "sec",
    "runs": len(runs),
    "sf": runs[0]["sf"],
    "total": stats([r["value"] for r in runs]),
    "queries": {q: stats([r["queries"][q] for r in runs]) for q in sorted(names)},
}
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(root, "BENCH_VARIANCE.json")
json.dump(out, open(path, "w"), indent=2)
print(f"wrote {path}: total mean {out['total']['mean']} s "
      f"± {out['total']['stddev']} s over {len(runs)} runs")
noisy = sorted(out["queries"].items(),
               key=lambda kv: -kv[1]["stddev"])[:8]
for q, s in noisy:
    print(f"  noisiest: {q}: {s['mean']} ± {s['stddev']} s")
