#!/usr/bin/env python3
"""Aggregate N BENCH_TIMES.json-shaped runs into BENCH_VARIANCE.json.

Usage: python3 tools/bench_variance.py run1.json run2.json [run3.json ...]

Writes BENCH_VARIANCE.json at the repo root: per-query mean/stddev/min/max
over the runs plus the same stats for the total. stddev is the sample
standard deviation (n-1); with the bench's own best-of-2 inside each run,
this measures run-to-run box noise, the number regression triage needs.

Also rewrites BENCH_TIMES.json as the per-query MIN over the same runs
(total = sum of mins). The committed per-query artifact is therefore always
min-of-n from a variance set, never one arbitrary run — a single noisy
sample (round-8's q1_filter_project landed a 0.43 s spike against a
0.114 +/- 0.005 idle mean) can no longer masquerade as the committed time.
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
    # load provenance: per-run 1-min loadavg at start/end as recorded by
    # graft.Bench (round-9's 72-vs-43s driver-vs-idle dispute needed a manual
    # re-run to adjudicate; with loadavg in the artifact it is self-evident)
    "loadavg_start": [r.get("loadavg_start") for r in runs],
    "loadavg_end": [r.get("loadavg_end") for r in runs],
    "runs_per_query": sum(r.get("runs_per_query") or 2 for r in runs),
    "total": stats([r["value"] for r in runs]),
    "queries": {q: stats([r["queries"][q] for r in runs]) for q in sorted(names)},
}
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(root, "BENCH_VARIANCE.json")
json.dump(out, open(path, "w"), indent=2)
print(f"wrote {path}: total mean {out['total']['mean']} s "
      f"± {out['total']['stddev']} s over {len(runs)} runs")

# BENCH_TIMES.json = per-query min-of-n over the same runs, in the exact
# shape graft.Bench persists (one query per line, sorted, diffable)
mins = {q: min(r["queries"][q] for r in runs) for q in sorted(names)}
total_min = round(sum(mins.values()), 9)
lines = ",\n".join(f'    "{q}": {v}' for q, v in mins.items())
times_path = os.path.join(root, "BENCH_TIMES.json")
with open(times_path, "w") as f:
    f.write('{\n  "metric": "total",\n  "value": ' + str(total_min) +
            ',\n  "unit": "sec",\n  "sf": "' + runs[0]["sf"] +
            '",\n  "failed": [],\n  "loadavg_start": ' +
            json.dumps([r.get("loadavg_start") for r in runs]) +
            ',\n  "loadavg_end": ' +
            json.dumps([r.get("loadavg_end") for r in runs]) +
            ',\n  "runs_per_query": ' +
            str(sum(r.get("runs_per_query") or 2 for r in runs)) +
            ',\n  "queries": {\n' + lines + "\n  }\n}\n")
print(f"wrote {times_path}: min-of-{len(runs)} total {total_min} s")
noisy = sorted(out["queries"].items(),
               key=lambda kv: -kv[1]["stddev"])[:8]
for q, s in noisy:
    print(f"  noisiest: {q}: {s['mean']} ± {s['stddev']} s")
