#!/usr/bin/env python3
"""Pin the current bench.json per-query minima as the standing wall-time
baseline in BASELINE.json ("pinned_wall_seconds"). graft.Bench then emits
vs_baseline_total / vs_baseline_worst / vs_baseline_regressions on every
run, making the 2x perf gate mechanically checkable instead of requiring a
human diff against a prior round's artifact.

Refuses contended runs — the baseline must be a quiet-host measurement.

Usage: python3 tools/pin_baseline.py <round_number>
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")

bench = json.load(open(os.path.join(REPO, "bench.json")))
if bench.get("contended"):
    sys.exit("refusing to pin a contended run — re-run bench on a quiet host")
if bench.get("errors"):
    sys.exit(f"refusing to pin a run with errors: {sorted(bench['errors'])}")

rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
path = os.path.join(REPO, "BASELINE.json")
base = json.load(open(path))
base["pinned_wall_seconds"] = {
    "sf": os.path.basename(bench["sf"].rstrip("/")),
    "round": rnd,
    "stat": "min",
    "reps": bench["reps"],
    "total": bench["total_min"],
    "queries": bench["queries_min"],
}
with open(path, "w") as f:
    json.dump(base, f, indent=2)
    f.write("\n")
print(f"pinned {len(bench['queries_min'])} query minima "
      f"(total {bench['total_min']}s, round {rnd}) into BASELINE.json")
