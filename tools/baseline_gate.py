#!/usr/bin/env python3
"""The 2x perf-regression gate, ENFORCED (round 10; VERDICT_r09 item 5).

Bench.scala emits vs_baseline_* fields but nothing acted on them — the gate
the grading uses was not the gate the build enforces. This tool closes that:
it recomputes per-query ratios INDEPENDENTLY from bench.json's per-rep
minima against BASELINE.json's pinned quiet-host minima and exits nonzero
when the gate fails, printing every offending query.

Exit codes:
  0  gate passes (all common queries < 2x their pin, comparison valid)
  1  REGRESSION: at least one query >= 2x its pinned min (offenders printed)
  2  gate cannot run: baseline missing/malformed, sf mismatch, no common
     queries, or bench.json carries the "vs_baseline":"unavailable:..."
     marker — distinguished loudly from a pass (round-9 advice: a silently
     disabled comparison must never read as green)
  3  bench run is contended (median >1.5x min survived adjudication):
     wall-clock ratios from a loaded host are noise, not regressions —
     rerun on a quiet host; refusing mirrors tools/pin_baseline.py

Usage:
  python3 tools/baseline_gate.py [bench.json] [BASELINE.json]
  python3 tools/baseline_gate.py --self-test   # forced-regression test
"""
import json, sys, os

THRESHOLD = 2.0


def gate(bench: dict, baseline: dict, out=sys.stdout):
    """Returns (exit_code, message). Pure so the self-test can force inputs."""
    vb = bench.get("vs_baseline")
    if isinstance(vb, str) and vb.startswith("unavailable:"):
        return 2, f"bench.json reports the comparison itself failed: {vb}"
    if bench.get("contended"):
        return 3, ("bench run is contended (loadavg_before=%s) - rerun on a "
                   "quiet host before gating" % bench.get("loadavg_before", "?"))
    pin = baseline.get("pinned_wall_seconds")
    if not isinstance(pin, dict):
        return 2, "BASELINE.json has no pinned_wall_seconds block"
    pin_sf, bench_sf = pin.get("sf"), os.path.basename(str(bench.get("sf", "")).rstrip("/"))
    if pin_sf != bench_sf:
        return 2, f"sf mismatch: pin={pin_sf} bench={bench_sf}"
    base_q = pin.get("queries")
    mins = bench.get("queries_min") or bench.get("queries")
    if not isinstance(base_q, dict) or not base_q or not isinstance(mins, dict) or not mins:
        return 2, "pin or bench carries no per-query minima"
    common = sorted(set(base_q) & set(mins))
    if not common:
        return 2, "no common queries between bench and pin"
    ratios = {q: mins[q] / base_q[q] for q in common if base_q[q] > 0}
    offenders = {q: r for q, r in ratios.items() if r >= THRESHOLD}
    tot = sum(mins[q] for q in common) / sum(base_q[q] for q in common)
    print(f"[gate] {len(common)} common queries vs round-{pin.get('round', '?')} pin: "
          f"total ratio {tot:.3f}, worst {max(ratios.values()):.2f}x "
          f"({max(ratios, key=ratios.get)})", file=out)
    if offenders:
        for q, r in sorted(offenders.items(), key=lambda kv: -kv[1]):
            print(f"[gate] REGRESSION {q}: {mins[q]:.2f}s vs pinned {base_q[q]:.2f}s "
                  f"= {r:.2f}x (>= {THRESHOLD}x)", file=out)
        return 1, f"{len(offenders)} queries regressed >= {THRESHOLD}x vs the pinned baseline"
    return 0, f"gate PASSES: no query >= {THRESHOLD}x its pinned min"


def self_test():
    """Forced-regression test: the gate MUST trip on a planted 3x row, pass
    on a clean copy, and refuse contended/unavailable inputs."""
    baseline = {"pinned_wall_seconds": {"sf": "sf0.1", "round": 9,
                "queries": {"q_a": 1.0, "q_b": 2.0}}}
    clean = {"sf": "/x/sf0.1", "contended": False,
             "queries_min": {"q_a": 1.1, "q_b": 2.1}}
    devnull = open(os.devnull, "w")
    code, _ = gate(clean, baseline, out=devnull)
    assert code == 0, f"clean run must pass, got {code}"
    regressed = {"sf": "/x/sf0.1", "contended": False,
                 "queries_min": {"q_a": 3.0, "q_b": 2.1}}
    code, msg = gate(regressed, baseline, out=devnull)
    assert code == 1, f"planted 3x regression must trip the gate, got {code}"
    assert "1 queries regressed" in msg
    contended = dict(regressed, contended=True)
    code, _ = gate(contended, baseline, out=devnull)
    assert code == 3, f"contended run must be refused, got {code}"
    unavailable = {"sf": "/x/sf0.1", "contended": False,
                   "vs_baseline": "unavailable:no-baseline-file",
                   "queries_min": {"q_a": 1.0}}
    code, _ = gate(unavailable, baseline, out=devnull)
    assert code == 2, f"unavailable marker must fail loudly, got {code}"
    code, _ = gate(clean, {}, out=devnull)
    assert code == 2, "missing pin block must fail loudly"
    code, _ = gate(dict(clean, sf="/x/sf0.01"), baseline, out=devnull)
    assert code == 2, "sf mismatch must fail loudly"
    print("[gate] self-test: all 6 cases pass (trip/pass/contended/"
          "unavailable/no-pin/sf-mismatch)")
    return 0


def main():
    if "--self-test" in sys.argv:
        sys.exit(self_test())
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bench_path = args[0] if len(args) > 0 else "bench.json"
    base_path = args[1] if len(args) > 1 else "BASELINE.json"
    try:
        bench = json.load(open(bench_path))
    except (OSError, json.JSONDecodeError) as e:
        print(f"[gate] cannot read {bench_path}: {e}")
        sys.exit(2)
    try:
        baseline = json.load(open(base_path))
    except (OSError, json.JSONDecodeError) as e:
        print(f"[gate] cannot read {base_path}: {e}")
        sys.exit(2)
    code, msg = gate(bench, baseline)
    print(f"[gate] {msg}")
    sys.exit(code)


if __name__ == "__main__":
    main()
