"""Run the full stress battery (every tools/stress_*.py) sequentially.

Each round's SURVEY claims "the FULL battery re-ran green"; until now
that was an ad-hoc shell loop.  This runner makes the claim
reproducible with one command: it discovers the tools, runs each in
its own process, captures the final result line, and exits nonzero if
any tool does.

Timing caveat (SURVEY round-13 measurement note): a big local[32] JVM
launched immediately after another one exits can read several times
slower — the kernel is still reclaiming the previous heap's pages —
at identical correctness.  Correctness sweeps can run back-to-back
(the default); pass --gap 300 when the WALL-CLOCKS are meant to be
compared round-over-round.

Usage: python tools/run_stress_battery.py [--gap SECONDS] [tool ...]
       (bare names like `fuzzy` or `stress_fuzzy` select a subset)
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

# Non-default invocations (everything else runs bare).
EXTRA_ARGS = {
    "stress_neardup_stream": ["200000", "20", "both"],
}
PER_TOOL_TIMEOUT = 1800  # seconds


def main() -> int:
    args = sys.argv[1:]
    gap = 0
    if "--gap" in args:
        i = args.index("--gap")
        gap = int(args[i + 1])
        del args[i : i + 2]
    tools_dir = os.path.dirname(os.path.abspath(__file__))
    available = sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(tools_dir, "stress_*.py"))
    )
    if args:
        want = {a if a.startswith("stress_") else f"stress_{a}" for a in args}
        unknown = want - set(available)
        if unknown:
            print(f"unknown tools: {sorted(unknown)}; have {available}")
            return 2
        selected = [t for t in available if t in want]
    else:
        selected = available

    failures: list[str] = []
    for i, tool in enumerate(selected):
        if gap and i:
            print(f"--- sleeping {gap}s (page-reclaim gap) ---", flush=True)
            time.sleep(gap)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(tools_dir, f"{tool}.py")]
            + EXTRA_ARGS.get(tool, []),
            capture_output=True,
            text=True,
            timeout=PER_TOOL_TIMEOUT,
        )
        # last non-log line is the tool's verdict/JSON summary
        tail = [
            ln
            for ln in (proc.stdout or "").splitlines()
            if ln.strip() and not ln.startswith(("26/", "Setting", "To adjust"))
        ]
        verdict = tail[-1] if tail else "(no output)"
        status = "PASS" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        print(f"{status} {tool} ({time.time() - t0:.0f}s): {verdict}", flush=True)
        if proc.returncode != 0:
            failures.append(tool)
            err = (proc.stderr or "").splitlines()
            print("\n".join(err[-8:]), flush=True)
    print(
        f"\n{len(selected) - len(failures)}/{len(selected)} tools green"
        + (f"; FAILED: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
