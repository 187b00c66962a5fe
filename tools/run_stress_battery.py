"""Run the full stress battery (every tools/stress_*.py) sequentially.

Each round's SURVEY claims "the FULL battery re-ran green"; until now
that was an ad-hoc shell loop.  This runner makes the claim
reproducible with one command: it discovers the tools, runs each in
its own process, captures the final result line, and exits nonzero if
any tool does.  It also writes a machine-checkable summary artifact
(default `STRESS_BATTERY.json` at the repo root, full runs only) so
SURVEY can cite the battery by filename instead of prose — one row
per tool with PASS/FAIL, wall seconds, and the tool's own verdict
line (parsed JSON where the tool prints one).

Timing caveat (SURVEY round-13 measurement note): a big local[32] JVM
launched immediately after another one exits can read several times
slower — the kernel is still reclaiming the previous heap's pages —
at identical correctness.  Correctness sweeps can run back-to-back
(the default); pass --gap 300 when the WALL-CLOCKS are meant to be
compared round-over-round.

Usage: python tools/run_stress_battery.py [--gap SECONDS]
           [--summary PATH] [tool ...]
       (bare names like `fuzzy` or `stress_fuzzy` select a subset;
        subset runs skip the summary artifact unless --summary is
        given explicitly)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

# Non-default invocations (everything else runs bare).
EXTRA_ARGS = {
    "stress_neardup_stream": ["200000", "20", "both"],
}
PER_TOOL_TIMEOUT = 1800  # seconds

# Spark/log noise lines start with a dd/dd/dd timestamp (any year) or
# a known JVM-banner prefix; everything else is tool output.
_LOG_LINE = re.compile(r"^\d{2}/\d{2}/\d{2} ")
_BANNER_PREFIXES = ("Setting", "To adjust")


def _verdict_line(stdout: str) -> tuple[str, dict | None]:
    """The tool's verdict: prefer the LAST line that parses as a JSON
    object (every stress tool prints one), else the last non-log line."""
    tail = [
        ln
        for ln in (stdout or "").splitlines()
        if ln.strip()
        and not _LOG_LINE.match(ln)
        and not ln.startswith(_BANNER_PREFIXES)
    ]
    for ln in reversed(tail):
        try:
            obj = json.loads(ln)
        except ValueError:
            continue
        if isinstance(obj, dict):
            return ln, obj
    return (tail[-1] if tail else "(no output)"), None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--gap", type=int, default=0, metavar="SECONDS",
                    help="sleep between tools (page-reclaim gap)")
    ap.add_argument("--summary", default=None, metavar="PATH",
                    help="summary JSON path (default STRESS_BATTERY.json "
                         "at the repo root for full runs; omitted for "
                         "subset runs)")
    ap.add_argument("tools", nargs="*",
                    help="subset of tools (bare names like `fuzzy` ok)")
    opts = ap.parse_args()

    tools_dir = os.path.dirname(os.path.abspath(__file__))
    available = sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(tools_dir, "stress_*.py"))
    )
    if opts.tools:
        want = {
            a if a.startswith("stress_") else f"stress_{a}"
            for a in opts.tools
        }
        unknown = want - set(available)
        if unknown:
            print(f"unknown tools: {sorted(unknown)}; have {available}")
            return 2
        selected = [t for t in available if t in want]
    else:
        selected = available
    is_full = selected == available
    summary_path = opts.summary or (
        os.path.join(os.path.dirname(tools_dir), "STRESS_BATTERY.json")
        if is_full
        else None
    )

    rows: list[dict] = []
    failures: list[str] = []
    for i, tool in enumerate(selected):
        if opts.gap and i:
            print(f"--- sleeping {opts.gap}s (page-reclaim gap) ---",
                  flush=True)
            time.sleep(opts.gap)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(tools_dir, f"{tool}.py")]
                + EXTRA_ARGS.get(tool, []),
                capture_output=True,
                text=True,
                timeout=PER_TOOL_TIMEOUT,
            )
            rc: int | str = proc.returncode
            stdout, stderr = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as exc:
            rc = f"timeout>{PER_TOOL_TIMEOUT}s"
            stdout = exc.stdout.decode() if isinstance(
                exc.stdout, bytes) else (exc.stdout or "")
            stderr = exc.stderr.decode() if isinstance(
                exc.stderr, bytes) else (exc.stderr or "")
        secs = time.time() - t0
        verdict, verdict_obj = _verdict_line(stdout)
        ok = rc == 0
        status = "PASS" if ok else f"FAIL rc={rc}"
        print(f"{status} {tool} ({secs:.0f}s): {verdict}", flush=True)
        if not ok:
            failures.append(tool)
            print("\n".join((stderr or "").splitlines()[-8:]), flush=True)
        rows.append(
            {
                "tool": tool,
                "status": "PASS" if ok else "FAIL",
                "rc": rc,
                "secs": round(secs, 1),
                "verdict": verdict_obj if verdict_obj is not None else verdict,
            }
        )
    print(
        f"\n{len(selected) - len(failures)}/{len(selected)} tools green"
        + (f"; FAILED: {failures}" if failures else "")
    )
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump(
                {
                    "n_tools": len(selected),
                    "n_green": len(selected) - len(failures),
                    "failed": failures,
                    "gap_s": opts.gap,
                    "full_battery": is_full,
                    "tools": rows,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"summary -> {summary_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
