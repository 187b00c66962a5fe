"""Recompute GATE_ROTATION evidence tiers from CORRECTNESS_r*.json.

Every round's verdict orders "rotation hygiene: front the oldest
evidence tier" — and every round the tier membership has been derived
by an ad-hoc script.  This makes the derivation a first-class,
reviewable tool: for each registered query, find the LATEST round with
a green driver row (hash/rows pass, or a produced-rows `no_oracle` row
for the declared rows-only queries), print the histogram and the
oldest tier's members, and check the CURRENT rotation window against
it.

Usage: python tools/rotation_tiers.py [repo_dir]
Exit code 1 if the current 50-entry window does not start with the
oldest tier (behavior-changed queries fronted ahead of it are allowed
— they are by definition members of SOME tier and the check only
requires every oldest-tier query to sit inside the window).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW = 50  # the driver's per-round correctness window


def last_pass_rounds(repo: str) -> dict[str, int]:
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        try:
            rows = json.load(open(p))
        except Exception:  # noqa: BLE001 - a malformed artifact is skipped
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            passed = (
                row.get("err") is None
                and row.get("rows_match")
                # hash/schema must not be recorded-false; absent (older
                # artifacts / rows-only rows) still counts, but a
                # rows-match-with-hash-mismatch row is NOT green evidence.
                and row.get("hash_match") is not False
                and row.get("schema_match") is not False
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if passed:
                last[name] = max(last.get(name, 0), r)
    return last


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, repo)
    from transitdata_hfp_deduplicator_spark.queries import (
        GATE_ROTATION,
        QUERIES,
    )

    last = last_pass_rounds(repo)
    tiers: dict[int, list[str]] = {}
    for q in QUERIES:
        tiers.setdefault(last.get(q, 0), []).append(q)
    for t in sorted(tiers):
        label = f"r{t}" if t else "never"
        print(f"{label}: {len(tiers[t])}")
    oldest = min(tiers)
    print(f"\noldest tier (r{oldest}) members:")
    for q in sorted(tiers[oldest]):
        print(f"  {q}")

    window = set(GATE_ROTATION[:WINDOW])
    missing = sorted(set(tiers[oldest]) - window)
    if missing:
        print(
            f"\nROTATION STALE: {len(missing)} oldest-tier queries are "
            f"outside the current {WINDOW}-entry window: {missing}"
        )
        return 1
    fills = WINDOW - len(tiers[oldest])
    print(
        f"\nwindow OK: all {len(tiers[oldest])} oldest-tier queries inside "
        f"the {WINDOW}-entry window (+{fills} next-tier fills)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
