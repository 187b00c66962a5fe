"""Compare two bench outputs with machine-speed normalization.

Usage: python tools/compare_bench.py OLD.json NEW.json [--threshold 1.25]

Accepts either a raw bench line ({"metric": ..., "queries": ...}) or a
driver BENCH_r{N}.json wrapper (whose "tail" holds the line or whose
"parsed" holds it).  If both files carry `calib_sec` (the fixed probe
bench.py emits), per-query ratios are divided by the calib ratio so
host-speed drift doesn't read as regression.

Probe generations: the calib workload changed in round 10 (min-of-2 of
a ~0.3s 20M-row job -> median-of-5 of a ~3.4s 4B-row job), so calib
values from the two generations differ ~8.5x by construction, not by
host speed.  Since round 11 every bench artifact stamps its generation
(`calib_probe`, bench.py CALIB_PROBE), so when BOTH files carry the
tag the decision is deterministic: same tag -> normalize (even across
hosts whose speeds differ more than the heuristic window — ADVICE r10:
a real cross-host comparison no longer silently loses normalization);
different tags -> raw, loudly.  When either file predates the tag, the
old heuristic applies: a calib ratio outside plausible same-probe host
drift ([0.4, 2.5]) disables normalization with a loud warning —
silently dividing by 8.5x would mask any real regression.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    if "queries" in d:
        if "value" not in d:
            # a detail line carries no total — derive it so the header
            # doesn't print 0.0s when comparing BENCH_detail.json files
            d["value"] = sum(v for v in d["queries"].values() if v >= 0)
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    # driver wrapper: "parsed" may hold the compact final line (no
    # queries — the two-line bench format) and "tail" the last ~2000
    # chars of stdout, which carries the end of the per-query detail
    # line.  Merge: summary fields from the final line, plus every
    # per-query timing the tail retained (possibly a suffix subset).
    tail = d.get("tail", "")
    out: dict = {}
    if isinstance(d.get("parsed"), dict) and "metric" in d["parsed"]:
        out.update(d["parsed"])
    else:
        m = re.search(r'\{"metric".*?\}', tail)
        if m:
            out.update(json.loads(m.group(0)))
    qs = dict(
        (k, float(v)) for k, v in re.findall(r'"(q_\w+)": ([\d.]+)', tail)
    )
    if qs and "queries" not in out:
        out["queries"] = qs
    if "calib_sec" not in out:
        cm = re.search(r'"calib_sec": ([\d.]+)', tail)
        out["calib_sec"] = float(cm.group(1)) if cm else None
    if "calib_probe" not in out:
        pm = re.search(r'"calib_probe": "([^"]+)"', tail)
        if pm:
            out["calib_probe"] = pm.group(1)
    if "value" not in out and qs:
        out["value"] = sum(qs.values())
    if out.get("queries"):
        return out
    raise SystemExit(f"no bench data found in {path}")


def effective_speed(co, cn, po=None, pn=None) -> tuple[float, str]:
    """Host-speed ratio to normalize by, or 1.0 with a reason when
    normalization would be meaningless.  With generation tags on BOTH
    sides (po/pn, artifacts from round 11 on) the decision is
    deterministic: equal tags normalize, different tags go raw.
    Without tags, fall back to the ratio heuristic: outside plausible
    same-probe host drift [0.4, 2.5] (the probe-generation boundary)
    go raw (tests/test_bench_contract pins all edges)."""
    if not (co and cn):
        return 1.0, " — no calib, raw"
    speed = cn / co
    if po and pn:
        if po != pn:
            return 1.0, " — cross-generation calib (tagged), raw"
        return speed, " — normalized (same probe generation)"
    if not (0.4 <= speed <= 2.5):
        return 1.0, " — cross-generation calib, raw"
    return speed, " — normalized"


def subset_warning(old: dict, new: dict) -> str | None:
    """Loud warning when either side is a SPARK_GRAFT_BENCH_ONLY subset
    artifact or the two sides' query counts differ markedly (>20%) —
    a subset total compared against a full-registry total is apples to
    oranges (ADVICE r11 #4).  Tail-truncated queries dicts are fine:
    the check uses the final line's n_queries stamp, not len(queries)."""
    subsets = [
        side for side, d in (("OLD", old), ("NEW", new)) if d.get("subset")
    ]
    if subsets:
        return (
            f"WARNING: {' and '.join(subsets)} "
            f"{'are' if len(subsets) > 1 else 'is a'} SPARK_GRAFT_BENCH_ONLY "
            f"subset artifact{'s' if len(subsets) > 1 else ''} — totals "
            f"cover only the selected queries, not the registry. Compare "
            f"per-query rows only; ignore the totals line."
        )
    no, nn = old.get("n_queries"), new.get("n_queries")
    if no and nn and abs(no - nn) > 0.2 * max(no, nn):
        return (
            f"WARNING: the files time markedly different query counts "
            f"({no} vs {nn}) — one side may be a subset or a different "
            f"registry generation. Totals are not comparable; compare "
            f"per-query rows only."
        )
    return None


def ratio_kind_of(note: str) -> str:
    """'normalized' vs 'raw' for the per-query ratio labels.  Substring
    match, NOT equality: effective_speed emits two normalized notes
    (' — normalized' and ' — normalized (same probe generation)'), and
    an exact match against the first mislabeled every tagged comparison
    as raw (ADVICE r11 #1 — the math was right, the label lied)."""
    return "normalized" if "normalized" in note else "raw"


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = 1.25
    if "--threshold" in sys.argv:
        thresh = float(sys.argv[sys.argv.index("--threshold") + 1])
    warn = subset_warning(old, new)
    if warn:
        print(warn)
    co, cn = old.get("calib_sec"), new.get("calib_sec")
    po, pn = old.get("calib_probe"), new.get("calib_probe")
    speed, note = effective_speed(co, cn, po, pn)
    if co and cn and note.endswith("raw"):
        if "tagged" in note:
            print(
                f"WARNING: the files carry different calib-probe "
                f"generation tags ({po!r} vs {pn!r}) — calib values are "
                f"not comparable across probe workloads. Normalization "
                f"disabled; ratios below are RAW."
            )
        else:
            print(
                f"WARNING: calib ratio {cn / co:.2f}x is outside plausible "
                f"same-probe host drift [0.4, 2.5] — either the files were "
                f"made by different calib-probe generations (the probe "
                f"changed scale ~8.5x in round 10; artifacts since round "
                f"11 carry a calib_probe tag that decides this "
                f"deterministically) or the hosts differ too much for the "
                f"ratio to be trusted. Normalization disabled; ratios "
                f"below are RAW."
            )
    print(
        f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s"
        f"  (host speed ratio {speed:.2f}x{note})"
    )
    qo, qn = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(qo) & set(qn)):
        norm = (qn[name] / speed) / qo[name] if qo[name] > 0 else float("inf")
        rows.append((norm, name, qo[name], qn[name]))
    rows.sort(reverse=True)
    # note-to-label contract: every normalized note contains the word
    # (tests/test_bench_contract asserts this against effective_speed's
    # actual outputs, so a new note string can't silently mislabel)
    ratio_kind = ratio_kind_of(note)
    flagged = [r for r in rows if r[0] >= thresh and r[3] >= 0.5]
    for norm, name, a, b in flagged:
        print(
            f"  REGRESSED {name}: {a:.2f}s -> {b:.2f}s"
            f" ({norm:.2f}x {ratio_kind})"
        )
    for name in sorted(set(qn) - set(qo)):
        print(f"  NEW {name}: {qn[name]:.2f}s")
    for name in sorted(set(qo) - set(qn)):
        print(f"  REMOVED {name}")
    if not flagged:
        print(f"  no query regressed >= {thresh}x ({ratio_kind})")


if __name__ == "__main__":
    main()
