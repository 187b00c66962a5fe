"""The driver parses bench.py's FINAL stdout line from a ~2000-char
tail capture.  Four rounds of BENCH_r{N}.json carried "parsed": null
because the 90+-entry per-query dict rode the final line and overflowed
that window — pin the split-output contract so it cannot regress."""

from __future__ import annotations

import json

from bench import format_output
from transitdata_hfp_deduplicator_spark.queries import QUERIES


def test_final_line_compact_and_parseable():
    timings = {name: 123.4567 for name in QUERIES}
    assert len(timings) >= 90  # the regime that broke the old format
    detail, final = format_output(timings, 0.1, 0.3634)
    assert len(final) < 200, f"final line {len(final)} chars"
    d = json.loads(final)
    assert d["metric"] == "total_query_runtime"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], float)
    assert d["sf"] == 0.1 and d["calib_sec"] == 0.3634
    assert d["n_queries"] == len(timings)
    # per-query detail fully recoverable from its own line
    dd = json.loads(detail)
    assert dd["queries"] == timings


def test_final_line_is_last_and_detail_precedes():
    detail, final = format_output({"q_x": 1.0}, 0.01, None)
    # contract: main() prints detail then final; both single-line JSON
    assert "\n" not in detail and "\n" not in final
    assert json.loads(final)["calib_sec"] is None


def test_failed_queries_excluded_from_total():
    _, final = format_output({"q_a": 2.0, "q_b": -1.0}, 0.1, 0.4)
    assert json.loads(final)["value"] == 2.0


def test_gate_rotation_covers_registry():
    """Every registered query must appear in GATE_ROTATION exactly once
    (a query added without a rotation slot would silently never reach
    the driver's 50-entry correctness window); forward-declared names
    for unreleased queries are allowed, duplicates are not."""
    from transitdata_hfp_deduplicator_spark.queries import GATE_ROTATION

    dupes = {n for n in GATE_ROTATION if GATE_ROTATION.count(n) > 1}
    assert not dupes, f"duplicate rotation entries: {dupes}"
    missing = set(QUERIES) - set(GATE_ROTATION)
    assert not missing, f"registered but not rotated: {missing}"


def test_gate_ordered_is_registry_permutation():
    from transitdata_hfp_deduplicator_spark.queries import gate_ordered

    ordered = gate_ordered()
    assert set(ordered) == set(QUERIES)
    assert list(ordered) != list(QUERIES) or len(QUERIES) <= 1
