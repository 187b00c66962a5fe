"""Misra-Gries heavy hitters: superset guarantee, exactness vs the
groupBy+HAVING oracle, NULL semantics, validation, and the scan budget.

Reference tie-in: Analytics.java:56-59 monitors a frequency ratio over a
bounded key space; ``heavy_hitters_exact`` is the unbounded analog and
must match a plain ``GROUP BY .. HAVING cnt*phi_den >= N*phi_num``
exactly (the MG phase is result-invisible).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    mg_partition_candidates,
)


def _exact_oracle(spark, rows, phi_num, phi_den):
    """groupBy + HAVING over non-NULL keys — the documented contract."""
    nn = [r for r in rows if r is not None]
    n = len(nn)
    from collections import Counter

    return {
        (k, c)
        for k, c in Counter(nn).items()
        if c * phi_den >= n * phi_num
    }


def _df(spark, rows, parts):
    return spark.createDataFrame(
        [(v,) for v in rows], "k string"
    ).repartition(parts)


def _hh(spark, rows, phi_num, phi_den, parts=4, capacity=None):
    out = heavy_hitters_exact(
        _df(spark, rows, parts), "k", phi_num, phi_den, capacity=capacity
    )
    return {(r["k"], r["cnt"]) for r in out.collect()}


def test_matches_oracle_skewed(spark):
    rows = ["a"] * 500 + ["b"] * 120 + [f"t{i}" for i in range(300)]
    assert _hh(spark, rows, 1, 10) == _exact_oracle(spark, rows, 1, 10)


def test_matches_oracle_uniform_all_tied(spark):
    # 20 keys x 50 each: every key is exactly at the 1/20 threshold
    rows = [f"k{i}" for i in range(20) for _ in range(50)]
    got = _hh(spark, rows, 1, 20)
    assert got == _exact_oracle(spark, rows, 1, 20)
    assert len(got) == 20  # >= is inclusive: ties pass


def test_matches_oracle_nothing_passes(spark):
    rows = [f"u{i}" for i in range(400)]  # all singletons, phi=1/10
    assert _hh(spark, rows, 1, 10) == set()


def test_null_keys_excluded_from_candidacy_and_total(spark):
    # 60% NULLs: if NULLs counted toward N, "a" (40 of 100 rows) would
    # fail phi=1/2; against the non-NULL N=40 it passes.
    rows = ["a"] * 40 + [None] * 60
    got = _hh(spark, rows, 1, 2)
    assert got == {("a", 40)} == _exact_oracle(spark, rows, 1, 2)


def test_all_null_input_yields_empty(spark):
    assert _hh(spark, [None] * 50, 1, 2) == set()


def test_cross_partition_split_key(spark):
    # "hot" is below capacity's local guarantee in every partition but
    # globally heavy — the mergeable-summaries superset bound at work.
    rows = ["hot"] * 64 + [f"noise{i}" for i in range(640)]
    got = _hh(spark, rows, 1, 12, parts=16)
    assert got == _exact_oracle(spark, rows, 1, 12)
    assert ("hot", 64) in got


def test_capacity_override_and_validation(spark):
    rows = ["a"] * 30 + ["b"] * 10
    df = _df(spark, rows, 2)
    # raising capacity is allowed; lowering below ceil(den/num) is not
    ok = heavy_hitters_exact(df, "k", 1, 4, capacity=64)
    assert {(r["k"], r["cnt"]) for r in ok.collect()} == _exact_oracle(
        spark, rows, 1, 4
    )
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters_exact(df, "k", 1, 10, capacity=3)
    with pytest.raises(ValueError, match="phi_num"):
        heavy_hitters_exact(df, "k", 0, 10)
    with pytest.raises(ValueError, match="phi must be <= 1"):
        heavy_hitters_exact(df, "k", 11, 10)
    with pytest.raises(ValueError, match="capacity"):
        mg_partition_candidates(df, "k", 0)


def test_mg_candidates_superset_and_bounded(spark):
    rows = ["a"] * 300 + ["b"] * 100 + [f"t{i}" for i in range(600)]
    parts, cap = 8, 10
    cand = mg_partition_candidates(_df(spark, rows, parts), "k", cap)
    rows_out = cand.collect()
    survivors = [r for r in rows_out if r["k"] is not None]
    sentinels = [r for r in rows_out if r["k"] is None]
    # superset: every true phi=1/(cap+1) heavy hitter survives somewhere
    heavy = {k for k, _ in _exact_oracle(spark, rows, 1, cap + 1)}
    assert heavy <= {r["k"] for r in survivors}
    # bounded: <= capacity survivors + 1 sentinel per partition
    assert len(survivors) <= parts * cap
    assert 0 < len(sentinels) <= parts
    # sentinels carry the exact non-NULL row total
    assert sum(r["lb"] for r in sentinels) == len(rows)
    # lb is a lower bound on the true count
    from collections import Counter

    true = Counter(rows)
    for r in survivors:
        assert 0 < r["lb"] <= true[r["k"]]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", None]),
        min_size=1,
        max_size=200,
    ),
    phi_den=st.integers(min_value=2, max_value=20),
    parts=st.integers(min_value=1, max_value=7),
)
def test_property_matches_groupby_having(spark, data, phi_den, parts):
    assert _hh(spark, data, 1, phi_den, parts=parts) == _exact_oracle(
        spark, data, 1, phi_den
    )


def test_plan_no_full_cardinality_agg_and_broadcasts(spark):
    """Phase-2 recount joins the broadcast candidate set; the only
    groupBy over df rows is AFTER the semi-join; N comes from the
    persisted fold output, not a third scan of df."""
    rows = ["a"] * 50 + [f"t{i}" for i in range(50)]
    out = heavy_hitters_exact(_df(spark, rows, 4), "k", 1, 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") >= 2  # candidates + n_total
    # both small branches read the cached fold output
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_weighted_matches_weighted_oracle(spark):
    """Weighted heavy hitters == groupBy(sum(w)) + HAVING; a key with
    few rows but huge mass must pass, a many-row light key must not."""
    rows = [("whale", 1000)] * 3 + [("ant", 1)] * 300 + [
        (f"t{i}", 2) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, w long").repartition(4)
    total = sum(w for _, w in rows)
    out = {
        (r["k"], r["cnt"])
        for r in heavy_hitters_exact(
            df, "k", 1, 2, weight_col="w"
        ).collect()
    }
    from collections import Counter

    mass = Counter()
    for k, w in rows:
        mass[k] += w
    expect = {(k, m) for k, m in mass.items() if m * 2 >= total}
    assert out == expect
    assert ("whale", 3000) in out and not any(k == "ant" for k, _ in out)


def test_weighted_null_weight_rows_excluded(spark):
    rows = [("a", 10), ("a", None), ("b", 5), (None, 7)]
    df = spark.createDataFrame(rows, "k string, w long")
    out = {
        (r["k"], r["cnt"])
        for r in heavy_hitters_exact(
            df, "k", 1, 2, weight_col="w"
        ).collect()
    }
    # totals exclude NULL key AND NULL weight: N = 15, threshold 7.5
    assert out == {("a", 10)}


def test_weighted_candidates_superset_cross_partition(spark):
    # heavy mass split across every partition, flooded by unit noise
    rows = [("hot", 40)] * 16 + [(f"n{i}", 1) for i in range(600)]
    df = spark.createDataFrame(rows, "k string, w long").repartition(8)
    total = 16 * 40 + 600
    out = {
        (r["k"], r["cnt"])
        for r in heavy_hitters_exact(
            df, "k", 1, 3, weight_col="w", capacity=8
        ).collect()
    }
    assert out == {("hot", 640)}
    assert 640 * 3 >= total


def test_weighted_zero_total_mass_empty(spark):
    """N = 0 contract: all-zero weights -> EMPTY (documented as the one
    divergence from a naive HAVING oracle, which returns every key
    since 0 >= 0 — an output unbounded in key cardinality that no
    capacity-bounded summary can produce)."""
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("a", 0)], "k string, w long"
    ).repartition(3)
    out = heavy_hitters_exact(df, "k", 1, 10, weight_col="w")
    assert out.collect() == []


def test_fold_cache_tracked_and_released(spark):
    """Each call releases the previous call's persisted fold output
    (bounding live caches at one) and release_fold_caches() frees the
    last — the long-session hygiene contract."""
    from transitdata_hfp_deduplicator_spark.operators import heavyhitters as hh

    hh.release_fold_caches()
    df = _df(spark, ["a"] * 20 + ["b"] * 3, 2)
    heavy_hitters_exact(df, "k", 1, 4).collect()
    assert len(hh._FOLD_CACHES) == 1
    first = hh._FOLD_CACHES[0]
    assert first.storageLevel.useMemory
    # a DIFFERENT input, so the second fold's plan cannot alias the
    # first in the cache-manager's plan-equality lookup
    df2 = _df(spark, ["x"] * 9 + ["y"] * 2, 3)
    heavy_hitters_exact(df2, "k", 1, 4).collect()
    assert len(hh._FOLD_CACHES) == 1
    assert not first.storageLevel.useMemory, "previous cache not released"
    hh.release_fold_caches()
    assert not hh._FOLD_CACHES
