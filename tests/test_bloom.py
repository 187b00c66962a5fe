"""Bloom-filter build/probe operator (operators/bloom.py).

The contract a decontamination prefilter lives or dies by: ZERO false
negatives (a missed contamination is a leaked benchmark), a bounded,
DETERMINISTIC false-positive set (the oracle hash-checks it), and a
bitmap small enough to broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from transitdata_hfp_deduplicator_spark.operators.bloom import (
    DEFAULT_M_BITS,
    bloom_build,
    bloom_probe,
)
from transitdata_hfp_deduplicator_spark.plans.inspect import physical_plan


def _hashes(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "hv bigint")


def test_no_false_negatives(spark):
    # every inserted hash must probe positive — the one property a
    # decontamination prefilter cannot trade away
    inserted = [i * 1_000_003 + 17 for i in range(2000)]
    bloom = bloom_build(_hashes(spark, inserted))
    back = bloom_probe(_hashes(spark, inserted), bloom)
    assert back.count() == len(inserted)


def test_false_positive_rate_bounded(spark):
    # disjoint probe set: FP rate must be near the analytic bound
    # (~(1 - e^{-kn/m})^k ≈ 0.0001 at n=2000, m=2^17, k=3) — allow 10x
    inserted = [i * 1_000_003 + 17 for i in range(2000)]
    probes = [i * 999_983 + 7 for i in range(50_000, 60_000)]
    probes = [p for p in probes if p not in set(inserted)]
    bloom = bloom_build(_hashes(spark, inserted))
    fp = bloom_probe(_hashes(spark, probes), bloom).count()
    assert fp <= len(probes) * 0.001, f"FP rate too high: {fp}/{len(probes)}"


def test_probe_is_deterministic_and_keeps_schema(spark):
    inserted = [3, 5, 7, 11]
    bloom = bloom_build(_hashes(spark, inserted))
    probes = spark.createDataFrame(
        [(1, 3, "a"), (2, 4, "b"), (3, 7, "c")], "doc_id int, hv bigint, tag string"
    )
    out = bloom_probe(probes, bloom)
    assert out.columns == ["doc_id", "hv", "tag"]
    rows = {tuple(r) for r in out.collect()}
    assert (1, 3, "a") in rows and (3, 7, "c") in rows
    assert (2, 4, "b") not in rows or True  # 4 may FP; determinism below
    rows2 = {tuple(r) for r in bloom_probe(probes, bloom).collect()}
    assert rows == rows2


def test_bitmap_is_bounded_and_broadcast(spark):
    inserted = [i for i in range(10_000)]
    bloom = bloom_build(_hashes(spark, inserted))
    assert bloom.count() <= DEFAULT_M_BITS // 32
    plan = physical_plan(bloom_probe(_hashes(spark, [1, 2]), bloom))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_membership_requires_all_k_bits(spark):
    # a probe sharing only SOME positions with inserted keys must not
    # pass: craft two keys whose first KM position collides but whose
    # other positions differ, verify the collider is rejected
    m = DEFAULT_M_BITS
    a = 12345
    # b has same h1 (mod m) but different h2 => only position 0 collides
    b = a + m
    assert a % m == b % m and (a >> 17) % m != (b >> 17) % m
    bloom = bloom_build(_hashes(spark, [a]))
    assert bloom_probe(_hashes(spark, [b]), bloom).count() == 0


def test_member_rowjoin_agrees_with_probe(spark):
    # the row-level k-join membership (streaming shape) and the
    # explode+regroup probe (batch shape) must produce identical
    # verdicts over the same bitmap — false positives included
    from transitdata_hfp_deduplicator_spark.operators.bloom import bloom_member

    inserted = [i * 1_000_003 + 17 for i in range(500)]
    probes = _hashes(spark, [i * 31 + 5 for i in range(3000)])
    bloom = bloom_build(_hashes(spark, inserted))
    via_probe = {r.hv for r in bloom_probe(probes, bloom).collect()}
    via_member = {
        r.hv
        for r in bloom_member(probes, bloom).filter("bloom_member").collect()
    }
    assert via_probe == via_member
    assert via_probe  # non-degenerate: some hits exist


def test_member_is_stateless_row_preserving(spark):
    from transitdata_hfp_deduplicator_spark.operators.bloom import bloom_member

    bloom = bloom_build(_hashes(spark, [1, 2, 3]))
    probes = spark.createDataFrame(
        [(1, 2, "x"), (2, 99, "y")], "doc_id int, hv bigint, tag string"
    )
    out = bloom_member(probes, bloom)
    assert out.columns == ["doc_id", "hv", "tag", "bloom_member"]
    assert out.count() == 2  # row-preserving, no explode residue
