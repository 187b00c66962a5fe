"""Streaming Space-Saving heavy hitters: overestimate invariant,
superset guarantee under forced eviction, snapshot semantics, and
batch-vs-stream candidate/recount parity with the MG batch operator.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.streaming import (
    ephemeral_dir,
    parquet_stream,
    run_to_memory,
    scoped_shuffle_partitions,
)
from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
    final_snapshots,
    space_saving_stream,
)


def _replay(spark, rows, capacity, n_buckets=4, files=3):
    """Write rows as `files` parquet files and replay one file per
    micro-batch so state genuinely carries across batches."""
    d = ephemeral_dir("sshh_")
    per = -(-len(rows) // files)
    for i in range(files):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(
            [(v,) for v in chunk], "k string"
        ).coalesce(1).write.parquet(os.path.join(d, f"f{i}"))
    stream = parquet_stream(spark, d + "/*", max_files_per_trigger=1)
    snaps = space_saving_stream(stream, "k", capacity, n_buckets=n_buckets)
    with scoped_shuffle_partitions(spark, n_buckets):
        return run_to_memory(snaps, output_mode="append")


def test_no_eviction_is_exact(spark):
    rows = ["a"] * 30 + ["b"] * 20 + ["c"] * 10
    out = final_snapshots(_replay(spark, rows, capacity=16)).collect()
    got = {r["key"]: (r["est"], r["err"]) for r in out}
    assert got == {"a": (30, 0), "b": (20, 0), "c": (10, 0)}
    # bucket row totals add up to the stream
    assert sum({r["bucket"]: r["n_seen"] for r in out}.values()) == len(rows)


def test_eviction_overestimate_invariant_and_superset(spark):
    # 2 heavy keys + 300 singletons through capacity-4 buckets: eviction
    # churns constantly, heavies must survive with true <= est <= true+err
    rows = (["hot1"] * 120 + ["hot2"] * 90 + [f"t{i}" for i in range(300)]) * 1
    true = Counter(rows)
    out = final_snapshots(
        _replay(spark, rows, capacity=4, n_buckets=2)
    ).collect()
    got = {r["key"]: (r["est"], r["err"]) for r in out}
    for k in ("hot1", "hot2"):
        assert k in got, f"heavy key {k} evicted"
        est, err = got[k]
        assert true[k] <= est <= true[k] + err
    # summary stays capacity-bounded
    per_bucket = Counter(r["bucket"] for r in out)
    assert all(c <= 4 for c in per_bucket.values())
    # every tracked key obeys the invariant (est never undercounts)
    for k, (est, err) in got.items():
        assert est >= true[k]
        assert est - err <= true[k]


def test_nulls_dropped(spark):
    rows = ["a"] * 10 + [None] * 25
    out = final_snapshots(_replay(spark, rows, capacity=8)).collect()
    assert {r["key"] for r in out} == {"a"}
    assert sum({r["bucket"]: r["n_seen"] for r in out}.values()) == 10


def test_snapshots_grow_monotonically(spark):
    rows = ["a"] * 60
    out = _replay(spark, rows, capacity=4, n_buckets=1, files=3)
    ests = [
        r["est"]
        for r in out.filter(F.col("key") == "a")
        .orderBy("n_seen")
        .collect()
    ]
    assert len(ests) >= 2  # one snapshot per micro-batch that saw rows
    assert ests == sorted(ests) and ests[-1] == 60


def test_capacity_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="capacity"):
        space_saving_stream(df, "k", 0)


def test_stream_candidates_match_batch_heavy_hitters(spark):
    """End-to-end parity: stream candidates + exact recount == the batch
    MG operator's output == plain groupBy+HAVING, at phi where eviction
    is active (capacity just above 1/phi)."""
    from transitdata_hfp_deduplicator_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )

    rows = ["x"] * 200 + ["y"] * 80 + [f"n{i}" for i in range(400)]
    phi_num, phi_den = 1, 10  # threshold 68: x and y pass
    out = final_snapshots(
        _replay(spark, rows, capacity=phi_den + 1, n_buckets=2)
    )
    cand = out.select(F.col("key")).distinct()
    df = spark.createDataFrame([(v,) for v in rows], "k string")
    n = len(rows)
    stream_hh = {
        (r["k"], r["cnt"])
        for r in df.join(
            F.broadcast(cand.withColumnRenamed("key", "k")), "k", "left_semi"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * phi_den >= n * phi_num)
        .collect()
    }
    batch_hh = {
        (r["k"], r["cnt"])
        for r in heavy_hitters_exact(df, "k", phi_num, phi_den).collect()
    }
    truth = {
        (k, c) for k, c in Counter(rows).items() if c * phi_den >= n * phi_num
    }
    assert stream_hh == batch_hh == truth == {("x", 200), ("y", 80)}


def test_intermediate_snapshots_live_feed_invariants(spark):
    """The live monitoring feed (the reference's Analytics window
    report, Analytics.java:39-59, over an unbounded key space): every
    INTERMEDIATE snapshot — not just the final one — must be a valid
    summary of the stream so far.  Per bucket, in n_seen order:
    n_seen strictly increases, err (the decrement total) never
    decreases, each key's est never decreases across the snapshots
    that track it, no snapshot tracks more than ``capacity`` keys, and
    every snapshot obeys est <= n_seen and est - err <= n_seen
    (a summary can never claim more mass than the rows it folded)."""
    rows = ["hot"] * 90 + [f"s{i}" for i in range(120)] + ["hot2"] * 40
    out = _replay(spark, rows, capacity=4, n_buckets=1, files=4).collect()
    snaps = {}
    for r in out:
        snaps.setdefault(r["n_seen"], {})[r["key"]] = (r["est"], r["err"])
    n_seens = sorted(snaps)
    assert len(n_seens) >= 3, "expected one snapshot per non-empty batch"
    assert n_seens[-1] == len(rows)
    prev_err = 0
    prev_est: dict = {}
    for n in n_seens:
        snap = snaps[n]
        assert len(snap) <= 4, "summary exceeded capacity"
        errs = {e for _, e in snap.values()}
        assert len(errs) == 1, "err is the bucket's D — same on every row"
        err = errs.pop()
        assert err >= prev_err, "decrement total must be monotone"
        prev_err = err
        for k, (est, _) in snap.items():
            assert est <= n, f"{k}: est {est} exceeds rows seen {n}"
            assert est >= prev_est.get(k, 0), f"{k}: est decreased"
        prev_est.update({k: e for k, (e, _) in snap.items()})


def test_guaranteed_top_k_no_eviction_all_guaranteed(spark):
    """capacity large enough that err stays 0: the top-k report is the
    exact truth and every row is guaranteed."""
    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    rows = ["a"] * 30 + ["b"] * 20 + ["c"] * 10 + ["d"] * 5
    out = guaranteed_top_k(
        _replay(spark, rows, capacity=16), k=2
    ).collect()
    assert [(r["key"], r["est"], r["guaranteed"]) for r in out] == [
        ("a", 30, True),
        ("b", 20, True),
    ]


def test_guaranteed_top_k_exact_tie_boundary(spark):
    """Pin the documented tie contract (docstring: 'Tie boundary'):
    with a:5 b:5 and k=1 (no eviction, err=0), the ceiling equals the
    reported key's lower bound exactly (5 >= 5), so ``>=`` flags 'a'
    guaranteed — membership in SOME valid top-1 (the tie with 'b' is
    resolvable in its favor), NOT in every top-1.  A strict ``>``
    would return False here; if the comparison ever changes, this
    test localizes the semantic shift."""
    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    rows = ["a"] * 5 + ["b"] * 5
    out = guaranteed_top_k(
        _replay(spark, rows, capacity=16, n_buckets=1), k=1
    ).collect()
    assert len(out) == 1
    r = out[0]
    # row_number tiebreak is (est desc, key asc): 'a' is reported
    assert (r["key"], r["est"], r["err"]) == ("a", 5, 0)
    assert r["guaranteed"] is True


def test_guaranteed_top_k_under_churn_sound(spark):
    """With eviction churn the guarantee must stay SOUND: every row
    flagged guaranteed really is in the true top-k (never the reverse
    claim — unflagged rows may or may not be)."""
    from collections import Counter

    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    rows = ["hot1"] * 200 + ["hot2"] * 150 + [f"t{i}" for i in range(300)]
    true = Counter(rows)
    k = 3
    true_topk = {kk for kk, _ in true.most_common(k)}
    out = guaranteed_top_k(
        _replay(spark, rows, capacity=6, n_buckets=2), k=k
    ).collect()
    # the report can hold FEWER than k rows: the singleton flood's final
    # decrement legitimately wipes every tail key from the summary
    assert 1 <= len(out) <= k
    ests = [r["est"] for r in out]
    assert ests == sorted(ests, reverse=True)
    for r in out:
        assert true[r["key"]] <= r["est"] <= true[r["key"]] + r["err"]
        if r["guaranteed"]:
            assert r["key"] in true_topk, f"unsound guarantee on {r['key']}"
    # the clear heavies dominate every possible unreported count, so
    # their flags must come back True (the guarantee is not vacuous)
    flagged = {r["key"] for r in out if r["guaranteed"]}
    assert {"hot1", "hot2"} <= flagged


def test_empty_summary_batch_emits_sentinel_with_final_d(spark):
    """A batch whose all-ties decrement EMPTIES the summary must still
    surface the bucket's final decrement total: batch 1 tracks a:5,
    batch 2 floods b/c/d x6 so the pivot (6) wipes every counter.
    Without the sentinel, final_snapshots would return batch 1's stale
    (err=0) snapshot and guaranteed_top_k would flag 'a' as a
    guaranteed top-1 even though b's true count (6) beats it."""
    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    rows = ["a"] * 5 + (["b"] * 6 + ["c"] * 6 + ["d"] * 6)
    # files=2 splits exactly at index 12: file0 = a*5 + b*6 + c*1 ...
    # that's the wrong split; force the batches explicitly instead
    d = ephemeral_dir("sshh_sent_")
    spark.createDataFrame([(v,) for v in ["a"] * 5], "k string").coalesce(
        1
    ).write.parquet(os.path.join(d, "f0"))
    spark.createDataFrame(
        [(v,) for v in ["b"] * 6 + ["c"] * 6 + ["d"] * 6], "k string"
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    stream = parquet_stream(spark, d + "/*", max_files_per_trigger=1)
    snaps = space_saving_stream(stream, "k", capacity=2, n_buckets=1)
    with scoped_shuffle_partitions(spark, 1):
        out = run_to_memory(snaps, output_mode="append")
    fin = final_snapshots(out).collect()
    # the final snapshot IS the sentinel: n_seen covers the whole
    # stream and err carries the wipe-out decrement (6), not batch 1's 0
    assert len(fin) == 1
    assert fin[0]["key"] is None
    assert fin[0]["n_seen"] == len(rows)
    assert fin[0]["err"] >= 6
    # and the top-k report is EMPTY (sound): no stale 'a' guarantee
    assert guaranteed_top_k(out, k=1).collect() == []


def test_guaranteed_top_k_ceiling_covers_wiped_sibling_bucket(spark):
    """Two buckets: one keeps a genuinely heavy key, the other ends on
    an empty-summary sentinel with a large D.  The surviving key's
    guarantee must be judged against the SIBLING bucket's final D — a
    key whose lower bound clears it stays guaranteed; one that doesn't
    must not be."""
    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
        space_saving_stream as _sss,
    )

    # route keys to known buckets by probing the same hash Spark uses
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(40)], "k string"
    ).withColumn("b", F.pmod(F.xxhash64("k"), F.lit(2)))
    by_bucket = {0: [], 1: []}
    for r in probe.collect():
        by_bucket[r["b"]].append(r["k"])
    heavy = by_bucket[0][0]
    fillers = by_bucket[1][:3]
    assert len(fillers) == 3
    d = ephemeral_dir("sshh_sib_")
    # batch 1: the heavy key (bucket 0) + a seed in bucket 1
    spark.createDataFrame(
        [(heavy,)] * 50 + [(fillers[0],)], "k string"
    ).coalesce(1).write.parquet(os.path.join(d, "f0"))
    # batch 2: tops every filler up to exactly 10 (the seeded one gets
    # 9 more) -> a three-way tie at the pivot wipes bucket 1's
    # capacity-2 summary entirely, D = 10
    spark.createDataFrame(
        [(v,) for v in [fillers[0]] * 9 + [fillers[1]] * 10 + [fillers[2]] * 10],
        "k string",
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    stream = parquet_stream(spark, d + "/*", max_files_per_trigger=1)
    snaps = _sss(stream, "k", capacity=2, n_buckets=2)
    with scoped_shuffle_partitions(spark, 2):
        out = run_to_memory(snaps, output_mode="append")
    rep = {r["key"]: r for r in guaranteed_top_k(out, k=2).collect()}
    # bucket 1's final snapshot is the sentinel: its stale batch-1 seed
    # (est 1) must NOT resurface in the report — pre-fix it would, and
    # would even come back flagged guaranteed against a D=0 ceiling
    # despite the fillers' true counts of 10-11
    assert set(rep) == {heavy}
    r = rep[heavy]
    # ceiling = sibling bucket's final D (>= 10); heavy's lower bound is
    # 50 - err, comfortably above it -> guaranteed stays True
    assert r["est"] >= 50 and r["guaranteed"] is True


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 23, 47, 83])
def test_guaranteed_top_k_randomized_soundness(spark, seed):
    """Randomized soundness sweep: arbitrary skewed streams through
    small-capacity buckets (constant eviction churn, occasional
    empty-summary wipes) — every key flagged guaranteed must truly be
    in the top-k, and every reported est must obey
    true <= est <= true + err.  Fixed seeds keep it deterministic."""
    import random

    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    rng = random.Random(seed)
    # a few heavies + a zipf-ish mid tier + singleton flood
    rows = []
    for i in range(rng.randint(2, 4)):
        rows += [f"hot{i}"] * rng.randint(80, 200)
    for i in range(rng.randint(5, 15)):
        rows += [f"mid{i}"] * rng.randint(5, 25)
    rows += [f"s{i}" for i in range(rng.randint(100, 400))]
    rng.shuffle(rows)
    true = Counter(rows)
    k = rng.randint(2, 5)
    top_counts = sorted(true.values(), reverse=True)
    kth = top_counts[k - 1] if len(top_counts) >= k else 0
    out = guaranteed_top_k(
        _replay(
            spark,
            rows,
            capacity=rng.randint(3, 8),
            n_buckets=rng.choice([1, 2, 4]),
            files=rng.randint(2, 5),
        ),
        k=k,
    ).collect()
    assert len(out) <= k
    for r in out:
        assert r["key"] is not None
        assert true[r["key"]] <= r["est"] <= true[r["key"]] + r["err"]
        if r["guaranteed"]:
            # sound: its true count ties-or-beats the k-th largest
            assert true[r["key"]] >= kth, (
                f"seed={seed}: unsound guarantee on {r['key']} "
                f"(true {true[r['key']]} < kth {kth})"
            )


def test_guaranteed_top_k_validation(spark):
    import pytest as _pytest

    from transitdata_hfp_deduplicator_spark.streaming.heavyhitters_stream import (
        guaranteed_top_k,
    )

    df = spark.createDataFrame(
        [(0, "a", 1, 0, 1)], "bucket long, key string, est long, err long, n_seen long"
    )
    with _pytest.raises(ValueError, match="k must be"):
        guaranteed_top_k(df, 0)
