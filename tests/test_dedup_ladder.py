"""The round-5 rungs of the dedup ladder: exact-substring dedup
(Lee et al. 2022 ExactSubstr shape) and semantic dedup (SemDeDup
shape).  Reference analog: the same first-wins/keep-one discipline as
Deduplicator.java:43-66, lifted from payload equality to substring /
embedding similarity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _substring_verdicts(spark, rows):
    """q_dedup_substring's semantics on an inline corpus via an
    INDEPENDENT formulation (per-doc HOF gram arrays + array_distinct;
    production uses explode → top-level md5 → collect_set for codegen)
    — same k/sel_mod/df_cap constants, so agreement with the planted
    expectations is evidence about the semantics, not the plan."""
    from transitdata_hfp_deduplicator_spark.queries import QUERIES  # noqa: F401

    k, sel_mod, df_cap = 20, 4, 20
    d = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", F.lower(F.trim(F.col("text"))).alias("t"))
        .filter(F.length("t") >= k)
    )
    gram_hash = lambda p: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.col("t").substr(p, F.lit(k)).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    grams = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - F.lit(k - 1)),
                    gram_hash,
                ),
                lambda h: h % sel_mod == 0,
            )
        ).alias("gs"),
    )
    postings = grams.select("doc_id", F.explode("gs").alias("h"))
    buckets = (
        postings.groupBy("h")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= df_cap))
    )
    pair_struct = F.expr(
        "flatten(transform(ds, (x, ix) -> "
        "transform(slice(ds, ix + 2, size(ds) - ix - 1), y -> struct(x as i, y as j))))"
    )
    return {
        (r.i, r.j)
        for r in buckets.select(F.explode(pair_struct).alias("p"))
        .select("p.i", "p.j")
        .distinct()
        .collect()
    }


def test_substring_planted_shared_run_detected(spark):
    """Docs sharing a 60-char exact run are caught (expected selected
    grams in the run: (60-19)/4 ≈ 10); unrelated docs are not."""
    shared = "the migratory patterns of arctic terns span both polar regions yearly"
    rows = [
        (1, "PREFIX one alpha " + shared + " SUFFIX one"),
        (2, "completely different opening text " + shared),
        (3, "no overlap here at all: spark shuffles partition parquet row groups"),
    ]
    pairs = _substring_verdicts(spark, rows)
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_substring_alignment_free_selection(spark):
    """Content-defined selection must be ALIGNMENT-FREE: shifting the
    shared run to a different character offset in each doc still
    selects identical grams inside the run (stride sampling would
    not)."""
    shared = "zebra quagga okapi tapir capybara wombat pangolin axolotl newt"
    rows = [
        (10, "x" * 7 + " " + shared),
        (11, "y" * 24 + " " + shared + " tail words here"),
    ]
    assert (10, 11) in _substring_verdicts(spark, rows)


def test_semdedup_verdicts_planted(spark):
    """Within one cell: near-identical pair → lower id wins, higher id
    tagged with dup_of = the min qualifying lower id; orthogonal vector
    untouched; verdicts independent of input row order."""
    import numpy as np

    from transitdata_hfp_deduplicator_spark.operators.kmeans import (
        semdedup_verdicts,
    )

    a = [1.0, 0.0, 0.0, 0.0]
    a2 = [0.999, 0.01, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    for order in ([1, 2, 3], [3, 2, 1]):
        vecs = {1: a, 2: a2, 3: b}
        df = spark.createDataFrame(
            [(i, vecs[i], 0) for i in order],
            "vid long, v array<double>, cell int",
        )
        got = {
            r.vid: (r.dup_of, round(r.max_sim, 4))
            for r in semdedup_verdicts(df, tau=0.95).collect()
        }
        exp_sim = round(
            float(
                np.round(
                    np.dot(a, a2)
                    / (np.linalg.norm(a) * np.linalg.norm(a2)),
                    6,
                )
            ),
            4,
        )
        assert got == {2: (1, exp_sim)}


def test_semdedup_blocked_gemm_matches_unblocked(spark):
    """block=2 (forcing multiple GEMM tiles) and block=1024 agree."""
    import random

    from transitdata_hfp_deduplicator_spark.operators.kmeans import (
        semdedup_verdicts,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vid long, v array<double>, cell int")
    small = {
        (r.vid, r.dup_of, r.max_sim)
        for r in semdedup_verdicts(df, tau=0.3, block=2).collect()
    }
    big = {
        (r.vid, r.dup_of, r.max_sim)
        for r in semdedup_verdicts(df, tau=0.3, block=1024).collect()
    }
    assert small == big
    assert small  # tau=0.3 on gaussian 8-dim: hits exist


def test_kmeans_rejects_zero_iters(spark):
    from transitdata_hfp_deduplicator_spark.operators.kmeans import (
        kmeans_cells,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="iters"):
        kmeans_cells(df, k=2, iters=0)


def test_substring_short_docs_never_pair(spark):
    """Docs shorter than the gram width have no grams: they can never
    pair (the ExactSubstr guarantee is only about >= k-char runs), and
    identical SHORT texts are exact-dedup's job, not this operator's."""
    rows = [
        (1, "tiny text"),          # < 20 chars
        (2, "tiny text"),          # identical but too short
        (3, "exactly nineteen ch"),  # 19 chars
    ]
    assert _substring_verdicts(spark, rows) == set()
