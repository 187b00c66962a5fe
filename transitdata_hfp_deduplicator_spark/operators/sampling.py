"""Deterministic sampling / split assignment for training pipelines.

A 100 TB corpus needs *reproducible* train/valid/test splits: the split
a row lands in must be a pure function of its key, never of partition
layout, task order, or RNG state.  ``hash_split`` buckets each row by a
multiplicative hash of integer key columns into [0, modulus) and maps
bucket ranges to named splits.  The same arithmetic is trivially
expressible in any engine (the DuckDB oracle runs the identical
formula), which is exactly the property you want for split audits.

Also provided: ``bernoulli_sample`` (seeded, partition-independent —
unlike ``DataFrame.sample`` whose output depends on partitioning) and
``stratified_counts`` for verifying split balance per stratum.

Scale notes: pure narrow projections — no shuffle, no RNG
synchronization; the split predicate pushes into the scan like any
other deterministic filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small odd multipliers keep key*mult well inside int64 even at
# petabyte-scale key ranges (6e11 * 9973 << 2^63)
_MULTS = (9973, 31, 517, 7919)


def hash_bucket(key_cols: Sequence[str | Column], modulus: int = 100) -> Column:
    """Deterministic bucket in [0, modulus) from integer key columns."""
    acc: Column | None = None
    for i, c in enumerate(key_cols):
        col = F.col(c) if isinstance(c, str) else c
        term = col * F.lit(_MULTS[i % len(_MULTS)])
        acc = term if acc is None else acc + term
    assert acc is not None, "need at least one key column"
    return F.pmod(acc, F.lit(modulus))


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    splits: Sequence[tuple[str, int]] = (("train", 80), ("valid", 10), ("test", 10)),
    modulus: int = 100,
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split.

    ``splits`` are (name, weight) pairs; weights must sum to
    ``modulus``.  Assignment is a pure function of the keys.
    """
    if sum(w for _, w in splits) != modulus:
        raise ValueError("split weights must sum to the modulus")
    b = hash_bucket(key_cols, modulus)
    expr: Column | None = None
    hi = 0
    for name, w in splits[:-1]:
        hi += w
        branch = (b < F.lit(hi), F.lit(name))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    last = F.lit(splits[-1][0])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def bernoulli_sample(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    fraction: float,
    modulus: int = 1_000_000,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    regardless of partitioning (unlike ``DataFrame.sample``)."""
    return df.filter(hash_bucket(key_cols, modulus) < int(fraction * modulus))


def stratified_counts(
    df: DataFrame, split_col: str, strata: Sequence[str]
) -> DataFrame:
    """Per-stratum split sizes — the audit query for split balance."""
    return df.groupBy(split_col, *strata).agg(F.count(F.lit(1)).alias("n_rows"))


def stratified_quota_sample(
    df: DataFrame,
    strata: Sequence[str],
    key_cols: Sequence[str | Column],
    quota: int,
    modulus: int = 1_000_003,
) -> DataFrame:
    """Keep at most ``quota`` rows per stratum — the corpus-mixing
    primitive ("N docs per (lang, source)") — chosen as the ``quota``
    SMALLEST key hashes within the stratum (bottom-k by hash = a
    uniform without-replacement sample that is a pure function of the
    keys: reproducible across engines, partitionings, and reruns, and
    shrink-stable — lowering the quota yields a subset of the larger
    sample).  Appends ``pick_rank`` (1-based within stratum).

    Scale shape: ONE exchange keyed by the strata, rank inside the
    sorted stream.  A pathologically hot stratum pays its sort locally
    (spillable); when stratum sizes are known, pre-cut with
    ``hash_bucket(keys) < quota * margin * modulus / size`` before the
    window to shed the bulk map-side — same winners, since the final
    rank re-derives them from the surviving superset.
    """
    order = hash_bucket(key_cols, modulus)
    from pyspark.sql.window import Window as W

    ties = [c if isinstance(c, Column) else F.col(c) for c in key_cols]
    w = W.partitionBy(*strata).orderBy(order, *ties)
    return (
        df.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= quota)
    )


def sharded_prefix_sum(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    part_cols: Sequence[str] = (),
    shards: int = 32,
    out_col: str = "prior",
    max_df: DataFrame | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``weight_col`` in ``id_col`` order
    within each ``part_cols`` group — the range-sharded TWO-PASS form,
    never a single-task window over a whole group.

    A plain ``Window.partitionBy(part).orderBy(id)`` running sum
    funnels each group's entire row set through ONE task's sort — at
    100 TB with ~10 languages that is ~10 tasks holding terabytes.
    Here rows bucket into ``shards`` id ranges (the bucket function is
    monotone in id, so within-group order is preserved across shard
    boundaries); pass 1 aggregates one partial sum per (group, shard)
    and turns it into exclusive running offsets over a tiny
    groups×shards table; pass 2 cumsums WITHIN each (group, shard) in
    parallel and adds the offset.  Identical values to the single-task
    window, linear shuffle at any group size.

    ``max_df``: optional cheap superset to derive min/max(id) from
    (e.g. the raw scan) when ``df`` is the tail of an expensive plan —
    using a superset's bounds only changes shard boundaries, never the
    sum.  Appends ``out_col`` (bigint) to ``df``'s columns.

    NULL handling matches the single-task window: NULL ids get a
    dedicated shard that sorts before every real one (Spark windows
    order NULLs first ascending; their mutual tie order is arbitrary in
    both forms), and NULLs in ``part_cols`` are a group of their own
    (the internal joins are null-safe).
    """
    from functools import reduce as _reduce

    from pyspark.sql.window import Window as W

    src = df if max_df is None else max_df
    stats = src.select(
        F.min(F.col(id_col)).alias("_mn"), F.max(F.col(id_col)).alias("_mx")
    )
    parts = list(part_cols)
    # Shard index: monotone in id — rescale by min so the numerator is
    # never negative for any id sign, and compute in DOUBLE so
    # hash-derived ids near ±2^63 can't silently wrap an int64 multiply
    # (x·c with c>0, and truncation, are both order-preserving in IEEE
    # double, so non-strict monotonicity — all the bucketing needs —
    # survives the precision loss above 2^53).
    mn = F.col("_mn").cast("double")
    span = F.col("_mx").cast("double") - mn + F.lit(1.0)
    bucket = F.least(
        F.greatest(
            ((F.col(id_col).cast("double") - mn) * shards / span).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(shards - 1),
    )
    d = df.crossJoin(F.broadcast(stats)).withColumn(
        "_shard",
        F.when(F.col(id_col).isNull(), F.lit(-1)).otherwise(bucket),
    )
    # pass 1: per-(group, shard) totals -> exclusive running offsets
    # (tiny table: |groups| * shards rows; the offset window partitions
    # by group, so even this small sort parallelizes across groups)
    sh = (
        d.groupBy(*parts, "_shard")
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("_sw"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_sw").over(
                    W.partitionBy(*parts)
                    .orderBy("_shard")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(*parts, "_shard", "_off")
    )
    # pass 2: within-(group, shard) exclusive cumsums, all in parallel.
    # The offset join is NULL-SAFE so NULL group keys / the NULL-id
    # shard still find their offset row (a plain equi-join would
    # silently drop them — diverging from the window semantics).
    join_keys = [*parts, "_shard"]
    sh_r = sh.select(
        *[F.col(c).alias(f"_r_{c}") for c in join_keys], F.col("_off")
    )
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_r_{c}")) for c in join_keys],
    )
    out = d.join(F.broadcast(sh_r), cond).withColumn(
        out_col,
        F.col("_off")
        + F.coalesce(
            F.sum(F.col(weight_col).cast("bigint")).over(
                W.partitionBy(*parts, "_shard")
                .orderBy(id_col)
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return out.drop(
        "_mn", "_mx", "_shard", "_off", *[f"_r_{c}" for c in join_keys]
    )


def systematic_pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    shards: int = 32,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949) — k deterministic picks with inclusion probability
    proportional to an integer weight: lay every row's weight end to
    end in id order, drop k evenly spaced pointers at
    t_j = (2j+1)·W/(2k), and select the row each pointer lands in.  A
    row heavier than W/k can be hit multiple times (true PPS
    semantics), reported via ``n_picks``.  ENTIRELY integer arithmetic
    (the pointer test (2j+1)·W < 2k·cum is cross-multiplied, never
    divided), so verdicts are exact in any engine — no transcendental
    u^(1/w) keys (Efraimidis-Spirakis needs pow/log, which are not
    correctly-rounded IEEE and can differ across engines in the last
    ulp; systematic PPS gives the same proportional-inclusion guarantee
    for ordered data with none of that risk).

    Scale shape: the global cumulative sum is the classic TWO-PASS
    range-sharded form, not a single-partition global window — rows
    bucket into ``shards`` id ranges, pass 1 aggregates one partial sum
    per shard (broadcast back as running offsets, shards² tiny rows),
    pass 2 cumsums WITHIN each shard in parallel.  The bucketing is the
    same min/max-rescaled DOUBLE form as ``sharded_prefix_sum`` (no
    int64 wrap for hash-derived ids near ±2^63; NULL ids get the
    first-ordered shard, matching window nulls-first order, instead of
    being silently dropped while their weights still shifted every
    pointer).  Returns (id, weight, n_picks) for rows with
    n_picks >= 1.
    """
    stats = df.select(
        F.min(F.col(id_col)).alias("mn"),
        F.max(F.col(id_col)).alias("mx"),
        F.sum(F.col(weight_col)).cast("bigint").alias("tw"),
    )
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("bigint").alias("w"),
    ).crossJoin(F.broadcast(stats))
    _mn = F.col("mn").cast("double")
    _span = F.col("mx").cast("double") - _mn + F.lit(1.0)
    _bucket = F.least(
        F.greatest(
            ((F.col("id").cast("double") - _mn) * shards / _span).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(shards - 1),
    )
    d = d.withColumn(
        "shard",
        F.when(F.col("id").isNull(), F.lit(-1)).otherwise(_bucket),
    )
    # pass 1: per-shard totals -> exclusive running offsets (tiny table)
    from pyspark.sql.window import Window as W

    sh = (
        d.groupBy("shard")
        .agg(F.sum("w").alias("sw"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("sw").over(
                    W.orderBy("shard").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("shard", "off")
    )
    # pass 2: within-shard cumulative sums, all shards in parallel
    cum = (
        d.join(F.broadcast(sh), "shard")
        .withColumn(
            "cum",
            F.col("off")
            + F.sum("w").over(
                W.partitionBy("shard")
                .orderBy("id")
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .withColumn("cprev", F.col("cum") - F.col("w"))
    )
    # g(c) = #{ j >= 0 : (2j+1) * W < 2k * c } — TRUE integer division
    # (SQL `div`), never `/`: BIGINT `/` routes through double, which
    # loses exactness past 2^53 (reachable when k·W crosses ~9e15 at
    # corpus scale)
    out = (
        cum.withColumn("nhi", F.lit(2 * k) * F.col("cum") - F.col("tw") - 1)
        .withColumn("nlo", F.lit(2 * k) * F.col("cprev") - F.col("tw") - 1)
        .withColumn(
            "ghi",
            F.when(F.col("nhi") >= 0, F.expr("nhi div (2 * tw) + 1")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "glo",
            F.when(F.col("nlo") >= 0, F.expr("nlo div (2 * tw) + 1")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("n_picks", (F.col("ghi") - F.col("glo")).cast("bigint"))
    )
    return out.filter(F.col("n_picks") >= 1).select(
        F.col("id").alias(id_col),
        F.col("w").alias(weight_col),
        "n_picks",
    )
