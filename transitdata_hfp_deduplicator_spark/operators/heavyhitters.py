"""Distributed phi-heavy-hitters: Misra-Gries candidates + exact recount.

The classic two-phase frequent-items plan (Misra & Gries 1982; merge
bound from Agarwal et al. 2013, "Mergeable Summaries"):

1. Each partition folds its rows through a WEIGHTED Misra-Gries summary
   of ``capacity`` counters (value_counts per Arrow batch, then the
   decrement step subtracts the (capacity+1)-th largest count from all
   counters and drops the non-positive ones).  Every decrement round
   removes >= (capacity+1) * d total weight, so a partition holding
   N_p rows under-counts any item by at most N_p / (capacity+1).
2. The union of partition survivors is a GUARANTEED superset of every
   item with global frequency > N / (capacity+1): if an item survived
   nowhere, each partition counted it <= N_p/(capacity+1); summing
   gives freq <= N/(capacity+1).  Hence ``capacity >= 1/phi`` makes the
   candidate set complete for phi-heavy hitters at ANY distribution —
   no skew assumption, no sampling error.
3. One exact recount of candidates only (broadcast semi-join onto the
   stream — candidates are <= n_partitions * capacity rows, a
   broadcast-small contract like clusters.py's union-find bound)
   then the exact ``freq >= phi * N`` filter.

The output is therefore EXACT (same rows as a full groupBy + HAVING)
while the full-cardinality aggregation never happens: at 100 TB with
billions of distinct keys, phase 1 keeps ``capacity`` counters per
partition and phase 2 aggregates only the candidate slice.

Reference tie-in: the reference's duplicate-ratio alert
(Analytics.java:56-59) is a frequency monitor over a bounded key space;
this is its unbounded-key-space analog.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_partition_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries survivors ``(col, lb)``.

    ``lb`` is the surviving counter value — a LOWER bound on the
    partition-local count (under-counted by at most N_p/(capacity+1)).
    At most ``capacity`` rows per partition leave the executor.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    out_schema = f"`{col}` string, lb long"

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for val, c in pdf[col].value_counts().items():
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > capacity:
                # weighted MG decrement: subtract the (capacity+1)-th
                # largest counter from ALL counters, drop <= 0 — one
                # O(n log n) pass per Arrow batch, never per row
                vals = sorted(counts.values(), reverse=True)
                d = vals[capacity]
                counts = {k: v - d for k, v in counts.items() if v > d}
        if counts:
            yield pd.DataFrame(
                {col: list(counts.keys()), "lb": list(counts.values())}
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        fold, schema=out_schema
    )


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    phi_num: int,
    phi_den: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters (freq * phi_den >= N * phi_num) without a
    full-cardinality aggregation.

    ``phi = phi_num / phi_den`` stays a rational so the final filter is
    integer arithmetic — identical in Spark and any SQL oracle.
    ``capacity`` defaults to the smallest value satisfying the superset
    guarantee (ceil(phi_den/phi_num)); callers may raise it to shrink
    phase-2 candidate counts.
    """
    if capacity is None:
        capacity = -(-phi_den // phi_num)
    if capacity * phi_num < phi_den:
        raise ValueError(
            f"capacity {capacity} breaks the superset guarantee for "
            f"phi={phi_num}/{phi_den} (need >= {-(-phi_den // phi_num)})"
        )
    cand = (
        mg_partition_candidates(df, col, capacity)
        .select(col)
        .distinct()
    )
    n = df.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        df.select(F.col(col).cast("string").alias(col))
        .join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * phi_den >= F.col("n_total") * phi_num)
        .select(col, "cnt")
    )
