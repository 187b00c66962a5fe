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
   gives freq <= N/(capacity+1).  Hence ``capacity >= phi_den/phi_num``
   makes the candidate set complete for phi-heavy hitters at ANY
   distribution — no skew assumption, no sampling error.
3. One exact recount of candidates only (broadcast semi-join onto the
   stream — candidates are <= n_partitions * capacity rows, a
   broadcast-small contract like clusters.py's union-find bound)
   then the exact ``freq >= phi * N`` filter.

The output is therefore EXACT — the same rows as a full
``groupBy + HAVING cnt*phi_den >= N*phi_num`` over the non-NULL rows —
while the full-cardinality aggregation never happens: at 100 TB with
billions of distinct keys, phase 1 keeps ``capacity`` counters per
partition and phase 2 aggregates only the candidate slice.

NULL semantics: NULL keys are EXCLUDED from both candidacy and the
total N (``WHERE col IS NOT NULL`` in oracle terms).  pandas
``value_counts`` drops NaN/None and a NULL key can never match the
semi-join, so counting NULL rows in N while excluding them from
candidacy would silently diverge from any groupBy oracle; excluding
them from both sides keeps the contract exact and SQL-expressible.

Input-scan budget: exactly TWO full passes over ``df`` (the phase-1
fold and the phase-3 recount) — the minimum inherent to the
algorithm.  The phase-1 fold emits one sentinel row per partition
carrying the partition's row total, and the tiny fold output
(<= n_partitions * (capacity+1) rows) is persisted so the candidate
branch and the N branch both read it without re-scanning ``df``.

Reference tie-in: the reference's duplicate-ratio alert
(Analytics.java:56-59) is a frequency monitor over a bounded key space;
this is its unbounded-key-space analog.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: phase-1 output column carrying either a surviving MG counter value
#: (candidate rows) or the partition row total (the per-partition
#: sentinel row, marked by a NULL key — safe because NULL inputs are
#: filtered before the fold).
_LB = "lb"
#: internal alias for the optional weight column inside the fold
_W = "__w"

#: fold outputs persisted by heavy_hitters_exact, tracked so long
#: sessions can release them: each new call releases the previous
#: call's cache (the two-scan budget only needs the cache alive while
#: ITS query runs; queries in this repo build-then-execute
#: sequentially, and an early unpersist is never wrong — Spark just
#: recomputes), and release_fold_caches() frees the last one.
_FOLD_CACHES: list[DataFrame] = []


def release_fold_caches() -> None:
    """Unpersist every fold output still tracked (session hygiene —
    the same long-session concern session.py documents for the
    ContextCleaner).  Safe at any time: an unpersisted fold recomputes
    on next use, it never changes results."""
    while _FOLD_CACHES:
        try:
            _FOLD_CACHES.pop().unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass


def _keyed(df: DataFrame, col: str, weight_col: str | None) -> DataFrame:
    """(key[, weight]) projection with the documented NULL exclusion."""
    out = df.select(
        F.col(col).cast("string").alias(col),
        *(
            [F.col(weight_col).cast("long").alias(_W)]
            if weight_col is not None
            else []
        ),
    ).filter(F.col(col).isNotNull())
    if weight_col is not None:
        out = out.filter(F.col(_W).isNotNull())
    return out


def mg_partition_candidates(
    df: DataFrame, col: str, capacity: int, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra-Gries survivors ``(col, lb)`` plus one
    sentinel row per non-empty partition (``col`` NULL, ``lb`` = the
    partition's total mass, NULLs excluded).

    With ``weight_col`` the summary tracks WEIGHTED mass (e.g. bytes
    per tenant) instead of row counts — the MG decrement is already
    weighted, so every bound below holds verbatim with N = total
    weight.  Weights must be non-negative integers; rows with NULL key
    OR NULL weight are excluded from both candidacy and the totals.

    ``lb`` on a survivor row is the surviving counter value — a LOWER
    bound on the partition-local mass (under-counted by at most
    N_p/(capacity+1)).  At most ``capacity + 1`` rows per partition
    leave the executor.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    out_schema = f"`{col}` string, {_LB} long"

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        n_part = 0
        for pdf in batches:
            if weight_col is None:
                grouped = pdf[col].value_counts().items()
                n_part += len(pdf)
            else:
                w = pdf.groupby(col, sort=False)[_W].sum()
                grouped = w.items()
                n_part += int(pdf[_W].sum())
            for val, c in grouped:
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > capacity:
                # weighted MG decrement: subtract the (capacity+1)-th
                # largest counter from ALL counters, drop <= 0 — one
                # O(n log n) pass per Arrow batch, never per row
                vals = sorted(counts.values(), reverse=True)
                d = vals[capacity]
                counts = {k: v - d for k, v in counts.items() if v > d}
        if n_part:
            yield pd.DataFrame(
                {
                    col: list(counts.keys()) + [None],
                    _LB: list(counts.values()) + [n_part],
                }
            )

    return (
        _keyed(df, col, weight_col)
        .mapInPandas(fold, schema=out_schema)
    )


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    phi_num: int,
    phi_den: int,
    capacity: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters over non-NULL keys:
    ``cnt * phi_den >= N * phi_num`` where N counts non-NULL rows —
    or, with ``weight_col``, phi-heavy MASS: ``cnt`` becomes the key's
    exact weight sum and N the total weight (bytes per tenant, tokens
    per source — the weighted-frequent-items problem; same MG bounds,
    weights in place of unit counts).

    ``phi = phi_num / phi_den`` stays a rational so the final filter is
    integer arithmetic — identical in Spark and any SQL oracle; the
    comparison runs in decimal(38,0) so it cannot wrap at int64 scale
    (ANSI-off Spark would otherwise overflow silently).
    ``capacity`` defaults to the smallest value satisfying the superset
    guarantee (ceil(phi_den/phi_num)); callers may raise it to shrink
    phase-2 candidate counts.

    N = 0 contract (weighted only): when every row's weight is 0 the
    total mass is zero and this returns EMPTY, whereas a naive
    ``HAVING cnt*phi_den >= N*phi_num`` oracle returns EVERY distinct
    key (0 >= 0).  "Every key is phi-heavy of nothing" is degenerate —
    its output is unbounded in the key cardinality, which no
    capacity-bounded summary can produce — so exactness is guaranteed
    for N >= 1 and the zero-mass case is pinned to empty
    (tests/test_heavyhitters.py::test_weighted_zero_total_mass_empty).
    """
    if phi_num < 1:
        raise ValueError(f"phi_num must be >= 1, got {phi_num}")
    if phi_den < phi_num:
        raise ValueError(
            f"phi must be <= 1: got phi_num={phi_num} > phi_den={phi_den}"
        )
    if capacity is None:
        capacity = -(-phi_den // phi_num)
    if capacity * phi_num < phi_den:
        raise ValueError(
            f"capacity {capacity} breaks the superset guarantee for "
            f"phi={phi_num}/{phi_den} (need >= {-(-phi_den // phi_num)})"
        )
    # Tiny fold output (<= n_partitions * (capacity+1) rows): persist so
    # the candidate branch and the N branch share ONE scan of df.
    # Tracked in _FOLD_CACHES: releasing the PREVIOUS call's cache here
    # bounds live fold caches at one per session however many queries a
    # sweep runs; release_fold_caches() frees the last.
    release_fold_caches()
    fold_out = mg_partition_candidates(df, col, capacity, weight_col).persist()
    _FOLD_CACHES.append(fold_out)
    cand = fold_out.filter(F.col(col).isNotNull()).select(col).distinct()
    n = fold_out.filter(F.col(col).isNull()).agg(
        F.coalesce(F.sum(_LB), F.lit(0)).alias("n_total")
    )
    mass = (
        F.count(F.lit(1)) if weight_col is None else F.sum(_W)
    ).alias("cnt")
    exact = (
        _keyed(df, col, weight_col)
        .join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(mass)
    )
    big = "decimal(38,0)"
    return (
        exact.crossJoin(F.broadcast(n))
        .filter(
            F.col("cnt").cast(big) * F.lit(phi_den).cast(big)
            >= F.col("n_total").cast(big) * F.lit(phi_num).cast(big)
        )
        .select(col, "cnt")
    )
