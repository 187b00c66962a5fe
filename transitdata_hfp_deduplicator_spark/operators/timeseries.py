"""Time-series operators: gap-based sessionization and gap-fill/resample.

The reference's only time notion is a processing-time scheduler window
(Analytics.java:41-44); these operators generalize that to the
event-time shapes a training-data or telemetry pipeline needs:

* ``sessionize`` — split each entity's event stream into sessions at
  inactivity gaps (the batch mirror of Spark's streaming
  ``session_window``, which q_session_window already covers).
* ``gapfill`` — densify a per-bucket aggregate onto a regular time
  grid (TimescaleDB calls this ``time_bucket_gapfill`` + ``locf``),
  zero-filling counts and forward-filling last observations.

Scale notes:

* ``sessionize`` is ONE shuffle on the entity key; the two window
  functions (lag + running sum) and the final per-session aggregate
  all reuse that partitioning, so Catalyst plans a single Exchange.
* ``gapfill`` generates the grid with ``sequence()`` per *group*, not
  per row — grid size is O(groups x buckets), independent of input
  row count, so the explode side stays tiny relative to the fact scan
  even at 100 TB.  The grid join is an equi-join on (group, bucket)
  and broadcasts when the grid is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap: str = "10 minutes",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-entity ``session_id`` (1-based) that increments
    whenever the gap since the previous event exceeds ``gap``.

    Returns the input rows with ``session_id`` appended.  One shuffle
    (on ``entity_cols``); both window passes reuse it.
    """
    order = [ts_col, *order_tiebreak]
    w = W.partitionBy(*entity_cols).orderBy(*order)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ms = F.unix_millis(F.col(ts_col))
    prev = F.lag(ms).over(w)
    gap_col = F.lit(_interval_millis(gap))
    brk = F.when(prev.isNull() | ((ms - prev) > gap_col), 1).otherwise(0)
    return df.withColumn("_brk", brk).withColumn(
        "session_id", F.sum("_brk").over(run)
    ).drop("_brk")


def _interval_millis(spec: str) -> int:
    """Parse a small interval spec ("10 minutes", "1 hour") to millis."""
    qty, unit = spec.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(qty) * mult


def session_stats(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap: str = "10 minutes",
    order_tiebreak: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sessionize then collapse each session to start/end/count rows."""
    s = sessionize(df, entity_cols, ts_col, gap, order_tiebreak)
    return s.groupBy(*entity_cols, "session_id").agg(
        F.unix_millis(F.min(ts_col)).alias("session_start_ms"),
        F.unix_millis(F.max(ts_col)).alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        *aggs,
    )


def gapfill(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    bucket: str = "1 hour",
    aggs: Sequence[Column] = (),
    zero_fill: Sequence[str] = (),
    ffill: Sequence[str] = (),
) -> DataFrame:
    """Bucket ``df`` by ``date_trunc(bucket)`` per group, then densify
    onto the full [min, max] grid of each group.

    ``aggs`` are applied per (group, bucket); columns named in
    ``zero_fill`` get 0 on empty buckets, columns in ``ffill`` carry
    the last non-null observation forward (locf).

    Bucketing floors epoch-millis to the FULL interval width (epoch-
    anchored), so multi-quantity buckets ("30 minutes", "6 hours")
    align with the grid the sequence() step walks — a unit-only
    date_trunc would put data rows on one grid and the join keys on
    another, silently dropping real aggregates.  For quantity-1 specs
    this floor is identical to date_trunc in the engine's UTC session.
    """
    qty, unit_raw = bucket.split()
    unit = unit_raw.rstrip("s")
    if unit in ("week", "month", "year"):
        # calendar units are irregular — no epoch-width floor exists;
        # date_trunc aligns with the calendar starts sequence() walks,
        # but only for quantity 1
        if int(qty) != 1:
            raise ValueError(
                f"gapfill: multi-quantity calendar buckets ({bucket!r}) "
                "have no fixed width; use quantity 1 or a day-based spec"
            )

        def _floor(c: Column) -> Column:
            return F.date_trunc(unit, c)

    else:
        width = F.lit(_interval_millis(bucket))

        def _floor(c: Column) -> Column:
            ms = F.unix_millis(c)
            return F.timestamp_millis(ms - F.pmod(ms, width))

    b = _floor(F.col(ts_col)).alias("_bucket")
    per_bucket = df.groupBy(*group_cols, b).agg(*aggs)
    span = df.groupBy(*group_cols).agg(
        _floor(F.min(ts_col)).alias("_b0"),
        _floor(F.max(ts_col)).alias("_b1"),
    )
    grid = span.select(
        *group_cols,
        F.explode(
            F.sequence("_b0", "_b1", F.expr(f"interval {bucket}"))
        ).alias("_bucket"),
    )
    out = grid.join(per_bucket, [*group_cols, "_bucket"], "left")
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            W.partitionBy(*group_cols)
            .orderBy("_bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for c in ffill:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
