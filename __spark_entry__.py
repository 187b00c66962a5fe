"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``transitdata_hfp_deduplicator_spark/`` — this
module only re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transitdata_hfp_deduplicator_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: first-wins exact dedup of `events` at sf0.001 — the
    reference's core semantics (Deduplicator.java:43-66) as one batch
    DataFrame plan."""
    return _q.QUERIES["q_dedup_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    so the driver's 50-entry correctness window covers queries with no
    prior-round evidence first (this round's new queries and the r3
    gate-cut tail), then re-confirms the cheapest evidenced ones."""
    return _q.gate_ordered()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return dict(_q.ORACLES)
