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
    """Flagship: end-to-end corpus curation at sf0.001 — quality gate →
    exact dedup → MinHash-LSH near-dup prune → 512-token sequence
    packing, returning the per-sequence manifest.  Composes the
    reference's dedup core (Deduplicator.java:43-66 generalized to the
    documents table) with the LLM-pipeline operators into one plan."""
    return _q.QUERIES["q_corpus_curate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    so the driver's 50-entry correctness window covers queries with no
    prior-round evidence first (this round's new queries and the r3
    gate-cut tail), then re-confirms the cheapest evidenced ones."""
    return _q.gate_ordered()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return dict(_q.ORACLES)
