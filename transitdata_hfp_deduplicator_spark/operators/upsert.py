"""MERGE-style upsert without a table format.

Training-data pipelines refresh snapshots from change streams; with
Delta/Iceberg absent (no jars in this environment) the classic
emulation is anti-join + union: updates replace matched target rows,
unmatched updates append.  At scale both sides shuffle once on the
merge key — identical shape to the join it replaces; a real lakehouse
MERGE additionally prunes untouched files, which is a storage-layout
property, not a plan property.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Rows of ``updates`` win over matching ``target`` rows; the rest
    of the target passes through (UPDATE + INSERT of SQL MERGE)."""
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def latest_snapshot(
    changes: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Collapse a change stream to its latest row per key (CDC compact):
    max_by over the version order — map-side combinable, the same
    partial-aggregation shape as dedup_exact but keeping the LAST."""
    keys, version_cols = list(keys), list(version_cols)
    latest = F.max_by(
        F.struct(*[F.col(c) for c in changes.columns]),
        F.struct(*[F.col(c) for c in version_cols]),
    ).alias("__latest")
    return changes.groupBy(*keys).agg(latest).select(
        *[F.col(f"__latest.{c}").alias(c) for c in changes.columns]
    )
