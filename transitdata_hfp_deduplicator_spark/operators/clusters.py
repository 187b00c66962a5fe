"""Duplicate-cluster formation: connected components over the near-dup
pair graph — the step that turns pairwise similarity into dedup GROUPS
(keep one canonical document per component).

Iterative min-label propagation: each vertex repeatedly adopts the
minimum label among itself and its neighbours; converges in
O(graph diameter) join rounds.  Each round is one shuffle keyed by
vertex id; ``localCheckpoint`` truncates the lineage so round N's plan
doesn't replay rounds 1..N-1 (the classic Spark iterative-algorithm
trap).  For web-scale graphs the round count drops to O(log n) with
the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — same join shapes,
different edge rewrites; the hook is noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex ``id``, ``component``) for every vertex in ``edges``;
    ``component`` = min vertex id reachable (including itself)."""
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    vertices = sym.select(F.col("a").alias("id")).distinct()
    labels = vertices.withColumn("component", F.col("id")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage: round N must not replay 1..N-1
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_src: str = "i",
    pair_dst: str = "j",
) -> DataFrame:
    """Assign every document a dedup cluster: near-dup components get
    their minimum member id as ``cluster_id`` (the canonical survivor —
    first-wins by id, the reference's first-occurrence rule applied to
    groups); untouched documents are their own cluster.
    Adds ``is_canonical``."""
    comp = connected_components(pairs, pair_src, pair_dst)
    out = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )
    return out
