"""Duplicate-cluster formation: connected components over the near-dup
pair graph — the step that turns pairwise similarity into dedup GROUPS
(keep one canonical document per component).

Distributed path: alternating large-star/small-star edge rewrites
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) — converges in O(log² n) rounds regardless of graph
DIAMETER, unlike min-label propagation whose round count is the
diameter itself (a 10⁹-doc near-dup graph can chain: think quoted
paragraphs A~B~C~…).  Each phase is ONE shuffle of the edge list
keyed by vertex (a window min — no join), and ``localCheckpoint``
truncates the lineage so round N's plan doesn't replay rounds 1..N-1
(the classic Spark iterative-algorithm trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _large_small_star(
    sym: DataFrame, max_iter: int, stats: dict | None = None
) -> DataFrame:
    """One (id, component) row per vertex of the symmetric edge list.

    Per round (Kiveris et al. 2014, Algorithm 2):
      large-star: every vertex u links its LARGER neighbours to
        m = min(Γ(u) ∪ {u})   — emitted as (v, m) for v ∈ Γ(u), v > u
      small-star: over the downward edges, every vertex u links its
        smaller neighbourhood N ∪ {u} to m = min(N ∪ {u})
    Both phases are a window-min partitioned by u — one exchange each,
    no self-join — and both strictly orient edges (big, small), so the
    edge list shrinks toward stars; fixpoint = all edges (v, root).

    ``stats`` (observability only, e.g. tools/stress_clusters.py):
    records ``rounds`` actually run before the fixpoint.
    """
    w = W.partitionBy("a")
    e = (
        sym.filter(F.col("b") < F.col("a")).distinct().localCheckpoint()
    )

    def fingerprint(df: DataFrame):
        """(count, hash-sum) of the edge SET (inputs are distinct()
        outputs) in ONE map-side-combined agg job.  Fixpoint detection
        by fingerprint equality replaces the old count + exceptAll pair
        — exceptAll re-shuffled both multi-million-row edge lists every
        round (measured: the check cost rivaled the rewrite itself).
        A false fixpoint needs a 64-bit hash-sum collision at equal
        counts (~2⁻⁶⁴ per round) and is additionally capped by
        ``max_iter``; the DECIMAL sum keeps the fold exact under
        ANSI overflow rules."""
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
            ).first()
        )

    fp = fingerprint(e)
    if stats is not None:
        stats["rounds"] = 0
    for _ in range(max_iter):
        s = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        # no distinct here: the small-star window-min is duplicate-
        # insensitive and new_e dedups below — the extra exchange cost
        # ~18% of the round (measured at 1M edges, warm, same rounds)
        ls = (
            s.withColumn("m", F.least(F.col("a"), F.min("b").over(w)))
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        ss = ls.withColumn("m", F.least(F.col("a"), F.min("b").over(w)))
        new_e = (
            ss.filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(ss.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        new_fp = fingerprint(new_e)
        converged = new_fp == fp
        e, fp = new_e, new_fp
        if stats is not None:
            stats["rounds"] += 1
        if converged:
            break
    labels = e.select(F.col("a").alias("id"), F.col("b").alias("component"))
    # roots never appear on the left of a downward edge — label them
    # with themselves (also covers vertices isolated by self-loop input)
    return (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """(vertex ``id``, ``component``) for every vertex in ``edges``;
    ``component`` = min vertex id reachable (including itself).

    Hybrid execution: the near-dup candidate graph is orders of
    magnitude smaller than the corpus (it only contains docs with at
    least one match), so below ``small_graph_edges`` the edge list is
    pulled to the driver and solved with union-find in one pass — the
    same small-side contract as a broadcast join (1M edges ≈ 16 MB).
    Above the bound, distributed large-star/small-star runs — round
    count O(log² n), independent of graph diameter (``max_iter`` is a
    safety bound, not a correctness knob: 25 rounds covers any graph
    that fits on hardware).
    """
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint()  # materialize the (possibly expensive)
    n_edges = sym.count()        # edge pipeline ONCE; count reads it back
    if n_edges <= small_graph_edges:
        rows = sym.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = r.a, r.b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union toward the smaller root => component = min id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = [(v, find(v)) for v in parent]
        return edges.sparkSession.createDataFrame(out, "id long, component long")
    return _large_small_star(sym, max_iter)


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
