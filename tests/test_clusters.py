"""Connected-components / dedup-cluster semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def test_chain_triangle_and_isolated(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "i long, j long",
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_clusters_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "i long, j long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs, pairs).collect()}
    assert out[0] == (0, True)
    assert out[3] == (0, False)
    assert out[5] == (0, False)
    assert out[1] == (1, True)  # untouched docs are their own canonical
    n_canonical = sum(1 for c, canon in out.values() if canon)
    assert n_canonical == 4  # {0,1,2,4}


def test_long_chain_converges(spark):
    n = 40  # diameter > default max_iter would break; 25 iters, chain 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "i long, j long"
    )
    comp = connected_components(edges, max_iter=50)
    labels = {r.component for r in comp.collect()}
    assert labels == {0}, f"chain must collapse to one component, got {labels}"


def test_distributed_path_matches_unionfind(spark):
    """Force the distributed large/small-star path (small_graph_edges=0)
    and check it agrees with the driver union-find fast path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "i long, j long",
    )
    fast = {r.id: r.component for r in connected_components(edges).collect()}
    dist = {
        r.id: r.component
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    assert fast == dist


def _py_components(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_large_small_star_deep_chain(spark):
    """Diameter 120 ≫ max_iter 25: label propagation would need 120
    rounds; large/small-star must converge in O(log² n) — the property
    the 100 TB path depends on (quoted-paragraph chains A~B~C~...)."""
    n = 120
    edge_list = [(i, i + 1) for i in range(n)]
    edges = spark.createDataFrame(edge_list, "i long, j long")
    dist = {
        r.id: r.component
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    assert dist == _py_components(edge_list)
    assert set(dist.values()) == {0}


def test_large_small_star_random_graphs(spark):
    """Distributed path vs pure-python union-find on random graphs of
    mixed shape (chains, stars, cliques, singletons-by-pair)."""
    import random

    rng = random.Random(20260814)
    for trial in range(3):
        nodes = list(range(0, 400, rng.choice([1, 3, 7])))
        edge_list = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
        ]
        edge_list = [e for e in edge_list if e[0] != e[1]]
        edges = spark.createDataFrame(edge_list, "i long, j long")
        dist = {
            r.id: r.component
            for r in connected_components(edges, small_graph_edges=0).collect()
        }
        assert dist == _py_components(edge_list), f"trial {trial}"
