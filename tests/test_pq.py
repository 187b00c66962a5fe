"""Product quantization (operators/pq.py).

Two kinds of pins: (1) semantics — codes are one-per-(vector,
subspace), ADC equals the hand-computed LUT sum, re-rank returns
exactly the true nearest of whatever the shortlist admits; (2) scale
shape — codebook/LUT/shortlist joins are broadcast, no cartesian, the
raw-vector table is never shuffled.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from transitdata_hfp_deduplicator_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_rerank_topk,
    sub_vectors,
)
from transitdata_hfp_deduplicator_spark.plans.inspect import physical_plan


def _clustered(spark, n_clusters=8, per=25, dim=16, noise=0.05, seed=7):
    """Tight planted clusters — the regime PQ is good at."""
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per):
            rows.append(
                (vid, [x + rng.uniform(-noise, noise) for x in c], ci)
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def test_one_code_per_vector_subspace(spark):
    e = _clustered(spark)
    sub = sub_vectors(e, subspaces=4, sub_dim=4)
    books = pq_codebooks(sub, k=8)
    codes = pq_encode(sub, books, sub_dim=4)
    n_vec = e.count()
    assert codes.count() == n_vec * 4
    assert codes.groupBy("vid", "s").count().filter("count > 1").count() == 0


def test_adc_equals_manual_lut_sum(spark):
    e = _clustered(spark, n_clusters=4, per=10, dim=8)
    sub = sub_vectors(e, subspaces=2, sub_dim=4)
    books = pq_codebooks(sub, k=4)
    codes = pq_encode(sub, books, sub_dim=4)
    qsub = sub.filter(F.col("vid") == 0)
    out = {
        (r.q_id, r.item_id): r.adc_d2
        for r in pq_adc_topk(codes, qsub, books, k=1000, sub_dim=4, subspaces=2).collect()
    }
    # recompute one entry by hand
    books_py = {(r.s, r.cell): r.c for r in books.collect()}
    codes_py = {(r.vid, r.s): r.cell for r in codes.collect()}
    qv = e.filter("vec_id = 0").collect()[0].embedding
    item = 17
    expect = 0.0
    for s in (0, 1):
        qsubv = qv[s * 4 : (s + 1) * 4]
        c = books_py[(s, codes_py[(item, s)])]
        d2 = (
            sum(x * x for x in qsubv)
            - 2 * sum(x * y for x, y in zip(qsubv, c))
            + sum(x * x for x in c)
        )
        expect += d2
    assert math.isclose(out[(0, item)], expect, abs_tol=1e-5)


def test_planted_clusters_high_recall(spark):
    # tight clusters, cluster diameter << inter-cluster distance:
    # ADC-only top-5 must stay inside the query's own cluster
    e = _clustered(spark, n_clusters=8, per=25, dim=16, noise=0.02)
    sub = sub_vectors(e, subspaces=4, sub_dim=4)
    books = pq_codebooks(sub, k=16)
    codes = pq_encode(sub, books, sub_dim=4)
    qsub = sub.filter(F.col("vid") % 50 == 0)
    top = pq_adc_topk(codes, qsub, books, k=5, sub_dim=4)
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    bad = [
        (r.q_id, r.item_id)
        for r in top.collect()
        if labels[r.item_id] != labels[r.q_id]
    ]
    assert not bad, f"cross-cluster neighbors: {bad}"


def test_rerank_is_exact_within_shortlist(spark):
    # whatever the shortlist admits, re-rank must order EXACTLY like a
    # brute-force L2 scan restricted to the shortlist
    e = _clustered(spark, n_clusters=4, per=20, dim=16, noise=0.3)
    sub = sub_vectors(e, subspaces=4, sub_dim=4)
    books = pq_codebooks(sub, k=8)
    codes = pq_encode(sub, books, sub_dim=4)
    qsub = sub.filter(F.col("vid") == 0)
    short = pq_adc_topk(codes, qsub, books, k=20, sub_dim=4)
    rr = pq_rerank_topk(short, e, query_filter=F.col("vec_id") == 0, k=20, dim=16)
    vecs = {r.vec_id: r.embedding for r in e.collect()}
    qv = vecs[0]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    short_ids = [r.item_id for r in short.collect()]
    expect = sorted(short_ids, key=lambda i: (round(d2(vecs[i], qv), 6), i))
    got = [r.item_id for r in rr.orderBy("rank").collect()]
    assert got == expect


def test_ivfadc_shortlist_restricted_to_probed_cells(spark):
    # IVFADC: every shortlist candidate must come from a coarse cell the
    # query probed — the IVF pruning is a hard guarantee, not a ranking
    # preference.  Also exercises the carry= path (ccell rides through
    # sub_vectors -> pq_encode with no vid-keyed join back).
    from transitdata_hfp_deduplicator_spark.operators.kmeans import (
        _cell_means,
        hash_cell,
    )
    from transitdata_hfp_deduplicator_spark.operators.pq import (
        _d2,
        ivfadc_shortlist,
    )

    e = _clustered(spark, n_clusters=6, per=20, dim=16, noise=0.05)
    vecs = e.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
    cmeans = _cell_means(vecs.withColumn("cell", hash_cell("vid", 4)))
    cand = vecs.join(F.broadcast(cmeans)).select(
        "vid", "v", "cell",
        F.round(_d2(F.col("v"), F.col("centroid"), 16), 6).alias("d2"),
    )
    assigned = cand.groupBy("vid").agg(
        F.min_by("cell", F.struct("d2", "cell")).alias("ccell"),
        F.any_value("v").alias("v"),
    )
    resid = assigned.join(
        F.broadcast(cmeans.withColumnRenamed("cell", "ccell")), "ccell"
    ).select(
        "vid", "ccell",
        F.zip_with("v", "centroid", lambda a, b: a - b).alias("r"),
    )
    sub = sub_vectors(
        resid, id_col="vid", vec_col="r", subspaces=4, sub_dim=4,
        carry=("ccell",),
    )
    books = pq_codebooks(sub, k=8)
    codes = pq_encode(sub, books, sub_dim=4, carry=("ccell",))
    assert dict(codes.groupBy("vid", "s").count().filter("count > 1").collect()) == {}

    qs = assigned.filter(F.col("vid") % 40 == 0)
    probes = qs.join(F.broadcast(cmeans)).select(
        F.col("vid").alias("q_id"),
        F.col("cell").alias("ccell"),
        "centroid",
        F.col("v").alias("qv"),
        F.round(_d2(F.col("v"), F.col("centroid"), 16), 6).alias("d2"),
    )
    from pyspark.sql.window import Window as W

    probes = probes.withColumn(
        "c_rank",
        F.row_number().over(W.partitionBy("q_id").orderBy("d2", "ccell")),
    ).filter(F.col("c_rank") <= 2)
    qresid = probes.select(
        "q_id", "ccell",
        F.zip_with("qv", "centroid", lambda a, b: a - b).alias("rq"),
    )
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(F.col("rq"), s * 4 + 1, 4).alias("subv"),
            )
            for s in range(4)
        ]
    )
    qsub = qresid.select("q_id", "ccell", F.explode(parts).alias("x")).select(
        "q_id", "ccell", "x.s", "x.subv"
    )
    lut = qsub.join(F.broadcast(books), "s").select(
        "q_id", "ccell", "s", "cell",
        _d2(F.col("subv"), F.col("c"), 4).alias("d2q"),
    )
    short = ivfadc_shortlist(codes, lut, subspaces=4, shortlist=10)

    probed = {(r.q_id, r.ccell) for r in probes.select("q_id", "ccell").collect()}
    cells = {r.vid: r.ccell for r in assigned.select("vid", "ccell").collect()}
    for r in short.collect():
        assert (r.q_id, cells[r.item_id]) in probed, (
            f"shortlist item {r.item_id} of q {r.q_id} sits in unprobed "
            f"cell {cells[r.item_id]}"
        )


def test_ivfadc_query_self_recall(spark, sf_dir):
    # corpus-member queries: the re-ranked rank-1 item must be the query
    # itself at d2 = 0 (exact-copy recall through coarse probe + ADC
    # shortlist + re-rank)
    from transitdata_hfp_deduplicator_spark.queries import QUERIES

    out = QUERIES["q_embed_ann_ivfpq"](spark, sf_dir)
    top1 = {(r.q_id, r.item_id, r.d2) for r in out.filter("rank = 1").collect()}
    assert top1, "no rank-1 rows"
    for q_id, item_id, d2 in top1:
        assert item_id == q_id and d2 == 0.0, (q_id, item_id, d2)


def test_plan_shape_broadcast_only(spark):
    e = _clustered(spark)
    sub = sub_vectors(e, subspaces=4, sub_dim=4)
    books = pq_codebooks(sub, k=8)
    codes = pq_encode(sub, books, sub_dim=4)
    qsub = sub.filter(F.col("vid") % 50 == 0)
    short = pq_adc_topk(codes, qsub, books, k=10, sub_dim=4)
    plan = physical_plan(
        pq_rerank_topk(short, e, query_filter=F.col("vec_id") % 50 == 0, dim=16)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
