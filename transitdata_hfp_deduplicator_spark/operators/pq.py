"""Product quantization (PQ) ANN: codebooks, encoding, ADC scoring.

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") is the memory-side complement to the IVF family already in
the engine (operators/kmeans.py, similarity.ivf_topk): split each
D-dim vector into S subspaces, quantize each subvector against a
small per-subspace codebook, and store only S one-byte codes per
vector.  At 100 TB of embeddings this is the difference between
scanning 4 KB/vector and 4 B/vector: the codes table is ~1000x
smaller than the raw vectors, and query scoring (ADC — asymmetric
distance computation) touches ONLY the codes plus a per-query lookup
table of S x k precomputed sub-distances.

Everything is deterministic and engine-reproducible, same discipline
as the k-means trainer it borrows its init from:

* codebooks = DECIMAL-routed subvector means of md5-hash-init cells
  (one Lloyd "mean" step from a deterministic partition — the trained
  refinement path is ``kmeans_cells`` applied per subspace);
* encoding = argmin over round(L2², 6) with a cell tie-break;
* ADC sums route through DECIMAL so partial-aggregation order cannot
  perturb the ranking.

L2² is spelled ``dot(a,a) - 2·dot(a,b) + dot(b,b)`` because both
engines evaluate each dot product as a sequential in-order fold
(functions/vectors.py:22, DuckDB list_dot_product) — bit-identical,
where a zip-then-sum of squared differences would leave the
summation order unspecified in SQL.

Scale shape: codebooks are S·k rows (tiny, broadcast everywhere); the
encode and LUT joins are broadcast joins against them; ADC joins the
codes table to the per-query LUT (broadcast: #queries × S·k rows) and
reduces with one (q_id, vid)-keyed partial-agg exchange.  The raw
vectors are read exactly twice (codebook build, encode) and never
shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from transitdata_hfp_deduplicator_spark.functions import vectors as VEC
from transitdata_hfp_deduplicator_spark.operators.kmeans import hash_cell


def _d2(a: Column, b: Column) -> Column:
    """L2² via the dot-product identity — see module docstring for why
    not a squared-difference fold."""
    return VEC.dot(a, a) - F.lit(2.0) * VEC.dot(a, b) + VEC.dot(b, b)


def sub_vectors(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subspaces: int = 4,
    sub_dim: int = 16,
) -> DataFrame:
    """Long-format subspace view: (vid, s, subv double[sub_dim])."""
    v = VEC.as_double(F.col(vec_col))
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(v, s * sub_dim + 1, sub_dim).alias("subv"),
            )
            for s in range(subspaces)
        ]
    )
    return vecs.select(
        F.col(id_col).alias("vid"), F.explode(parts).alias("x")
    ).select("vid", "x.s", "x.subv")


def pq_codebooks(sub: DataFrame, k: int = 8) -> DataFrame:
    """(s, cell, c double[sub_dim]): per-subspace codebook — DECIMAL
    mean of the md5-hash-init cells (one deterministic Lloyd mean step;
    chain ``kmeans_cells`` per subspace for more refinement)."""
    init = sub.withColumn("cell", hash_cell("vid", k))
    m = (
        init.select("s", "cell", F.posexplode("subv").alias("i", "x"))
        .groupBy("s", "cell", "i")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    return m.groupBy("s", "cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda st: st.m
        ).alias("c")
    )


def pq_encode(sub: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vid, s, cell): nearest-codeword assignment per subspace —
    argmin of round(L2², 6) with a cell tie-break, broadcast join
    against the S·k codebook rows."""
    cand = sub.join(F.broadcast(codebooks), "s").withColumn(
        "d2", F.round(_d2(F.col("subv"), F.col("c")), 6)
    )
    rn = F.row_number().over(
        W.partitionBy("vid", "s").orderBy(F.col("d2").asc(), F.col("cell").asc())
    )
    return cand.withColumn("rn", rn).filter(F.col("rn") == 1).select(
        "vid", "s", "cell"
    )


def pq_adc_topk(
    codes: DataFrame,
    queries_sub: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Asymmetric distance top-k: per query, precompute the S·k LUT of
    exact query-subvector-to-codeword sub-distances, then score every
    encoded vector as the DECIMAL-routed sum of its S looked-up
    entries.  Returns (q_id, item_id, adc_d2, rank) with rank <= k."""
    lut = (
        queries_sub.select(F.col("vid").alias("q_id"), "s", "subv")
        .join(F.broadcast(codebooks), "s")
        .select("q_id", "s", "cell", _d2(F.col("subv"), F.col("c")).alias("d2q"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["s", "cell"])
        .groupBy("q_id", F.col("vid").alias("item_id"))
        .agg(
            F.round(
                F.sum(F.col("d2q").cast("decimal(30,12)")).cast("double"), 6
            ).alias("adc_d2")
        )
    )
    rank = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("adc_d2").asc(), F.col("item_id").asc())
    )
    return (
        adc.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "adc_d2", "rank")
    )


def pq_rerank_topk(
    shortlist: DataFrame,
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact re-rank of an ADC shortlist — how PQ ships in production
    (Jégou et al. §V): the quantized distances SELECT candidates, the
    raw vectors DECIDE the final ranking, so quantization error costs
    shortlist recall, never final-ranking precision.  At scale the
    shortlist (#queries × shortlist_k rows) broadcasts onto the raw
    vector table, so full vectors are touched only for candidates —
    a map-side semi-join of the 100 TB table, no shuffle."""
    v = VEC.as_double(F.col(vec_col))
    items = vecs.select(F.col(id_col).alias("item_id"), v.alias("iv"))
    qf = query_filter if query_filter is not None else F.lit(True)
    qs = vecs.filter(qf).select(F.col(id_col).alias("q_id"), v.alias("qv"))
    rr = (
        items.join(F.broadcast(shortlist.select("q_id", "item_id")), "item_id")
        .join(F.broadcast(qs), "q_id")
        .withColumn("d2", F.round(_d2(F.col("iv"), F.col("qv")), 6))
    )
    rank = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("item_id").asc())
    )
    return (
        rr.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "d2", "rank")
    )
