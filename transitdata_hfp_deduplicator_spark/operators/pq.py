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
* ADC sums are a FIXED-ORDER double chain (an in-order fold over the
  S subspace terms, not a partial aggregation) so summation order
  cannot perturb the ranking — see ``pq_adc_topk``; only the codebook
  means route through DECIMAL.

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


def _d2(a: Column | str, b: Column | str, dim: int) -> Column:
    """L2² via the dot-product identity — see module docstring for why
    not a squared-difference fold.  Explicit element sums (dim is
    statically known everywhere PQ uses this), NOT the HOF fold: under
    the encode/LUT join fan-out the fold is CodegenFallback and
    measured ~10x slower at 25M candidate rows.

    Column-NAME arguments take the one-shot ``F.expr`` path (identical
    tree, one py4j round trip instead of ~5·dim — the 64-dim rerank
    spelling alone cost 3.8 s of driver time per construction)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"(({VEC.dot_explicit_sql(a, a, dim)})"
            f" - (2.0D * ({VEC.dot_explicit_sql(a, b, dim)})))"
            f" + ({VEC.dot_explicit_sql(b, b, dim)})"
        )
    return (
        VEC.dot_explicit(a, a, dim)
        - F.lit(2.0) * VEC.dot_explicit(a, b, dim)
        + VEC.dot_explicit(b, b, dim)
    )


def sub_vectors(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subspaces: int = 4,
    sub_dim: int = 16,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Long-format subspace view: (vid, s, subv double[sub_dim], *carry).

    ``carry`` threads extra per-vector columns (e.g. the IVFADC coarse
    cell) through the explode so downstream never needs a vid-keyed
    join back to the source — in deployment those columns are written
    WITH the codes."""
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
        F.col(id_col).alias("vid"), *carry, F.explode(parts).alias("x")
    ).select("vid", *carry, "x.s", "x.subv")


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


def pq_encode(
    sub: DataFrame,
    codebooks: DataFrame,
    sub_dim: int = 16,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(vid, s, cell): nearest-codeword assignment per subspace —
    argmin of round(L2², 6) with a cell tie-break, broadcast join
    against the S·k codebook rows.

    The argmin is a map-side ``min_by`` partial aggregate, NOT a
    row_number window: the candidate fan-out is |vectors|·S·k rows and
    a window would SORT all of them (measured: the window encode was
    the top cost at 1M vectors / 256M candidates), where min_by
    collapses candidates to one row per (vid, s) inside each input
    partition before the exchange — the q_dedup_exact discipline
    (operators/dedup.py).  The norm terms are hoisted: ||subv||² once
    per input row, ||c||² once per codeword (precomputed on the
    broadcast side), leaving only the 8-16 cross products per
    candidate; the full expression keeps the exact _d2 shape
    ``(n2 - 2·cross) + cn2`` so values are bit-identical to the
    naive form and to the DuckDB oracle."""
    books = F.broadcast(
        codebooks.withColumn(
            "cn2", VEC.dot_explicit("c", "c", sub_dim)
        )
    )
    cand = (
        sub.withColumn("n2", VEC.dot_explicit("subv", "subv", sub_dim))
        .join(books, "s")
        .select(
            "vid",
            *carry,
            "s",
            "cell",
            F.round(
                (
                    F.col("n2")
                    - F.lit(2.0)
                    * VEC.dot_explicit("subv", "c", sub_dim)
                )
                + F.col("cn2"),
                6,
            ).alias("d2"),
        )
    )
    return cand.groupBy("vid", "s").agg(
        F.min_by("cell", F.struct("d2", "cell")).alias("cell"),
        *[F.any_value(c).alias(c) for c in carry],
    )


def pq_adc_topk(
    codes: DataFrame,
    queries_sub: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    sub_dim: int = 16,
    subspaces: int = 4,
) -> DataFrame:
    """Asymmetric distance top-k: per query, precompute the S·k LUT of
    exact query-subvector-to-codeword sub-distances, then score every
    encoded vector by summing its S looked-up entries.  Returns
    (q_id, item_id, adc_d2, rank) with rank <= k.

    Shape: codes pivot WIDE (one row per vector, S cell columns), the
    LUT pivots to S per-query cell→distance maps, and scoring is ONE
    broadcast nested-loop of |vectors| × |queries| rows with S map
    lookups each — versus the long-format (s, cell) join whose
    candidate set is S× larger (measured the difference at 1M vectors
    × 100 queries: 800M joined rows → 100M).  The S-term sum is an
    explicit left-associated chain, so it is order-FIXED and therefore
    engine-deterministic without routing through DECIMAL; the DuckDB
    oracle mirrors it as an S-join chain adding in the same order.
    Every lookup hits: codes only ever reference codebook cells, and
    the LUT covers every (s, cell) of the codebook."""
    lut = (
        queries_sub.select(F.col("vid").alias("q_id"), "s", "subv")
        .join(F.broadcast(codebooks), "s")
        .select(
            "q_id", "s", "cell",
            _d2("subv", "c", sub_dim).alias("d2q"),
        )
    )
    codes_w = codes.groupBy("vid").agg(
        *[
            F.max(F.when(F.col("s") == i, F.col("cell"))).alias(f"c{i}")
            for i in range(subspaces)
        ]
    )
    lut_w = (
        lut.groupBy("q_id", "s")
        .agg(F.map_from_entries(F.collect_list(F.struct("cell", "d2q"))).alias("m"))
        .groupBy("q_id")
        .agg(
            *[
                F.any_value(F.when(F.col("s") == i, F.col("m")), True).alias(
                    f"m{i}"
                )
                for i in range(subspaces)
            ]
        )
    )
    score = F.element_at(F.col("m0"), F.col("c0"))
    for i in range(1, subspaces):
        score = score + F.element_at(F.col(f"m{i}"), F.col(f"c{i}"))
    adc = codes_w.crossJoin(F.broadcast(lut_w)).select(
        "q_id",
        F.col("vid").alias("item_id"),
        F.round(score, 6).alias("adc_d2"),
    )
    rank = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("adc_d2").asc(), F.col("item_id").asc())
    )
    return (
        adc.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "adc_d2", "rank")
    )


def ivfadc_shortlist(
    codes: DataFrame,
    lut: DataFrame,
    subspaces: int = 8,
    shortlist: int = 50,
) -> DataFrame:
    """IVFADC shortlist (Jégou et al. 2011, §VII): ADC scoring
    restricted to the coarse cells each query PROBES, with the lookup
    table built per (query, probed cell) — because codes quantize
    RESIDUALS, a vector's sub-distances depend on which coarse centroid
    it was encoded against.

    codes: (vid, s, cell, ccell) PQ codes of the residuals WITH the
    coarse assignment carried through encode (``pq_encode(carry=
    ("ccell",))`` — no vid-keyed join back to the assignment, matching
    the deployed layout where codes are written with their cell); lut:
    (q_id, ccell, s, cell, d2q) per-probed-cell query LUT.  Returns
    (q_id, item_id) shortlist rows.

    Shape: same wide pivot as ``pq_adc_topk`` (one row per vector, S
    map lookups), but the cross join becomes a broadcast join ON THE
    COARSE CELL — only vectors in probed cells are ever scored, so the
    candidate set is (nprobe / n_cells) of the corpus per query, the
    IVF pruning applied to the memory-resident codes.  At 100 TB the
    codes table is written partitioned by ccell and the join prunes
    partitions."""
    cw = codes.groupBy("vid").agg(
        *[
            F.max(F.when(F.col("s") == i, F.col("cell"))).alias(f"c{i}")
            for i in range(subspaces)
        ],
        F.any_value("ccell").alias("ccell"),
    )
    lut_w = (
        lut.groupBy("q_id", "ccell", "s")
        .agg(F.map_from_entries(F.collect_list(F.struct("cell", "d2q"))).alias("m"))
        .groupBy("q_id", "ccell")
        .agg(
            *[
                F.any_value(F.when(F.col("s") == i, F.col("m")), True).alias(
                    f"m{i}"
                )
                for i in range(subspaces)
            ]
        )
    )
    score = F.element_at(F.col("m0"), F.col("c0"))
    for i in range(1, subspaces):
        score = score + F.element_at(F.col(f"m{i}"), F.col(f"c{i}"))
    adc = cw.join(F.broadcast(lut_w), "ccell").select(
        "q_id",
        F.col("vid").alias("item_id"),
        F.round(score, 6).alias("adc_d2"),
    )
    rank = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("adc_d2").asc(), F.col("item_id").asc())
    )
    return (
        adc.withColumn("rank", rank)
        .filter(F.col("rank") <= shortlist)
        .select("q_id", "item_id")
    )


def pq_rerank_topk(
    shortlist: DataFrame,
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
    k: int = 5,
    dim: int = 64,
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
        .withColumn("d2", F.round(_d2("iv", "qv", dim), 6))
    )
    rank = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("item_id").asc())
    )
    return (
        rr.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "d2", "rank")
    )
