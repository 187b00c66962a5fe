"""Near-duplicate detection and similarity search (north-star surface).

Five near-dup families (exact-digest, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine) plus brute-force and IVF-style ANN.  Scale
notes per operator inline; the common theme: every candidate-generation
step is an equi-join on a derived key (shingle, band hash, bucket,
centroid id) — never an unkeyed cross join — so the shuffle stays
partitionable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from transitdata_hfp_deduplicator_spark.functions import text as TXT
from transitdata_hfp_deduplicator_spark.functions import vectors as VEC


def _shingled(docs: DataFrame, id_col: str, text_col: str, shingle_n: int) -> DataFrame:
    toks = TXT.tokenize(F.col(text_col))
    sh = TXT.shingles(toks, shingle_n) if shingle_n > 1 else F.array_distinct(toks)
    return docs.select(F.col(id_col).alias("doc_id"), sh.alias("shingles"))


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs: J(A,B) >= threshold.

    explode(shingles) → self-equi-join on shingle → pair-count = |A∩B|;
    |A∪B| from per-doc sizes.  The join key is the shingle, so frequency
    skew = hot shingles; at scale, drop top-frequency shingles first
    (stopword shingles carry no similarity signal) — here the document
    frequency cap is a parameter of the candidate join.
    """
    sh = _shingled(docs, id_col, text_col, shingle_n)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, F.col("i") == F.col("sa.doc_id"))
        .join(sb, F.col("j") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "inter", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures: sig[k] = min over shingles of h_k(shingle).

    h_k is the md5-derived 60-bit hash (functions.text.hash64) so the
    signature is reproducible in any engine (oracle-checkable) — the
    same externalizability argument as the reference's fixed murmur3
    seed (Deduplicator.java:27-28).  Computed as one column expression
    per hash over the shingle array — no explode, no shuffle: the
    signature step is embarrassingly parallel map work.
    """
    sh = _shingled(docs, id_col, text_col, shingle_n)

    def _mh(k: int):
        # closure factory, NOT a default-arg lambda: a 2-param lambda is
        # interpreted by transform() as (element, index)
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: TXT.hash64(s, seed=k))
        ).alias(f"mh_{k}")

    return sh.select("doc_id", *[_mh(k) for k in range(num_hashes)])


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup pairs with exact-Jaccard verification.

    banding: rows_per_band = num_hashes/bands; docs agreeing on ALL rows
    of any band become candidates (equi-join on (band, band_hash) —
    partitionable, linear in candidates).  Candidates are then verified
    with exact Jaccard so no false positives remain; false negatives are
    the standard LSH S-curve tail.  This is THE 100 TB near-dup plan:
    signatures are map-only, the only shuffle keys are band buckets.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, shingle_n, num_hashes)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_rows.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws("_", *[c.cast("string") for c in cols])).alias(
                    "band_hash"
                ),
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionAll(br)
    a, b_ = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
    )
    sh = _shingled(docs, id_col, text_col, shingle_n)
    ci = candidates.join(sh.withColumnRenamed("doc_id", "i").withColumnRenamed("shingles", "sh_i"), "i")
    cij = ci.join(sh.withColumnRenamed("doc_id", "j").withColumnRenamed("shingles", "sh_j"), "j")
    verified = cij.withColumn(
        "jaccard",
        F.round(
            F.size(F.array_intersect("sh_i", "sh_j"))
            / F.size(F.array_union("sh_i", "sh_j")),
            6,
        ),
    )
    return verified.filter(F.col("jaccard") >= threshold).select("i", "j", "jaccard")


def simhash(tokens: Column, bits: int = 64) -> Column:
    """SimHash of a token array: per-bit majority vote of token hashes.

    Folds a 64-wide vote counter across tokens entirely JVM-side
    (aggregate + zip_with), then packs sign bits into one BIGINT.
    Near-dup docs differ in a few bits; candidates come from equi-joins
    on 16-bit chunks (simhash_pairs), exact check = popcount(XOR).
    """
    from functools import reduce

    # bit positions are static (0..bits-1), so the per-bit expressions are
    # built in Python — shiftright/shiftleft take literal shift amounts
    votes = F.aggregate(
        tokens,
        F.array(*[F.lit(0) for _ in range(bits)]),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1))
                    for i in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    return reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(
                F.element_at(votes, i + 1) > 0,
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(bits),
        F.lit(0).cast("long"),
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_i, simhash_j) <= d.

    Pigeonhole candidate generation: split the 64-bit hash into 4
    16-bit chunks; any pair within hamming<=3 agrees exactly on >=1
    chunk, so an equi-join per chunk finds ALL such pairs (no recall
    loss), then popcount(XOR) filters exactly.  Candidate joins are
    equi-joins on (chunk_idx, chunk_value) — partitionable.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash(TXT.tokenize(F.col(text_col))).alias("sh"),
    )
    chunks = hashed.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("sh"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "sh", "ch.chunk_idx", "ch.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.sh").alias("sh_i"),
            F.col("b.sh").alias("sh_j"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every item.

    The baseline ANN oracle.  Joined via broadcast of the (small) query
    set — the item side streams through map-side scoring + per-query
    top-k (window rank), so the big table is read once, never shuffled
    except the final k rows per query.  100 TB path: see ivf_topk.
    """
    scored = embeddings.join(F.broadcast(queries)).select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("item_id"),
        F.round(
            VEC.cosine(VEC.as_double(F.col(vec_col)), VEC.as_double(F.col(query_vec_col))),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "cos_sim", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF-style ANN: centroids per partition (here the given ``label``
    plays the coarse-quantizer cell), each query probes its ``nprobe``
    nearest centroids, exact scoring only inside probed cells.

    Scale shape: centroids are tiny (broadcast); the big table is
    pre-partitioned by cell, and each query touches nprobe/ncells of
    the data — the standard 10-100x scan reduction, with recall traded
    via nprobe.
    """
    # centroid = element-wise mean, computed by posexplode + per-dim avg
    # (shuffles n_rows x dim scalar rows with map-side partial agg —
    # scalable, unlike collecting whole vectors per group)
    centroids = (
        embeddings.select(partition_col, F.posexplode(VEC.as_double(F.col(vec_col))))
        .groupBy(partition_col, "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy(partition_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x.m
            ).alias("centroid")
        )
    )
    probes = (
        queries.join(F.broadcast(centroids))
        .select(
            query_id_col,
            query_vec_col,
            partition_col,
            VEC.cosine(VEC.as_double(F.col(query_vec_col)), F.col("centroid")).alias(
                "c_sim"
            ),
        )
        .withColumn(
            "c_rank",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(
                    F.col("c_sim").desc(), F.col(partition_col)
                )
            ),
        )
        .filter(F.col("c_rank") <= nprobe)
        .select(query_id_col, query_vec_col, partition_col)
    )
    scored = embeddings.join(F.broadcast(probes), on=partition_col).select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("item_id"),
        F.round(
            VEC.cosine(VEC.as_double(F.col(vec_col)), VEC.as_double(F.col(query_vec_col))),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "item_id", "cos_sim", "rank")
    )
