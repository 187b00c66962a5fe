"""Exact-substring dedup building blocks (Lee et al. 2022, ExactSubstr).

One home for the content-defined k-char-gram posting pipeline that
q_dedup_substring, q_dedup_incr_substring, and tools/stress_substring.py
previously each carried a private copy of — the constants (gram width,
selection modulus, df cap) and the hash spelling must stay in lockstep
with the oracle SQL of both queries, and a single implementation removes
the silent-desync channel.

Reference analog: the dedup-by-content-digest discipline of
Deduplicator.java:69,96-106, applied to overlapping character grams so
two documents sharing ANY >= k-char exact run select identical grams
inside the shared region regardless of alignment.

Scale notes (measured at sf0.1 and in the 1M-doc stress):
* the md5 must run as a TOP-LEVEL projected column — the same hash
  inside a transform() HOF is CodegenFallback (interpreted per gram,
  5.8s vs 4.2s warm at sf0.1);
* positions explode NARROW (an int per gram, text carried once per
  row batch, never duplicated per gram by the optimizer's projection);
* the selection filter (h % sel_mod == 0) cuts the posting stream to
  ~1/sel_mod gram density BEFORE any exchange — the only shuffles
  downstream carry (60-bit hash, doc_id) postings, linear in corpus
  bytes, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Defaults shared by the substring-dedup family AND mirrored verbatim in
# the oracle SQL of q_dedup_substring / q_dedup_incr_substring: 20-char
# grams, keep hashes % 4 == 0, drop grams appearing in > 20 docs
# (boilerplate).  Change here -> change the oracles.
GRAM_K = 20
SEL_MOD = 4
DF_CAP = 20


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = GRAM_K,
) -> DataFrame:
    """(id, t): lower/trim normalization, docs shorter than one gram
    dropped (they can never carry a selected gram)."""
    return docs.select(
        id_col, F.lower(F.trim(F.col(text_col))).alias("t")
    ).filter(F.length("t") >= k)


def char_gram_postings(
    norm: DataFrame,
    k: int = GRAM_K,
    sel_mod: int = SEL_MOD,
    id_col: str = "doc_id",
    text_col: str = "t",
) -> DataFrame:
    """(id, h) postings of the SELECTED k-char grams of a normalized
    text column: md5-prefix 60-bit hash (engine-independent, same
    spelling as the MinHash family), keep h % sel_mod == 0.  Selection
    depends only on gram CONTENT, so shared substrings select identical
    grams in every document that carries them — the alignment-free
    property stride sampling lacks.

    NOT deduplicated per doc: q_dedup_substring folds the per-doc dedup
    into its h-keyed exchange's map-side partial collect_set; callers
    that need distinct (doc, h) rows add .distinct() themselves.

    spread() first: the gram md5 is the dominant map cost and a small
    single-file scan plans as ONE split, serializing it on one core
    (guide §2.5 input skew — measured 3.5s vs 0.85s for the posting
    projection at sf0.1); at lake scale the scan is already parallel
    and spread() is an identity.
    """
    from transitdata_hfp_deduplicator_spark.tables import spread

    norm = spread(norm)
    return (
        norm.select(
            id_col,
            text_col,
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(k - 1))
            ).alias("p"),
        )
        .select(
            id_col,
            F.conv(
                F.substring(
                    F.md5(
                        F.col(text_col)
                        .substr(F.col("p"), F.lit(k))
                        .cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .filter(F.col("h") % sel_mod == 0)
    )


def cdc_chunks(
    norm: DataFrame,
    w: int = 16,
    mod: int = 32,
    id_col: str = "doc_id",
    text_col: str = "t",
) -> DataFrame:
    """Content-defined chunking (Muthitacharoen et al. SOSP'01, LBFS):
    (id, start, clen, digest) — a chunk boundary falls wherever the
    w-char window's content hash ≡ 0 (mod ``mod``), so boundaries move
    WITH the content: an insertion shifts only the chunk it lands in
    and every later chunk keeps its digest (mean chunk ≈ mod chars).

    Boundary detection is the char-gram posting discipline (explode
    positions, md5 as a TOP-LEVEL codegen column, selection before any
    exchange); chunk assembly is per-doc array math off one id-keyed
    boundary collect.  Boundaries start at position 2 (a boundary at 1
    would make a zero-length first chunk); documents shorter than w+1
    chars are a single chunk.  Min/max chunk-size clamps (the
    production refinement) are a greedy sequential rule that would ride
    the same boundary stream."""
    from transitdata_hfp_deduplicator_spark.tables import spread

    # spread() for the same reason as char_gram_postings: the boundary
    # md5 dominates and a single-split scan would run it on one core
    norm = spread(norm)
    t, ln = F.col(text_col), F.length(text_col)
    b = (
        norm.filter(ln >= w + 1)
        .select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(2), ln - F.lit(w - 1))).alias("p"),
        )
        .select(
            id_col,
            "p",
            F.conv(
                F.substring(
                    F.md5(t.substr(F.col("p"), F.lit(w)).cast("binary")), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .filter(F.col("h") % mod == 0)
        .select(id_col, "p")
    )
    bounds = b.groupBy(id_col).agg(
        F.array_sort(F.collect_list("p")).alias("bp")
    )
    wb = norm.join(bounds, id_col, "left").select(
        id_col,
        text_col,
        ln.alias("ln"),
        F.coalesce(F.col("bp"), F.array().cast("array<int>")).alias("bp"),
    )
    starts = F.concat(F.array(F.lit(1)), F.col("bp"))
    spans = F.transform(
        starts,
        lambda x, i: F.struct(
            x.alias("start"),
            (F.coalesce(F.get(starts, i + 1), F.col("ln") + 1) - x).alias(
                "clen"
            ),
        ),
    )
    return wb.select(id_col, text_col, F.explode(spans).alias("sp")).select(
        id_col,
        F.col("sp.start").alias("start"),
        F.col("sp.clen").alias("clen"),
        F.md5(
            t.substr(F.col("sp.start"), F.col("sp.clen")).cast("binary")
        ).alias("digest"),
    )


def gram_buckets(
    postings: DataFrame, df_cap: int = DF_CAP, id_col: str = "doc_id"
) -> DataFrame:
    """(h, ds): sorted distinct doc lists per selected gram, singleton
    and boilerplate (> df_cap docs) buckets dropped.  collect_set dedups
    per-doc gram repeats INSIDE the one h-keyed exchange (map-side
    partial set) — a separate distinct() would add a second full
    shuffle on (doc, h) for nothing."""
    return (
        postings.groupBy("h")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= df_cap))
    )


def bucket_pairs(buckets: DataFrame) -> DataFrame:
    """(i, j) with i < j: all within-bucket doc pairs, exploded from the
    sorted doc-list arrays — bounded per bucket by the df cap, so the
    explosion is O(df_cap²) per gram worst case, never corpus-quadratic."""
    pair_struct = F.expr(
        "flatten(transform(ds, (x, ix) -> "
        "transform(slice(ds, ix + 2, size(ds) - ix - 1), "
        "y -> struct(x as i, y as j))))"
    )
    return buckets.select(F.explode(pair_struct).alias("p")).select(
        "p.i", "p.j"
    )
