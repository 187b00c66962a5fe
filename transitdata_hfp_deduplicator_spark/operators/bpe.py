"""Distributed BPE pair-merge training as doc-partitioned window ops.

Byte-pair encoding's training loop — count adjacent symbol pairs over
the corpus, merge the most frequent pair everywhere, repeat — is the
canonical tokenizer-building step of an LLM data pipeline (Sennrich et
al. 2016).  The natural distributed formulation keeps the corpus at
``(doc_id, pos, tok)`` grain and expresses ONE iteration as:

1. pair counts: ``lead(tok)`` over the per-doc window, one partial-agg
   exchange keyed by the pair — the only corpus-sized shuffle is the
   initial repartition by doc_id, which every later window REUSES
   (HashPartitioning(doc_id) satisfies the (doc_id, …) clustering of
   all four window specs — verified: 1 exchange per iteration chain,
   sorts only);
2. winner: global top-1 pair via TakeOrderedAndProject (count desc,
   pair asc tie-break), crossJoin-broadcast back — never collected;
3. merge: greedy LEFT-TO-RIGHT non-overlapping occurrence replacement,
   the exact semantics single-node BPE trainers implement with a
   sequential scan, reproduced with windows: match flag per position,
   gaps-and-islands grouping of CONSECUTIVE matches (consecutive
   matches only arise for a==b runs), odd-parity selection inside each
   island = greedy's take-skip-take, then drop consumed positions and
   re-number.

No UDFs, no collect, no arrays — every step is whole-stage-codegen
window/aggregate work, and DuckDB reproduces it operator-for-operator
(the oracle generates the same iteration as SQL text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def char_tokens(docs: DataFrame, text_col: str = "text", cap: int = 200) -> DataFrame:
    """Initial symbol table: one row per character position,
    ``(doc_id, pos, tok)``, lower/trim-normalized, capped at ``cap``
    chars per doc (config — caps the per-doc window width, not the
    algorithm)."""
    from transitdata_hfp_deduplicator_spark.tables import spread

    t = F.lower(F.trim(F.col(text_col)))
    return (
        # spread(): the up-to-200x per-char explode below is the map
        # work upstream of the doc_id repartition every consumer starts
        # with, and a single-file scan plans as ONE split (guide §2.5;
        # measured 0.7s single-task at sf0.1); identity on a multi-split
        # lake scan
        spread(docs.select("doc_id", t.alias("t")).filter(F.length("t") >= 1))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.least(F.length("t"), F.lit(cap)))
            ).alias("pos"),
            "t",
        )
        .select("doc_id", "pos", F.col("t").substr(F.col("pos"), F.lit(1)).alias("tok"))
    )


def top_pair(toks: DataFrame) -> DataFrame:
    """1-row DataFrame (a, b, pair_n): the most frequent adjacent pair,
    ties broken lexicographically — deterministic across partitionings."""
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    return (
        toks.select(
            F.col("tok").alias("a"), F.lead("tok").over(wdoc).alias("b")
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .orderBy(F.col("pair_n").desc(), "a", "b")
        .limit(1)
    )


def merge_pair(toks: DataFrame, winner: DataFrame) -> DataFrame:
    """Apply one merge everywhere: greedy left-to-right non-overlapping,
    exactly what a sequential BPE trainer does.  ``winner`` is a 1-row
    (a, b, …) frame, crossJoin-broadcast so the merge stays fully
    distributed.

    Greedy-as-windows: inside a maximal run of CONSECUTIVE match
    positions (possible only when a == b, e.g. pair (x,x) on "xxxx"),
    greedy takes the 1st, 3rd, … match.  The run prefix length before
    position p is ``p - lastm0(p) - 1`` where lastm0 is the running max
    of non-match positions — so ``taken = m AND even(prefix)``, a
    single running-max over the SAME (doc_id, pos) window every other
    step uses.  One exchange + ONE sort for the whole merge (the
    gaps-and-islands formulation — which the DuckDB oracle keeps, as an
    independently-derived twin — needs two extra sorts for its
    (doc_id, m) and (doc_id, grp, m) partitions; measured 7.2s → 4.4s
    warm at sf0.1 for q_bpe_merges).  A taken position emits a||b; the
    position after a taken one is consumed; everything else passes
    through.  A merged token can never re-match as the `a` of the same
    pass (len(a||b) > len(a)), so one window pass IS the full merge.

    Requires DENSE positions (1..len per doc) — the run-prefix
    arithmetic counts gaps as matches otherwise; the output re-numbers,
    so the invariant is self-sustaining."""
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    t = toks.crossJoin(F.broadcast(winner.select("a", "b")))
    t = t.withColumn(
        "m",
        F.when(
            (F.col("tok") == F.col("a"))
            & (F.lead("tok").over(wdoc) == F.col("b")),
            1,
        ).otherwise(0),
    )
    # running max of the last NON-match position (default frame:
    # unbounded preceding .. current row — current is null when m=1,
    # so including it is harmless)
    t = t.withColumn(
        "lastm0",
        F.max(F.when(F.col("m") == 0, F.col("pos"))).over(wdoc),
    )
    t = t.withColumn(
        "taken",
        F.when(
            (F.col("m") == 1)
            & ((F.col("pos") - F.coalesce(F.col("lastm0"), F.lit(0)) - 1) % 2 == 0),
            1,
        ).otherwise(0),
    )
    t = t.withColumn("prev_taken", F.lag("taken").over(wdoc)).withColumn(
        "nxt", F.lead("tok").over(wdoc)
    )
    merged = t.filter(F.coalesce(F.col("prev_taken"), F.lit(0)) == 0)
    return merged.select(
        "doc_id",
        F.row_number().over(wdoc).alias("pos"),
        F.when(F.col("taken") == 1, F.concat("tok", "nxt"))
        .otherwise(F.col("tok"))
        .alias("tok"),
    )


def apply_merges(toks: DataFrame, merges: DataFrame, iters: int) -> DataFrame:
    """ENCODE with a trained merge table — the tokenizer inference path,
    and the one that runs at corpus scale (training happens once; every
    pretraining document is encoded).  Applies the rank-``i`` merge for
    i = 1..iters in rank order, each as one ``merge_pair`` window pass —
    greedy left-to-right per rank, exactly how single-node BPE encoders
    apply a merge list.

    NO pair counting, NO per-iteration aggregate shuffles — unlike the
    training loop, the only exchange is the initial doc_id repartition
    that every window pass reuses; each rank's merge row is a 1-row
    filter of the (bounded, tokenizer-artifact-sized) merge table,
    crossJoin-broadcast, never collected.  Applying the trained merges
    to the training corpus reproduces the trainer's final token table
    exactly (the oracle of q_bpe_encode pins this equivalence).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cur = toks.repartition("doc_id").sortWithinPartitions("doc_id", "pos")
    for i in range(1, iters + 1):
        w = merges.filter(F.col("iter") == i).select(
            F.col("lhs").alias("a"), F.col("rhs").alias("b")
        )
        cur = merge_pair(cur, w)
    return cur


def train_merges(
    toks: DataFrame, iters: int, keep_final: bool = False
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Run ``iters`` BPE iterations; returns the merge table
    (iter, lhs, rhs, merged, pair_n, tokens_after) — the trained
    tokenizer artifact.  The token table is localCheckpoint-ed between
    iterations so the plan stays bounded (same discipline as the
    k-means trainer, operators/kmeans.py).

    ``keep_final=True`` additionally returns the final token table
    (doc_id, pos, tok) as a second frame.  The trainer's final state IS
    ``apply_merges(toks, merges, iters)`` — greedy left-to-right
    application of the rank-i merge in rank order is exactly what each
    training iteration performed (pinned by
    tests/test_bpe.py::test_apply_merges_reproduces_trainer_final_state)
    — so a caller that trains and encodes the SAME corpus can reuse it
    instead of re-running every merge pass from the raw scan
    (q_bpe_encode: measured ~8.3s -> ~4s at sf0.1).  Returned as a
    localCheckpoint, not the live persist: checkpoint blocks free via
    the ContextCleaner when the frame drops, while a leaked persist
    would pin corpus-sized cache across every later query in a long
    session."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    rows = None
    persisted = []

    def pin(df: DataFrame) -> DataFrame:
        # persist SORTED by (doc_id, pos): InMemoryRelation advertises
        # its child's outputOrdering, so every window in top_pair and
        # merge_pair reads the cache WITHOUT re-sorting — one real sort
        # per iteration instead of three (measured: iteration 2+ drops
        # ~2.5s -> ~1.4s at sf0.1).  persist, NOT localCheckpoint: the
        # RDD checkpoint path re-serializes and loses the ordering
        # metadata (measured 42s vs 12s for the 3-iteration loop).
        # Lazily: the next consumer (top_pair) populates the cache while
        # doing its own work — an eager count() here would add a whole
        # extra pass per iteration just to warm it.
        out = df.sortWithinPartitions("doc_id", "pos").persist()
        persisted.append(out)
        return out

    cur = pin(toks.repartition("doc_id"))
    for i in range(1, iters + 1):
        # persist the 1-row winner too: it is consumed three times
        # (merge crossJoin, output row, next iteration's lineage)
        winner = top_pair(cur).persist()
        persisted.append(winner)
        cur = pin(merge_pair(cur, winner))
        after = cur.agg(F.count(F.lit(1)).alias("tokens_after"))
        row = winner.crossJoin(after).select(
            F.lit(i).alias("iter"),
            F.col("a").alias("lhs"),
            F.col("b").alias("rhs"),
            F.concat("a", "b").alias("merged"),
            "pair_n",
            "tokens_after",
        )
        rows = row if rows is None else rows.unionAll(row)
    # pin the (iters)-row result and free the corpus-sized caches — the
    # merge table is the artifact, the token tables were scaffolding
    out = rows.localCheckpoint()
    # the final token table's cache is already populated (the iteration's
    # tokens_after count consumed it), so the checkpoint copy is a cheap
    # cache read, taken BEFORE the unpersist below frees it
    final = cur.localCheckpoint() if keep_final else None
    for df in persisted:
        df.unpersist()
    if keep_final:
        return out, final
    return out
