"""BPE pair-merge trainer (operators/bpe.py).

The subtle part is the greedy LEFT-TO-RIGHT NON-OVERLAPPING merge —
single-node BPE trainers get it from a sequential scan; the engine
reproduces it with a running-max parity window.  These tests pin the
sequential semantics against hand-computed merges, including the a==b
run cases where overlap handling actually matters.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from transitdata_hfp_deduplicator_spark.operators.bpe import (
    char_tokens,
    merge_pair,
    top_pair,
    train_merges,
)
from transitdata_hfp_deduplicator_spark.plans.inspect import physical_plan


def _toks(spark, docs: dict[int, str]):
    rows = [
        (doc_id, pos + 1, ch)
        for doc_id, s in docs.items()
        for pos, ch in enumerate(s)
    ]
    return spark.createDataFrame(rows, "doc_id int, pos int, tok string")


def _merged(spark, docs, a, b):
    w = spark.createDataFrame([(a, b)], "a string, b string")
    out = merge_pair(_toks(spark, docs), w)
    got = {}
    for r in out.orderBy("doc_id", "pos").collect():
        got.setdefault(r.doc_id, []).append(r.tok)
    return got


def test_simple_merge(spark):
    got = _merged(spark, {1: "abab", 2: "ba"}, "a", "b")
    assert got == {1: ["ab", "ab"], 2: ["b", "a"]}


def test_equal_pair_run_is_greedy_left_to_right(spark):
    # 'xxxx' -> xx,xx ; 'xxx' -> xx,x ; 'xxxxx' -> xx,xx,x
    got = _merged(spark, {1: "xxxx", 2: "xxx", 3: "xxxxx"}, "x", "x")
    assert got == {1: ["xx", "xx"], 2: ["xx", "x"], 3: ["xx", "xx", "x"]}


def test_merged_token_does_not_rematch_in_same_pass(spark):
    # merging (a,b) on 'aab': positions 2,3 match -> a,ab ; the new
    # 'ab' token must not pair with anything else this pass
    got = _merged(spark, {1: "aab"}, "a", "b")
    assert got == {1: ["a", "ab"]}


def test_positions_renumber_dense(spark):
    w = spark.createDataFrame([("a", "b")], "a string, b string")
    out = merge_pair(_toks(spark, {1: "abcab"}), w)
    rows = out.filter(F.col("doc_id") == 1).orderBy("pos").collect()
    assert [r.pos for r in rows] == [1, 2, 3]
    assert [r.tok for r in rows] == ["ab", "c", "ab"]


def test_top_pair_tie_breaks_lexicographically(spark):
    # 'ab' and 'ba' each occur twice -> ('a','b') wins the tie
    t = _toks(spark, {1: "aba", 2: "bab"})
    r = top_pair(t).collect()[0]
    assert (r.a, r.b, r.pair_n) == ("a", "b", 2)


def test_train_merges_matches_sequential_reference(spark):
    # tiny corpus, 2 iterations, hand-computed:
    #   corpus: 'abab' (ab,ba,ab), 'aba' (ab,ba) -> ab x3, ba x2
    #   -> merge (a,b): [ab,ab], [ab,a] -> 4 tokens
    #   iter 2 pairs: (ab,ab) x1, (ab,a) x1 -> lexicographic tie-break:
    #   ('ab','a') < ('ab','ab') -> winner (ab, a)
    docs = spark.createDataFrame(
        [(1, "abab"), (2, "aba")], "doc_id int, text string"
    )
    out = train_merges(char_tokens(docs, cap=10), iters=2)
    rows = {r.iter: r for r in out.collect()}
    assert (rows[1].lhs, rows[1].rhs, rows[1].pair_n) == ("a", "b", 3)
    assert rows[1].tokens_after == 4
    assert (rows[2].lhs, rows[2].rhs, rows[2].pair_n) == ("ab", "a", 1)
    assert rows[2].merged == "aba" and rows[2].tokens_after == 3


def test_apply_merges_encodes_held_out_docs(spark):
    # train on 'aaaa' x2: merge1 = (a,a) -> [aa,aa]; iter2 pairs:
    # (aa,aa) x1 per doc -> merge2 = (aa,aa).  Encode the HELD-OUT
    # doc 'aaaaa': merge1 greedy -> [aa,aa,a]; merge2 -> [aaaa,a].
    from transitdata_hfp_deduplicator_spark.operators.bpe import apply_merges

    train = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "doc_id int, text string"
    )
    merges = train_merges(char_tokens(train, cap=10), iters=2)
    rows = {r.iter: (r.lhs, r.rhs) for r in merges.collect()}
    assert rows == {1: ("a", "a"), 2: ("aa", "aa")}
    held_out = spark.createDataFrame([(9, "aaaaa")], "doc_id int, text string")
    enc = apply_merges(char_tokens(held_out, cap=10), merges, iters=2)
    got = [r.tok for r in enc.orderBy("pos").collect()]
    assert got == ["aaaa", "a"]


def test_apply_merges_reproduces_trainer_final_state(spark):
    # apply(train(corpus), corpus) == the trainer's own final token
    # table (also pinned cell-exactly by q_bpe_encode's oracle)
    from transitdata_hfp_deduplicator_spark.operators.bpe import apply_merges

    docs = spark.createDataFrame(
        [(1, "abab"), (2, "aba"), (3, "bbab")], "doc_id int, text string"
    )
    toks = char_tokens(docs, cap=10)
    merges = train_merges(toks, iters=3)
    enc = apply_merges(toks, merges, iters=3)
    # re-derive the trainer's final state by replaying merge_pair with
    # each winner (the trainer's internal loop, reconstructed)
    cur = toks
    for i in (1, 2, 3):
        w = merges.filter(F.col("iter") == i).select(
            F.col("lhs").alias("a"), F.col("rhs").alias("b")
        )
        cur = merge_pair(cur, w)
    lhs = {(r.doc_id, r.pos, r.tok) for r in enc.collect()}
    rhs = {(r.doc_id, r.pos, r.tok) for r in cur.collect()}
    assert lhs == rhs


def test_train_merges_rejects_zero_iters(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id int, text string")
    try:
        train_merges(char_tokens(docs), iters=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_merge_plan_is_single_exchange_plus_broadcast(spark):
    # the whole merge must ride ONE doc_id exchange; the winner joins
    # broadcast; no sort-merge join, no extra shuffles
    t = _toks(spark, {1: "abcabc"}).repartition("doc_id")
    w = spark.createDataFrame([("a", "b")], "a string, b string")
    plan = physical_plan(merge_pair(t, w))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exactly one real exchange (the doc_id repartition); the broadcast
    # exchange is the 1-row winner
    import re

    exchanges = re.findall(r"\n\s*(?:\+-|:-)?\s*Exchange hashpartitioning", plan)
    assert len(exchanges) <= 1, plan
