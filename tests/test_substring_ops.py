"""operators/substring.py — the shared char-gram posting pipeline and
content-defined chunking.

The headline semantic pins: (1) gram selection is content-defined, so
a shared substring selects identical grams in both carriers regardless
of alignment; (2) CDC boundaries move WITH the content — an insertion
early in a document disturbs only the chunk it lands in, every later
chunk keeps its digest (the property fixed-offset chunking lacks, and
the whole reason CDC exists).
"""

from __future__ import annotations

import random

from transitdata_hfp_deduplicator_spark.operators.substring import (
    bucket_pairs,
    cdc_chunks,
    char_gram_postings,
    gram_buckets,
    normalize_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_selected_grams_are_alignment_free(spark):
    rng = random.Random(11)
    shared = _rand_text(rng, 80)
    a = _rand_text(rng, 37) + shared + _rand_text(rng, 20)
    b = _rand_text(rng, 5) + shared + _rand_text(rng, 61)
    d = normalize_text(_docs(spark, [(1, a), (2, b)]))
    g = char_gram_postings(d).distinct()
    by_doc = {}
    for r in g.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    # every selected gram inside the shared run appears in BOTH docs;
    # the shared 80-char run carries ~61 grams, ~15 selected
    common = by_doc.get(1, set()) & by_doc.get(2, set())
    assert len(common) >= 5, f"only {len(common)} shared selected grams"


def test_bucket_pairs_orders_and_bounds(spark):
    rng = random.Random(3)
    text = _rand_text(rng, 200)  # ~45 selected grams expected
    d = normalize_text(_docs(spark, [(3, text), (1, text), (2, text)]))
    pairs = {
        (r.i, r.j)
        for r in bucket_pairs(gram_buckets(char_gram_postings(d))).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_cdc_chunks_cover_and_roundtrip(spark):
    rng = random.Random(7)
    text = _rand_text(rng, 500)
    d = _docs(spark, [(1, text)]).selectExpr("doc_id", "text AS t")
    ch = cdc_chunks(d).orderBy("start").collect()
    # chunks tile the document exactly: starts contiguous, lengths sum
    assert ch[0].start == 1
    for prev, cur in zip(ch, ch[1:]):
        assert cur.start == prev.start + prev.clen
    assert sum(r.clen for r in ch) == len(text)


def test_cdc_insertion_shifts_only_one_chunk(spark):
    # THE content-defined property: inserting a char early must preserve
    # the digests of every chunk after the one the edit lands in
    rng = random.Random(23)
    text = _rand_text(rng, 2000)
    edited = text[:50] + "@" + text[50:]
    d = _docs(spark, [(1, text), (2, edited)]).selectExpr(
        "doc_id", "text AS t"
    )
    ch = cdc_chunks(d).collect()
    digests = {1: set(), 2: set()}
    for r in ch:
        digests[r.doc_id].add(r.digest)
    n1 = len([r for r in ch if r.doc_id == 1])
    common = digests[1] & digests[2]
    # all chunks except the edited one (and possibly its boundary
    # neighbor if the edit created/destroyed a boundary) must survive
    assert len(common) >= n1 - 3, (
        f"{len(common)}/{n1} chunks survived an early 1-char insertion"
    )
    # and a fixed-offset scheme would NOT have this property: the edit
    # shifts every later byte, so shared fixed 32-byte block digests
    # collapse to near zero
    fixed = {
        doc: {
            text_v[i : i + 32]
            for i in range(0, len(text_v) - 31, 32)
        }
        for doc, text_v in ((1, text), (2, edited))
    }
    assert len(fixed[1] & fixed[2]) <= 2


def test_cdc_short_doc_is_single_chunk(spark):
    d = _docs(spark, [(1, "tiny"), (2, "")]).selectExpr("doc_id", "text AS t")
    rows = {r.doc_id: r for r in cdc_chunks(d).collect()}
    assert rows[1].start == 1 and rows[1].clen == 4
    assert rows[2].clen == 0  # empty doc: one empty chunk, md5('')
