"""Text-analysis function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.functions import text as TXT


def test_tokenize_and_counts(spark):
    df = spark.createDataFrame([("The quick  brown Fox",)], "text string")
    row = df.select(
        TXT.tokenize(F.col("text")).alias("toks"),
        TXT.token_count(F.col("text")).alias("n"),
    ).collect()[0]
    assert row.toks == ["the", "quick", "brown", "fox"]
    assert row.n == 4


def test_bpe_ish_counts_subword_boundaries(spark):
    df = spark.createDataFrame([("hello, world42 foo",)], "text string")
    n = df.select(TXT.bpe_ish_token_count(F.col("text")).alias("n")).collect()[0].n
    # hello | , | world | 42 | foo
    assert n == 5


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(
        TXT.shingles(TXT.tokenize(F.col("text")), 3).alias("sh")
    ).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # shorter than n -> empty, not error


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is happy",),
            ("der hund ist nicht zu hause und die katze",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    langs = [
        r.lang
        for r in df.select(
            TXT.lang_id(TXT.tokenize(F.col("text"))).alias("lang")
        ).collect()
    ]
    assert langs == ["en", "de", "und"]


def test_fingerprint_is_content_only(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, text string"
    )
    rows = df.select("id", TXT.fingerprint(F.col("text")).alias("fp")).collect()
    fps = {r.id: r.fp for r in rows}
    assert fps[1] == fps[2] != fps[3]


def test_quality_score_ranges(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.tables import table

    d = table(spark, sf_dir, "documents")
    bad = d.select(TXT.quality_score(F.col("text")).alias("q")).filter(
        (F.col("q") < 0) | (F.col("q") > 1)
    )
    assert bad.count() == 0


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            ("mail me at jane.doe+x@corp.example.org today",),
            ("see https://ex.org/p?u=a@b.co&x=1 and http://y.io",),
            ("call +358401234567 now",),
            ("clean text stays untouched",),
        ],
        "text string",
    )
    out = [r.s for r in df.select(TXT.scrub_pii("text").alias("s")).collect()]
    assert out[0] == "mail me at <EMAIL> today"
    # the email-shaped substring INSIDE the url is consumed by the URL
    # scrub (order matters), the second bare URL too
    assert out[1] == "see <URL> and <URL>"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "clean text stays untouched"


def test_chunk_text_windows(spark):
    df = spark.createDataFrame(
        [("abcdefghij",), ("abc",), ("",)], "text string"
    )
    rows = df.select(
        TXT.chunk_text(F.col("text"), size=4, stride=3).alias("ch")
    ).collect()
    # len 10, size 4, stride 3 -> nc = ceil((10-4)/3)+1 = 3 chunks
    # covering [0:4),[3:7),[6:10) -- every char in >=1 chunk, overlap 1
    assert rows[0].ch == ["abcd", "defg", "ghij"]
    assert rows[1].ch == ["abc"]  # shorter than size -> single chunk
    assert rows[2].ch == [""]  # empty doc -> one empty chunk, not error


def test_repetition_signals(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES

    out = QUERIES["q_text_repetition"](spark, sf_dir)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows  # every doc scored
    for r in rows.values():
        assert 0.0 <= r.dup_bigram_ratio <= 1.0
        assert 0.0 < r.top_tok_frac <= 1.0
    # a fully repeated doc pins both signals at their maximum
    df = spark.createDataFrame([(1, "spam spam spam spam")], "doc_id long, text string")
    import transitdata_hfp_deduplicator_spark.queries as Q
    from pyspark.sql import functions as F
    from transitdata_hfp_deduplicator_spark.functions import text as TXT

    toks = TXT.tokenize(F.col("text"))
    n_bi_distinct = F.size(TXT.shingles(toks, 2))
    row = df.select(
        (1 - n_bi_distinct / (F.size(toks) - 1)).alias("rep")
    ).collect()[0]
    assert row.rep == 1 - 1 / 3  # 3 bigrams, 1 distinct


def test_ngram_lm_scores_common_tokens_higher(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES

    out = QUERIES["q_ngram_lm"](spark, sf_dir).collect()
    assert all(r.avg_logp < 0 for r in out)  # probabilities < 1
    # n_tok matches the tokenizer's count for every doc
    from pyspark.sql import functions as F
    from transitdata_hfp_deduplicator_spark.functions import text as TXT
    from transitdata_hfp_deduplicator_spark.tables import table

    d = table(spark, sf_dir, "documents")
    n = {r.doc_id: r.n for r in d.select("doc_id", TXT.token_count(F.col("text")).alias("n")).collect()}
    for r in out:
        assert r.n_tok == n[r.doc_id]


def test_bm25_monotone_in_term_frequency(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES
    from transitdata_hfp_deduplicator_spark.tables import table
    from pyspark.sql import functions as F

    out = {r.doc_id: r.bm25 for r in QUERIES["q_bm25"](spark, sf_dir).collect()}
    assert out and all(v > 0 for v in out.values())  # idf(ln(1+x)) > 0 always
    # every scored doc really contains a query term; unscored docs don't
    d = table(spark, sf_dir, "documents")
    has_term = {
        r.doc_id
        for r in d.filter(
            F.arrays_overlap(
                F.split(F.lower(F.trim("text")), r"\s+"),
                F.array(F.lit("data"), F.lit("model"), F.lit("system"), F.lit("language")),
            )
        ).collect()
    }
    assert set(out) == has_term


def test_seq_pack_respects_budget_and_order(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES

    rows = QUERIES["q_seq_pack"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        prev_seq = 0
        for r in rs:
            assert r.seq_id == run // 512, (lang, r)
            assert r.seq_id >= prev_seq  # ids monotone in pack order
            prev_seq = r.seq_id
            run += r.n_tok


def test_corpus_shuffle_deterministic_permutation(spark, sf_dir):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES

    a = {(r.doc_id): (r.shard, r.pos) for r in QUERIES["q_corpus_shuffle"](spark, sf_dir).collect()}
    b = {(r.doc_id): (r.shard, r.pos) for r in QUERIES["q_corpus_shuffle"](spark, sf_dir).collect()}
    assert a == b  # reproducible
    # within a shard, positions are a dense 1..n permutation
    from collections import defaultdict
    shards = defaultdict(list)
    for (shard, pos) in a.values():
        shards[shard].append(pos)
    for shard, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_dedup_norm_collapses_reformatted_copies(spark):
    from transitdata_hfp_deduplicator_spark.queries import QUERIES
    import transitdata_hfp_deduplicator_spark.queries as Q
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO WORLD."),
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")),
        " +",
        " ",
    )
    out = (
        df.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    groups = {r.doc_id: r.n for r in out}
    assert groups == {1: 3, 4: 1}  # three formats of one doc collapse, first wins
