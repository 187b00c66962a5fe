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
