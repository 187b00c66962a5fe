"""Reference-parity golden tests on the REAL corpus.

Mirrors ITDeduplicatorTest.java:64-113: all 5000 HFP messages from
hfp-5000.txt, independent oracle by (topic + ' ' + payload), golden
count 5000 -> 4956 uniques.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.dedup import dedup_exact
from transitdata_hfp_deduplicator_spark.sources import hfp

CORPUS = "/root/reference/src/integration-test/resources/hfp-5000.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not available"
)


def _corpus(spark):
    df = hfp.read_corpus(spark, CORPUS)
    # stable arrival order = line order; server_ts has duplicates so the
    # monotonic id is the tiebreaker (the reference consumes in order)
    return df.withColumn("seq", F.monotonically_increasing_id())


def test_parse_rule(spark):
    """First-space / first-brace split (ITDeduplicatorTest.java:138-148)."""
    rows = _corpus(spark).take(2)
    assert rows[0].server_ts.startswith("2018-")
    assert rows[0].topic.startswith("/hfp/")
    assert rows[0].payload.startswith('{"')


def test_golden_unique_count(spark):
    """5000 in -> 4956 unique by (topic, payload) — the reference's
    in-test HashMap oracle (ITDeduplicatorTest.java:80-93)."""
    df = _corpus(spark)
    assert df.count() == 5000
    uniq = dedup_exact(df, ["topic", "payload"], ["seq"])
    assert uniq.count() == 4956


def test_golden_unique_count_streaming(spark, tmp_path):
    """Same golden count through the actual streaming dedup operator
    (state store + watermark) — the replay analog of the reference's
    end-to-end pipeline test."""
    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        run_to_memory,
        stream_dedup,
    )

    df = _corpus(spark).withColumn(
        "ts",
        F.to_timestamp(F.col("server_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"),
    )
    assert df.filter(F.col("ts").isNull()).count() == 0, "server_ts must parse"
    src = str(tmp_path / "hfp_parquet")
    df.coalesce(1).write.parquet(src)
    stream = parquet_stream(spark, src)
    deduped = stream_dedup(stream, ["topic", "payload"], "ts", ttl="4 hours")
    out = run_to_memory(deduped, output_mode="append")
    assert out.count() == 4956


def test_topic_struct_and_vp_decode(spark):
    df = hfp.with_vp(hfp.with_topic_struct(_corpus(spark)))
    sample = df.filter(F.col("topic_parts.journey_type") == "journey").take(1)[0]
    assert sample.topic_parts.transport_mode in ("bus", "train", "tram", "ferry", "metro")
    decoded = df.filter(F.col("vp").isNotNull())
    assert decoded.count() == 5000, "every line carries a VP payload"
    with_coords = df.filter(
        F.col("vp.lat").isNotNull() & F.col("vp.long").isNotNull()
    ).count()
    assert with_coords > 4000
    # tst (ISO string) and tsi (epoch seconds) agree (§1.3 duality)
    mismatch = (
        df.withColumn("tst_epoch", F.unix_timestamp(F.to_timestamp("vp.tst")))
        .filter(F.col("vp.tsi").isNotNull())
        .filter(F.abs(F.col("tst_epoch") - F.col("vp.tsi")) > 1)
    )
    assert mismatch.count() == 0
