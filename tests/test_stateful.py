"""Custom stateful dedup-with-metrics operator (streaming/stateful.py):
the full reference hot path including per-duplicate delays, online."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.streaming import parquet_stream, run_to_memory
from transitdata_hfp_deduplicator_spark.streaming.stateful import dedup_tag_stream


def _replay(spark, tmp_path, batches, schema):
    now = time.time()
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now + i * 10, now + i * 10))
    return parquet_stream(spark, str(tmp_path) + "/*", max_files_per_trigger=1)


def test_delays_match_reference_semantics(spark, tmp_path):
    """elapsedSinceHit = now - firstSeen (Deduplicator.java:51-57): the
    cache stores only the FIRST timestamp; every duplicate reports its
    distance from that, not from the previous duplicate."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [("A", base), ("B", base + dt.timedelta(seconds=1))],
        [("A", base + dt.timedelta(seconds=10))],
        [("A", base + dt.timedelta(seconds=25))],
    ]
    stream = _replay(spark, tmp_path, batches, "user string, ts timestamp")
    out = run_to_memory(
        dedup_tag_stream(stream, ["user"], "ts", ttl_ms=3600_000), "append"
    ).collect()
    by_hit = {}
    for r in out:
        if not r.is_prime:
            by_hit[r.hit_no] = r.delay_ms
    primes = [r for r in out if r.is_prime]
    assert len(primes) == 2
    assert by_hit == {2: 10_000, 3: 25_000}, f"got {by_hit}"
    assert all(r.delay_ms is None for r in primes)


def test_tagged_stream_feeds_analytics(spark, tmp_path):
    """dedup_tag_stream output drives the dup-ratio window aggregation
    (the reportPrime/reportDuplicate -> calcStats pipeline, online)."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [(k, base + dt.timedelta(seconds=s)) for k in ("A", "B", "C") for s in (0,)],
        [("A", base + dt.timedelta(seconds=30)), ("B", base + dt.timedelta(seconds=40))],
    ]
    stream = _replay(spark, tmp_path, batches, "user string, ts timestamp")
    tagged = run_to_memory(
        dedup_tag_stream(stream, ["user"], "ts", ttl_ms=3600_000), "append"
    )
    stats = (
        tagged.groupBy()
        .agg(
            F.count_if(F.col("is_prime")).alias("primes"),
            F.count_if(~F.col("is_prime")).alias("duplicates"),
            F.avg(F.when(~F.col("is_prime"), F.col("delay_ms"))).alias("avg_delay"),
        )
        .collect()[0]
    )
    assert stats.primes == 3
    assert stats.duplicates == 2
    assert stats.avg_delay == 35_000.0


def test_state_ttl_eviction_reemits_prime(spark, tmp_path):
    """After the event-time timeout, the key's state is gone and the
    next occurrence is a PRIME again — the intended cacheTTL behavior
    (environment.conf:24) the reference never applied."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [("A", base)],
        [("PUSH", base + dt.timedelta(hours=3))],
        [("A", base + dt.timedelta(hours=3, minutes=1))],
    ]
    stream = _replay(spark, tmp_path, batches, "user string, ts timestamp")
    out = run_to_memory(
        dedup_tag_stream(stream, ["user"], "ts", ttl_ms=3600_000), "append"
    ).collect()
    a_rows = sorted(
        [r for r in out if r.ts_ms in (1704110400000, 1704121260000)],
        key=lambda r: r.ts_ms,
    )
    assert len(a_rows) == 2
    assert a_rows[0].is_prime and a_rows[1].is_prime, (
        "post-TTL occurrence must be prime again: "
        + str([(r.ts_ms, r.is_prime) for r in out])
    )


def test_dedup_tag_deterministic_across_arrow_chunk_sizes(spark, tmp_path):
    """Chunked state groups (group rows > arrow.maxRecordsPerBatch)
    must replay in the same deterministic event-time order as a single
    chunk — identical verdicts, delays, and hit counts."""
    import datetime as dt
    import random

    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (f"u{rng.randrange(20)}", base + dt.timedelta(seconds=i))
        for i in range(500)
    ]
    results = []
    for chunk_size in (10_000, 41):
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_size))
        try:
            stream = _replay(
                spark, tmp_path / f"c{chunk_size}", [rows], "user string, ts timestamp"
            )
            out = run_to_memory(
                dedup_tag_stream(stream, ["user"], "ts", ttl_ms=3600_000, n_buckets=1),
                "append",
            )
            results.append(
                sorted(
                    (r.key, r.ts_ms, r.is_prime, r.delay_ms, r.hit_no)
                    for r in out.collect()
                )
            )
        finally:
            if old is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert results[0] == results[1]
