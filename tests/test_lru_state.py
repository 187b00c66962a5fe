"""Size-bound LRU dedup semantics (reference A6, Deduplicator.java:36-40).

Pins the three behaviors the registry's rows-only q_dedup_lru cannot:
access-ordered eviction + re-emission, expire-after-write TTL reset,
and state durability across a query restart.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest
from transitdata_hfp_deduplicator_spark.streaming.lru_state import lru_dedup_stream

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _digest_of(spark, *keys):
    rows = spark.createDataFrame([(k,) for k in keys], "k string")
    out = rows.select("k", payload_digest("k").alias("d")).collect()
    return {r.k: r.d for r in out}


def _write_batch(spark, d, rows):
    spark.createDataFrame(rows, "k string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(d)


def _run(spark, src, ckpt, out_dir, **lru_kwargs):
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tagged = lru_dedup_stream(stream, ["k"], "ts", **lru_kwargs)
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def _sec(i: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=i)


def test_lru_capacity_eviction_and_reemission(spark, tmp_path):
    """cap=3, one bucket: inserting a 4th key evicts the LRU entry; the
    evicted key's next occurrence re-emits as a PRIME (the reference
    forgets and re-forwards); a still-cached key stays a duplicate."""
    rows = [
        ("a", _sec(1)),  # prime
        ("b", _sec(2)),  # prime
        ("c", _sec(3)),  # prime
        ("b", _sec(4)),  # hit -> refreshes b's access time
        ("d", _sec(5)),  # prime; cache full -> evict LRU = a(t1)
        ("a", _sec(6)),  # a was evicted -> RE-EMITTED as prime; evicts c(t3)
        ("b", _sec(7)),  # still cached -> duplicate, delay 5000ms
        ("c", _sec(8)),  # c was evicted at t6 -> re-emitted as prime
    ]
    _write_batch(spark, str(tmp_path / "src"), rows)
    out = _run(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_size=3,
        buckets=1,
    )
    dg = _digest_of(spark, "a", "b", "c", "d")
    got = {
        (r.digest, r.ts_ms): (r.is_prime, r.delay_ms)
        for r in out.collect()
    }
    assert len(got) == 8
    ms = lambda i: int(_sec(i).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert got[(dg["a"], ms(1))] == (True, None)
    assert got[(dg["b"], ms(2))] == (True, None)
    assert got[(dg["c"], ms(3))] == (True, None)
    assert got[(dg["b"], ms(4))] == (False, 2000)
    assert got[(dg["d"], ms(5))] == (True, None)
    assert got[(dg["a"], ms(6))] == (True, None), "evicted key must re-emit as prime"
    assert got[(dg["b"], ms(7))] == (False, 5000), "cached key must stay duplicate"
    assert got[(dg["c"], ms(8))] == (True, None), "evicted key must re-emit as prime"


def test_lru_ttl_expire_after_write(spark, tmp_path):
    """ttl_ms=2000: a hit within TTL is a duplicate; beyond TTL of the
    FIRST write it resets to a fresh prime (expireAfterWrite — the
    cacheTTL the reference configured but forgot to apply)."""
    rows = [
        ("x", _sec(0)),  # prime
        ("x", _sec(1)),  # within ttl -> duplicate (delay 1000)
        ("x", _sec(10)),  # 10s > ttl since first write -> prime again
        ("x", _sec(11)),  # duplicate of the NEW epoch (delay 1000)
    ]
    _write_batch(spark, str(tmp_path / "src"), rows)
    out = _run(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_size=100,
        buckets=1,
        ttl_ms=2000,
    )
    seq = [
        (r.is_prime, r.delay_ms)
        for r in sorted(out.collect(), key=lambda r: r.ts_ms)
    ]
    assert seq == [(True, None), (False, 1000), (True, None), (False, 1000)]


def test_lru_state_survives_restart(spark, tmp_path):
    """The sharded LRU maps live in the checkpointed state store: after
    stop/start, a duplicate of a remembered key is still tagged
    duplicate (the reference's in-heap cache dies with the process)."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    _write_batch(spark, src, [("a", _sec(0)), ("b", _sec(1))])
    out1 = _run(spark, src, ckpt, out_dir, max_size=100, buckets=2)
    assert out1.filter(F.col("is_prime")).count() == 2

    time.sleep(1.1)  # newer mtime so the resumed query sees a new file
    _write_batch(spark, src, [("a", _sec(60)), ("c", _sec(61))])
    out2 = _run(spark, src, ckpt, out_dir, max_size=100, buckets=2)
    dg = _digest_of(spark, "a", "b", "c")
    by_key = {
        (r.digest, r.ts_ms): r.is_prime for r in out2.collect()
    }
    ms = lambda i: int(_sec(i).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert by_key[(dg["c"], ms(61))] is True, "new key must pass after restart"
    assert by_key[(dg["a"], ms(60))] is False, (
        "duplicate after restart must be tagged by RECOVERED LRU state"
    )


def test_lru_deterministic_across_arrow_chunk_sizes(spark, tmp_path):
    """A state group larger than arrow.maxRecordsPerBatch arrives as
    several pandas chunks; the operator must concat-then-sort so the
    replay order (and therefore every verdict, delay, and eviction) is
    identical however the rows are chunked."""
    import random

    rng = random.Random(7)
    keys = [f"k{i}" for i in range(40)]
    rows = [
        (rng.choice(keys), _sec(i)) for i in range(600)
    ]
    results = []
    for chunk_size in (10_000, 37):
        src = str(tmp_path / f"src_{chunk_size}")
        _write_batch(spark, src, rows)
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_size))
        try:
            out = _run(
                spark,
                src,
                str(tmp_path / f"ck_{chunk_size}"),
                str(tmp_path / f"out_{chunk_size}"),
                max_size=16,
                buckets=1,
            )
            results.append(
                sorted(
                    (r.digest, r.ts_ms, r.is_prime, r.delay_ms, r.hit_no)
                    for r in out.collect()
                )
            )
        finally:
            if old is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert results[0] == results[1]
