"""transformWithState dedup tagger (streaming/tws_dedup.py).

The execution path needs ``google.protobuf`` (the TWS state protocol;
absent in this sandbox — re-probed rounds 7 and 8, still absent — see the
module docstring), so the semantic parity test gates on it.  Plan construction is checked unconditionally:
the operator must analyze into a TransformWithState node without
touching the state runtime.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.streaming import (
    parquet_stream,
    run_to_memory,
    scoped_conf,
)
from transitdata_hfp_deduplicator_spark.streaming.tws_dedup import (
    dedup_tag_stream_tws,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def test_plan_constructs_without_state_runtime(spark, sf_dir):
    stream = parquet_stream(spark, os.path.join(sf_dir, "events.parquet"))
    tagged = dedup_tag_stream_tws(
        stream, ["user_id", "event_type", "props"], "ts"
    )
    assert tagged.isStreaming
    assert [f.name for f in tagged.schema.fields] == [
        "key",
        "ts_ms",
        "is_prime",
        "delay_ms",
        "hit_no",
    ]


def test_parity_with_apply_in_pandas_operator(spark, sf_dir):
    pytest.importorskip("google.protobuf")
    from transitdata_hfp_deduplicator_spark.streaming.stateful import (
        dedup_tag_stream,
    )

    path = os.path.join(sf_dir, "events.parquet")
    with scoped_conf(
        spark, "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    ):
        tws = run_to_memory(
            dedup_tag_stream_tws(
                parquet_stream(spark, path),
                ["user_id", "event_type", "props"],
                "ts",
            ),
            "append",
        )
    ref = run_to_memory(
        dedup_tag_stream(
            parquet_stream(spark, path), ["user_id", "event_type", "props"], "ts"
        ),
        "append",
    )
    cols = ["key", "ts_ms", "is_prime", "delay_ms", "hit_no"]
    assert sorted(map(tuple, tws.select(cols).collect())) == sorted(
        map(tuple, ref.select(cols).collect())
    )


def test_ttl_reprimes_expired_key(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("A", base),
        ("A", base + dt.timedelta(minutes=5)),  # dup within TTL
        ("A", base + dt.timedelta(hours=2)),  # past TTL: fresh prime
    ]
    d = str(tmp_path / "d")
    spark.createDataFrame(rows, "k string, ts timestamp").coalesce(
        1
    ).write.parquet(d)
    with scoped_conf(
        spark, "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    ):
        out = run_to_memory(
            dedup_tag_stream_tws(
                parquet_stream(spark, d), ["k"], "ts", ttl_ms=3600 * 1000
            ),
            "append",
        )
    got = sorted((r.is_prime, r.hit_no) for r in out.collect())
    assert got == [(False, 2), (True, 1), (True, 1)]


class _FakeMapState:
    """Stand-in for the TWS MapState handle: dict-backed get/update."""

    def __init__(self):
        self.d = {}

    def getValue(self, key):
        return self.d.get(key)

    def updateValue(self, key, value):
        self.d[key] = value


def _run_processor(batches, ttl_ms=10**12):
    """Drive _DedupTagProcessor.handleInputRows directly — the state
    runtime needs google.protobuf (absent here), but the processor is
    pure Python over pandas chunks + a MapState, so its semantics are
    testable without the runtime."""
    import pandas as pd

    from transitdata_hfp_deduplicator_spark.streaming.tws_dedup import (
        _DedupTagProcessor,
    )

    p = _DedupTagProcessor(ttl_ms)
    p.cache = _FakeMapState()
    out = []
    for chunks in batches:
        frames = list(
            p.handleInputRows(
                ("bucket",),
                iter(
                    pd.DataFrame({"key": [k for k, _ in c],
                                  "ts_ms": [t for _, t in c]})
                    for c in chunks
                ),
                None,
            )
        )
        out.extend(frames)
    return pd.concat(out, ignore_index=True) if out else None


def test_multi_chunk_batch_sorts_across_chunks():
    """A batch whose Arrow chunks arrive out of event-time order must
    still tag by GLOBAL batch order: the prime is the overall-earliest
    row even when it sits in the second chunk, and delay_ms is never
    negative (the regression: per-chunk sorting made hit_no/delay_ms
    chunk-boundary-dependent)."""
    # chunk 1 holds the LATER rows, chunk 2 the earliest
    batch = [
        [("k", 3000), ("k", 2000)],  # chunk 1
        [("k", 1000), ("k", 4000)],  # chunk 2
    ]
    df = _run_processor([batch]).sort_values("ts_ms")
    assert df["ts_ms"].tolist() == [1000, 2000, 3000, 4000]
    assert df["is_prime"].tolist() == [True, False, False, False]
    assert df["hit_no"].tolist() == [1, 2, 3, 4]
    delays = df["delay_ms"].tolist()
    assert delays[0] is None or pd.isna(delays[0])
    assert [int(x) for x in delays[1:]] == [1000, 2000, 3000]


def test_state_carries_across_batches_and_ttl_reprimes():
    batches = [
        [[("a", 1000)]],
        [[("a", 2000), ("b", 2500)]],
        [[("a", 10_000_000)]],  # beyond ttl: fresh prime
    ]
    df = _run_processor(batches, ttl_ms=1_000_000)
    rows = {
        (r.key, int(r.ts_ms)): (bool(r.is_prime), int(r.hit_no))
        for r in df.itertuples()
    }
    assert rows[("a", 1000)] == (True, 1)
    assert rows[("a", 2000)] == (False, 2)
    assert rows[("b", 2500)] == (True, 1)
    assert rows[("a", 10_000_000)] == (True, 1)
