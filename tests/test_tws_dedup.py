"""transformWithState dedup tagger (streaming/tws_dedup.py).

The execution path needs ``google.protobuf`` (the TWS state protocol;
absent in this sandbox — see the module docstring), so the semantic
parity test gates on it.  Plan construction is checked unconditionally:
the operator must analyze into a TransformWithState node without
touching the state runtime.
"""

from __future__ import annotations

import datetime as dt
import os
import time

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
