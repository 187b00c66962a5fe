"""Full-wiring tests: config env overrides, the Main.java-analog
pipeline over the real corpus, and the error-path listener (A11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.config import DedupConfig
from transitdata_hfp_deduplicator_spark.pipeline import run_hfp_corpus_pipeline
from transitdata_hfp_deduplicator_spark.sources import hfp

CORPUS = "/root/reference/src/integration-test/resources/hfp-5000.txt"


def test_config_defaults_and_env_override(monkeypatch):
    cfg = DedupConfig()
    assert cfg.cache_ttl_ms == 4 * 3600 * 1000  # environment.conf:24
    assert cfg.duplicate_ratio_threshold == 0.97  # environment.conf:29
    monkeypatch.setenv("APPLICATION_CACHE_TTL_SECONDS", "60")
    monkeypatch.setenv("APPLICATION_ALERT_RATIO_THRESHOLD", "0.5")
    cfg2 = DedupConfig()
    assert cfg2.cache_ttl_ms == 60_000
    assert cfg2.duplicate_ratio_threshold == 0.5


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference corpus absent")
def test_full_pipeline_on_real_corpus(spark, tmp_path):
    """Main-wiring parity: corpus in -> 4956 uniques out + alerting
    stats, through the composed streaming pipeline."""
    df = (
        hfp.read_corpus(spark, CORPUS)
        .withColumn(
            "ts", F.to_timestamp("server_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ")
        )
        .select("topic", "payload", "ts")
    )
    src = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(src)

    received = []
    uniques, stats = run_hfp_corpus_pipeline(
        spark, src, on_alerts=lambda alerts, bid: received.extend(alerts)
    )
    assert uniques.count() == 4956  # ITDeduplicatorTest.java:92-93
    totals = stats.agg(
        F.sum("primes").alias("p"), F.sum("duplicates").alias("d")
    ).collect()[0]
    assert totals.p == 4956
    assert totals.p + totals.d == 5000
    # 0.88% duplicate corpus -> far below the 0.97 healthy band:
    # every alerting window says FEED_DOWN (the reference would too)
    assert received, "sub-threshold ratio must alert"
    assert {a.alert for a in received} <= {"FEED_DOWN", "MORE_DUPLICATES_THAN_PRIMARIES"}


def test_per_duplicate_alert(spark, tmp_path, monkeypatch):
    """alertOnDuplicate (environment.conf:33-34): the pipeline fires one
    alert PER duplicate, each carrying its inter-duplicate delay —
    Analytics.java:69-75's reportDuplicate branch."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("t/a", "m1", base),
        ("t/b", "m2", base + dt.timedelta(seconds=1)),
        ("t/a", "m1", base + dt.timedelta(seconds=3)),  # dup of m1, 3000ms
        ("t/a", "m1", base + dt.timedelta(seconds=7)),  # dup of m1, 7000ms
        ("t/b", "m2", base + dt.timedelta(seconds=2)),  # dup of m2, 1000ms
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "topic string, payload string, ts timestamp"
    ).coalesce(1).write.parquet(src)

    monkeypatch.setenv("APPLICATION_ALERT_ON_DUPLICATE", "true")
    received = []
    uniques, _ = run_hfp_corpus_pipeline(
        spark, src, on_alerts=lambda alerts, bid: received.extend(alerts)
    )
    assert uniques.count() == 2
    dup_alerts = [a for a in received if a.alert == "DUPLICATE_RECEIVED"]
    assert len(dup_alerts) == 3, "one alert per duplicate"
    assert sorted(a.delay_ms for a in dup_alerts) == [1000, 3000, 7000]


def test_per_duplicate_alert_off_by_default(spark, tmp_path):
    """With the shipped config (alertOnDuplicate=false) no per-duplicate
    alerts fire — only the window-level threshold alerts."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("t/a", "m1", base),
        ("t/a", "m1", base + dt.timedelta(seconds=3)),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "topic string, payload string, ts timestamp"
    ).coalesce(1).write.parquet(src)
    received = []
    run_hfp_corpus_pipeline(
        spark, src, on_alerts=lambda alerts, bid: received.extend(alerts)
    )
    assert not [a for a in received if a.alert == "DUPLICATE_RECEIVED"]
    # the chained-stateful correctness-check lift is scoped to the
    # pipeline's query start — the session default must survive
    assert (
        spark.conf.get(
            "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
        )
        == "true"
    )


def test_streaming_pipeline_canonicalizes_typed_payloads(spark, tmp_path):
    """A3 ONLINE: a scrambled-field-order MqttRawMessage dedups against
    its canonical twin through the full streaming pipeline (envelope →
    typed canonicalize → stateful dedup), while the same scramble under
    PassengerCount stays two records (raw-bytes identity,
    Deduplicator.java:76-106)."""
    import datetime as dt

    from transitdata_hfp_deduplicator_spark.pipeline import build_dedup_pipeline
    from transitdata_hfp_deduplicator_spark.sources.envelope import (
        envelope_from_rows,
    )
    from transitdata_hfp_deduplicator_spark.streaming import (
        allow_chained_stateful,
        parquet_stream,
        run_to_memory,
    )
    from tests.test_sources import _mqtt_raw

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = _mqtt_raw(1, "/hfp/v1/journey", b'{"VP":{"spd":7}}')
    m_scr = _mqtt_raw(1, "/hfp/v1/journey", b'{"VP":{"spd":7}}', order=(3, 1, 2))
    mqtt = {"protobuf-schema": "MqttRawMessage", "schema-version": "1"}
    pc = {"protobuf-schema": "PassengerCount", "schema-version": "1"}
    rows = [
        ("k1", m, base, mqtt),
        ("k2", m_scr, base.replace(second=1), mqtt),  # canonical dup of k1
        ("k3", m, base.replace(second=2), pc),  # same bytes as k1 -> dup
        ("k4", m_scr, base.replace(second=3), pc),  # raw-bytes: unique
    ]
    src = str(tmp_path / "env")
    envelope_from_rows(spark, rows).coalesce(1).write.parquet(src)

    uniques_s, stats_s, _ = build_dedup_pipeline(
        parquet_stream(spark, src), canonicalize=True
    )
    uniques = run_to_memory(uniques_s, "append")
    assert sorted(r.key for r in uniques.collect()) == ["k1", "k4"]
    with allow_chained_stateful(spark):
        stats = run_to_memory(stats_s, "complete")
    totals = stats.agg(
        F.sum("primes").alias("p"), F.sum("duplicates").alias("d")
    ).collect()[0]
    assert (totals.p, totals.d) == (2, 2)


def test_listener_captures_failure(spark, tmp_path):
    from transitdata_hfp_deduplicator_spark.streaming.listener import (
        DedupQueryListener,
    )

    failures = []
    listener = DedupQueryListener(on_failure=lambda qid, exc: failures.append(exc))
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "x")], "id long, s string"
        ).write.parquet(src)
        stream = spark.readStream.schema("id long, s string").parquet(src)

        def explode_in_batch(df, _):
            raise RuntimeError("boom")

        q = (
            stream.writeStream.foreachBatch(explode_in_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception):
            q.awaitTermination()
        import time

        for _ in range(40):  # listener events are async
            if failures:
                break
            time.sleep(0.25)
        assert failures and "boom" in failures[0]
    finally:
        spark.streams.removeListener(listener)
