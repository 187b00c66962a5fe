"""Broker adapter column mappings (testable without a broker) and the
envelope canonical-payload dispatch."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.sources.broker import (
    kafka_to_envelope,
    pulsar_to_envelope,
)
from transitdata_hfp_deduplicator_spark.sources.envelope import (
    KEY_PROTOBUF_SCHEMA,
    canonical_payload,
)


def test_kafka_shape_maps_to_envelope(spark):
    rows = [
        (
            b"veh-1",
            b"payload-bytes",
            dt.datetime(2024, 1, 1, 12, 0, 0),
            [("protobuf-schema", b"MqttRawMessage"), ("schema-version", b"1")],
        ),
        (b"veh-2", b"other", dt.datetime(2024, 1, 1, 12, 0, 1), None),
    ]
    df = spark.createDataFrame(
        rows,
        "key binary, value binary, timestamp timestamp, "
        "headers array<struct<key: string, value: binary>>",
    )
    env = kafka_to_envelope(df).collect()
    assert env[0].key == "veh-1"
    assert env[0].properties[KEY_PROTOBUF_SCHEMA] == "MqttRawMessage"
    assert env[0].value == b"payload-bytes"
    assert env[1].properties == {}  # null headers -> empty map, not null


def test_pulsar_shape_maps_to_envelope(spark):
    rows = [
        (
            b"veh-1",
            b"data",
            dt.datetime(2024, 1, 1, 12, 0, 0),
            {"protobuf-schema": "HfpData"},
        )
    ]
    df = spark.createDataFrame(
        rows,
        "__key binary, value binary, __eventTime timestamp, "
        "__properties map<string,string>",
    )
    env = pulsar_to_envelope(df).collect()[0]
    assert env.key == "veh-1"
    assert env.properties["protobuf-schema"] == "HfpData"


# --- typed protobuf canonicalization through the envelope path (A3) --------


def _vi(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _f_varint(no: int, v: int) -> bytes:
    return _vi(no << 3) + _vi(v)


def _f_len(no: int, payload: bytes) -> bytes:
    return _vi((no << 3) | 2) + _vi(len(payload)) + payload


def _mqtt_raw(version: int, topic: str, payload: bytes, order=(1, 2, 3)) -> bytes:
    """MqttRawMessage wire bytes (ITDeduplicatorTest.java:149-154 shape)
    with a caller-chosen field emission order — the nondeterminism
    Deduplicator.java:69 canonicalizes away."""
    parts = {
        1: _f_varint(1, version),
        2: _f_len(2, topic.encode()),
        3: _f_len(3, payload),
    }
    return b"".join(parts[i] for i in order)


def test_typed_canonicalize_mqtt_field_order(spark):
    """Two serializations of the SAME MqttRawMessage in different field
    orders canonicalize to identical bytes; a different message does
    not (Deduplicator.java:96-106 parse->reserialize semantics)."""
    from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
        MQTT_RAW_MESSAGE_DESC,
        typed_canonicalize,
    )

    a = _mqtt_raw(1, "/hfp/v1/journey", b'{"VP":{}}', order=(1, 2, 3))
    b = _mqtt_raw(1, "/hfp/v1/journey", b'{"VP":{}}', order=(3, 1, 2))
    assert a != b
    assert typed_canonicalize(a, MQTT_RAW_MESSAGE_DESC) == typed_canonicalize(
        b, MQTT_RAW_MESSAGE_DESC
    )
    other = _mqtt_raw(1, "/hfp/v1/deadrun", b'{"VP":{}}')
    assert typed_canonicalize(a, MQTT_RAW_MESSAGE_DESC) != typed_canonicalize(
        other, MQTT_RAW_MESSAGE_DESC
    )


def test_typed_canonicalize_rejects_schema_mismatch(spark):
    """A payload whose wire types contradict the registered schema is
    rejected (ValueError) — the caller's raw-bytes fallback, like the
    swallowed typed-parse exception at Deduplicator.java:86-93."""
    import pytest

    from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
        MQTT_RAW_MESSAGE_DESC,
        typed_canonicalize,
    )

    bad = _f_len(1, b"not-a-varint")  # field 1 declared varint
    with pytest.raises(ValueError):
        typed_canonicalize(bad, MQTT_RAW_MESSAGE_DESC)


def test_typed_canonicalize_hfp_nested(spark):
    """HfpData: nested topic/payload sub-messages are canonicalized
    recursively, so scrambling BOTH outer and inner field order yields
    the same canonical bytes."""
    from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
        HFP_DATA_DESC,
        typed_canonicalize,
    )

    topic_a = _f_varint(1, 5) + _f_len(2, b"bus")
    topic_b = _f_len(2, b"bus") + _f_varint(1, 5)  # inner scramble
    pay_a = _f_varint(1, 42) + _f_len(3, b"12:30")
    pay_b = _f_len(3, b"12:30") + _f_varint(1, 42)
    msg_a = _f_varint(1, 1) + _f_len(2, topic_a) + _f_len(3, pay_a)
    msg_b = _f_len(3, pay_b) + _f_varint(1, 1) + _f_len(2, topic_b)
    assert msg_a != msg_b
    assert typed_canonicalize(msg_a, HFP_DATA_DESC) == typed_canonicalize(
        msg_b, HFP_DATA_DESC
    )


def test_envelope_canonical_dedups_scrambled_twin(spark):
    """THE A3 end-to-end contract (Deduplicator.java:69-106): a typed
    message whose serialization scrambles field order dedups against
    its canonical twin through the envelope path — while the SAME
    scramble under the PassengerCount tag does NOT (its typed parse
    throws and the reference dedups it on raw bytes, :104,:86-93)."""
    import datetime as dt

    from transitdata_hfp_deduplicator_spark.operators.dedup import dedup_exact
    from transitdata_hfp_deduplicator_spark.sources.envelope import (
        envelope_from_rows,
        with_envelope_canonical,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m_sorted = _mqtt_raw(1, "/hfp/v1/journey", b'{"VP":{"spd":5}}')
    m_scrambled = _mqtt_raw(
        1, "/hfp/v1/journey", b'{"VP":{"spd":5}}', order=(2, 3, 1)
    )
    mqtt_props = {"protobuf-schema": "MqttRawMessage", "schema-version": "1"}
    pc_props = {"protobuf-schema": "PassengerCount", "schema-version": "1"}
    rows = [
        ("k1", m_sorted, base, mqtt_props),
        ("k2", m_scrambled, base.replace(second=1), mqtt_props),  # dup of k1
        ("k3", m_sorted, base.replace(second=2), pc_props),
        ("k4", m_scrambled, base.replace(second=3), pc_props),  # NOT a dup: raw bytes
        ("k5", b"\xff\xfe-unparseable", base.replace(second=4), mqtt_props),
    ]
    env = with_envelope_canonical(envelope_from_rows(spark, rows))
    uniq = dedup_exact(env, ["canonical"], ["event_time"])
    keys = sorted(r.key for r in uniq.collect())
    # k2 (scrambled, typed) canonicalizes into k1's bytes -> dedups.
    # k3 (PassengerCount, raw bytes == k1's canonical form) ALSO dedups:
    # identity is payload bytes only, schema tag never enters it
    # (ITDeduplicatorTest.java:37-42).  k4 (scrambled PassengerCount)
    # survives — its raw bytes differ, the reference's :104 quirk.
    # k5 survives via the parse-failure fallback.
    assert keys == ["k1", "k4", "k5"]


def test_canonical_payload_dispatch(spark):
    """Whitelisted schema tags route through the canonicalization hook;
    unknown tags and missing tags degrade to raw bytes
    (Deduplicator.java:76-93)."""
    rows = [
        ("a", b"x", {"protobuf-schema": "MqttRawMessage"}),
        ("b", b"y", {"protobuf-schema": "TotallyUnknown"}),
        ("c", b"z", None),
    ]
    df = spark.createDataFrame(
        rows, "key string, value binary, properties map<string,string>"
    )
    out = df.select("key", canonical_payload().alias("canon")).collect()
    got = {r.key: r.canon for r in out}
    assert got == {"a": b"x", "b": b"y", "c": b"z"}


def test_socket_replay_golden(spark):
    """hfp-5000.txt replayed over a REAL TCP socket (Spark's built-in
    receiver-backed socket source — no connector jar) through
    parse → dedup: 4956 uniques.  This is the closest executable analog
    of the reference's live-broker integration test, which sends the
    corpus over a Pulsar connection and awaits the deduped output
    (ITDeduplicatorTest.java:64-113): a true unbounded network source,
    not a file replay."""
    import os
    import socket
    import threading
    import time

    import pytest

    from transitdata_hfp_deduplicator_spark.sources import hfp
    from transitdata_hfp_deduplicator_spark.sources.broker import (
        socket_line_stream,
    )
    from transitdata_hfp_deduplicator_spark.streaming import ephemeral_dir

    corpus = "/root/reference/src/integration-test/resources/hfp-5000.txt"
    if not os.path.exists(corpus):
        pytest.skip("reference corpus absent")
    with open(corpus, "rb") as f:
        lines = f.read().splitlines()

    done = threading.Event()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve() -> None:
        conn, _ = srv.accept()  # Spark connects when the query starts
        with conn:
            conn.sendall(b"\n".join(lines) + b"\n")
            done.wait(120)  # hold the connection until the query stops

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    out_dir = os.path.join(ephemeral_dir("socket_golden_"), "data")
    parsed = hfp.dedup_identity(
        hfp.parse_lines(socket_line_stream(spark, "127.0.0.1", port))
    )
    deduped = parsed.dropDuplicates(["identity"])

    def spool(batch_df, _bid):
        batch_df.select("identity").write.mode("append").parquet(out_dir)

    q = (
        deduped.writeStream.foreachBatch(spool)
        .outputMode("append")
        .option(
            "checkpointLocation",
            os.path.join(ephemeral_dir("socket_golden_ck_"), "ckpt"),
        )
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        stable_since = None
        last = -1
        while time.time() < deadline:
            time.sleep(1.0)
            try:
                n = spark.read.parquet(out_dir).count()
            except Exception:  # noqa: BLE001 - no batch committed yet
                continue
            if n != last:
                last, stable_since = n, time.time()
            elif n >= 4956 and time.time() - stable_since > 3:
                break
    finally:
        q.stop()
        done.set()
        srv.close()

    got = spark.read.parquet(out_dir)
    assert got.count() == 4956  # ITDeduplicatorTest.java:92-93
    assert got.select("identity").distinct().count() == 4956
