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
