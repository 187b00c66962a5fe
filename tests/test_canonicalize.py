"""Canonicalization (A3) semantics: field-order-insensitive byte
identity with raw-bytes fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
    canonicalize_protobuf,
    with_canonical_payload,
)


def _field(no: int, wire: int, payload: bytes) -> bytes:
    key = (no << 3) | wire
    assert key < 0x80
    return bytes([key]) + payload


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _len_field(no: int, data: bytes) -> bytes:
    return _field(no, 2, _varint(len(data)) + data)


def test_field_order_insensitive():
    """The MqttRawMessage shape: {schema_version:1 varint, topic:2 str,
    payload:3 bytes} serialized in two different field orders must
    canonicalize to identical bytes (the reference's reason for A3,
    Deduplicator.java:69)."""
    sv = _field(1, 0, _varint(1))
    topic = _len_field(2, b"/hfp/v1/journey")
    payload = _len_field(3, b'{"VP": {}}')
    order_a = sv + topic + payload
    order_b = payload + sv + topic
    assert order_a != order_b
    assert canonicalize_protobuf(order_a) == canonicalize_protobuf(order_b)


def test_repeated_fields_keep_relative_order():
    a1, a2 = _len_field(2, b"first"), _len_field(2, b"second")
    other = _field(1, 0, _varint(7))
    canon = canonicalize_protobuf(a2 + other + a1)
    # field 1 sorts before the two field-2 entries; 'second' stays
    # before 'first' (stable sort preserves repeated order)
    assert canon == other + a2 + a1


def test_unparseable_falls_back_to_raw():
    """Deduplicator.java:86-93: failure -> raw bytes, never an error."""
    garbage = b"\xff\xff\xff\xff\xff"
    assert canonicalize_protobuf(garbage) == garbage
    assert canonicalize_protobuf(b"") == b""
    text = b'{"VP": {"desi": "57"}}'  # JSON happens to parse or not — must not throw
    out = canonicalize_protobuf(text)
    assert isinstance(out, bytes)


def test_idempotent():
    msg = _len_field(3, b"payload") + _field(1, 0, _varint(5))
    once = canonicalize_protobuf(msg)
    assert canonicalize_protobuf(once) == once


def test_dataframe_kernel_dedups_across_orders(spark):
    """Two envelope rows with the same message in different field
    orders become ONE identity after canonicalization."""
    sv = _field(1, 0, _varint(1))
    topic = _len_field(2, b"/hfp/v1/journey")
    pay = _len_field(3, b"x")
    rows = [(1, sv + topic + pay), (2, pay + sv + topic), (3, sv + topic)]
    df = spark.createDataFrame(rows, "id long, value binary")
    out = with_canonical_payload(df)
    n_ident = (
        out.select(F.md5("canonical").alias("fp")).distinct().count()
    )
    assert n_ident == 2
    assert out.count() == 3
