"""Payload canonicalization — the reference's A3 projection
(Deduplicator.java:69-106), dependency-free.

The reference decodes protobuf and re-encodes it because "protobuf is
not deterministic in how it orders the bytes" (Deduplicator.java:69):
two serializations of the SAME message can interleave fields
differently, so byte-identity needs a canonical form.  The reference
gets one via the typed re-encode; the generic equivalent — no schema
required — is to parse the wire format's (tag, value) pairs and
re-emit them with a stable field order.  Protobuf wire format is four
primitive shapes (varint / fixed64 / length-delimited / fixed32), so
the parser is ~40 lines of pure Python, run as an Arrow-batched kernel.

Fallback contract preserved exactly: any parse failure returns the raw
bytes (Deduplicator.java:86-93) — unparseable payloads dedup on raw
identity, never error.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VARINT, _FIXED64, _LEN, _SGROUP, _EGROUP, _FIXED32 = 0, 1, 2, 3, 4, 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _parse_fields(buf: bytes) -> list[tuple[int, int, bytes]]:
    """(field_number, wire_type, encoded_value) triples, in order."""
    fields = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field_no, wire = key >> 3, key & 0x7
        if field_no == 0:
            raise ValueError("field number 0")
        if wire == _VARINT:
            v, npos = _read_varint(buf, pos)
            # normalize: re-emit the MINIMAL encoding of the value.  A
            # decode→re-encode runtime (the reference's typed path,
            # Deduplicator.java:96-106) collapses over-long varints
            # (e.g. 0x80 0x00 == 0x00); preserving the raw slice would
            # make padding-only-different wire images dedup apart.
            fields.append((field_no, wire, _write_varint(v)))
            pos = npos
        elif wire == _FIXED64:
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64")
            fields.append((field_no, wire, buf[pos : pos + 8]))
            pos += 8
        elif wire == _LEN:
            ln, npos = _read_varint(buf, pos)
            if npos + ln > len(buf):
                raise ValueError("truncated bytes field")
            fields.append((field_no, wire, buf[npos : npos + ln]))
            pos = npos + ln
        elif wire == _FIXED32:
            if pos + 4 > len(buf):
                raise ValueError("truncated fixed32")
            fields.append((field_no, wire, buf[pos : pos + 4]))
            pos += 4
        else:  # groups (deprecated) and reserved types -> not canonical
            raise ValueError(f"unsupported wire type {wire}")
    return fields


def _reencode(fields: list[tuple[int, int, bytes]]) -> bytes:
    out = bytearray()
    for field_no, wire, val in fields:
        out += _write_varint((field_no << 3) | wire)
        if wire == _LEN:
            out += _write_varint(len(val))
        out += val
    return bytes(out)


# --- typed descriptors (the "registered schema" path, A3) ------------------
#
# A descriptor maps field_number -> (expected_wire_type, NESTED | None).
# NESTED marks a field whose value is itself a protobuf message, to be
# canonicalized recursively.  This is the engine's registered-schema
# analog of the reference's typed ``parseFrom(...).toByteArray()``
# (Deduplicator.java:96-106): parse against a known shape, re-emit
# deterministically, and REJECT (ValueError) anything that does not
# match the shape — the caller maps rejection to the raw-bytes
# fallback, exactly like the swallowed parse exception at
# Deduplicator.java:86-93.

NESTED = "nested"

# MqttRawMessage {1: schemaVersion varint, 2: topic string, 3: payload
# bytes} — shape pinned by its construction at
# ITDeduplicatorTest.java:149-154.
MQTT_RAW_MESSAGE_DESC = {1: (_VARINT, None), 2: (_LEN, None), 3: (_LEN, None)}

# Hfp.Data {1: SchemaVersion varint, 2: topic message, 3: payload
# message} (parsed at Deduplicator.java:100-101; Topic/Payload carry
# only scalar fields, so their canonical form is the generic sorted
# re-emit one level down).
HFP_DATA_DESC = {1: (_VARINT, None), 2: (_LEN, NESTED), 3: (_LEN, NESTED)}


def typed_canonicalize(payload: bytes, desc: dict) -> bytes:
    """Typed decode -> canonical re-encode against a registered schema.

    Semantics mirror a protobuf runtime's parse+reserialize:
      * a declared field must arrive with its declared wire type
        (mismatch => ValueError => caller's raw-bytes fallback);
      * repeated occurrences of a declared scalar keep the LAST value
        (protobuf last-wins merge);
      * declared NESTED fields are parsed and re-emitted with sorted
        sub-fields (their shapes are scalar-only, so one level of
        recursion is the full canonical form); occurrences concatenate
        (wire-level message merge);
      * unknown fields are preserved verbatim, like Java's
        UnknownFieldSet, and sorted into place.
    """
    fields = _parse_fields(bytes(payload))
    last_scalar: dict[int, tuple[int, int, bytes]] = {}
    nested_parts: dict[int, list[tuple[int, int, bytes]]] = {}
    unknown: list[tuple[int, int, bytes]] = []
    for field_no, wire, val in fields:
        spec = desc.get(field_no)
        if spec is None:
            unknown.append((field_no, wire, val))
            continue
        want_wire, kind = spec
        if wire != want_wire:
            raise ValueError(
                f"field {field_no}: wire type {wire}, schema says {want_wire}"
            )
        if kind is NESTED:
            nested_parts.setdefault(field_no, []).extend(_parse_fields(val))
        else:
            last_scalar[field_no] = (field_no, wire, val)
    out: list[tuple[int, int, bytes]] = list(last_scalar.values())
    for field_no, subs in nested_parts.items():
        subs = sorted(subs, key=lambda f: f[0])
        out.append((field_no, _LEN, _reencode(subs)))
    out.extend(unknown)
    out.sort(key=lambda f: f[0])  # stable: repeated unknowns keep order
    return _reencode(out)


def canonicalize_protobuf(payload: bytes) -> bytes:
    """Stable re-encoding of a protobuf message's wire bytes.

    Fields are re-emitted sorted by field number (stable within a
    number, preserving repeated-field order); length-delimited values
    are kept opaque — nested-message ambiguity (bytes vs message) means
    recursing could corrupt byte fields, and top-level ordering already
    removes the nondeterminism the reference canonicalized away.
    Returns the input unchanged on any parse failure.
    """
    if payload is None:
        return None
    try:
        fields = _parse_fields(bytes(payload))
    except ValueError:
        return bytes(payload)  # Deduplicator.java:86-93 fallback
    fields.sort(key=lambda f: f[0])  # stable: repeated fields keep order
    return _reencode(fields)


def with_canonical_payload(
    df: DataFrame, value_col: str = "value", out_col: str = "canonical"
) -> DataFrame:
    """Add the canonicalized-payload column via an Arrow-batched kernel
    (mapInPandas keeps all original columns + appends one)."""
    schema_str = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_str}, `{out_col}` binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [canonicalize_protobuf(v) for v in pdf[value_col]]
            yield pdf

    return df.mapInPandas(kernel, out_schema)
