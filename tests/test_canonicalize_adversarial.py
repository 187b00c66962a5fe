"""Adversarial wire-image tests for the canonicalizer (A3,
Deduplicator.java:69-106): groups, truncations, over-long varints,
multi-byte tags, unknown-field preservation, typed-schema rejection.

The reference gets canonical bytes from a protobuf runtime's
decode→re-encode; these tests pin that our hand-rolled codec behaves
like one on the inputs a runtime treats specially — and falls back to
raw-byte identity (Deduplicator.java:86-93) exactly where a runtime
would throw.  The encoder used to build adversarial images below is
written independently of the operator's (tag/length emission inlined
per test), so agreement is evidence, not tautology.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transitdata_hfp_deduplicator_spark.operators.canonicalize import (
    HFP_DATA_DESC,
    MQTT_RAW_MESSAGE_DESC,
    _parse_fields,
    canonicalize_protobuf,
    typed_canonicalize,
)


def varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def overlong_varint(v: int, pad: int) -> bytes:
    """Valid but non-minimal varint: ``pad`` redundant continuation
    bytes (protobuf runtimes accept these on decode, never emit them)."""
    minimal = bytearray(varint(v))
    for _ in range(pad):
        minimal[-1] |= 0x80
        minimal.append(0x00)
    return bytes(minimal)


def tag(field_no: int, wire: int) -> bytes:
    return varint((field_no << 3) | wire)


# -- groups (deprecated wire types 3/4): runtime-unparseable for any
#    modern schema → raw-bytes fallback --------------------------------------


def test_group_wire_type_falls_back_to_raw():
    msg = tag(1, 3) + tag(1, 4)  # SGROUP/EGROUP pair
    assert canonicalize_protobuf(msg) == msg  # identity, not an error


def test_group_inside_message_falls_back_whole():
    msg = tag(2, 0) + varint(7) + tag(1, 3) + b"junk"
    assert canonicalize_protobuf(msg) == msg


def test_typed_rejects_groups():
    msg = tag(1, 3)
    with pytest.raises(ValueError):
        typed_canonicalize(msg, MQTT_RAW_MESSAGE_DESC)


# -- truncations: every wire shape cut mid-value ----------------------------


@pytest.mark.parametrize(
    "img",
    [
        tag(1, 0),  # varint tag, no value
        tag(1, 0) + b"\x80",  # dangling continuation bit
        tag(1, 1) + b"\x00" * 7,  # fixed64 short by one
        tag(1, 5) + b"\x00" * 3,  # fixed32 short by one
        tag(1, 2) + varint(5) + b"abc",  # len-delimited short
        tag(1, 2) + b"\x80",  # truncated length varint
        b"\x80",  # truncated tag itself
        tag(0, 0) + varint(1),  # field number 0 is invalid
        tag(1, 0) + b"\xff" * 10 + b"\x01",  # varint > 64 bits
    ],
)
def test_truncated_and_invalid_images_fall_back(img):
    assert canonicalize_protobuf(img) == img
    with pytest.raises(ValueError):
        typed_canonicalize(img, MQTT_RAW_MESSAGE_DESC)


# -- over-long varints: padding-only-different images must canonicalize
#    to the SAME bytes (what a decode→re-encode runtime guarantees) ---------


@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=200, deadline=None)
def test_overlong_varint_value_normalizes(v, pad):
    # runtimes (and our parser) cap varints at 10 bytes; a padded image
    # beyond that is malformed → separate fallback test below
    pad = min(pad, 10 - len(varint(v)))
    if pad < 1:
        return
    minimal = tag(1, 0) + varint(v)
    padded = tag(1, 0) + overlong_varint(v, pad)
    assert len(padded) > len(minimal)
    assert canonicalize_protobuf(padded) == canonicalize_protobuf(minimal)


def test_varint_beyond_ten_bytes_falls_back():
    img = tag(1, 0) + overlong_varint(1 << 63, 3)  # 11 bytes of varint
    assert canonicalize_protobuf(img) == img


@given(st.integers(min_value=1, max_value=(1 << 29) - 1))
@settings(max_examples=100, deadline=None)
def test_overlong_tag_normalizes(field_no):
    """The field KEY is a varint too — an over-long tag encoding must
    collapse to the minimal one."""
    minimal = tag(field_no, 0) + varint(3)
    key = (field_no << 3) | 0
    padded = overlong_varint(key, 2) + varint(3)
    assert canonicalize_protobuf(padded) == canonicalize_protobuf(minimal)


def test_overlong_varint_in_typed_scalar_normalizes():
    a = tag(1, 0) + varint(300) + tag(2, 2) + varint(1) + b"t"
    b = tag(1, 0) + overlong_varint(300, 3) + tag(2, 2) + varint(1) + b"t"
    assert typed_canonicalize(a, MQTT_RAW_MESSAGE_DESC) == typed_canonicalize(
        b, MQTT_RAW_MESSAGE_DESC
    )


# -- multi-byte tags: field numbers beyond the 1-byte tag range -------------


@given(st.lists(st.integers(min_value=16, max_value=(1 << 29) - 1), min_size=1, max_size=6, unique=True))
@settings(max_examples=100, deadline=None)
def test_large_field_numbers_sort_and_roundtrip(nums):
    img = b"".join(tag(n, 0) + varint(n % 97) for n in nums)
    out = canonicalize_protobuf(img)
    assert [f[0] for f in _parse_fields(out)] == sorted(nums)
    assert canonicalize_protobuf(out) == out  # idempotent


# -- typed path: unknown fields, wire mismatch, nested merge ----------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=4, max_value=200),  # not in the MQTT desc
            st.sampled_from([0, 1, 2, 5]),
            st.binary(min_size=0, max_size=12),
        ),
        max_size=5,
        # unique field numbers: repeated unknowns keep ARRIVAL order by
        # design (stable sort), so full order-invariance needs uniqueness
        unique_by=lambda u: u[0],
    ),
    st.randoms(),
)
@settings(max_examples=150, deadline=None)
def test_typed_preserves_unknown_fields_sorted(unknowns, rnd):
    """Unknown fields survive the typed re-encode verbatim (Java
    UnknownFieldSet semantics) and land sorted by field number,
    regardless of where they appeared in the input."""
    known = [
        tag(1, 0) + varint(1),
        tag(2, 2) + varint(5) + b"topic",
        tag(3, 2) + varint(2) + b"pl",
    ]
    unk_imgs = []
    for no, wire, payload in unknowns:
        if wire == 0:
            unk_imgs.append(tag(no, 0) + varint(len(payload)))
        elif wire == 1:
            unk_imgs.append(tag(no, 1) + payload.ljust(8, b"\0")[:8])
        elif wire == 5:
            unk_imgs.append(tag(no, 5) + payload.ljust(4, b"\0")[:4])
        else:
            unk_imgs.append(tag(no, 2) + varint(len(payload)) + payload)
    pieces = known + unk_imgs
    rnd.shuffle(pieces)
    out = typed_canonicalize(b"".join(pieces), MQTT_RAW_MESSAGE_DESC)
    nums = [f[0] for f in _parse_fields(out)]
    assert nums == sorted(nums)
    # the unknown field numbers all survive
    assert {f[0] for f in _parse_fields(out)} == {1, 2, 3} | {u[0] for u in unknowns}
    # and a different arrival order gives identical canonical bytes
    rnd.shuffle(pieces)
    assert typed_canonicalize(b"".join(pieces), MQTT_RAW_MESSAGE_DESC) == out


@pytest.mark.parametrize(
    "img",
    [
        tag(1, 2) + varint(1) + b"x",  # schemaVersion declared varint, sent len-delim
        tag(2, 0) + varint(3),  # topic declared len-delim, sent varint
        tag(3, 5) + b"\0\0\0\0",  # payload declared len-delim, sent fixed32
    ],
)
def test_typed_wire_mismatch_rejects(img):
    """A declared field arriving with the wrong wire type is a parse
    failure (→ caller's raw-bytes fallback), exactly like a protobuf
    runtime's InvalidProtocolBufferException at Deduplicator.java:86-89."""
    with pytest.raises(ValueError):
        typed_canonicalize(img, MQTT_RAW_MESSAGE_DESC)


def test_typed_nested_occurrences_merge():
    """Two occurrences of a declared nested field concatenate into ONE
    canonical submessage (wire-level message merge), with sub-fields
    sorted — protobuf's split-message merge semantics."""
    sub_a = tag(2, 0) + varint(9)  # sub-field 2 in first chunk
    sub_b = tag(1, 0) + varint(4)  # sub-field 1 in second chunk
    msg = (
        tag(1, 0)
        + varint(1)
        + tag(2, 2)
        + varint(len(sub_a))
        + sub_a
        + tag(2, 2)
        + varint(len(sub_b))
        + sub_b
    )
    out = typed_canonicalize(msg, HFP_DATA_DESC)
    fields = _parse_fields(out)
    topic = [f for f in fields if f[0] == 2]
    assert len(topic) == 1  # merged
    sub = _parse_fields(topic[0][2])
    assert [f[0] for f in sub] == [1, 2]  # sorted sub-fields


def test_typed_repeated_scalar_last_wins():
    msg = tag(1, 0) + varint(1) + tag(1, 0) + varint(2)
    out = typed_canonicalize(msg, MQTT_RAW_MESSAGE_DESC)
    fields = _parse_fields(out)
    assert fields == [(1, 0, varint(2))]
