"""Property tests (hypothesis) for the pure-Python protobuf codec —
the Arrow-UDF decode path (`functions/protobuf_io.decode_message` /
`parse_wire_fields`). Mirrors test_avro_property.py's
truncation/mutation discipline (VERDICT r11 #7): arbitrary typed
messages round-trip; any cut strictly INSIDE the last field loud-fails
with ProtoDecodeError (truncation honesty — protobuf carries no
message length, so a cut AT a field boundary legitimately yields a
shorter message, but a cut inside a field must never silently decode);
arbitrary garbage either decodes or raises ProtoDecodeError — no other
exception class may escape the walk."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.protobuf_io import (
    ProtoDecodeError,
    decode_message,
    decode_varint,
    encode_field,
    encode_message,
    encode_varint,
    encode_zigzag,
    parse_wire_fields,
)

_FS = {
    1: ("i", "int64"),
    2: ("s", "sint64"),
    3: ("t", "string"),
    4: ("d", "double"),
    5: ("f", "float"),
    6: ("b", "bytes"),
    7: ("o", "bool"),
}

_ints = st.integers(-(1 << 63), (1 << 63) - 1)


def _field_st():
    return st.one_of(
        st.tuples(st.just(1), _ints),
        st.tuples(st.just(2), _ints.map(encode_zigzag)),
        st.tuples(st.just(3), st.text(max_size=12)),
        st.tuples(st.just(4), st.floats(allow_nan=True, allow_infinity=True)),
        st.tuples(
            st.just(5),
            st.floats(allow_nan=True, allow_infinity=True, width=32),
            st.just(5),
        ),
        st.tuples(st.just(6), st.binary(max_size=12)),
        st.tuples(st.just(7), st.integers(0, 1)),
        # unknown field numbers across all scalar wire shapes —
        # the forward-compat skip rule must hold for any of them
        st.tuples(st.just(9), _ints),
        st.tuples(st.just(10), st.binary(max_size=6)),
    )


def _expected(fields):
    """Independent model of decode_message: last-wins, unknown
    skipped, typed reinterpretation of the raw scalar."""
    out = {}
    for f in fields:
        num, val = f[0], f[1]
        spec = _FS.get(num)
        if spec is None:
            continue
        name, typ = spec
        if typ == "int64":
            out[name] = val
        elif typ == "sint64":
            # encoded as zigzag by the strategy; decode_message returns
            # the original signed value
            out[name] = (val >> 1) ^ -(val & 1)
        elif typ == "bool":
            out[name] = bool(val)
        elif typ == "double":
            out[name] = struct.unpack("<d", struct.pack("<d", val))[0]
        elif typ == "float":
            out[name] = struct.unpack("<f", struct.pack("<f", val))[0]
        else:
            out[name] = val
    return out


def _values_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return struct.pack("<d", a) == struct.pack("<d", b) or (
            a != a and b != b
        )
    return a == b


@settings(max_examples=200, deadline=None)
@given(st.lists(_field_st(), max_size=8))
def test_message_roundtrip_any_fields(fields):
    got = decode_message(encode_message(list(fields)), _FS)
    exp = _expected(fields)
    assert set(got) == set(exp)
    for k in exp:
        assert _values_eq(got[k], exp[k]), (k, got[k], exp[k])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_field_st(), max_size=4),
    _field_st(),
    st.data(),
)
def test_truncation_inside_last_field_fails_loud(prefix_fields, last, data):
    """Every strict cut inside the LAST field's encoding (including
    mid-tag) must raise ProtoDecodeError — never return a value for a
    field whose bytes are incomplete."""
    head = encode_message(list(prefix_fields))
    tail = encode_field(last[0], last[1], *(last[2:] or []))
    msg = head + tail
    cut = data.draw(st.integers(len(head) + 1, len(msg) - 1)) if len(tail) > 1 else None
    if cut is None:
        return
    with pytest.raises(ProtoDecodeError):
        decode_message(msg[:cut], _FS)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=40))
def test_garbage_decodes_or_raises_proto_error_only(data):
    """The walk's total contract over arbitrary bytes: a dict out, or
    ProtoDecodeError — IndexError/struct.error/OverflowError leaking
    from the byte arithmetic would crash the Arrow batch instead of
    routing the record to the DLQ."""
    try:
        out = decode_message(data, _FS)
    except ProtoDecodeError:
        return
    assert isinstance(out, dict)
    for k in out:
        assert k in {n for n, _ in _FS.values()}


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=40))
def test_parse_wire_fields_consumes_exactly_or_raises(data):
    """Walk accounting: when the schemaless walk succeeds, re-encoding
    each yielded (field, wire_type, raw) must reproduce a stream the
    walk parses identically — i.e. the walk consumed every byte with a
    consistent interpretation (no silent resync after bad bytes)."""
    try:
        fields = list(parse_wire_fields(data))
    except ProtoDecodeError:
        return
    replay = b""
    for num, wt, raw in fields:
        key = encode_varint((num << 3) | wt)
        if wt == 0:
            replay += key + encode_varint(raw)
        elif wt == 1:
            replay += key + int(raw).to_bytes(8, "little")
        elif wt == 5:
            replay += key + int(raw).to_bytes(4, "little")
        else:
            replay += key + encode_varint(len(raw)) + bytes(raw)
    assert list(parse_wire_fields(replay)) == fields


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 64) - 1), st.integers(1, 9))
def test_varint_truncation_always_raises(v, keep):
    enc = encode_varint(v)
    if keep >= len(enc):
        return
    with pytest.raises(ProtoDecodeError):
        decode_varint(enc[:keep], 0)


def test_varint_over_ten_bytes_rejected():
    with pytest.raises(ProtoDecodeError, match="10 bytes"):
        decode_varint(b"\x80" * 10 + b"\x01", 0)
