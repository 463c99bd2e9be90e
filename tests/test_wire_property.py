"""Property test: the codegen wire-frame parser (`wire_frame_audit`)
agrees with an independent pure-Python reference parser on ARBITRARY
byte frames — valid, corrupt, truncated, or random garbage. One Spark
round-trip per hypothesis batch (per-example round-trips are slow)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.wire_format import (
    MAX_MESSAGE_INDEXES,
    encode_wire_frame,
    wire_frame_audit,
)

HANDLERS = {
    1: {"fmt": "json"},
    2: {"fmt": "protobuf", "proto_field_schema": {1: ("a", "int64")}},
}


def _reference_parse(frame: bytes) -> tuple:
    """Independent Python decode of (schema_id, status) for HANDLERS —
    written straight from the Confluent wire spec + the module's
    documented bounded-index rules, sharing no code with the codegen
    path."""
    if len(frame) < 5:
        return None, "truncated"
    sid = struct.unpack(">I", frame[1:5])[0]
    if frame[0] != 0:
        return sid, "bad_magic"
    if sid not in HANDLERS:
        return sid, "unknown_id"
    if HANDLERS[sid]["fmt"] != "protobuf":
        return sid, "ok"
    # protobuf: parse the bounded message-index list at offset 5
    if len(frame) < 6:
        return sid, "truncated"
    b0 = frame[5]
    if b0 == 0:
        idx = [0]
    elif b0 % 2 or b0 >= 0x80 or b0 // 2 > MAX_MESSAGE_INDEXES:
        return sid, "unsupported_index"
    else:
        count = b0 // 2
        if len(frame) < 6 + count:
            return sid, "truncated"
        entries = frame[6 : 6 + count]
        if any(e % 2 or e >= 0x80 for e in entries):
            return sid, "unsupported_index"
        idx = [e // 2 for e in entries]
    declared = HANDLERS[sid].get("message_indexes", [0])
    return sid, ("ok" if idx == declared else "unknown_index")


frame_st = st.one_of(
    # totally arbitrary bytes (any length, incl. < header)
    st.binary(min_size=0, max_size=24),
    # structurally valid-ish frames: known/unknown id × magic × prefix
    st.tuples(
        st.sampled_from([1, 2, 3, 99]),
        st.sampled_from([0x00, 0x01]),
        st.binary(min_size=0, max_size=10),
    ).map(lambda t: bytes([t[1]]) + struct.pack(">I", t[0]) + t[2]),
    # well-formed protobuf frames with random index lists
    st.lists(st.integers(0, 70), min_size=1, max_size=3).map(
        lambda idx: encode_wire_frame(2, b"\x08\x01", message_indexes=idx)
    ),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(frame_st, min_size=1, max_size=60))
def test_audit_matches_reference_parser_on_arbitrary_frames(spark, frames):
    df = spark.createDataFrame(
        list(enumerate(frames)), "row_id long, value binary"
    )
    out = {
        r.row_id: (r.wire_schema_id, r.wire_status)
        for r in wire_frame_audit(df, HANDLERS).collect()
    }
    for i, frame in enumerate(frames):
        ref_sid, ref_status = _reference_parse(frame)
        got_sid, got_status = out[i]
        assert got_status == ref_status, (frame.hex(), got_status, ref_status)
        assert got_sid == ref_sid, (frame.hex(), got_sid, ref_sid)


# ---------------------------------------------------------------------------
# VERDICT r8 #7 — jar-path twin vs codegen decoder on MUTATED frames.
#
# `attach_codegen_decode` (the 100% JVM expression decoder used when no
# spark-protobuf jar is present) and `decode_message` (the pure-Python
# codec that mirrors what the jar path produces) were aligned on
# truncated bodies, negative varints and wrong wire types in r7/r8 —
# but only example-tested. This section property-tests the contract
# over hundreds of mutated frames: valid protobuf messages put through
# truncation, bit flips, byte insertion, oversized length declarations
# and appended garbage.
#
# The referee is `_codegen_walk_model`, a pure-Python rendition of the
# DOCUMENTED bounded-walk rules (attach_codegen_decode's docstring +
# _codegen_step's starve conditions), sharing no code with either
# decoder. Assertions, per frame:
#   1. codegen output == model output, field by field (strong check);
#   2. where BOTH paths are fully defined (decode_message succeeds and
#      the frame is inside the codegen envelope: 1-byte tags, <=2-byte
#      length varints, schema-used wire types, <= n_steps fields), the
#      codegen output equals decode_message's — the literal jar-twin
#      agreement VERDICT r8 #7 asks for.
# Invalid-UTF-8 string slices are excluded from value comparison only
# (Java and Python differ in U+FFFD replacement granularity — a
# representation detail, not a decode outcome).

from pyspark.sql.types import (  # noqa: E402
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_sink_azure_kusto_spark.functions.protobuf_io import (  # noqa: E402
    ProtoDecodeError,
    _to_signed64,
    attach_codegen_decode,
    decode_message,
    decode_zigzag,
    encode_message,
    encode_zigzag,
)

_FS = {
    1: ("i", "int64"),
    2: ("s", "sint64"),
    3: ("t", "string"),
    4: ("d", "double"),
    5: ("f", "float"),
    6: ("bb", "bytes"),
    7: ("g", "bool"),
}
_SCHEMA = StructType(
    [
        StructField("i", LongType()),
        StructField("s", LongType()),
        StructField("t", StringType()),
        StructField("d", DoubleType()),
        StructField("f", FloatType()),
        StructField("bb", BinaryType()),
        StructField("g", BooleanType()),
    ]
)
_N_STEPS = len(_FS) + 2  # attach_codegen_decode's default
_WT_OF = {"int64": 0, "sint64": 0, "bool": 0, "string": 2, "bytes": 2,
          "double": 1, "float": 5}
_MASK64 = (1 << 64) - 1

#: sentinel for "field present but value comparison skipped"
_SKIP = object()


def _codegen_walk_model(frame: bytes, fs: dict, n_steps: int):
    """→ (records, complete): the bounded-walk record list
    [(fld, wt, value-or-None), ...] and whether the walk consumed the
    whole frame without starving or running out of steps. Written
    straight from the documented starve rules, no shared decode code."""
    records = []
    pos, n = 0, len(frame)
    complete = True
    for _ in range(n_steps):
        if pos >= n:
            return records, complete
        tag = frame[pos]
        if tag >= 0x80:  # multi-byte tag starves the walk
            return records, False
        fld, wt = tag >> 3, tag & 7
        if wt == 0:
            val, ln = 0, None
            for i in range(10):
                if pos + 1 + i >= n:
                    break
                b = frame[pos + 1 + i]
                val |= (b & 0x7F) << (7 * i)
                if not b & 0x80:
                    ln = i + 1
                    break
            if ln is None:  # truncated or >10-byte varint
                return records, False
            records.append((fld, 0, val & _MASK64))
            pos += 1 + ln
        elif wt == 1:
            if pos + 9 > n:  # truncated fixed64: NULL-value record, starve
                records.append((fld, 1, None))
                return records, False
            records.append((fld, 1, int.from_bytes(frame[pos + 1:pos + 9], "little")))
            pos += 9
        elif wt == 5:
            if pos + 5 > n:
                records.append((fld, 5, None))
                return records, False
            records.append((fld, 5, int.from_bytes(frame[pos + 1:pos + 5], "little")))
            pos += 5
        elif wt == 2:
            if pos + 1 >= n:
                return records, False
            b1 = frame[pos + 1]
            if b1 < 0x80:
                dlen, ds = b1, pos + 2
            elif pos + 2 < n and frame[pos + 2] < 0x80:
                dlen, ds = (b1 & 0x7F) | (frame[pos + 2] << 7), pos + 3
            else:  # >2-byte length varint or truncated length
                return records, False
            if ds + dlen > n:  # over-length slice starves (never a prefix)
                return records, False
            records.append((fld, 2, frame[ds:ds + dlen]))
            pos = ds + dlen
        else:  # deprecated group / schema-unused wire type
            return records, False
    return records, pos >= n


def _model_fields(frame: bytes, fs: dict, n_steps: int) -> dict:
    """Predicted struct values: last record with matching (field, wire
    type) and a non-NULL value wins (coalesce over reversed steps)."""
    records, _ = _codegen_walk_model(frame, fs, n_steps)
    out = {}
    for num, (name, typ) in fs.items():
        want = _WT_OF[typ]
        out[name] = None
        for fld, wt, val in reversed(records):
            if fld != num or wt != want or val is None:
                continue
            if typ == "int64":
                out[name] = _to_signed64(val)
            elif typ == "sint64":
                out[name] = decode_zigzag(val)
            elif typ == "bool":
                out[name] = val != 0
            elif typ == "string":
                try:
                    out[name] = val.decode("utf-8")
                except UnicodeDecodeError:
                    out[name] = _SKIP
            elif typ == "bytes":
                out[name] = bytes(val)
            elif typ == "double":
                out[name] = struct.unpack("<d", val.to_bytes(8, "little"))[0]
            else:  # float
                out[name] = struct.unpack("<f", val.to_bytes(4, "little"))[0]
            break
    return out


def _values_equal(typ: str, got, exp) -> bool:
    if exp is _SKIP:
        return got is not None  # representation-detail exclusion
    if got is None or exp is None:
        return got is None and exp is None
    if typ == "double":
        return struct.pack("<d", got) == struct.pack("<d", exp) or (
            got != got and exp != exp
        )
    if typ == "float":
        return struct.pack("<f", got) == struct.pack("<f", exp) or (
            got != got and exp != exp
        )
    if typ == "bytes":
        return bytes(got) == bytes(exp)
    return got == exp


def _valid_field_st():
    import math

    ints = st.integers(-(1 << 63), (1 << 63) - 1)
    return st.one_of(
        st.tuples(st.just(1), ints),
        st.tuples(st.just(2), ints.map(encode_zigzag)),
        st.tuples(st.just(3), st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=8)),
        st.tuples(st.just(4), st.floats(allow_nan=True, allow_infinity=True)),
        st.tuples(st.just(5), st.floats(allow_nan=True, allow_infinity=True, width=32), st.just(5)),
        st.tuples(st.just(6), st.binary(max_size=8)),
        st.tuples(st.just(7), st.integers(0, 3)),
        # unknown interleaved fields (forward-compat skip rule)
        st.tuples(st.integers(8, 15), ints),
    )


@st.composite
def _mutated_frame_st(draw):
    fields = draw(st.lists(_valid_field_st(), min_size=0, max_size=6))
    frame = encode_message(list(fields))
    op = draw(st.integers(0, 5))
    if op == 1 and frame:  # truncate
        frame = frame[: draw(st.integers(0, len(frame) - 1))]
    elif op == 2 and frame:  # bit flip (tags, lengths, payload bytes)
        i = draw(st.integers(0, len(frame) - 1))
        frame = frame[:i] + bytes([frame[i] ^ (1 << draw(st.integers(0, 7)))]) + frame[i + 1:]
    elif op == 3 and frame:  # oversize a byte (length/garbage inflation)
        i = draw(st.integers(0, len(frame) - 1))
        frame = frame[:i] + bytes([min(0xFF, frame[i] + draw(st.integers(1, 200)))]) + frame[i + 1:]
    elif op == 4:  # insert a random byte
        i = draw(st.integers(0, len(frame)))
        frame = frame[:i] + bytes([draw(st.integers(0, 255))]) + frame[i:]
    elif op == 5:  # append garbage
        frame = frame + draw(st.binary(min_size=1, max_size=6))
    return frame


@settings(max_examples=10, deadline=None)
@given(st.lists(_mutated_frame_st(), min_size=55, max_size=80))
def test_codegen_decode_matches_jar_twin_on_mutated_frames(spark, frames):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        list(enumerate(frames)), "row_id long, value binary"
    )
    out = {
        r.row_id: r.payload
        for r in attach_codegen_decode(
            df, F.col("value"), _FS, _SCHEMA, n_steps=_N_STEPS
        ).select("row_id", "payload").collect()
    }
    for i, frame in enumerate(frames):
        got = out[i]
        expected = _model_fields(frame, _FS, _N_STEPS)
        # 1. codegen == documented-walk model, every field
        for num, (name, typ) in _FS.items():
            assert _values_equal(typ, got[name], expected[name]), (
                frame.hex(), name, got[name], expected[name]
            )
        # 2. direct jar-twin agreement where both paths fully defined
        _, complete = _codegen_walk_model(frame, _FS, _N_STEPS)
        if not complete:
            continue
        try:
            ref = decode_message(frame, _FS)
        except ProtoDecodeError:
            continue  # outside decode_message's stricter contract
        for num, (name, typ) in _FS.items():
            exp = ref.get(name)
            if typ == "string" and expected[name] is _SKIP:
                continue
            assert _values_equal(typ, got[name], exp), (
                frame.hex(), name, got[name], exp
            )
