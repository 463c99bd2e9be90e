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
