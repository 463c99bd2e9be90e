"""Property-based tests (hypothesis) for the pure-Python Avro codec —
the one hand-written binary format in the repo, so it gets adversarial
inputs: arbitrary ints across the varint width spectrum, arbitrary
unicode/bytes payloads, arbitrary nullable records, arbitrary block
sizes. Complements the known-byte spec pins in test_avro_io.py."""

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.avro_io import (
    _zigzag_decode,
    _zigzag_encode,
    count_container_records,
    decode_record,
    encode_record,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "d", "type": "double"},
    ],
}

records_st = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | st.text(max_size=50),
        "b": st.booleans(),
        "by": st.binary(max_size=50),
        "d": st.floats(allow_nan=False, allow_infinity=True),
    }
)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip_any_long(n):
    assert _zigzag_decode(io.BytesIO(_zigzag_encode(n))) == n


@given(records_st)
def test_record_roundtrip_any_values(rec):
    out = decode_record(SCHEMA, io.BytesIO(encode_record(SCHEMA, rec)))
    assert out == rec


@settings(max_examples=30, deadline=None)
@given(st.lists(records_st, max_size=25), st.integers(min_value=1, max_value=7))
def test_container_roundtrip_any_batch(recs, block_records):
    bio = io.BytesIO()
    n = write_container(recs, SCHEMA, bio, block_records=block_records)
    assert n == len(recs)
    _, back = read_container(bio.getvalue())
    assert back == recs
    assert count_container_records(bio.getvalue()) == len(recs)
