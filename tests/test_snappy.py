"""Unit + property tests for the pure-Python snappy raw-block codec.

Golden hand-assembled streams pin the DECODER to the public format
description independent of the compressor, so the round-trip property
can't pass via mirrored bugs."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.snappy_io import (
    SnappyError,
    snappy_compress,
    snappy_decompress,
)


# ---------------------------------------------------------------- golden


def test_golden_literal_only():
    # preamble varint 5, literal tag (5-1)<<2 = 16, body
    assert snappy_decompress(bytes([5, 16]) + b"hello") == b"hello"


def test_golden_all_three_copy_forms():
    # "ab" literal, then:
    #   1-byte-offset copy  (tag&3==1): len 4, offset 2  -> +"abab"
    #   2-byte-offset copy  (tag&3==2): len 4, offset 6  -> +"abab"
    #   4-byte-offset copy  (tag&3==3): len 2, offset 10 -> +"ab"
    stream = bytes(
        [12]                       # uncompressed length 12
        + [(2 - 1) << 2] + list(b"ab")
        + [1 | ((4 - 4) << 2) | ((2 >> 8) << 5), 2 & 0xFF]
        + [2 | ((4 - 1) << 2)] + list((6).to_bytes(2, "little"))
        + [3 | ((2 - 1) << 2)] + list((10).to_bytes(4, "little"))
    )
    assert snappy_decompress(stream) == b"ababababab" + b"ab"


def test_golden_overlapping_copy_repeats_pattern():
    # literal "a", copy len 8 offset 1 => "a" * 9
    stream = bytes([9, 0]) + b"a" + bytes([2 | ((8 - 1) << 2)]) + (1).to_bytes(2, "little")
    assert snappy_decompress(stream) == b"a" * 9


def test_golden_multibyte_literal_lengths():
    body = bytes(range(256)) * 2  # 512 bytes: needs the 2-byte length form
    stream = bytes([0x80 | (512 & 0x7F), 512 >> 7])  # varint 512
    stream += bytes([61 << 2]) + (511).to_bytes(2, "little") + body
    assert snappy_decompress(stream) == body


def test_loud_rejects():
    with pytest.raises(SnappyError, match="preamble"):
        snappy_decompress(b"")
    with pytest.raises(SnappyError, match="literal body"):
        snappy_decompress(bytes([5, 16]) + b"hel")  # declares 5, holds 3
    with pytest.raises(SnappyError, match="offset"):
        # copy reaching before output start
        snappy_decompress(bytes([4, 0]) + b"a" + bytes([2 | ((3 - 1) << 2)]) + (9).to_bytes(2, "little"))
    with pytest.raises(SnappyError, match="!= declared"):
        snappy_decompress(bytes([9, 16]) + b"hello")  # 5 real vs 9 declared
    with pytest.raises(SnappyError, match="truncated 2-byte-offset"):
        snappy_decompress(bytes([4, 0]) + b"a" + bytes([2 | ((3 - 1) << 2), 1]))


# -------------------------------------------------------------- property


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_arbitrary_bytes(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=1, max_size=64),
    st.integers(min_value=2, max_value=2000),
)
def test_roundtrip_repetitive_compresses(unit, reps):
    data = unit * reps
    c = snappy_compress(data)
    assert snappy_decompress(c) == data
    if len(data) >= 256:
        assert len(c) < len(data)  # matches must actually fire


@settings(max_examples=150, deadline=None)
@given(
    st.binary(max_size=512),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_mutation_never_silent_or_hangs(data, pos, xor):
    c = bytearray(snappy_compress(data))
    c[pos % len(c)] ^= xor
    try:
        out = snappy_decompress(bytes(c))
    except SnappyError:
        return  # loud reject — the contract
    # a surviving mutation must still be a structurally valid stream
    assert isinstance(out, bytes)
