"""Property-based tests (hypothesis) for the pure-Python PNG codec
(functions/codecs.py) — the same no-silent-equality discipline as the
Avro/snappy/GIF/protobuf suites (VERDICT r12 next-round #7):

- arbitrary geometry × color type × filter cycling × stored/zlib
  deflate × Adam7 round-trips pixel-exact;
- ANY truncation loud-rejects;
- ANY single-byte mutation loud-rejects — PNG carries per-chunk CRCs,
  so unlike GIF the contract is strictly "always loud", never
  "decodes differently".
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.codecs import (
    MediaDecodeError,
    decode_png,
    encode_png,
    encode_png_gray,
)


def _rgb(seed: int, w: int, h: int) -> list[int]:
    return [int(x) for x in
            np.random.RandomState(seed).randint(0, 256, 3 * w * h)]


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 11),
    h=st.integers(1, 9),
    seed=st.integers(0, 10_000),
    level=st.sampled_from([0, 6]),
    interlace=st.booleans(),
    with_alpha=st.booleans(),
)
def test_png_rgb_roundtrip_property(w, h, seed, level, interlace, with_alpha):
    rgb = _rgb(seed, w, h)
    alpha = (
        [int(x) for x in np.random.RandomState(seed + 1).randint(0, 256, w * h)]
        if with_alpha else None
    )
    blob = encode_png(w, h, rgb, alpha=alpha, level=level, interlace=interlace)
    m = decode_png(blob)
    assert (m.media_type, m.width, m.height) == ("png", w, h)
    # alpha strips; RGB samples survive exactly for both color types
    assert m.samples.tolist() == rgb


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    seed=st.integers(0, 10_000),
    level=st.sampled_from([0, 6]),
    interlace=st.booleans(),
    with_alpha=st.booleans(),
)
def test_png_gray_roundtrip_property(w, h, seed, level, interlace, with_alpha):
    gray = [int(x) for x in np.random.RandomState(seed).randint(0, 256, w * h)]
    alpha = (
        [int(x) for x in np.random.RandomState(seed + 1).randint(0, 256, w * h)]
        if with_alpha else None
    )
    blob = encode_png_gray(
        w, h, gray, alpha=alpha, level=level, interlace=interlace
    )
    m = decode_png(blob)
    assert (m.width, m.height) == (w, h)
    # gray replicates ×3 (operators keep the 3-channel contract)
    assert m.samples.reshape(h, w, 3).tolist() == [
        [[g, g, g] for g in row]
        for row in np.asarray(gray).reshape(h, w).tolist()
    ]


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(1, 10_000),
    seed=st.integers(0, 1000),
    interlace=st.booleans(),
    level=st.sampled_from([0, 6]),
)
def test_png_truncation_always_loud(cut, seed, interlace, level):
    blob = encode_png(
        7, 5, _rgb(seed, 7, 5), level=level, interlace=interlace
    )
    cut = cut % (len(blob) - 1) + 1  # 1 .. len-1
    with pytest.raises(MediaDecodeError):
        decode_png(blob[:cut])


@settings(max_examples=80, deadline=None)
@given(
    off=st.integers(0, 10_000),
    xor=st.integers(1, 255),
    seed=st.integers(0, 1000),
    interlace=st.booleans(),
    level=st.sampled_from([0, 6]),
)
def test_png_mutation_always_loud(off, xor, seed, interlace, level):
    """Per-chunk CRCs make every single-byte corruption detectable:
    signature bytes fail the magic check, length bytes break chunk
    framing, body/CRC bytes fail the CRC compare. Silent tolerance of
    any of them would mean a verification gap."""
    blob = bytearray(
        encode_png(6, 6, _rgb(seed, 6, 6), level=level, interlace=interlace)
    )
    off = off % len(blob)
    blob[off] ^= xor
    with pytest.raises(MediaDecodeError):
        decode_png(bytes(blob))
