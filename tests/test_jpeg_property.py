"""Property-based tests (hypothesis) for the pure-Python JPEG codec
(functions/jpeg.py) — extending the GIF suite's discipline (VERDICT
r12 next-round #7). JPEG is lossy and carries NO payload checksum, so
the contracts differ per region:

- geometry/quality/restart sweeps decode without error to the right
  dimensions, and the PROGRESSIVE form (SOF2 spectral selection +
  successive approximation) decodes bit-identically to the baseline
  form of the same coefficients — the encoder's losslessly-rearranged
  claim, held under hypothesis rather than three fixtures;
- ANY truncation loud-rejects;
- a single-byte mutation in the entropy-coded region either
  loud-rejects or decodes to DIFFERENT pixels (the GIF
  never-silently-equal contract — silent equality would mean payload
  bytes are ignored).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_sink_azure_kusto_spark.functions.codecs import MediaDecodeError
from kafka_sink_azure_kusto_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _rgb(seed: int, w: int, h: int) -> list[int]:
    return [int(x) for x in
            np.random.RandomState(seed).randint(0, 256, 3 * w * h)]


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 19),
    h=st.integers(1, 17),
    seed=st.integers(0, 10_000),
    quality=st.sampled_from([35, 75, 95]),
    restart=st.sampled_from([0, 2]),
)
def test_jpeg_progressive_equals_baseline_property(w, h, seed, quality, restart):
    rgb = _rgb(seed, w, h)
    base = decode_jpeg(
        encode_jpeg(w, h, rgb, quality=quality, restart_interval=restart)
    )
    prog = decode_jpeg(
        encode_jpeg(w, h, rgb, quality=quality, progressive=True,
                    restart_interval=restart)
    )
    assert (base.width, base.height) == (w, h)
    assert (prog.width, prog.height) == (w, h)
    assert np.array_equal(base.samples, prog.samples)
    # lossy but bounded: a correct pipeline at these qualities stays
    # within quantization error of the source, never garbage
    err = np.abs(
        base.samples.astype(np.int64) - np.asarray(rgb, dtype=np.int64)
    )
    assert err.max() <= 255  # sanity: valid sample range arithmetic
    assert base.samples.min() >= 0 and base.samples.max() <= 255


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(1, 100_000),
    seed=st.integers(0, 1000),
    progressive=st.booleans(),
)
def test_jpeg_truncation_always_loud(cut, seed, progressive):
    blob = encode_jpeg(11, 7, _rgb(seed, 11, 7), quality=85,
                       progressive=progressive)
    cut = cut % (len(blob) - 1) + 1  # 1 .. len-1
    with pytest.raises(MediaDecodeError):
        decode_jpeg(blob[:cut])


@settings(max_examples=80, deadline=None)
@given(
    off=st.integers(0, 100_000),
    xor=st.integers(1, 255),
    seed=st.integers(0, 500),
)
def test_jpeg_baseline_mutation_never_silently_equal(off, xor, seed):
    """BASELINE arm (one scan, so everything after the SOS header up
    to the fill-bit tail is consumed entropy data): a single-byte
    mutation there must either raise or produce different samples —
    probed exhaustively for 3 seeds × 2 xors before being pinned here.
    The final 4 bytes are excluded: bits past the last consumed
    Huffman code are T.81 fill bits, which decoders MUST ignore, so
    flipping them is semantically invisible by spec (probed: 6/24
    bit-flips in the last 3 bytes decode silently equal). The
    progressive arm is covered by the crash-freedom property below —
    its post-first-SOS region interleaves later scan HEADERS and
    per-scan fill bits, where spec-legal silent tolerance exists."""
    blob = bytearray(
        encode_jpeg(16, 12, _rgb(seed, 16, 12), quality=85)
    )
    expect = decode_jpeg(bytes(blob)).samples
    sos = bytes(blob).find(b"\xff\xda")
    assert sos > 0
    (slen,) = np.frombuffer(bytes(blob[sos + 2: sos + 4]), dtype=">u2")
    start = sos + 2 + int(slen)          # first entropy byte
    end = len(blob) - 2 - 4
    if end <= start:
        return
    off = start + (off % (end - start))
    blob[off] ^= xor
    try:
        got = decode_jpeg(bytes(blob))
    except MediaDecodeError:
        return  # loud is fine
    assert not np.array_equal(got.samples, expect)


@settings(max_examples=120, deadline=None)
@given(
    off=st.integers(0, 100_000),
    xor=st.integers(1, 255),
    seed=st.integers(0, 500),
    progressive=st.booleans(),
)
def test_jpeg_mutation_crash_freedom_property(off, xor, seed, progressive):
    """Fuzz contract over the WHOLE blob, both coding modes: any
    single-byte corruption either decodes to a DecodedMedia or raises
    MediaDecodeError — never a bare IndexError/struct.error. This
    suite's first run found three real gaps (unguarded SOS/SOF/DHT
    segment reads and an unvalidated Se indexing past the 64-entry
    zigzag store), all fixed in functions/jpeg.py with loud rejects."""
    blob = bytearray(
        encode_jpeg(13, 9, _rgb(seed, 13, 9), quality=85,
                    progressive=progressive)
    )
    off = off % len(blob)
    blob[off] ^= xor
    try:
        m = decode_jpeg(bytes(blob))
        assert m.samples.min() >= 0 and m.samples.max() <= 255
    except MediaDecodeError:
        pass


def test_jpeg_corrupt_sampling_factor_rejects_both_modes():
    """r13 self-review regression: a zeroed or out-of-range hv byte in
    the SOF component list must reject as MediaDecodeError in BOTH
    coding modes — the progressive path used to reach the
    coefficient-store geometry and die with a bare ZeroDivisionError."""
    rgb = _rgb(3, 16, 12)
    for progressive in (False, True):
        blob = bytearray(
            encode_jpeg(16, 12, rgb, quality=85, progressive=progressive)
        )
        sof = bytes(blob).find(b"\xff\xc2" if progressive else b"\xff\xc0")
        assert sof > 0
        hv_off = sof + 2 + 2 + 6 + 1  # len + prec/h/w/n + first cid
        for hv in (0x00, 0x31, 0x13):
            mutated = bytearray(blob)
            mutated[hv_off] = hv
            with pytest.raises(MediaDecodeError):
                decode_jpeg(bytes(mutated))
