"""GIF codec tests: roundtrips across frame counts / interlace / local
palettes, LZW table-reset coverage, loud rejection of malformed
streams, and a no-silent-corruption mutation property (GIF carries no
checksum, so a mutated stream must either loud-reject or decode to
DIFFERENT pixels — never quietly equal)."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_sink_azure_kusto_spark.functions.codecs import (
    MediaDecodeError,
    decode_media_bytes,
)
from kafka_sink_azure_kusto_spark.functions.gif import (
    _interlace_order,
    decode_gif,
    encode_gif,
)

PAL = np.stack(
    [
        np.arange(256, dtype=np.int64),
        (np.arange(256) * 3 + 1) % 256,
        (np.arange(256) * 7 + 5) % 256,
    ],
    axis=1,
)


def _expect(frames):
    return np.concatenate([PAL[f] for f in frames]).reshape(-1)


@pytest.mark.parametrize("nf,w,h", [(1, 5, 4), (2, 11, 7), (3, 13, 9)])
def test_roundtrip_frames(nf, w, h):
    rng = np.random.RandomState(nf * 100 + w)
    frames = [rng.randint(0, 256, w * h) for _ in range(nf)]
    m = decode_gif(encode_gif(w, h, frames, PAL))
    assert (m.media_type, m.width, m.height, m.n_frames) == ("gif", w, h, nf)
    assert np.array_equal(m.samples, _expect(frames))


def test_interlace_roundtrip_all_heights():
    """Every height 1..17 exercises a different pass-boundary split of
    the 4-pass interlace."""
    rng = np.random.RandomState(3)
    for h in range(1, 18):
        w = 6
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))
        f = rng.randint(0, 256, w * h)
        m = decode_gif(encode_gif(w, h, [f], PAL, interlaced_frames={0}))
        assert np.array_equal(m.samples, _expect([f])), f"h={h}"


def test_local_palette_priority():
    """local_palette=True ships a scrambled GLOBAL table; a decoder that
    ignores the local table decodes wrong colors."""
    rng = np.random.RandomState(7)
    f = rng.randint(1, 255, 8 * 6)  # avoid palindromic 0/255 entries
    m = decode_gif(encode_gif(8, 6, [f], PAL, local_palette=True))
    assert np.array_equal(m.samples, _expect([f]))


def test_lzw_table_reset():
    """120×90 random indices force >4096 LZW codes → CLEAR + restart."""
    rng = np.random.RandomState(11)
    f = rng.randint(0, 256, 120 * 90)
    m = decode_gif(encode_gif(120, 90, [f], PAL))
    assert np.array_equal(m.samples, _expect([f]))


def test_dispatch_magic():
    f = np.arange(20) % 256
    m = decode_media_bytes(encode_gif(5, 4, [f], PAL))
    assert m.media_type == "gif"


def test_animated_sets_n_frames_and_order():
    frames = [np.full(12, 1), np.full(12, 2), np.full(12, 3)]
    m = decode_gif(encode_gif(4, 3, frames, PAL))
    assert m.n_frames == 3
    per = m.samples.reshape(3, -1, 3)
    for i, f in enumerate(frames):
        assert np.array_equal(per[i], PAL[f])


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:5],  # header truncation
        lambda b: b[:-1],  # trailer gone
        lambda b: b"PNG" + b[3:],  # wrong magic
        lambda b: b[: len(b) // 2],  # mid-stream truncation
    ],
)
def test_malformed_loud_reject(mutate):
    f = np.random.RandomState(1).randint(0, 256, 9 * 9)
    blob = encode_gif(9, 9, [f], PAL)
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(mutate(bytearray(blob))))


def test_mutation_never_silently_equal():
    """GIF has no content checksum, so the contract is: a single-byte
    mutation inside the LZW data either loud-rejects or decodes to
    different pixels. Silent equality would mean the decoder ignores
    payload bytes."""
    rng = np.random.RandomState(23)
    f = rng.randint(0, 256, 16 * 12)
    blob = bytearray(encode_gif(16, 12, [f], PAL))
    expect = _expect([f])
    # mutate bytes inside the image data region (skip 13B header +
    # 768B global table + 10B descriptor/min-code-size)
    start = 13 + 768 + 10
    hits = 0
    for off in range(start, min(len(blob) - 1, start + 60)):
        mutated = bytearray(blob)
        mutated[off] ^= 0x5A
        try:
            m = decode_gif(bytes(mutated))
        except MediaDecodeError:
            hits += 1
            continue
        assert not np.array_equal(m.samples, expect) or mutated == blob
        hits += 1
    assert hits > 0


# ------------------------------------------------------ property suite

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    idx=st.lists(st.integers(0, 255), min_size=1, max_size=2000),
    mcs=st.integers(2, 8),
)
def test_lzw_roundtrip_property(idx, mcs):
    """LZW encode→decode is identity for arbitrary symbol streams at
    every min-code-size, across the code-size-growth and (for long
    random streams) full-table-reset regimes. Symbols are clamped to
    the alphabet implied by mcs."""
    import numpy as np

    from kafka_sink_azure_kusto_spark.functions.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    syms = np.asarray(idx, dtype=np.int64) % (1 << mcs)
    enc = _lzw_encode(syms, mcs)
    out = _lzw_decode(enc, mcs, len(syms))
    assert np.array_equal(out, syms)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    nf=st.integers(1, 4),
    interlace_mask=st.integers(0, 15),
    local=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_container_roundtrip_property(w, h, nf, interlace_mask, local, seed):
    """Arbitrary geometry × frame count × interlace subset × palette
    placement round-trips exactly through the full container."""
    import numpy as np

    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, w * h) for _ in range(nf)]
    blob = encode_gif(
        w, h, frames, PAL,
        local_palette=local,
        interlaced_frames={f for f in range(nf) if interlace_mask >> f & 1},
    )
    m = decode_gif(blob)
    assert (m.width, m.height, m.n_frames) == (w, h, nf)
    assert np.array_equal(m.samples, _expect(frames))


@settings(max_examples=40, deadline=None)
@given(
    cut=st.integers(1, 400),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_truncation_always_loud(cut, seed):
    """EVERY prefix truncation of a valid stream loud-rejects — no
    prefix parses as a complete GIF (the trailer byte is load-bearing,
    and sub-block/LZW walks check their bounds)."""
    import numpy as np
    import pytest as _pytest

    rng = np.random.RandomState(seed)
    f = rng.randint(0, 256, 10 * 8)
    blob = encode_gif(10, 8, [f], PAL)
    prefix = blob[: len(blob) - 1 - (cut % (len(blob) - 1))]
    with _pytest.raises(MediaDecodeError):
        decode_gif(prefix)
