"""Baseline JPEG codec tests.

JPEG is lossy, so the strategy differs from the exact-roundtrip codecs:
golden hand-assembled streams pin the DECODER against independent
arithmetic (a naive O(N^4) IDCT written here, not the module's matrix),
encode->decode round trips bound pixel error on smooth images, and the
unsupported-shape rejects are exercised explicitly."""

import math
import struct

import numpy as np
import pytest

from kafka_sink_azure_kusto_spark.functions.codecs import (
    MediaDecodeError,
    decode_media_bytes,
)
from kafka_sink_azure_kusto_spark.functions.jpeg import (
    _AC_LUMA,
    _DC_LUMA,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _gray_jpeg(qtable, scan_bits):
    """Minimal 8x8 single-component baseline JPEG with the standard
    luma Huffman tables and the given natural-order quant table."""
    dqt = _seg(0xDB, bytes([0]) + bytes(int(qtable[z]) for z in _ZIGZAG))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
           + _seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1])))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # pack scan_bits (string of 0/1) into bytes, pad with 1s
    bits = scan_bits + "1" * ((8 - len(scan_bits) % 8) % 8)
    scan = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def _naive_idct(F):
    """Independent O(N^4) loop IDCT straight from the T.81 formula."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * F[u, v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            out[x, y] = s / 4.0
    return out


def test_golden_dc_only_block():
    # quant table all 16; scan: DC cat3 (code 100) value +4 (bits 100),
    # then EOB (code 1010). DC coeff 4 * 16 = 64 -> flat 64/8 = 8,
    # +128 level shift = 136 everywhere; grayscale replicates x3.
    qt = np.full(64, 16, dtype=np.int64)
    data = _gray_jpeg(qt, "100" + "100" + "1010")
    m = decode_jpeg(data)
    assert (m.media_type, m.width, m.height) == ("jpeg", 8, 8)
    assert set(m.samples.tolist()) == {136}


def test_golden_single_ac_matches_naive_idct():
    # DC 0 (cat 0, code 00), then one AC at zigzag index 1 (natural
    # (0,1)): run 0, size 2, value +2 -> RS 0x02 (luma AC code '01'),
    # bits '10'. Then EOB.
    qt = np.full(64, 16, dtype=np.int64)
    data = _gray_jpeg(qt, "00" + "01" + "10" + "1010")
    m = decode_jpeg(data)
    F = np.zeros((8, 8))
    F[0, 1] = 2 * 16  # dequantized
    expect = np.clip(np.round(_naive_idct(F) + 128.0), 0, 255).astype(np.int64)
    got = m.samples.reshape(8, 8, 3)[:, :, 0]
    assert np.array_equal(got, expect)


def test_roundtrip_smooth_image_small_error():
    for w, h in [(8, 8), (16, 8), (13, 11), (32, 24), (1, 1), (7, 3)]:
        x = np.arange(w, dtype=np.float64)
        y = np.arange(h, dtype=np.float64)
        # smooth, no wraparound edges
        r = 60 + 40 * np.sin(y[:, None] / 9.0) + 30 * np.cos(x[None, :] / 7.0)
        g = 120 + 50 * np.cos((x[None, :] + y[:, None]) / 11.0)
        b = 90 + 20 * np.sin(x[None, :] / 5.0) + 0 * y[:, None]
        rgb = np.clip(np.round(np.stack(
            [r, g, np.broadcast_to(b, (h, w))], axis=2)), 0, 255
        ).astype(np.int64).reshape(-1)
        m = decode_jpeg(encode_jpeg(w, h, rgb, quality=95))
        assert (m.width, m.height) == (w, h)
        err = np.abs(m.samples - rgb)
        assert err.max() <= 12, (w, h, err.max())
        assert err.mean() <= 3.0, (w, h, err.mean())


def test_quality_knob_monotone_size():
    w, h = 24, 16
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, 3 * w * h)
    sizes = [len(encode_jpeg(w, h, rgb, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    # decode works at every quality
    for q in (10, 50, 90):
        m = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
        assert m.samples.size == 3 * w * h


def test_dispatch_and_determinism():
    rgb = list(range(192))
    data = encode_jpeg(8, 8, rgb, quality=80)
    assert decode_media_bytes(data).media_type == "jpeg"
    assert encode_jpeg(8, 8, rgb, quality=80) == data  # byte-deterministic


def test_loud_rejects():
    good = encode_jpeg(8, 8, [128] * 192)
    with pytest.raises(MediaDecodeError, match="not a JPEG"):
        decode_jpeg(b"\x00\x00" + good)
    with pytest.raises(MediaDecodeError, match="truncated|marker|Huffman"):
        decode_jpeg(good[:40])
    # lossless SOF3 rejects by marker, before any entropy work
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC3
    with pytest.raises(MediaDecodeError, match="unsupported JPEG SOF"):
        decode_jpeg(bytes(prog))
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single scan claims DC with Se=63) — loud reject, not garbage
    prog[i + 1] = 0xC2
    with pytest.raises(MediaDecodeError, match="progressive DC scan"):
        decode_jpeg(bytes(prog))
    # 16-bit DQT rejects
    qt16 = bytearray(good)
    j = qt16.find(b"\xff\xdb")
    qt16[j + 4] = 0x10  # pq=1
    with pytest.raises(MediaDecodeError, match="16-bit"):
        decode_jpeg(bytes(qt16))


def test_quality_tables_formula():
    ql50, qc50 = quality_tables(50)
    assert ql50[0] == 16 and qc50[0] == 17  # scale 100 => identity
    ql100, _ = quality_tables(100)
    assert ql100.max() == 1  # scale 0 clamps to all-ones
    ql10, _ = quality_tables(10)
    assert ql10[0] == (16 * 500 + 50) // 100


def test_golden_nonuniform_qt_dequant_order():
    """Regression: dequantization must pair the ZIGZAG-ordered
    coefficient stream with the NATURAL-ordered quant table (a uniform
    table hides the mismatch — this one puts 16 at natural (0,1) and 99
    at the corresponding zigzag slot's wrong pairing)."""
    qt = np.full(64, 99, dtype=np.int64)
    qt[1] = 16  # natural (0,1) — zigzag index 1
    # DC 0, one AC at zigzag index 1 = natural (0,1), value +2, EOB
    data = _gray_jpeg(qt, "00" + "01" + "10" + "1010")
    m = decode_jpeg(data)
    F = np.zeros((8, 8))
    F[0, 1] = 2 * 16  # must use qt[natural (0,1)] = 16, not 99
    expect = np.clip(np.round(_naive_idct(F) + 128.0), 0, 255).astype(np.int64)
    assert np.array_equal(m.samples.reshape(8, 8, 3)[:, :, 0], expect)


def test_golden_420_subsampled_mcu():
    """Hand-assembled 4:2:0 stream (Y 2x2, Cb/Cr 1x1, one 16x16 MCU,
    DC-only blocks): exercises the multi-block MCU walk, per-component
    DC predictors, chroma table selection, and 2x2 upsampling."""
    from kafka_sink_azure_kusto_spark.functions.jpeg import (
        _AC_CHROMA,
        _DC_CHROMA,
    )

    qt = np.full(64, 16, dtype=np.int64)
    dqt = (_seg(0xDB, bytes([0]) + bytes(int(qt[z]) for z in _ZIGZAG))
           + _seg(0xDB, bytes([1]) + bytes(int(qt[z]) for z in _ZIGZAG)))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
           + _seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1]))
           + _seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA[0]) + bytes(_DC_CHROMA[1]))
           + _seg(0xC4, bytes([0x11]) + bytes(_AC_CHROMA[0]) + bytes(_AC_CHROMA[1])))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    # Y DC diffs +2 +2 -4 +2 (running DCs 2,4,0,2); Cb +4; Cr -4
    bits = ("011" "10" "1010"      # Y1
            "011" "10" "1010"      # Y2
            "100" "011" "1010"     # Y3 (diff -4: cat3 bits 011)
            "011" "10" "1010"      # Y4
            "110" "100" "00"       # Cb (+4)
            "110" "011" "00")      # Cr (-4)
    bits += "1" * ((8 - len(bits) % 8) % 8)
    scan = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 2 * 4))
    data = (b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9")
    m = decode_jpeg(data)
    assert (m.width, m.height) == (16, 16)
    got = m.samples.reshape(16, 16, 3).astype(np.float64)
    # expected: flat Y quadrants, flat upsampled chroma
    ydc = {(0, 0): 2, (0, 1): 4, (1, 0): 0, (1, 1): 2}
    for (qy, qx), dc in ydc.items():
        yval = dc * 16 / 8.0 + 128.0
        cb, cr = 4 * 16 / 8.0, -4 * 16 / 8.0  # already centered at 0
        expect_px = np.clip(np.round(np.array([
            yval + 1.402 * cr,
            yval - 0.344136 * cb - 0.714136 * cr,
            yval + 1.772 * cb,
        ])), 0, 255)
        block = got[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8, :]
        assert np.array_equal(block, np.broadcast_to(expect_px, block.shape)), (
            qy, qx, block[0, 0], expect_px)


def test_cross_format_perceptual_dedup():
    """The near-dup image story on real lossy compression: the SAME
    image saved as PNG and as JPEG must land within the dHash near-dup
    radius. Smooth (realistic) content hashes near-identically; even
    pure-noise fixtures (JPEG's worst case) stay well inside the
    8-bit Hamming threshold the dedup family uses."""
    from kafka_sink_azure_kusto_spark.functions.codecs import encode_png
    from kafka_sink_azure_kusto_spark.functions.multimodal import dhash64

    # strong-margin gradient (every horizontal luminance step ≥ ~8):
    # gradient SIGNS — which are all dHash keeps — survive JPEG noise
    w, h = 24, 18
    col = np.linspace(20, 230, w)[None, :]
    b = np.broadcast_to(col, (h, w))
    rgb = np.clip(np.round(np.stack([b, b, b], axis=2)), 0, 255).astype(
        np.int64
    ).reshape(-1)
    hp = dhash64(decode_media_bytes(encode_png(w, h, rgb)))
    hj = dhash64(decode_media_bytes(encode_jpeg(w, h, rgb, quality=90)))
    assert bin(hp ^ hj).count("1") == 0
    # noise fixtures (the synthetic corpus arithmetic): worst case
    for doc in range(0, 120, 7):
        wn, hn = 8 + (doc % 13), 8 + (doc % 7)
        i = np.arange(wn * hn, dtype=np.int64)
        nrgb = np.empty(3 * wn * hn, dtype=np.int64)
        nrgb[0::3] = (doc * 31 + i * 7) % 256
        nrgb[1::3] = (doc * 37 + i * 11) % 256
        nrgb[2::3] = (doc * 41 + i * 13) % 256
        a = dhash64(decode_media_bytes(encode_png(wn, hn, nrgb)))
        bb = dhash64(decode_media_bytes(encode_jpeg(wn, hn, nrgb, quality=90)))
        assert bin(a ^ bb).count("1") <= 8


def test_exif_orientation_applied():
    """r11: EXIF orientation tag (APP1 TIFF, tag 0x0112) is applied on
    decode — all 8 orientations verified against numpy transforms of
    the baseline (orientation-1) decode; malformed EXIF is ignored."""
    w, h = 16, 8
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, 3 * w * h)
    base = encode_jpeg(w, h, rgb, quality=90)
    m1 = decode_jpeg(base)
    px1 = m1.samples.reshape(h, w, 3)

    def with_exif(orientation, endian=b"II"):
        if endian == b"II":
            tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
                    + struct.pack("<H", 1)
                    + struct.pack("<HHI", 0x0112, 3, 1)
                    + struct.pack("<H", orientation) + b"\x00\x00"
                    + struct.pack("<I", 0))
        else:
            tiff = (b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
                    + struct.pack(">H", 1)
                    + struct.pack(">HHI", 0x0112, 3, 1)
                    + struct.pack(">H", orientation) + b"\x00\x00"
                    + struct.pack(">I", 0))
        app1 = _seg(0xE1, b"Exif\x00\x00" + tiff)
        return base[:2] + app1 + base[2:]

    expect = {
        1: px1, 2: px1[:, ::-1], 3: px1[::-1, ::-1], 4: px1[::-1, :],
        5: px1.transpose(1, 0, 2), 6: px1.transpose(1, 0, 2)[:, ::-1],
        7: px1.transpose(1, 0, 2)[::-1, ::-1], 8: px1.transpose(1, 0, 2)[::-1, :],
    }
    for o, exp in expect.items():
        m = decode_jpeg(with_exif(o))
        assert (m.height, m.width) == exp.shape[:2], o
        assert np.array_equal(m.samples.reshape(exp.shape), exp), o
    # big-endian TIFF header also parses
    m = decode_jpeg(with_exif(6, endian=b"MM"))
    assert (m.width, m.height) == (h, w)
    # garbage EXIF does not break the decode
    app1 = _seg(0xE1, b"Exif\x00\x00" + b"XX\x00\x00garbage")
    m = decode_jpeg(base[:2] + app1 + base[2:])
    assert np.array_equal(m.samples.reshape(h, w, 3), px1)


def test_progressive_decodes_identical_to_baseline():
    """Progressive entropy coding is a LOSSLESS rearrangement of the
    same quantized coefficients, so decode(progressive(x)) must equal
    decode(baseline(x)) bit-for-bit — a strong equivalence oracle that
    ties the DC first/refine, spectral-band, EOB-run, and AC-refinement
    paths to the already-golden-pinned baseline pipeline."""
    rng = np.random.default_rng(2)
    for w, h in [(8, 8), (16, 16), (13, 11), (32, 24), (1, 1), (24, 7)]:
        rgb = rng.integers(0, 256, 3 * w * h)
        for q in (90, 50, 10):
            base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
            pdata = encode_jpeg(w, h, rgb, quality=q, progressive=True)
            prog = decode_jpeg(pdata)
            assert pdata[2:4] != b"\xff\xc0" and b"\xff\xc2" in pdata[:600]
            assert pdata.count(b"\xff\xda") >= 9  # multi-scan progression
            assert np.array_equal(base.samples, prog.samples), (w, h, q)


def test_progressive_smooth_image_and_dispatch():
    w, h = 24, 16
    x = np.arange(w, dtype=np.float64)
    col = 20 + 8 * x
    rgb = np.clip(np.round(np.broadcast_to(
        col[None, :, None], (h, w, 3))), 0, 255).astype(np.int64).reshape(-1)
    data = encode_jpeg(w, h, rgb, quality=95, progressive=True)
    m = decode_media_bytes(data)  # magic dispatch handles SOF2 too
    assert m.media_type == "jpeg" and (m.width, m.height) == (w, h)
    assert np.abs(m.samples - rgb).max() <= 12


def test_restart_intervals_roundtrip():
    """DRI + RSTn: the encoder closes each interval with bit padding +
    a sequence-checked restart marker and resets DC predictors; decode
    must be IDENTICAL to the no-restart stream (restarts change framing,
    not coefficients). Covers intervals that divide, straddle, and
    exceed the MCU count."""
    rng = np.random.default_rng(5)
    for w, h in [(32, 24), (16, 16), (40, 8)]:
        rgb = rng.integers(0, 256, 3 * w * h)
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=85))
        for ri in (1, 2, 3, 7):
            data = encode_jpeg(w, h, rgb, quality=85, restart_interval=ri)
            m = decode_jpeg(data)
            assert np.array_equal(m.samples, base.samples), (w, h, ri)
    # out-of-order restart sequence rejects loudly
    data = bytearray(
        encode_jpeg(32, 24, rng.integers(0, 256, 3 * 32 * 24),
                    quality=85, restart_interval=1)
    )
    i = data.find(b"\xff\xd0")
    data[i + 1] = 0xD5  # wrong sequence number
    with pytest.raises(MediaDecodeError, match="restart"):
        decode_jpeg(bytes(data))
