"""Pure-Python media codecs for the multimodal operators.

No codec libraries ship in this environment, so the simple container
formats are implemented from their public specs:

- **BMP** (Windows bitmap): BITMAPFILEHEADER + BITMAPINFOHEADER,
  24 bpp, bottom-up row order, rows padded to 4 bytes, BGR channel
  order.
- **PPM** (Netpbm P6): ASCII header tokens (with ``#`` comment
  support) followed by raw RGB bytes.
- **WAV** (RIFF/WAVE): chunk walk to ``fmt `` + ``data``, PCM 16-bit
  little-endian mono; unknown chunks are skipped (word-aligned).

Decoders return the DECODED SAMPLES (channel-interleaved RGB for
images, signed 16-bit amplitudes for audio) — not just header fields —
so the registry oracles assert on pixel/sample content. Encoders exist
to synthesize deterministic fixtures; a wrong stride, padding, channel
order, or row direction in either half breaks the cross-engine hash.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Sequence

import numpy as np


@dataclass(frozen=True)
class DecodedMedia:
    media_type: str  # bmp | ppm | wav
    width: int  # 0 for audio
    height: int  # 0 for audio
    sample_rate: int  # 0 for images
    # RGB-interleaved values (images) or PCM amplitudes (audio), as an
    # int64 ndarray so downstream stats stay vectorized (no per-sample
    # Python loop on the hottest bytes in the pipeline).
    samples: np.ndarray
    # presentation frames concatenated in `samples` (GIF animations; 1
    # for every single-image/audio format)
    n_frames: int = 1


class MediaDecodeError(ValueError):
    """Malformed or unsupported media payload."""


# ------------------------------------------------------------------ BMP

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(width: int, height: int, rgb: Sequence[int]) -> bytes:
    """24-bit BMP: rows bottom-up, BGR within a pixel, rows padded to a
    4-byte boundary. ``rgb`` is row-major top-down RGB-interleaved."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    arr = np.asarray(rgb, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("rgb values must be in 0..255")
    pad = (4 - (3 * width) % 4) % 4
    stride = 3 * width + pad
    # top-down RGB → bottom-up BGR rows, padded to the 4-byte stride.
    px = arr.astype(np.uint8).reshape(height, width, 3)[::-1, :, ::-1]
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : 3 * width] = px.reshape(height, 3 * width)
    pixel_bytes = rows.tobytes()
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    header = _BMP_FILE_HEADER.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, len(pixel_bytes),
        2835, 2835, 0, 0,
    )
    return header + info + bytes(pixel_bytes)


def decode_bmp(data: bytes) -> DecodedMedia:
    """Parse a 24 bpp uncompressed BMP into top-down RGB samples."""
    if len(data) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise MediaDecodeError("BMP truncated header")
    magic, _size, _r1, _r2, offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise MediaDecodeError("not a BMP payload")
    (hdr_size, width, height, planes, bpp, compression, _img_size,
     _xppm, _yppm, _clr, _clr_imp) = _BMP_INFO_HEADER.unpack_from(
        data, _BMP_FILE_HEADER.size
    )
    if hdr_size < 40 or planes != 1:
        raise MediaDecodeError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or compression != 0:
        raise MediaDecodeError(f"unsupported BMP bpp={bpp}/compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise MediaDecodeError("non-positive BMP dimensions")
    pad = (4 - (3 * width) % 4) % 4
    stride = 3 * width + pad
    if offset + stride * height > len(data):
        raise MediaDecodeError("BMP pixel array truncated")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, : 3 * width]
    if bottom_up:
        rows = rows[::-1]
    samples = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR → RGB
    return DecodedMedia("bmp", width, height, 0, samples.reshape(-1).astype(np.int64))


# ------------------------------------------------------------------ PPM


def encode_ppm(width: int, height: int, rgb: Sequence[int]) -> bytes:
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    arr = np.asarray(rgb, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("rgb values must be in 0..255")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + arr.astype(np.uint8).tobytes()


def _ppm_tokens(data: bytes, count: int, start: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated ASCII integer tokens starting
    at ``start``, honoring ``#`` comments (to end of line)."""
    toks: list[int] = []
    i = start
    n = len(data)
    while len(toks) < count:
        while i < n and data[i: i + 1].isspace():
            i += 1
        if i < n and data[i: i + 1] == b"#":
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not data[j: j + 1].isspace():
            j += 1
        if j == i:
            raise MediaDecodeError("PPM header truncated")
        try:
            toks.append(int(data[i:j]))
        except ValueError as e:
            raise MediaDecodeError(f"bad PPM header token {data[i:j]!r}") from e
        i = j
    return toks, i + 1  # single whitespace after maxval precedes raster


def decode_ppm(data: bytes) -> DecodedMedia:
    """Parse a binary P6 PPM (maxval ≤ 255) into RGB samples."""
    if data[:2] != b"P6":
        raise MediaDecodeError("not a P6 PPM payload")
    (width, height, maxval), raster = _ppm_tokens(data, 3, 2)
    if width <= 0 or height <= 0:
        raise MediaDecodeError("non-positive PPM dimensions")
    if maxval != 255:
        raise MediaDecodeError(f"unsupported PPM maxval={maxval}")
    need = 3 * width * height
    if raster + need > len(data):
        raise MediaDecodeError("PPM raster truncated")
    samples = np.frombuffer(data, dtype=np.uint8, count=need, offset=raster)
    return DecodedMedia("ppm", width, height, 0, samples.astype(np.int64))


# ------------------------------------------------------------------ WAV


def encode_wav(samples: Sequence[int], sample_rate: int) -> bytes:
    """PCM 16-bit little-endian mono RIFF/WAVE container."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("samples must fit in signed 16-bit")
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _g711_ulaw_table() -> np.ndarray:
    """µ-law byte → 16-bit linear PCM (ITU-T G.711): complement the
    byte, split sign/exponent/mantissa, expand with the 0x84 bias."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag)


def _g711_alaw_table() -> np.ndarray:
    """A-law byte → 16-bit linear PCM (ITU-T G.711): even bits toggled
    (0x55), exponent-0 segment is linear, others add the leading 1."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = (a & 0x80) != 0  # A-law: sign bit SET means POSITIVE
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(sign, mag, -mag)


_ULAW = _g711_ulaw_table()
_ALAW = _g711_alaw_table()


def decode_wav(data: bytes) -> DecodedMedia:
    """Chunk-walk a RIFF/WAVE payload: PCM 16-bit mono (fmt 1), plus
    the G.711 telephony encodings — A-law (fmt 6) and µ-law (fmt 7),
    8-bit mono, expanded to 16-bit linear per the public companding
    formulas. Unknown chunks (LIST, fact, …) are skipped with word
    alignment."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    i = 12
    sample_rate = None
    fmt_code = 1
    data_body: bytes | None = None
    while i + 8 <= len(data):
        cid = data[i: i + 4]
        (clen,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8: i + 8 + clen]
        if cid == b"fmt ":
            # check the ACTUAL body length, not just the declared clen —
            # a truncated file whose fmt chunk claims ≥16 bytes must not
            # escape as a bare struct.error.
            if clen < 16 or len(body) < 16:
                raise MediaDecodeError("WAV fmt chunk truncated")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            ok = (audio_fmt == 1 and bits == 16) or (
                audio_fmt in (6, 7) and bits == 8
            )
            if not ok or channels != 1:
                raise MediaDecodeError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
            fmt_code = audio_fmt
            sample_rate = rate
        elif cid == b"data":
            if len(body) < clen:
                raise MediaDecodeError("WAV data chunk truncated")
            data_body = body[:clen]
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if sample_rate is None or data_body is None:
        raise MediaDecodeError("WAV missing fmt or data chunk")
    if fmt_code == 1:
        samples = np.frombuffer(
            data_body, dtype="<i2", count=len(data_body) // 2
        ).astype(np.int64)
    else:
        raw = np.frombuffer(data_body, dtype=np.uint8)
        samples = (_ALAW if fmt_code == 6 else _ULAW)[raw]
    return DecodedMedia("wav", 0, 0, sample_rate, samples)


# ------------------------------------------------------------------ PNG
#
# Implemented from the public PNG spec (RFC 2083 / W3C PNG): 8-byte
# signature, length+type+data+CRC32 chunks, IHDR geometry, IDAT = one
# zlib stream of filter-prefixed scanlines, IEND terminator. Supported
# subset: bit depth 8, color type 2 (RGB) / 6 (RGBA, alpha stripped on
# decode so every downstream image op keeps its (h, w, 3) contract),
# compression 0, filter method 0 (all FIVE per-row filter types:
# None/Sub/Up/Average/Paeth), no interlace. This is the real-corpus
# format the BMP/PPM fixtures stood in for — same DecodedMedia out, so
# the whole dHash/resize/crop/curation family runs on PNG unchanged.

import zlib as _zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """Byte-deterministic zlib stream with STORED deflate blocks (the
    level-0 layout, constructed by hand so fixture byte sizes are a
    closed-form function of the raster size across Python versions):
    2-byte header, 5-byte block header per ≤65535-byte block, adler32."""
    out = [b"\x78\x01"]
    n = len(data)
    pos = 0
    while True:
        chunk = data[pos: pos + 65535]
        final = 1 if pos + 65535 >= n else 0
        ln = len(chunk)
        out.append(bytes([final]) + struct.pack("<HH", ln, ln ^ 0xFFFF) + chunk)
        pos += 65535
        if final:
            break
    out.append(struct.pack(">I", _zlib.adler32(data) & 0xFFFFFFFF))
    return b"".join(out)


def _png_filter_rows(raw: np.ndarray, bpp: int) -> bytes:
    """Filter scanlines with type = row_index % 5 — every filter type is
    exercised on any raster ≥5 rows, so a decoder bug in ANY of the five
    reconstruction rules breaks the fixture round trip."""
    h = raw.shape[0]
    r = raw.astype(np.int64)
    left = np.zeros_like(r)
    left[:, bpp:] = r[:, :-bpp]
    up = np.zeros_like(r)
    up[1:] = r[:-1]
    upleft = np.zeros_like(r)
    upleft[1:, bpp:] = r[:-1, :-bpp]
    out = bytearray()
    for y in range(h):
        ftype = y % 5
        if ftype == 0:
            row = r[y]
        elif ftype == 1:
            row = r[y] - left[y]
        elif ftype == 2:
            row = r[y] - up[y]
        elif ftype == 3:
            row = r[y] - (left[y] + up[y]) // 2
        else:
            p = left[y] + up[y] - upleft[y]
            pa = np.abs(p - left[y])
            pb = np.abs(p - up[y])
            pc = np.abs(p - upleft[y])
            pred = np.where(
                (pa <= pb) & (pa <= pc), left[y], np.where(pb <= pc, up[y], upleft[y])
            )
            row = r[y] - pred
        out.append(ftype)
        out.extend((row % 256).astype(np.uint8).tobytes())
    return bytes(out)


# Adam7 interlace passes: (x0, y0, dx, dy) — pass p covers pixels at
# (x0 + i·dx, y0 + j·dy); the IDAT stream is each pass's filtered
# scanlines concatenated, empty passes contributing nothing.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(
    width: int,
    height: int,
    rgb: Sequence[int],
    alpha: Sequence[int] | None = None,
    level: int = 0,
    interlace: bool = False,
) -> bytes:
    """8-bit PNG, color type 2 (RGB) or 6 (RGBA when ``alpha`` given).
    ``rgb`` is row-major top-down RGB-interleaved. Filter types cycle
    row % 5. ``level=0`` emits hand-built STORED deflate blocks
    (byte-count closed form: the oracle's n_bytes arithmetic); higher
    levels use real zlib compression. ``interlace`` emits Adam7
    (each pass filtered as its own sub-image per the spec)."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    arr = np.asarray(rgb, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("rgb values must be in 0..255")
    if alpha is not None:
        a = np.asarray(alpha, dtype=np.int64)
        if len(a) != width * height:
            raise ValueError("alpha length must be width*height")
        if a.size and (a.min() < 0 or a.max() > 255):
            raise ValueError("alpha values must be in 0..255")
        px = np.concatenate(
            [arr.reshape(height, width, 3), a.reshape(height, width, 1)], axis=2
        )
        color_type, bpp = 6, 4
    else:
        px = arr.reshape(height, width, 3)
        color_type, bpp = 2, 3
    return _encode_png_px(px.astype(np.uint8), color_type, bpp, level, interlace)


def encode_png_gray(
    width: int,
    height: int,
    gray: Sequence[int],
    alpha: Sequence[int] | None = None,
    level: int = 0,
    interlace: bool = False,
) -> bytes:
    """8-bit grayscale PNG, color type 0 (or 4 with ``alpha``)."""
    if len(gray) != width * height:
        raise ValueError("gray length must be width*height")
    g = np.asarray(gray, dtype=np.int64)
    if g.size and (g.min() < 0 or g.max() > 255):
        raise ValueError("gray values must be in 0..255")
    if alpha is not None:
        a = np.asarray(alpha, dtype=np.int64)
        if len(a) != width * height:
            raise ValueError("alpha length must be width*height")
        px = np.stack(
            [g.reshape(height, width), a.reshape(height, width)], axis=2
        )
        color_type, bpp = 4, 2
    else:
        px = g.reshape(height, width, 1)
        color_type, bpp = 0, 1
    return _encode_png_px(px.astype(np.uint8), color_type, bpp, level, interlace)


def _encode_png_px(
    px8: np.ndarray, color_type: int, bpp: int, level: int, interlace: bool
) -> bytes:
    height, width = px8.shape[0], px8.shape[1]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px8[y0::dy, x0::dx, :]
            if sub.size == 0:
                continue
            parts.append(
                _png_filter_rows(sub.reshape(sub.shape[0], -1), bpp)
            )
        filtered = b"".join(parts)
    else:
        filtered = _png_filter_rows(px8.reshape(height, width * bpp), bpp)
    compressed = (
        _zlib_stored(filtered) if level == 0 else _zlib.compress(filtered, level)
    )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", compressed)
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(filtered: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct raw scanlines from filter-prefixed rows (all five
    PNG filter types)."""
    if len(filtered) != height * (1 + stride):
        raise MediaDecodeError(
            f"PNG scanline data length {len(filtered)} != {height}*(1+{stride})"
        )
    buf = np.frombuffer(filtered, dtype=np.uint8).reshape(height, 1 + stride)
    ftypes = buf[:, 0]
    rows = buf[:, 1:].astype(np.int64)
    recon = np.zeros((height, stride), dtype=np.int64)
    for y in range(height):
        ft = int(ftypes[y])
        prev = recon[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        cur = rows[y]
        if ft == 0:
            recon[y] = cur
        elif ft == 2:
            recon[y] = (cur + prev) % 256
        elif ft in (1, 3, 4):
            out = recon[y]
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                if ft == 1:
                    out[x] = (cur[x] + a) % 256
                elif ft == 3:
                    out[x] = (cur[x] + (a + prev[x]) // 2) % 256
                else:
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    out[x] = (cur[x] + pred) % 256
        else:
            raise MediaDecodeError(f"PNG bad filter type {ft} on row {y}")
    return recon


def decode_png(data: bytes) -> DecodedMedia:
    """Parse an 8-bit RGB/RGBA PNG into top-down RGB samples (alpha is
    stripped for RGBA so image operators keep their 3-channel contract).
    Chunk CRCs are verified; truncation, bad CRC, and unsupported
    depth/color/interlace all loud-reject as MediaDecodeError."""
    if data[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG payload")
    i = 8
    width = height = None
    color_type = bpp = 0
    adam7 = False
    idat = bytearray()
    seen_iend = False
    while i < len(data):
        if i + 8 > len(data):
            raise MediaDecodeError("PNG chunk header truncated")
        (clen,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4: i + 8]
        body = data[i + 8: i + 8 + clen]
        if len(body) != clen or i + 12 + clen > len(data):
            raise MediaDecodeError(f"PNG {ctype!r} chunk truncated")
        (crc,) = struct.unpack_from(">I", data, i + 8 + clen)
        if crc != (_zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise MediaDecodeError(f"PNG {ctype!r} chunk CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2, 4, 6):
                raise MediaDecodeError(
                    f"unsupported PNG depth={depth}/color={color_type}"
                )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise MediaDecodeError(
                    f"unsupported PNG comp={comp}/filter={filt}/interlace={interlace}"
                )
            adam7 = interlace == 1
            bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        i += 12 + clen
    if width is None or not seen_iend:
        raise MediaDecodeError("PNG missing IHDR or IEND")
    if width <= 0 or height <= 0:
        raise MediaDecodeError("non-positive PNG dimensions")
    try:
        filtered = _zlib.decompress(bytes(idat))
    except _zlib.error as e:
        raise MediaDecodeError(f"PNG IDAT inflate failed: {e}") from e
    if adam7:
        full = np.zeros((height, width, bpp), dtype=np.int64)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            n = hp * (1 + wp * bpp)
            recon = _png_unfilter(filtered[pos: pos + n], hp, wp * bpp, bpp)
            full[y0::dy, x0::dx, :] = recon.reshape(hp, wp, bpp)
            pos += n
        if pos != len(filtered):
            raise MediaDecodeError(
                f"PNG scanline data length {len(filtered)} != Adam7 total {pos}"
            )
        raster = full
    else:
        recon = _png_unfilter(filtered, height, width * bpp, bpp)
        raster = recon.reshape(height, width, bpp)
    if bpp >= 3:
        px = raster[:, :, :3]  # RGBA → RGB
    else:
        # grayscale (types 0/4, alpha dropped like RGBA): replicate the
        # gray channel ×3 so every image operator keeps (h, w, 3)
        px = np.repeat(raster[:, :, :1], 3, axis=2)
    return DecodedMedia("png", width, height, 0, px.reshape(-1).astype(np.int64))


# ------------------------------------------------------------- dispatch


def decode_media_bytes(data: bytes) -> DecodedMedia:
    """Magic-byte dispatch to the right decoder."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:4] == b"RIFF":
        return decode_wav(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from kafka_sink_azure_kusto_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from kafka_sink_azure_kusto_spark.functions.gif import decode_gif

        return decode_gif(data)
    raise MediaDecodeError(f"unrecognized media magic {data[:4]!r}")
