"""Pure-Python GIF codec (GIF87a/89a) for the multimodal operators.

Implemented from the public GIF89a specification: logical screen
descriptor, global/local color tables, Graphic Control and generic
extensions, multi-frame animations, the 4-pass row interlace, and the
variable-code-size LZW compression with CLEAR/EOI codes, LSB-first bit
packing, 255-byte sub-block framing, and full-table (4096) reset.

GIF is LOSSLESS (palette indices round-trip exactly), so unlike JPEG
the decoded rasters join the registry's closed-form value-hash oracles
directly — a wrong interlace pass, palette priority (local over
global), code-size growth point, or sub-block walk changes the decoded
samples and flips the cross-engine hash.

Decoders return frames CONCATENATED in presentation order as
RGB-interleaved int64 samples (`DecodedMedia.samples`, with
``n_frames`` recording the frame count) — animation dedup and
frame-sampling operators consume this layout.
"""

from __future__ import annotations

import struct

import numpy as np

from kafka_sink_azure_kusto_spark.functions.codecs import (
    DecodedMedia,
    MediaDecodeError,
)

_MAX_CODE = 4096  # 12-bit LZW ceiling per the spec

# 4-pass GIF interlace: (row offset, row step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    rows = []
    for off, step in _INTERLACE_PASSES:
        rows.extend(range(off, height, step))
    return np.asarray(rows, dtype=np.int64)


# ------------------------------------------------------------------ LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, cs: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, cs = reset()
    emit(clear, cs)
    buf: tuple[int, ...] = ()
    for sym in (int(s) for s in indices):
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], cs)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << cs) + 1 and cs < 12:
            cs += 1
        if nxt == _MAX_CODE + 1:
            # table full: emit CLEAR (at the current 12-bit size) and
            # restart the dictionary, exactly as the decoder expects
            emit(clear, cs)
            table, nxt, cs = reset()
        buf = (sym,)
    if buf:
        emit(table[buf], cs)
        nxt += 1
        if nxt == (1 << cs) + 1 and cs < 12:
            cs += 1
    emit(eoi, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    if not 2 <= min_code_size <= 11:
        raise MediaDecodeError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.int64)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0

    table: list[tuple[int, ...]] = []
    cs = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset_table() -> None:
        nonlocal table, cs, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        cs = min_code_size + 1
        prev = None

    reset_table()
    while True:
        while nbits < cs:
            if pos >= len(data):
                raise MediaDecodeError("GIF LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if code < len(table) and code != clear and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise MediaDecodeError(f"GIF LZW code {code} out of range")
        if n_out + len(entry) > n_expected:
            raise MediaDecodeError("GIF LZW output exceeds frame size")
        out[n_out: n_out + len(entry)] = entry
        n_out += len(entry)
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + (entry[0],))
            if len(table) == (1 << cs) and cs < 12:
                cs += 1
        prev = entry
    if n_out != n_expected:
        raise MediaDecodeError(
            f"GIF frame decoded {n_out} pixels, expected {n_expected}"
        )
    return out


# ---------------------------------------------------------------- encode


def _color_table(palette: np.ndarray) -> bytes:
    pal = np.asarray(palette, dtype=np.int64)
    if pal.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    return pal.astype(np.uint8).tobytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    local_palette: bool = False,
    interlaced_frames: frozenset[int] | set[int] = frozenset(),
    delay_cs: int = 4,
) -> bytes:
    """GIF89a with a 256-entry global color table. Each frame is a
    length-``width*height`` array of palette indices (row-major).
    ``local_palette=True`` additionally ships the table per-frame (and
    a deliberately scrambled global table, so a decoder that ignores
    the local table produces wrong pixels — the fixtures use this to
    prove palette priority). Frames in ``interlaced_frames`` are stored
    with the 4-pass row interlace. Multi-frame files carry a Graphic
    Control Extension per frame."""
    out = bytearray()
    out.extend(b"GIF89a")
    out.extend(struct.pack("<HH", width, height))
    # packed: global table present, 8 bits/channel, table size 256
    out.append(0b1111_0111)
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    if local_palette:
        scrambled = np.asarray(palette, dtype=np.int64)[::-1]
        out.extend(_color_table(scrambled))
    else:
        out.extend(_color_table(palette))
    animated = len(frames) > 1
    for fi, frame in enumerate(frames):
        idx = np.asarray(frame, dtype=np.int64).reshape(-1)
        if idx.size != width * height:
            raise ValueError("frame size mismatch")
        if animated:
            # Graphic Control Extension (no disposal, no transparency)
            out.extend(b"\x21\xf9\x04")
            out.append(0)
            out.extend(struct.pack("<H", delay_cs))
            out.append(0)
            out.append(0)
        out.append(0x2C)  # image descriptor
        out.extend(struct.pack("<HHHH", 0, 0, width, height))
        interlace = fi in interlaced_frames
        if local_palette:
            out.append((0b1000_0111) | (0b0100_0000 if interlace else 0))
            out.extend(_color_table(palette))
        else:
            out.append(0b0100_0000 if interlace else 0)
        if interlace:
            idx = idx.reshape(height, width)[_interlace_order(height)].reshape(-1)
        mcs = 8  # 256-entry palette
        out.append(mcs)
        out.extend(_sub_blocks(_lzw_encode(idx, mcs)))
    out.append(0x3B)  # trailer
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(data: bytes) -> DecodedMedia:
    """Parse a GIF87a/89a stream into concatenated top-down RGB frames.
    Walks extensions (skipped), honors local color tables over the
    global one, undoes per-frame interlace, and loud-rejects truncation,
    out-of-range LZW codes, and short frames as MediaDecodeError."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("not a GIF payload")
    if len(data) < 13:
        raise MediaDecodeError("GIF header truncated")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    global_pal: np.ndarray | None = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(data):
            raise MediaDecodeError("GIF global color table truncated")
        global_pal = np.frombuffer(
            data, dtype=np.uint8, count=3 * size, offset=pos
        ).astype(np.int64).reshape(size, 3)
        pos += 3 * size

    frames: list[np.ndarray] = []
    while True:
        if pos >= len(data):
            raise MediaDecodeError("GIF stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            if pos >= len(data):
                raise MediaDecodeError("GIF extension truncated")
            pos += 1
            while True:
                if pos >= len(data):
                    raise MediaDecodeError("GIF extension sub-block truncated")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if block != 0x2C:
            raise MediaDecodeError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise MediaDecodeError("GIF image descriptor truncated")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", data, pos)
        fpacked = data[pos + 8]
        pos += 9
        if fx != 0 or fy != 0 or fw != width or fh != height:
            raise MediaDecodeError("GIF sub-rectangle frames unsupported")
        pal = global_pal
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            if pos + 3 * size > len(data):
                raise MediaDecodeError("GIF local color table truncated")
            pal = np.frombuffer(
                data, dtype=np.uint8, count=3 * size, offset=pos
            ).astype(np.int64).reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise MediaDecodeError("GIF frame has no color table")
        if pos >= len(data):
            raise MediaDecodeError("GIF image data truncated")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise MediaDecodeError("GIF image sub-block truncated")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            if pos + n > len(data):
                raise MediaDecodeError("GIF image sub-block truncated")
            lzw.extend(data[pos: pos + n])
            pos += n
        idx = _lzw_decode(bytes(lzw), mcs, fw * fh)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise MediaDecodeError("GIF pixel index exceeds palette")
        if fpacked & 0x40:  # interlaced: invert the 4-pass row order
            order = _interlace_order(fh)
            rows = idx.reshape(fh, fw)
            restored = np.empty_like(rows)
            restored[order] = rows
            idx = restored.reshape(-1)
        frames.append(pal[idx])  # (w*h, 3) RGB rows

    if not frames:
        raise MediaDecodeError("GIF contains no image frames")
    samples = np.concatenate(frames).reshape(-1).astype(np.int64)
    return DecodedMedia(
        "gif", width, height, 0, samples, n_frames=len(frames)
    )
