"""Pure-Python Snappy raw-block codec.

Implemented from the public Snappy format description
(google/snappy format_description.txt): a little-endian varint
preamble holding the uncompressed length, then a sequence of elements —
literals (tag & 3 == 0, length in the tag or 1-4 trailing bytes) and
back-reference copies with 1-, 2-, or 4-byte offsets (tag & 3 == 1/2/3).
Copies may overlap their own output (offset < length repeats a
pattern), so reconstruction is defined byte-at-a-time.

Why it exists: Avro Object Container Files with ``avro.codec=snappy``
are a common default from real producers (avro-tools, Java
DataFileWriter with SnappyCodec), and no snappy library ships in this
environment. The compressor is a greedy hash-table matcher (4-byte
anchors, 64 KiB window) — valid, deterministic output, not bit-identical
to C++ snappy (the format permits many encodings; DECOMPRESSION of any
spec-conforming stream is the compatibility contract, and the
round-trip property suite plus golden-byte decode tests pin both
directions).

Avro frames each snappy-compressed block with a 4-byte BIG-endian
CRC32 of the UNCOMPRESSED block data appended after the compressed
bytes (Avro spec "Required Codecs: snappy"); that framing lives in
``avro_io.py``, not here — this module is the raw block codec only.
"""

from __future__ import annotations

_MAX_OFFSET = 65535  # compressor window: 2-byte-offset copies only


class SnappyError(ValueError):
    """Malformed snappy stream."""


def _emit_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        if i >= len(data):
            raise SnappyError("truncated length preamble")
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 35:
            raise SnappyError("length preamble varint too long")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    while start < end:
        n = min(end - start, 1 << 32)  # format cap; loops are moot here
        ln = n - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out.append(ln)
        elif ln < 1 << 16:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        elif ln < 1 << 24:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += ln.to_bytes(4, "little")
        out += data[start: start + n]
        start += n


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Copy ops: ≤64 bytes each. The 1-byte-offset form (len 4-11,
    offset < 2048) is the compact encoding the reference compressor
    prefers; everything else uses the 2-byte-offset form (len 1-64)."""
    while length > 0:
        n = min(length, 64)
        if 4 <= n <= 11 and offset < 2048:
            out.append(1 | ((n - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        else:
            out.append(2 | ((n - 1) << 2))
            out += offset.to_bytes(2, "little")
        length -= n


def snappy_compress(data: bytes) -> bytes:
    """Greedy snappy compression: hash 4-byte anchors into a dict, emit
    a copy when the candidate (within the 64 KiB window) verifies, else
    advance one byte; pending bytes flush as literals."""
    out = bytearray()
    _emit_uvarint(out, len(data))
    n = len(data)
    i = 0
    lit_start = 0
    table: dict[bytes, int] = {}
    while i + 4 <= n:
        key = data[i: i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= _MAX_OFFSET:
            length = 4
            while i + length < n and data[j + length] == data[i + length]:
                length += 1
            _emit_literal(out, data, lit_start, i)
            _emit_copy(out, i - j, length)
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Decompress ANY spec-conforming snappy stream (all three copy tag
    forms, overlapping copies, multi-byte literal lengths). Truncation,
    bad offsets, and a length-preamble mismatch all raise SnappyError."""
    expected, i = _read_uvarint(data, 0)
    n = len(data)
    out = bytearray()
    while i < n:
        tag = data[i]
        i += 1
        t = tag & 3
        if t == 0:
            ln = tag >> 2
            if ln >= 60:
                k = ln - 59
                if i + k > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[i: i + k], "little")
                i += k
            ln += 1
            if i + ln > n:
                raise SnappyError("truncated literal body")
            out += data[i: i + ln]
            i += ln
            continue
        if t == 1:
            if i + 1 > n:
                raise SnappyError("truncated 1-byte-offset copy")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif t == 2:
            if i + 2 > n:
                raise SnappyError("truncated 2-byte-offset copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i: i + 2], "little")
            i += 2
        else:
            if i + 4 > n:
                raise SnappyError("truncated 4-byte-offset copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i: i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise SnappyError(f"copy offset {off} outside output ({len(out)})")
        if off >= ln:
            start = len(out) - off
            out += out[start: start + ln]
        else:  # overlapping copy: byte-at-a-time pattern repeat
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != expected:
        raise SnappyError(
            f"decompressed size {len(out)} != declared {expected}"
        )
    return bytes(out)
