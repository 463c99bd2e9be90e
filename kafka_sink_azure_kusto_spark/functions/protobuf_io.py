"""Pure-Python Protocol Buffers wire-format codec.

Completes the reference's converter matrix
(``/root/reference/README.md:147-156`` row 6, ProtobufConverter): the
connector's value converter may hand the sink protobuf-encoded
payloads. No protobuf library ships in this environment, so the wire
format is implemented from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/):

- varints: base-128, little-endian groups, MSB continuation bit;
  negative int64 values are 10-byte two's-complement varints
- tags: ``(field_number << 3) | wire_type``
- wire types: 0 varint, 1 fixed64 (little-endian double), 2
  length-delimited (bytes/str/embedded), 5 fixed32 (little-endian float)

Typed decode takes a ``{field_number: (name, type)}`` map — the
schema-registry stand-in. When the real ``google.protobuf`` package is
present it is preferred for message-descriptor decode; this module is
the dependency-free wire path and the fixture encoder for tests.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Sequence, Union

_MASK64 = (1 << 64) - 1


class ProtoDecodeError(ValueError):
    """Malformed protobuf wire payload."""


# ------------------------------------------------------------------ varint


def encode_varint(value: int) -> bytes:
    """Unsigned base-128 varint. Negative ints encode as their 64-bit
    two's complement (protobuf int32/int64 semantics ⇒ 10 bytes)."""
    v = value & _MASK64
    out = bytearray()
    while True:
        bits = v & 0x7F
        v >>= 7
        if v:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    """→ (unsigned value, next position). Raises on truncation or a
    varint longer than 10 bytes."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ProtoDecodeError("truncated varint")
        if shift >= 70:
            raise ProtoDecodeError("varint exceeds 10 bytes")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_zigzag(value: int) -> int:
    return (value << 1) ^ (value >> 63) if value < 0 else value << 1


def decode_zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ------------------------------------------------------------------ fields


def encode_field(field_number: int, value: Union[int, float, bytes, str],
                 wire_type: Optional[int] = None) -> bytes:
    """Encode one field. Wire type defaults by Python type: int → 0
    (varint), float → 1 (fixed64 double), bytes/str → 2."""
    if wire_type is None:
        wire_type = 0 if isinstance(value, int) else 1 if isinstance(value, float) else 2
    tag = encode_varint((field_number << 3) | wire_type)
    if wire_type == 0:
        return tag + encode_varint(int(value))
    if wire_type == 1:
        return tag + struct.pack("<d", float(value))
    if wire_type == 5:
        return tag + struct.pack("<f", float(value))
    if wire_type == 2:
        payload = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        return tag + encode_varint(len(payload)) + payload
    raise ValueError(f"unsupported wire type {wire_type}")


def encode_message(fields: Sequence[tuple]) -> bytes:
    """Concatenate ``(field_number, value[, wire_type])`` tuples."""
    return b"".join(encode_field(*f) for f in fields)


def parse_wire_fields(data: bytes) -> Iterator[tuple[int, int, Union[int, bytes]]]:
    """Schemaless walk: yields (field_number, wire_type, raw) where raw
    is the unsigned varint / fixed int (types 0/1/5) or bytes (type 2).
    Groups (wire types 3/4) are long-deprecated and rejected."""
    pos = 0
    while pos < len(data):
        key, pos = decode_varint(data, pos)
        field_number, wire_type = key >> 3, key & 0x07
        if field_number == 0:
            raise ProtoDecodeError("field number 0 is reserved")
        if wire_type == 0:
            raw, pos = decode_varint(data, pos)
        elif wire_type == 1:
            if pos + 8 > len(data):
                raise ProtoDecodeError("truncated fixed64")
            raw = int.from_bytes(data[pos: pos + 8], "little")
            pos += 8
        elif wire_type == 5:
            if pos + 4 > len(data):
                raise ProtoDecodeError("truncated fixed32")
            raw = int.from_bytes(data[pos: pos + 4], "little")
            pos += 4
        elif wire_type == 2:
            n, pos = decode_varint(data, pos)
            if pos + n > len(data):
                raise ProtoDecodeError("truncated length-delimited field")
            raw = data[pos: pos + n]
            pos += n
        else:
            raise ProtoDecodeError(f"unsupported wire type {wire_type}")
        yield field_number, wire_type, raw


# ------------------------------------------------------- descriptor set

#: FieldDescriptorProto.Type enum values (descriptor.proto, public spec)
#: for the field types this codec supports.
_DESCRIPTOR_TYPE = {
    "double": 1,   # TYPE_DOUBLE
    "float": 2,    # TYPE_FLOAT
    "int64": 3,    # TYPE_INT64
    "bool": 8,     # TYPE_BOOL
    "string": 9,   # TYPE_STRING
    "bytes": 12,   # TYPE_BYTES
    "sint64": 18,  # TYPE_SINT64
}

DESCRIPTOR_MESSAGE_NAME = "KustoRecord"
DESCRIPTOR_PACKAGE = "kustosink"


def file_descriptor_set(
    field_schema: dict,
    message_name: str = DESCRIPTOR_MESSAGE_NAME,
    package: str = DESCRIPTOR_PACKAGE,
) -> bytes:
    """Serialize a ``FileDescriptorSet`` for ``{field_number: (name,
    type)}`` — the input shape ``from_protobuf(binaryDescriptorSet=...)``
    consumes (spark-protobuf). Built with THIS module's wire encoder:
    descriptor.proto is itself a protobuf message with public, stable
    field numbers (FileDescriptorSet.file=1; FileDescriptorProto
    name=1/package=2/message_type=4/syntax=12; DescriptorProto
    name=1/field=2/oneof_decl=8; FieldDescriptorProto name=1/number=3/
    label=4/type=5/oneof_index=9/proto3_optional=17), so no
    google.protobuf dependency is needed to emit one.

    Every field is declared ``proto3 optional`` (synthetic oneof +
    proto3_optional), giving explicit presence — absent fields decode
    as NULL on the spark-protobuf path, matching this module's
    ``decode_message`` absent→None semantics.
    """
    fields = []
    oneofs = []
    for i, (num, (name, typ)) in enumerate(sorted(field_schema.items())):
        t = _DESCRIPTOR_TYPE.get(typ)
        if t is None:
            raise ValueError(
                f"field {name!r}: type {typ!r} has no descriptor mapping "
                f"(supported: {sorted(_DESCRIPTOR_TYPE)})"
            )
        fields.append(
            encode_message(
                [
                    (1, str(name)),    # name
                    (3, int(num)),     # number
                    (4, 1),            # label = LABEL_OPTIONAL
                    (5, t),            # type
                    (9, i),            # oneof_index (synthetic oneof)
                    (17, 1),           # proto3_optional = true
                ]
            )
        )
        oneofs.append(encode_message([(1, f"_{name}")]))
    message = encode_message(
        [(1, message_name)]
        + [(2, f, 2) for f in fields]
        + [(8, o, 2) for o in oneofs]
    )
    file_proto = encode_message(
        [
            (1, f"{package}.proto"),  # name
            (2, package),             # package
            (4, message, 2),          # message_type
            (12, "proto3"),           # syntax
        ]
    )
    return encode_message([(1, file_proto, 2)])


def decode_message(data: bytes, field_schema: dict) -> dict:
    """Typed decode via ``{field_number: (name, type)}``; type ∈
    int64 | sint64 | bool | string | bytes | double | float. Unknown
    fields are skipped (protobuf forward-compat rule); on repeated
    occurrences the LAST value wins (the spec's merge rule for
    non-repeated scalars)."""
    out: dict = {}
    for field_number, wire_type, raw in parse_wire_fields(data):
        spec = field_schema.get(field_number)
        if spec is None:
            continue
        name, typ = spec
        if typ == "int64":
            if wire_type != 0:
                raise ProtoDecodeError(f"{name}: expected varint, got type {wire_type}")
            out[name] = _to_signed64(raw)
        elif typ == "sint64":
            if wire_type != 0:
                raise ProtoDecodeError(f"{name}: expected varint, got type {wire_type}")
            out[name] = decode_zigzag(raw)
        elif typ == "bool":
            if wire_type != 0:
                raise ProtoDecodeError(f"{name}: expected varint, got type {wire_type}")
            out[name] = bool(raw)
        elif typ == "string":
            if wire_type != 2:
                raise ProtoDecodeError(
                    f"{name}: expected length-delimited, got type {wire_type}"
                )
            try:
                out[name] = bytes(raw).decode("utf-8")
            except UnicodeDecodeError as exc:
                raise ProtoDecodeError(f"{name}: invalid UTF-8 string") from exc
        elif typ == "bytes":
            if wire_type != 2:
                raise ProtoDecodeError(
                    f"{name}: expected length-delimited, got type {wire_type}"
                )
            out[name] = bytes(raw)
        elif typ == "double":
            if wire_type != 1:
                raise ProtoDecodeError(f"{name}: expected fixed64, got type {wire_type}")
            out[name] = struct.unpack("<d", raw.to_bytes(8, "little"))[0]
        elif typ == "float":
            if wire_type != 5:
                raise ProtoDecodeError(f"{name}: expected fixed32, got type {wire_type}")
            out[name] = struct.unpack("<f", raw.to_bytes(4, "little"))[0]
        else:
            raise ValueError(f"unsupported field type {typ!r}")
    return out
