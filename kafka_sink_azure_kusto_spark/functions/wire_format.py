"""Confluent Schema-Registry wire format (magic byte + schema id).

The reference consumes registry-backed Avro / JSON-Schema / Protobuf
topics through Connect converters (reference README.md:147-156; the E2E
harness runs a schema-registry container, KustoSinkIT.java setup). The
public wire format those converters parse is:

    byte 0      magic = 0x00
    bytes 1-4   schema id, big-endian uint32
    bytes 5..   serialized body (Avro binary / protobuf / JSON)

Spark rendition: the frame is split with BUILT-IN expressions only
(`substring`/`hex`/`conv` on the binary column — whole-stage-codegen,
no Python), then each body is routed to the configured decoder for its
schema id via a static id→handler map (the no-live-registry stand-in:
in production the map is the registry's id→schema dump). Frames that
are truncated, carry the wrong magic, or reference an unknown id are
NOT errors — they get a non-'ok' status so callers can route them to
the deserialization DLQ (K4 semantics), keeping one poisoned record
from killing a 1000-executor job.
"""

from __future__ import annotations

import struct
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MAGIC_BYTE = 0x00

#: status values emitted by decode_wire_frames
STATUS_OK = "ok"
STATUS_TRUNCATED = "truncated"
STATUS_BAD_MAGIC = "bad_magic"
STATUS_UNKNOWN_ID = "unknown_id"


def encode_wire_frame(schema_id: int, body: bytes, magic: int = MAGIC_BYTE) -> bytes:
    """Frame ``body`` in the registry wire format (fixture/producer
    helper; ``magic`` overridable to synthesize corrupt frames)."""
    if not 0 <= schema_id <= 0xFFFFFFFF:
        raise ValueError("schema_id must fit in uint32")
    return bytes([magic]) + struct.pack(">I", schema_id) + body


def wire_magic(v: Column) -> Column:
    """First frame byte as int (NULL for empty payloads)."""
    return F.when(
        F.length(v) >= 1, F.conv(F.hex(F.substring(v, 1, 1)), 16, 10).cast("int")
    )


def wire_schema_id(v: Column) -> Column:
    """Big-endian uint32 schema id from bytes 2-5 (NULL when the frame
    is shorter than the 5-byte header). hex() of the 4-byte slice IS the
    big-endian representation; conv() parses it exactly."""
    return F.when(
        F.length(v) >= 5, F.conv(F.hex(F.substring(v, 2, 4)), 16, 10).cast("long")
    )


def wire_body(v: Column) -> Column:
    """Serialized body after the 5-byte header (empty binary when the
    frame has no body bytes)."""
    return v.substr(F.lit(6), F.greatest(F.length(v) - F.lit(5), F.lit(0)))


def decode_wire_frames(
    df: DataFrame,
    handlers: dict,
    schema: StructType,
    value_col: str = "value",
    payload_col: str = "payload",
) -> DataFrame:
    """Split + route registry-framed payloads to per-schema-id decoders.

    ``handlers``: {schema_id: {"fmt": "json" | "protobuf" | "avro",
    ...fmt kwargs}} — the static id→schema map standing in for a live
    registry. ``fmt`` kwargs: json needs nothing (uses ``schema``),
    protobuf needs ``proto_field_schema`` ({field_number: (name,
    type)}), avro needs ``avro_schema_json``. All handlers decode into
    the SAME output struct ``schema`` (one typed payload column for the
    whole topic — the converter-boundary contract).

    Adds: ``wire_schema_id`` (long, NULL if truncated), ``wire_status``
    ('ok' / 'truncated' / 'bad_magic' / 'unknown_id'), and
    ``payload_col`` (struct, NULL unless status='ok').

    Scale: frame splitting and JSON decode are codegen'd built-ins; the
    protobuf path is an Arrow-batched pandas UDF that receives NULL for
    rows routed elsewhere (never sees foreign bodies, so a JSON body
    can't crash the proto parser). Everything is narrow — no shuffle.
    """
    if not handlers:
        raise ValueError("decode_wire_frames requires at least one handler")
    v = F.col(value_col)
    magic = wire_magic(v)
    sid = wire_schema_id(v)
    body = wire_body(v)
    known_ids = [int(i) for i in handlers]
    status = (
        F.when(F.length(v) < 6, F.lit(STATUS_TRUNCATED))
        .when(magic != MAGIC_BYTE, F.lit(STATUS_BAD_MAGIC))
        .when(~sid.isin(known_ids), F.lit(STATUS_UNKNOWN_ID))
        .otherwise(F.lit(STATUS_OK))
    )
    out = df.withColumn("wire_schema_id", F.when(status != STATUS_TRUNCATED, sid))
    out = out.withColumn("wire_status", status)

    payload: Optional[Column] = None
    for schema_id, h in handlers.items():
        fmt = h["fmt"].strip().lower()
        # decoder input is NULLed for rows not routed to this id, so a
        # body of one format can never reach another format's parser
        routed = F.when(
            (F.col("wire_status") == STATUS_OK)
            & (F.col("wire_schema_id") == int(schema_id)),
            body,
        )
        if fmt in ("json", "singlejson", "multijson"):
            dec = F.from_json(routed.cast("string"), schema)
        elif fmt == "protobuf":
            from kafka_sink_azure_kusto_spark.functions.encoders import (
                _protobuf_decode_column,
            )

            dec = _protobuf_decode_column(routed, schema, h["proto_field_schema"])
        elif fmt in ("avro", "apacheavro"):
            try:
                from pyspark.sql.avro.functions import from_avro
            except ImportError as e:  # spark-avro jar not on classpath
                raise NotImplementedError(
                    "from_avro requires the spark-avro package on the classpath"
                ) from e
            dec = from_avro(routed, h["avro_schema_json"])
        else:
            raise ValueError(f"unsupported wire handler format: {fmt!r}")
        cond = F.col("wire_schema_id") == int(schema_id)
        payload = F.when(cond, dec) if payload is None else payload.when(cond, dec)

    return out.withColumn(
        payload_col, F.when(F.col("wire_status") == STATUS_OK, payload)
    )
