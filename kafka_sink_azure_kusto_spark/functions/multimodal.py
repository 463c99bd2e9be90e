"""Multimodal-column operators (north-star additions, SURVEY §7.3.6).

Design for image/audio/video at 100 TB: media are opaque ``binary``
columns + a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
(one Python worker per partition, zero-copy Arrow transfer, bounded
batch memory via spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codec libraries (PIL/ffmpeg/etc.) are NOT in this container,
so the decode body is a clearly-marked deterministic stub: it derives
fake (width, height, mode) from the md5 of the payload. Everything
around it — schema contract, binary column handling, Arrow batch shape,
partition-parallel execution — is real and oracle-checked (the stub's
arithmetic is reproducible in SQL).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("mode", StringType(), False),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder (no codec libs in this container). Deterministic:
    width/height come from the first four hex digits of md5(payload),
    mode from byte length parity. A real deployment replaces this body
    with PIL.Image.open/ffmpeg — the signature and schema stay fixed."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[0:2], 16)
    height = int(h[2:4], 16)
    mode = "RGB" if len(payload) % 2 == 0 else "L"
    return width, height, mode


def decode_media_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, blob) → DECODE_SCHEMA rows."""
    for pdf in it:
        payloads = pdf["blob"]
        meta = [_fake_decode(bytes(b)) for b in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "width": pd.Series([m[0] for m in meta], dtype="int64"),
                "height": pd.Series([m[1] for m in meta], dtype="int64"),
                "mode": [m[2] for m in meta],
            }
        )


def with_media_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize the opaque binary column (here: utf-8 of the text —
    the stand-in payload; in production this is the raw image/audio)."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).cast("binary").alias("blob")
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' over the binary column.

    Scale: mapInPandas is narrow (no shuffle); each task streams its
    partition through the Python worker in Arrow batches, so memory is
    bounded by batch size, not partition size.
    """
    return df.mapInPandas(decode_media_batches, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: computes output dims/scale entirely in JVM
    expressions; the pixel transform itself would live in the same
    mapInPandas body as decode (unavailable here — stub)."""
    return df.withColumn(
        "scale_x", F.col("width") / F.lit(float(target_w))
    ).withColumn("scale_y", F.col("height") / F.lit(float(target_h)))
