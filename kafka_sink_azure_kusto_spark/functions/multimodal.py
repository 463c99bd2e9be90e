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


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("feat_idx", LongType(), False),
        StructField("feature", StringType(), False),
    ]
)


def feature_extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for feature extraction: blob → 8 scalar features
    in long form (doc_id, feat_idx, feature). STUB feature function —
    md5-derived hex-pair values, so the SQL oracle reproduces it exactly
    on the text stand-in payload; a real deployment swaps in a CLIP/CNN
    embedding call with the identical Arrow batch shape. Features are
    emitted as fixed-6-decimal strings to keep the cross-engine hash in
    exact arithmetic."""
    for pdf in it:
        rows = {"doc_id": [], "feat_idx": [], "feature": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            h = hashlib.md5(bytes(blob)).hexdigest()
            for i in range(8):
                rows["doc_id"].append(int(doc_id))
                rows["feat_idx"].append(i)
                rows["feature"].append(f"{int(h[2 * i:2 * i + 2], 16) / 255.0:.6f}")
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "feat_idx": pd.Series(rows["feat_idx"], dtype="int64"),
                "feature": rows["feature"],
            }
        )


def feature_extract(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column — narrow
    (no shuffle), memory bounded by the Arrow batch, output long-form so
    downstream aggregation/indexing shuffles carry fixed-width rows."""
    return df.mapInPandas(feature_extract_batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video columns: derive the frame count
    from the payload metadata (STUB: 1 + n_bytes mod 60 — a real
    deployment reads the container header in the decode pass) and emit
    every ``every_k``-th frame index. Entirely JVM-side
    (sequence + explode): the expensive per-frame decode then runs ONLY
    on the sampled (doc_id, frame_idx) rows, which is the point of
    sampling before decoding at 100 TB."""
    n_frames = (F.length("blob").cast("long") % 60 + 1).alias("n_frames")
    return (
        df.select("doc_id", F.length("blob").cast("long").alias("n_bytes"), n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))),
        )
        .select("doc_id", "n_frames", "frame_idx")
    )
