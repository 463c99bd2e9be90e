"""Record-level filters (SURVEY §2.2 F1–F2).

Reference behavior:
- F1 tombstone filter: records with a null value are dropped before
  writing (KustoSinkTask.java:510-513).
- F2 empty-serialization filter: Struct records that serialize to zero
  bytes of JSON are skipped (JsonRecordWriterProvider.java:53-56).

Both are narrow (no-shuffle) filters that Catalyst pushes down to the
source scan, so at 100 TB they cost a predicate per row, not a stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_tombstones(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F1 — drop Kafka tombstones (null value, KustoSinkTask.java:510-513).

    Narrow filter; pushed into the Kafka/parquet scan by Catalyst.
    """
    return df.filter(F.col(value_col).isNotNull())


def _serialized_length(col: Column) -> Column:
    # For binary payloads use byte length; for anything else the JSON/string
    # rendering length, matching JsonRecordWriterProvider's "bytes written".
    return F.length(col)


def drop_empty_serializations(df: DataFrame, value_col: str = "value") -> DataFrame:
    """F2 — drop records whose serialized form is empty
    (JsonRecordWriterProvider.java:53-56): zero-length strings/bytes or
    JSON that renders to an empty object.
    """
    col = F.col(value_col)
    return df.filter(
        col.isNotNull()
        & (_serialized_length(col) > 0)
        & (col.cast("string") != F.lit("{}"))
    )
