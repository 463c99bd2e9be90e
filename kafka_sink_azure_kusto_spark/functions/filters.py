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


def split_decode_failures(
    df: DataFrame, schema: str, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """K4 — deserialization-failure DLQ routing (inherited from the
    Connect framework in the reference, README.md:169-177; here a
    first-class split): parse ``value_col`` with the expected schema;
    records where every parsed field is null while the raw value is
    non-null are malformed → second DataFrame (DLQ side).

    Returns (decoded_good, raw_bad). Narrow — two filters over the same
    scan, no shuffle; Catalyst computes from_json once per branch."""
    parsed = df.withColumn("_decoded", F.from_json(F.col(value_col).cast("string"), schema))
    fields = parsed.schema["_decoded"].dataType.fieldNames()
    all_null = None
    for f_name in fields:
        c = F.col("_decoded").getField(f_name).isNull()
        all_null = c if all_null is None else (all_null & c)
    bad_cond = F.col(value_col).isNotNull() & (
        F.col("_decoded").isNull() | all_null
    )
    good = parsed.filter(~bad_cond)
    bad = parsed.filter(bad_cond).drop("_decoded")
    return good, bad


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
