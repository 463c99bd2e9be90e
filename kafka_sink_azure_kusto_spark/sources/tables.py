"""Loaders for the driver's TESTDATA parquet tables (TESTDATA.md).

Timestamp normalization — the driver has shipped two layouts across
rounds, and the loader accepts BOTH, always landing on TimestampType
(µs, session-zone semantics) so every downstream expression
(unix_micros, casts, window functions) sees one type:

- TIMESTAMP_NANOS columns (rounds 1-3): Spark's vectorized reader
  rejects these by default; we flip the public
  ``spark.sql.legacy.parquet.nanosAsLong`` conf (runtime-settable) and
  convert the epoch-nanos longs to µs TimestampType — the same
  truncation DuckDB applies reading TIMESTAMP_NS.
- TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (round 4 data):
  Spark reads TIMESTAMP_NTZ; we cast to TimestampType. The cast keeps
  the wall-clock reading, which is also what DuckDB's naive TIMESTAMP
  holds — so cross-engine value hashes line up in any session zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Known event-time columns per TESTDATA table (nanos in the parquet).
_TS_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA table; timestamps land as TimestampType (µs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        if dtypes[c] == "bigint":
            # Integer `div` (NOT `/`): epoch-nanos ≈ 1.7e18 exceeds double
            # mantissa precision, so float division is off by ±1 µs.
            # Truncating integer division matches DuckDB's ns→µs behavior
            # for the positive epoch range the generator uses.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes[c] == "timestamp_ntz":
            # µs-NTZ parquet: keep the wall-clock reading as TimestampType
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
