"""Loaders for the driver's TESTDATA parquet tables (TESTDATA.md).

The driver generates parquet with nanosecond (TIMESTAMP_NANOS) columns,
which Spark's vectorized reader rejects by default. We flip the public
``spark.sql.legacy.parquet.nanosAsLong`` conf (runtime-settable) and
convert the resulting epoch-nanos longs back to TimestampType at
microsecond precision — the same truncation DuckDB applies when reading
TIMESTAMP_NS into its TIMESTAMP type, so oracle comparisons line up
exactly.
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
    for c in _TS_COLUMNS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # Integer `div` (NOT `/`): epoch-nanos ≈ 1.7e18 exceeds double
            # mantissa precision, so float division is off by ±1 µs.
            # Truncating integer division matches DuckDB's ns→µs behavior
            # for the positive epoch range the generator uses.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
