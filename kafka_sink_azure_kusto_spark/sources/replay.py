"""File-replay stream source for tests and local runs.

Stands in for a Kafka broker: takes a static DataFrame (e.g. the driver
``events`` parquet, TESTDATA.md), renders it into the Kafka record shape
(key, value, topic, partition, offset) as NDJSON chunk files, then
re-reads the directory as a file stream with ``maxFilesPerTrigger=1`` so
each chunk becomes one micro-batch — the Spark analog of the reference
IT's embedded-Kafka producer loop (KustoSinkIT.java:339-462).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),  # null ⇒ tombstone
        StructField("topic", StringType(), False),
        StructField("partition", LongType(), False),
        StructField("offset", LongType(), False),
    ]
)


def as_kafka_records(
    df: DataFrame,
    topic_col,
    value_col,
    key_col=None,
    num_partitions: int = 4,
) -> DataFrame:
    """Render an arbitrary DataFrame into the Kafka record shape.

    ``partition`` is assigned by key hash (murmur3 like Kafka's default
    partitioner in spirit); ``offset`` is a per-(topic, partition) dense
    sequence — both computed with window functions, no driver round-trip.
    """
    from pyspark.sql import Window

    key = F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
    out = df.select(
        key.alias("key"),
        F.col(value_col).cast("string").alias("value"),
        F.col(topic_col).cast("string").alias("topic"),
    )
    out = out.withColumn(
        "partition", (F.abs(F.hash(F.coalesce(F.col("key"), F.col("value")))) % num_partitions).cast("long")
    )
    w = Window.partitionBy("topic", "partition").orderBy(F.coalesce("value", "key"))
    return out.withColumn("offset", (F.row_number().over(w) - 1).cast("long"))


def stage_replay_dir(records: DataFrame, replay_dir: str, chunks: int = 4) -> str:
    """Write the Kafka-shaped records as ``chunks`` NDJSON files; each file
    will be one micro-batch when replayed."""
    os.makedirs(replay_dir, exist_ok=True)
    records.repartition(chunks).write.mode("overwrite").json(replay_dir)
    return replay_dir


def replay_stream(spark: SparkSession, replay_dir: str, files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .json(replay_dir)
    )
