"""Kafka source builder (SURVEY §2.1 S1–S2).

Reference: the Connect framework owns the consumer; the connector picks
topics via ``topics`` / ``topics.regex`` (KustoSinkTask subscription,
regex exercised at KustoSinkIT.java:249-258) and offset reset via
``auto.offset.reset`` (README.md:400).

Spark: ``spark.readStream.format("kafka")`` with ``subscribe`` /
``subscribePattern`` / ``startingOffsets``. The returned DataFrame has
the canonical columns (key, value, topic, partition, offset, timestamp)
— the same record coordinates the reference tracks. ``minPartitions``
maps the reference's tasks≈partitions sizing guidance (README.md:693).

The kafka-sql connector jar ships with Spark distributions but may not
be on the classpath in this test environment — the builder only
assembles options, so it stays unit-testable without a broker.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def kafka_source_options(
    bootstrap_servers: str,
    topics: Optional[str] = None,
    topics_regex: Optional[str] = None,
    starting_offsets: str = "latest",  # auto.offset.reset default (README.md:400)
    min_partitions: Optional[int] = None,
    max_offsets_per_trigger: Optional[int] = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    if (topics is None) == (topics_regex is None):
        raise ValueError("exactly one of topics / topics_regex is required")
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if topics is not None:
        opts["subscribe"] = topics  # S1 explicit list
    else:
        opts["subscribePattern"] = topics_regex  # S1 regex subscription
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)  # C1 parallelism
    if max_offsets_per_trigger is not None:
        # B1 at the source: bound per-trigger batch size.
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(spark: SparkSession, **kwargs) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
