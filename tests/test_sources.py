"""Kafka source option builder (S1/S2) and replay source shaping."""

import pytest

from kafka_sink_azure_kusto_spark.sources.kafka import kafka_source_options


def test_subscribe_options():
    opts = kafka_source_options("b:9092", topics="t1,t2", starting_offsets="earliest")
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == "earliest"  # auto.offset.reset analog
    assert opts["kafka.bootstrap.servers"] == "b:9092"


def test_subscribe_pattern():
    # topics.regex subscription (KustoSinkIT.java:249-258)
    opts = kafka_source_options("b:9092", topics_regex="multijson.*")
    assert opts["subscribePattern"] == "multijson.*"
    assert "subscribe" not in opts


def test_exactly_one_subscription():
    with pytest.raises(ValueError):
        kafka_source_options("b:9092")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", topics="a", topics_regex="b")


def test_parallelism_and_batch_bounds():
    opts = kafka_source_options(
        "b:9092", topics="t", min_partitions=64, max_offsets_per_trigger=100_000
    )
    assert opts["minPartitions"] == "64"  # C1 tasks≈partitions analog
    assert opts["maxOffsetsPerTrigger"] == "100000"  # B1 at the source


def test_replay_shapes_kafka_records(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.sources.replay import as_kafka_records
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(50)
    rec = as_kafka_records(
        ev.withColumn("v", F.col("props")), topic_col="event_type", value_col="v",
        key_col="event_id", num_partitions=4,
    )
    assert set(rec.columns) == {"key", "value", "topic", "partition", "offset"}
    # offsets dense per (topic, partition) starting at 0
    mins = rec.groupBy("topic", "partition").agg(F.min("offset").alias("m")).collect()
    assert all(r.m == 0 for r in mins)
    assert rec.filter(F.col("partition") >= 4).count() == 0
