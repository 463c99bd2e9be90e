"""Effectively-once upgrade (replay dedup at the backend) and K4
deserialization-failure splitting."""

import json

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.config import KustoSinkConfig, TopicToTableMapping
from kafka_sink_azure_kusto_spark.functions.filters import split_decode_failures
from kafka_sink_azure_kusto_spark.streaming import LocalEmulatorBackend, KustoSparkSink


def test_replay_dedupe_gives_effectively_once(spark, tmp_path):
    # the same micro-batch processed twice (simulated checkpoint replay
    # after a crash between ingest and commit) must not duplicate rows
    rows = [(f"k{i}", json.dumps({"i": i}), "t1", 0, i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    cfg = KustoSinkConfig(
        ingest_url="https://x.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t1", db="db", table="t", format="json")],
        staging_dir=str(tmp_path / "staging"),
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), dedupe_replays=True)
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    sink.process_batch(df, epoch_id=0)  # exact replay
    assert len(backend.table_rows("db", "t")) == 6  # not 12
    statuses = [e for e in backend.ingest_log()]
    assert len(statuses) == 1  # second ingest skipped, not re-logged


def test_replay_dedupe_off_duplicates(spark, tmp_path):
    # without the flag we match the reference's at-least-once behavior
    rows = [(f"k{i}", json.dumps({"i": i}), "t1", 0, i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    cfg = KustoSinkConfig(
        ingest_url="https://x.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t1", db="db", table="t", format="json")],
        staging_dir=str(tmp_path / "staging"),
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    sink.process_batch(df, epoch_id=0)
    assert len(backend.table_rows("db", "t")) == 6  # duplicates allowed


def test_split_decode_failures(spark):
    rows = [
        (0, '{"k": 1}'),
        (1, "garbage"),
        (2, '{"other": 5}'),  # valid JSON, expected field missing → bad
        (3, '{"k": 42}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, value string")
    good, bad = split_decode_failures(df, "k int")
    assert {r.event_id for r in good.collect()} == {0, 3}
    assert {r.event_id for r in bad.collect()} == {1, 2}
    # good side carries the decoded struct
    ks = {r.event_id: r._decoded.k for r in good.collect()}
    assert ks == {0: 1, 3: 42}
    # bad side keeps the raw value for the DLQ
    assert "garbage" in {r.value for r in bad.collect()}


def test_split_decode_failures_keeps_tombstones_out(spark):
    df = spark.createDataFrame(
        [(0, None), (1, '{"k": 9}')], "event_id long, value string"
    )
    good, bad = split_decode_failures(drop_nulls(df), "k int")
    assert {r.event_id for r in good.collect()} == {1}
    assert bad.count() == 0


def drop_nulls(df):
    return df.filter(F.col("value").isNotNull())
