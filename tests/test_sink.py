"""Sink data-plane tests: process_batch on static DataFrames (the Spark
analog of TopicPartitionWriterTest put()-driven tests) and a full
Structured Streaming E2E through the replay source + LocalEmulatorBackend
(the SURVEY §5 rebuild test plan, mirroring KustoSinkIT's round-trip)."""

import json

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.config import (
    BehaviorOnError,
    KustoSinkConfig,
    TopicToTableMapping,
)
from kafka_sink_azure_kusto_spark.streaming.backends import LocalEmulatorBackend
from kafka_sink_azure_kusto_spark.streaming.sink import KustoSparkSink


def _cfg(tmp_path, mappings=None, **kw):
    return KustoSinkConfig(
        ingest_url="https://ingest.example.kusto.windows.net",
        mappings=mappings
        or [
            TopicToTableMapping(topic="topic1", db="db1", table="table1", format="json"),
            TopicToTableMapping(topic="*", db="dbW", table="tableW", format="json"),
        ],
        staging_dir=str(tmp_path / "staging"),
        **kw,
    )


def _records_df(spark, n=10):
    rows = []
    for i in range(n):
        rows.append((f"k{i}", json.dumps({"hello": i}), "topic1", 0, i))
    rows.append(("tomb", None, "topic1", 0, n))  # tombstone — must be dropped
    rows.append(("w0", json.dumps({"w": 0}), "other", 0, 0))  # wildcard route
    return spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )


def test_process_batch_routes_and_ingests(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(_cfg(tmp_path), backend)
    sink.process_batch(_records_df(spark), epoch_id=0)

    rows = backend.table_rows("db1", "table1")
    assert [json.loads(r)["hello"] for r in rows] == list(range(10))
    assert backend.table_rows("dbW", "tableW") == ['{"w": 0}']
    # tombstone dropped (KustoSinkTask.java:510-513)
    assert len(rows) == 10
    m = sink.metrics.snapshot()
    assert m["RecordsWritten"] == 11
    assert m["IngestionSuccesses"] == 2
    assert m["IngestionFailures"] == 0


def test_staged_file_naming_and_log(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(_cfg(tmp_path), backend)
    sink.process_batch(_records_df(spark), epoch_id=7)
    log = backend.ingest_log()
    files = {e["file"] for e in log}
    assert "kafka_topic1_0_0.multijson.gz" in files  # B4 naming
    assert all(e["format"] == "multijson" for e in log)  # E5 coalescing


def test_size_roll_in_sink(spark, tmp_path):
    # ~54-byte lines at threshold 100 ⇒ 2 records per rolled file
    rows = [(f"k{i}", "x" * 53, "topic1", 0, i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="csv")],
        flush_size_bytes=100,
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    log = backend.ingest_log()
    assert len(log) == 3  # FileWriterTest-style roll count
    assert sorted(e["records"] for e in log) == [2, 2, 2]


def test_retry_then_success(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), fail_times=2)
    cfg = _cfg(tmp_path, retry_max_time_ms=50, retry_backoff_time_ms=10)
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(_records_df(spark, n=3), epoch_id=0)
    m = sink.metrics.snapshot()
    assert m["IngestionSuccesses"] == 2
    assert m["IngestionAttempts"] >= 4  # 2 failures + retries


def test_behavior_fail_raises(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    cfg = _cfg(tmp_path, behavior_on_error=BehaviorOnError.FAIL)
    sink = KustoSparkSink(cfg, backend)
    with pytest.raises(Exception):
        sink.process_batch(_records_df(spark, n=2), epoch_id=0)
    assert sink.metrics.snapshot()["IngestionFailures"] >= 1


def test_behavior_log_sends_dlq(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    dlq: list[dict] = []
    cfg = _cfg(tmp_path, behavior_on_error=BehaviorOnError.LOG)
    sink = KustoSparkSink(cfg, backend, dlq_writer=dlq.extend)
    sink.process_batch(_records_df(spark, n=3), epoch_id=0)  # must NOT raise
    assert len(dlq) == 4  # 3 topic1 + 1 wildcard record
    assert "topic=topic1" in dlq[0]["key"]  # K3 error-coordinates key
    m = sink.metrics.snapshot()
    assert m["DlqRecordsSent"] == 4
    assert m["RecordsFailed"] == 4


def test_dlq_keys_carry_per_record_offsets(spark, tmp_path):
    # K3 fidelity (TopicPartitionWriter.java:210-233): a multi-record
    # rolled file must yield one DLQ record per source record, each key
    # carrying the record's OWN offset — not the file's base offset.
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    dlq: list[dict] = []
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="json")],
        behavior_on_error=BehaviorOnError.IGNORE,
    )
    sink = KustoSparkSink(cfg, backend, dlq_writer=dlq.extend)
    sink.process_batch(_records_df(spark, n=5), epoch_id=0)  # one rolled file, 5 records
    keys = [d["key"] for d in dlq]
    assert len(keys) == 5
    for i in range(5):
        assert (
            f"topic=topic1, partition=0, offset={i}." in keys[i]
        ), keys[i]  # byte-identical to the dlq_key_format oracle's shape
    assert [json.loads(d["value"])["hello"] for d in dlq] == list(range(5))


def test_partial_failure_only_failed_files_reach_dlq(spark, tmp_path):
    # Per-file outcome tracking: 3 rolled files, the first ingest fails
    # permanently via a flaky wrapper — only that file's records may land
    # in the DLQ; the other files' records count as written.
    class FirstCallFails:
        def __init__(self, inner):
            self.inner = inner
            self.calls = 0

        def ingest_file(self, path, props):
            self.calls += 1
            if self.calls == 1:
                from kafka_sink_azure_kusto_spark.streaming.backends import (
                    PermanentIngestError,
                )

                raise PermanentIngestError("boom")
            return self.inner.ingest_file(path, props)

        def validate(self, props):
            return None

    rows = [(f"k{i}", "x" * 53, "topic1", 0, i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    dlq: list[dict] = []
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="csv")],
        flush_size_bytes=100,  # ⇒ 3 files × 2 records
        behavior_on_error=BehaviorOnError.LOG,
        ingest_threads=1,  # deterministic: first submitted file fails
    )
    backend = FirstCallFails(LocalEmulatorBackend(str(tmp_path / "kusto")))
    sink = KustoSparkSink(cfg, backend, dlq_writer=dlq.extend)
    sink.process_batch(df, epoch_id=0)
    m = sink.metrics.snapshot()
    assert m["RecordsWritten"] == 4  # 2 surviving files
    assert m["RecordsFailed"] == 2  # only the failed file
    assert m["DlqRecordsSent"] == 2
    dlq_offsets = sorted(int(d["key"].split("offset=")[1].rstrip(".")) for d in dlq)
    assert dlq_offsets == [0, 1]  # the failed file's own records


def test_ingest_runs_concurrently(spark, tmp_path):
    # The staged files of one batch must ingest in parallel (bounded
    # pool), not serially behind each other's latency.
    import threading
    import time as _time

    class SlowBackend:
        def __init__(self):
            self._lock = threading.Lock()
            self.active = 0
            self.max_active = 0

        def ingest_file(self, path, props):
            with self._lock:
                self.active += 1
                self.max_active = max(self.max_active, self.active)
            _time.sleep(0.3)
            with self._lock:
                self.active -= 1
            from kafka_sink_azure_kusto_spark.streaming.backends import IngestResult

            return IngestResult(status="Succeeded", source_id=path)

        def validate(self, props):
            return None

    rows = [(f"k{i}", "x" * 53, "topic1", i % 4, i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="csv")],
        flush_size_bytes=100,  # ⇒ 4 files (one per partition)
    )
    backend = SlowBackend()
    sink = KustoSparkSink(cfg, backend)
    t0 = _time.monotonic()
    sink.process_batch(df, epoch_id=0)
    elapsed = _time.monotonic() - t0
    assert backend.max_active >= 2  # genuinely concurrent
    assert elapsed < 4 * 0.3 + 2.0  # not serialized (4 × 0.3 s + slack)


def test_flush_interval_zero_rolls_per_record(spark, tmp_path):
    # B3 (FileWriter.java:298): flush.interval.ms == 0 ⇒ every record
    # rolls its own staged file, for ALL formats — not just avro-bytes.
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="json")],
        flush_interval_ms=0,
        trigger_interval_ms=100,
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(_records_df(spark, n=5), epoch_id=0)
    log = [e for e in backend.ingest_log() if e["table"] == "t"]
    assert len(log) == 5  # N records ⇒ N files
    assert all(e["records"] == 1 for e in log)


def test_permanent_error_skips_retry(spark, tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    cfg = _cfg(
        tmp_path,
        behavior_on_error=BehaviorOnError.IGNORE,
        retry_max_time_ms=300_000,
        retry_backoff_time_ms=10_000,
    )
    sink = KustoSparkSink(cfg, backend, dlq_writer=lambda rs: None)
    sink.process_batch(_records_df(spark, n=2), epoch_id=0)
    # R3: permanent ⇒ exactly 1 attempt per mapping, not 30
    assert sink.metrics.snapshot()["IngestionAttempts"] == 2


def test_struct_value_encodes_ndjson(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ("a", 1)), (2, ("b", 2))], "offset long, value struct<s:string,i:int>"
    ).select(
        F.lit("topic1").alias("topic"),
        F.lit(0).cast("long").alias("partition"),
        "offset",
        "value",
    )
    cfg = _cfg(
        tmp_path,
        mappings=[TopicToTableMapping(topic="topic1", db="db1", table="t", format="json")],
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    rows = [json.loads(r) for r in backend.table_rows("db1", "t")]
    assert rows == [{"s": "a", "i": 1}, {"s": "b", "i": 2}]
