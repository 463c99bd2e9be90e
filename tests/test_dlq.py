"""Kafka DLQ writer tests (K3, TopicPartitionWriter.java:210-233 /
KustoSinkTask.java:442-458) — property surface round-trip and byte-exact
producer sends via an injected fake producer (no broker in CI)."""

import json

import pytest

from kafka_sink_azure_kusto_spark.config import KustoSinkConfig, TopicToTableMapping
from kafka_sink_azure_kusto_spark.streaming.backends import LocalEmulatorBackend
from kafka_sink_azure_kusto_spark.streaming.dlq import KafkaDlqWriter
from kafka_sink_azure_kusto_spark.streaming.sink import KustoSparkSink


class FakeProducer:
    def __init__(self):
        self.sent: list[tuple[str, bytes, bytes]] = []
        self.flushes = 0
        self.closed = False

    def send(self, topic, key=None, value=None):
        self.sent.append((topic, key, value))

    def flush(self):
        self.flushes += 1

    def close(self):
        self.closed = True


CONNECT_PROPS = {
    "kusto.ingestion.url": "https://ingest-c.kusto.windows.net",
    "kusto.tables.topics.mapping": '[{"topic":"t1","db":"db","table":"tb","format":"json"}]',
    "behavior.on.error": "log",
    "misc.deadletterqueue.bootstrap.servers": "dlq-broker:9092",
    "misc.deadletterqueue.topic.name": "dlq.topic",
    "misc.deadletterqueue.security.protocol": "SASL_SSL",
    "misc.deadletterqueue.sasl.mechanism": "PLAIN",
    "misc.deadletterqueue.ssl.truststore.location": "/tmp/ts.jks",
}


def test_dlq_props_roundtrip_from_connect_properties():
    # KustoSinkConfig.getDlqProps parity (KustoSinkConfig.java:465-472):
    # prefix-stripped pass-through + bootstrap + byte-array serializers.
    cfg = KustoSinkConfig.from_connect_properties(CONNECT_PROPS)
    assert cfg.dlq_enabled
    assert cfg.dlq_props == {
        "security.protocol": "SASL_SSL",
        "sasl.mechanism": "PLAIN",
        "ssl.truststore.location": "/tmp/ts.jks",
    }
    props = cfg.dlq_producer_props()
    assert props["bootstrap.servers"] == "dlq-broker:9092"
    assert props["security.protocol"] == "SASL_SSL"
    assert props["key.serializer"].endswith("ByteArraySerializer")
    assert props["value.serializer"].endswith("ByteArraySerializer")
    # DLQ keys are owned, not generic extras
    assert not any(k.startswith("misc.deadletterqueue") for k in cfg.extra)


def test_kafka_dlq_writer_sends_key_value_bytes():
    fake = FakeProducer()
    cfg = KustoSinkConfig.from_connect_properties(CONNECT_PROPS)
    writer = KafkaDlqWriter.from_config(cfg, producer_factory=lambda props: fake)
    writer(
        [
            {"key": "coords-0", "value": '{"a": 1}'},
            {"key": "coords-1", "value": b"\x00binary\xff"},
        ]
    )
    assert fake.sent == [
        ("dlq.topic", b"coords-0", b'{"a": 1}'),
        ("dlq.topic", b"coords-1", b"\x00binary\xff"),
    ]
    assert fake.flushes == 1
    writer.close()
    assert fake.closed


def test_kafka_dlq_writer_gates_without_client():
    cfg = KustoSinkConfig.from_connect_properties(CONNECT_PROPS)
    writer = KafkaDlqWriter.from_config(cfg)  # default factory, no kafka-python
    with pytest.raises(NotImplementedError, match="kafka-python"):
        writer([{"key": "k", "value": "v"}])


def test_sink_wires_kafka_dlq_from_config(spark, tmp_path):
    # End-to-end: DLQ-configured sink + failing backend ⇒ failed records
    # land on the fake Kafka producer with per-record coordinate keys.
    fake = FakeProducer()
    cfg = KustoSinkConfig.from_connect_properties(CONNECT_PROPS)
    cfg.staging_dir = str(tmp_path / "staging")
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    sink = KustoSparkSink(cfg, backend)
    sink._dlq_writer = KafkaDlqWriter.from_config(cfg, producer_factory=lambda p: fake)
    rows = [(f"k{i}", json.dumps({"n": i}), "t1", 0, i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )
    sink.process_batch(df, epoch_id=0)  # behavior=log ⇒ no raise
    assert len(fake.sent) == 3
    for i, (topic, key, value) in enumerate(fake.sent):
        assert topic == "dlq.topic"
        assert f"topic=t1, partition=0, offset={i}.".encode() in key
        assert json.loads(value) == {"n": i}
    assert sink.metrics.snapshot()["DlqRecordsSent"] == 3


def test_dlq_writer_requires_dlq_config():
    cfg = KustoSinkConfig(
        ingest_url="https://c.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t", db="d", table="t2")],
    )
    with pytest.raises(ValueError, match="not configured"):
        KafkaDlqWriter.from_config(cfg)


def test_producer_factory_coerces_bool_and_acks(monkeypatch):
    # kafka-python rejects string acks ('1') and treats 'false' as truthy
    # for ssl_check_hostname — the factory must coerce Java-prop strings.
    import sys
    import types

    captured = {}

    class CapturingProducer:
        def __init__(self, **kwargs):
            captured.update(kwargs)

    fake_kafka = types.ModuleType("kafka")
    fake_kafka.KafkaProducer = CapturingProducer
    monkeypatch.setitem(sys.modules, "kafka", fake_kafka)

    from kafka_sink_azure_kusto_spark.streaming.dlq import _default_producer_factory

    _default_producer_factory(
        {
            "bootstrap.servers": "b:9092",
            "ssl.check.hostname": "false",
            "acks": "1",
            "retries": "3",
        }
    )
    assert captured["ssl_check_hostname"] is False
    assert captured["acks"] == 1
    assert captured["retries"] == 3

    captured.clear()
    _default_producer_factory(
        {"bootstrap.servers": "b:9092", "ssl.check.hostname": "TRUE", "acks": "all"}
    )
    assert captured["ssl_check_hostname"] is True
    assert captured["acks"] == "all"


# ------------------------------------------------------- executor-side DLQ


from kafka_sink_azure_kusto_spark.streaming.dlq import FileDlqProducer


def _failed_batch_df(spark):
    rows = [(f"k{i}", json.dumps({"n": i}), "t1", 0, i) for i in range(6)]
    return spark.createDataFrame(
        rows, "key string, value string, topic string, partition long, offset long"
    )


def test_executor_side_dlq_bytes_match_driver_path(spark, tmp_path):
    import base64
    import functools
    import os

    # --- driver path (reference shape) ---
    fake = FakeProducer()
    cfg_d = KustoSinkConfig.from_connect_properties(CONNECT_PROPS)
    cfg_d.staging_dir = str(tmp_path / "staging_d")
    sink_d = KustoSparkSink(
        cfg_d, LocalEmulatorBackend(str(tmp_path / "kusto_d"), permanent_fail=True)
    )
    sink_d._dlq_writer = KafkaDlqWriter.from_config(cfg_d, producer_factory=lambda p: fake)
    sink_d.process_batch(_failed_batch_df(spark), epoch_id=0)
    driver_records = {(k, v) for _, k, v in fake.sent}
    assert len(driver_records) == 6

    # --- executor path (scale shape) ---
    capture = tmp_path / "capture"
    capture.mkdir()
    props = dict(CONNECT_PROPS)
    props["misc.deadletterqueue.executor.side.enable"] = "true"
    cfg_e = KustoSinkConfig.from_connect_properties(props)
    assert cfg_e.dlq_executor_side
    cfg_e.staging_dir = str(tmp_path / "staging_e")
    sink_e = KustoSparkSink(
        cfg_e,
        LocalEmulatorBackend(str(tmp_path / "kusto_e"), permanent_fail=True),
        dlq_partition_producer_factory=functools.partial(
            FileDlqProducer, directory=str(capture)
        ),
    )
    sink_e.process_batch(_failed_batch_df(spark), epoch_id=0)

    executor_records = set()
    topics = set()
    for name in os.listdir(capture):
        with open(capture / name) as f:
            for line in f:
                r = json.loads(line)
                topics.add(r["topic"])
                executor_records.add(
                    (base64.b64decode(r["key"]), base64.b64decode(r["value"]))
                )
    assert topics == {"dlq.topic"}
    assert executor_records == driver_records  # byte-identical per record
    assert sink_e.metrics.snapshot()["DlqRecordsSent"] == 6


def test_fallback_file_dlq_writes_from_executors(spark, tmp_path):
    # No custom writer, no executor flag, no Kafka DLQ config: the
    # fallback must still land failed records as JSONL under
    # staging/_dlq WITHOUT collecting the failure tail to the driver,
    # and dlq_records_sent must count delivered records.
    import base64
    import os

    cfg = KustoSinkConfig(
        ingest_url="https://ingest-c.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t1", db="db", table="tb", format="json")],
        staging_dir=str(tmp_path / "staging"),
        behavior_on_error="LOG",
    )
    sink = KustoSparkSink(
        cfg, LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True)
    )
    sink.process_batch(_failed_batch_df(spark), epoch_id=0)

    dlq_dir = tmp_path / "staging" / "_dlq"
    records = []
    for name in os.listdir(dlq_dir):
        with open(dlq_dir / name) as f:
            for line in f:
                r = json.loads(line)
                records.append(
                    (r["topic"], base64.b64decode(r["key"]), base64.b64decode(r["value"]))
                )
    assert len(records) == 6
    assert {t for t, _, _ in records} == {"dlq.db.tb"}
    values = {json.loads(v)["n"] for _, _, v in records}
    assert values == set(range(6))
    for _, k, _ in records:
        assert k.startswith(b"Failed to write record to KustoDB")
    assert sink.metrics.snapshot()["DlqRecordsSent"] == 6


def test_executor_dlq_metric_counts_sent_records(spark, tmp_path):
    # The executor path evaluates the failure frame ONCE and counts via
    # accumulator — a partition whose producer dies before flush must
    # not be counted as sent.
    import functools

    class ExplodingFileProducer(FileDlqProducer):
        def flush(self):
            raise RuntimeError("broker gone")

    props = dict(CONNECT_PROPS)
    props["misc.deadletterqueue.executor.side.enable"] = "true"
    cfg = KustoSinkConfig.from_connect_properties(props)
    cfg.staging_dir = str(tmp_path / "staging")
    sink = KustoSparkSink(
        cfg,
        LocalEmulatorBackend(str(tmp_path / "kusto"), permanent_fail=True),
        dlq_partition_producer_factory=functools.partial(
            ExplodingFileProducer, directory=str(tmp_path / "capture")
        ),
    )
    with pytest.raises(Exception):
        sink.process_batch(_failed_batch_df(spark), epoch_id=0)
    assert sink.metrics.snapshot()["DlqRecordsSent"] == 0
