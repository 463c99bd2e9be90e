"""Structured Streaming E2E (SURVEY §5 rebuild test plan): replay source
→ sink → emulator round-trip, recovery semantics, bytes-avro mode,
validation probes, multimodal plumbing."""

import json

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.config import KustoSinkConfig, TopicToTableMapping
from kafka_sink_azure_kusto_spark.sources.replay import (
    as_kafka_records,
    replay_stream,
    stage_replay_dir,
)
from kafka_sink_azure_kusto_spark.sources.tables import load_table
from kafka_sink_azure_kusto_spark.streaming import LocalEmulatorBackend, KustoSparkSink
from kafka_sink_azure_kusto_spark.streaming.metrics import make_metrics_listener


def _cfg(tmp_path, mappings, **kw):
    kw.setdefault("checkpoint_location", str(tmp_path / "chk"))
    return KustoSinkConfig(
        ingest_url="https://ingest.x.kusto.windows.net",
        mappings=mappings,
        staging_dir=str(tmp_path / "staging"),
        **kw,
    )


def test_streaming_roundtrip_with_routing(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(300)
    records = as_kafka_records(
        events.withColumn("v", F.to_json(F.struct("event_id", "user_id"))),
        topic_col="event_type",
        value_col="v",
        key_col="event_id",
    )
    tombs = records.limit(3).withColumn("value", F.lit(None).cast("string"))
    n_live = records.count()
    stage_replay_dir(records.unionByName(tombs), str(tmp_path / "replay"), chunks=2)

    cfg = _cfg(
        tmp_path,
        [
            TopicToTableMapping(topic="click", db="t", table="clicks", format="json"),
            TopicToTableMapping(topic="*", db="t", table="misc", format="json"),
        ],
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    listener = make_metrics_listener(sink.metrics)
    spark.streams.addListener(listener)
    try:
        q = sink.attach(
            replay_stream(spark, str(tmp_path / "replay")), available_now=True
        )
        # assert the availableNow query actually DRAINED before closing:
        # under heavy machine contention 120 s was occasionally not
        # enough, and closing a live query truncates the ingest counts
        terminated = q.awaitTermination(300)
        assert terminated, "streaming query did not drain within 300 s"
        KustoSparkSink.close(q)
    finally:
        spark.streams.removeListener(listener)

    clicks = backend.table_rows("t", "clicks")
    misc = backend.table_rows("t", "misc")
    n_clicks_src = events.filter(F.col("event_type") == "click").count()
    assert len(clicks) == n_clicks_src
    assert len(clicks) + len(misc) == n_live  # tombstones dropped
    # round-trip one record
    sample = json.loads(clicks[0])
    src = events.filter(F.col("event_id") == sample["event_id"]).collect()[0]
    assert src.user_id == sample["user_id"]
    # M1 listener published the final counters
    assert listener.last_published.get("RecordsWritten") == n_live


def test_avro_bytes_roll_per_message(spark, tmp_path):
    # E4: pre-serialized Avro payloads — every message is a complete
    # container file; one staged file per record regardless of threshold
    # (TopicPartitionWriterTest.java:260-291 analog).
    rows = [(f"k{i}", bytearray(b"avrobytes-%d" % i), "t1", 0, i) for i in range(4)]
    df = spark.createDataFrame(
        rows, "key string, value binary, topic string, partition long, offset long"
    )
    cfg = _cfg(
        tmp_path,
        [TopicToTableMapping(topic="t1", db="db", table="tb", format="avro")],
        flush_size_bytes=10_000_000,
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    log = backend.ingest_log()
    assert len(log) == 4  # one ingest per message despite huge threshold
    assert {e["records"] for e in log} == {1}
    assert all(e["file"].endswith(".avro.gz") for e in log)


def test_struct_to_avro_container_roundtrip(spark, tmp_path):
    # E2 (AvroRecordWriterProvider.java:27-73): struct payloads are staged
    # as real Avro Object Container Files — parse one back and check both
    # values and the declared reader schema.
    from kafka_sink_azure_kusto_spark.functions.avro_io import read_container

    df = spark.createDataFrame(
        [(("x", 1), "t1", 0, 0), (("y", None), "t1", 0, 1)],
        "value struct<s:string,i:int>, topic string, partition long, offset long",
    )
    cfg = _cfg(tmp_path, [TopicToTableMapping(topic="t1", db="d", table="t", format="avro")])
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    files = backend.table_files("d", "t")
    assert len(files) == 1
    with open(files[0], "rb") as f:
        schema, records = read_container(f.read())
    assert [f_["name"] for f_ in schema["fields"]] == ["s", "i"]
    assert records == [{"s": "x", "i": 1}, {"s": "y", "i": None}]
    assert backend.ingest_log()[0]["records"] == 2


def test_validation_probes(tmp_path):
    # V1/V2/V4 through the strict emulator (validateTableMappings analog)
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), strict_validation=True)
    backend.create_table("db1", "ok_table", streaming_policy=True)
    backend.create_mapping("db1", "ok_table", "Mapping", "JSON")
    good = _cfg(
        tmp_path,
        [
            TopicToTableMapping(
                topic="a", db="db1", table="ok_table", format="json",
                mapping="Mapping", streaming=True,
            )
        ],
        validate_tables=True,
    )
    KustoSparkSink(good, backend)  # must not raise

    bad = _cfg(
        tmp_path,
        [
            TopicToTableMapping(topic="a", db="db1", table="missing", format="json"),
            TopicToTableMapping(
                topic="b", db="db1", table="ok_table", format="json", mapping="Nope"
            ),
        ],
        validate_tables=True,
    )
    with pytest.raises(RuntimeError) as ei:
        KustoSparkSink(bad, backend)
    msg = str(ei.value)
    assert "missing" in msg and "Nope" in msg  # errors aggregated (V1 + V2)


def test_validation_off_by_default(tmp_path):
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"), strict_validation=True)
    cfg = _cfg(
        tmp_path, [TopicToTableMapping(topic="a", db="nodb", table="notable")]
    )  # validate_tables defaults False (kusto.validation.table.enable=false)
    KustoSparkSink(cfg, backend)  # no probe, no raise


def test_multimodal_decode_real_content(spark, sf_dir):
    from kafka_sink_azure_kusto_spark.functions import multimodal as M
    from kafka_sink_azure_kusto_spark.functions.codecs import decode_media_bytes

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = M.decode_media(M.with_synth_media_blob(docs)).collect()
    assert len(out) == 20
    for r in out:
        payload = M.synth_media_payload(r.doc_id)
        m = decode_media_bytes(payload)
        assert r.media_type == {0: "bmp", 1: "ppm", 2: "wav"}[r.doc_id % 3]
        assert r.n_bytes == len(payload)
        assert (r.width, r.height, r.sample_rate) == (m.width, m.height, m.sample_rate)
        assert r.n_samples == len(m.samples)
        assert r.sample_sum == sum(m.samples)
        assert r.checksum == sum((j + 1) * v for j, v in enumerate(m.samples))
