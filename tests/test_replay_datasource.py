"""The custom ``kafka_replay`` Python DataSource: batch parity with the
JVM JSON reader, partition planning (one per chunk), and the streaming
offset lifecycle (one chunk per micro-batch, availableNow drains all)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.sources.replay_datasource import (
    DATASOURCE_API_AVAILABLE,
    KafkaReplayBatchReader,
    register_kafka_replay_source,
)

pytestmark = pytest.mark.skipif(
    not DATASOURCE_API_AVAILABLE, reason="pyspark.sql.datasource API unavailable"
)

_MTIME = [1_600_000_000]


def _chunk(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # temp + rename: chunks are now written WHILE a query lists the dir
    tmp = path + ".tmp_"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    _MTIME[0] += 1000
    os.utime(tmp, (_MTIME[0], _MTIME[0]))
    os.replace(tmp, path)


def _rec(i, topic="t", tombstone=False):
    return {
        "key": str(i),
        "value": None if tombstone else f"v{i}",
        "topic": topic,
        "partition": i % 2,
        "offset": i,
    }


@pytest.fixture
def replay_dir(tmp_path):
    d = str(tmp_path / "replay")
    _chunk(f"{d}/a.json", [_rec(0), _rec(1), _rec(2, tombstone=True)])
    _chunk(f"{d}/b.json", [_rec(3, topic="u"), _rec(4)])
    _chunk(f"{d}/c.json", [_rec(5)])
    return d


def test_batch_read_matches_jvm_json_reader(spark, replay_dir):
    register_kafka_replay_source(spark)
    custom = spark.read.format("kafka_replay").option("path", replay_dir).load()
    jvm = (
        spark.read.schema(
            "key string, value string, topic string, partition bigint, offset bigint"
        ).json(replay_dir)
    )
    a = {tuple(r) for r in custom.collect()}
    b = {tuple(r) for r in jvm.collect()}
    assert a == b and len(a) == 6
    # tombstone survives as NULL value (F1 semantics downstream)
    assert custom.filter(F.col("value").isNull()).count() == 1


def test_batch_partitions_one_per_chunk(replay_dir):
    reader = KafkaReplayBatchReader({"path": replay_dir})
    parts = reader.partitions()
    assert len(parts) == 3
    # chunk order follows (mtime, name) — the replay batch order
    assert [os.path.basename(p.path) for p in parts] == ["a.json", "b.json", "c.json"]
    assert sum(1 for _ in reader.read(parts[0])) == 3


def test_missing_path_option_raises():
    with pytest.raises(ValueError):
        KafkaReplayBatchReader({})


def test_stream_batches_follow_arriving_files(spark, tmp_path):
    """Files appearing over time become separate micro-batches — the
    production arrival pattern (latestOffset reports the monotone
    on-disk truth, so batching granularity IS arrival granularity).
    Python stream sources don't support Trigger.AvailableNow (Spark
    falls back to single-batch), so this drives the real offset
    lifecycle with a processing-time trigger."""
    import time

    register_kafka_replay_source(spark)
    d = str(tmp_path / "replay")
    _chunk(f"{d}/a.json", [_rec(0), _rec(1), _rec(2, tombstone=True)])
    stream = spark.readStream.format("kafka_replay").option("path", d).load()
    name = "kafka_replay_stream_test"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )

    def wait_rows(n):
        deadline = time.time() + 90
        while time.time() < deadline and spark.table(name).count() < n:
            time.sleep(0.3)
        return spark.table(name).count()

    assert wait_rows(3) == 3
    _chunk(f"{d}/b.json", [_rec(3, topic="u"), _rec(4)])
    assert wait_rows(5) == 5
    _chunk(f"{d}/c.json", [_rec(5)])
    assert wait_rows(6) == 6
    nonempty_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    q.stop()
    out = spark.table(name)
    assert out.count() == 6
    # each arrival wave became its own batch (at least 3 nonempty)
    assert nonempty_batches >= 3
    assert {r["topic"] for r in out.collect()} == {"t", "u"}


def test_stream_offsets_identify_files_not_positions(tmp_path):
    """Offsets carry the last-consumed basename; a file arriving with an
    earlier (mtime, name) than committed files shifts the positional
    mapping and MUST be rejected, not silently replayed/skipped
    (round-6 advice: exactly-once only held for append-only arrival)."""
    from kafka_sink_azure_kusto_spark.sources.replay_datasource import (
        KafkaReplayStreamReader,
    )

    d = str(tmp_path / "replay")
    _chunk(f"{d}/b.json", [_rec(0)])
    _chunk(f"{d}/c.json", [_rec(1)])
    r = KafkaReplayStreamReader({"path": d})
    assert r.initialOffset() == {"index": 0, "last": None}
    end = r.latestOffset()
    assert end == {"index": 2, "last": "c.json"}
    parts = r.partitions(r.initialOffset(), end)
    assert [os.path.basename(p.path) for p in parts] == ["b.json", "c.json"]

    # a.json arrives with an mtime BEFORE the committed files (backdated
    # copy / clock skew): positional index 2 no longer means c.json
    _chunk(f"{d}/a.json", [_rec(9)])
    os.utime(f"{d}/a.json", (1_500_000_000, 1_500_000_000))
    with pytest.raises(RuntimeError, match="committed prefix changed"):
        r.partitions(end, r.latestOffset())

    # committed file removed entirely → offset exceeds listing
    os.remove(f"{d}/a.json")
    os.remove(f"{d}/c.json")
    with pytest.raises(RuntimeError, match="exceeds current listing"):
        r.partitions(end, {"index": 1, "last": "b.json"})


def test_stream_offsets_positional_fallback_pre_upgrade(tmp_path):
    """Checkpoints written before the identity upgrade ({'index': N}
    with no 'last') still resolve positionally with a length check."""
    from kafka_sink_azure_kusto_spark.sources.replay_datasource import (
        KafkaReplayStreamReader,
    )

    d = str(tmp_path / "replay")
    _chunk(f"{d}/a.json", [_rec(0)])
    _chunk(f"{d}/b.json", [_rec(1)])
    r = KafkaReplayStreamReader({"path": d})
    parts = r.partitions({"index": 1}, {"index": 2})
    assert [os.path.basename(p.path) for p in parts] == ["b.json"]
    with pytest.raises(RuntimeError, match="exceeds current listing"):
        r.partitions({"index": 3}, {"index": 3})


def test_stream_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Stop, add data, restart on the same checkpoint: every record is
    delivered EXACTLY once across the two runs. This test caught the
    original offset-monotonicity bug (an in-memory throttled
    latestOffset regressed below the committed offset after restart and
    re-served a committed file under a new batch id — see the reader
    docstring); latestOffset now reports the durable on-disk truth."""
    import time

    register_kafka_replay_source(spark)
    d = str(tmp_path / "replay")
    _chunk(f"{d}/a.json", [_rec(0), _rec(1), _rec(2, tombstone=True)])
    _chunk(f"{d}/b.json", [_rec(3, topic="u"), _rec(4)])
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def run(wait_rows: int) -> int:
        stream = spark.readStream.format("kafka_replay").option("path", d).load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= wait_rows:
                break
            time.sleep(0.3)
        q.stop()
        return n

    assert run(5) == 5  # first run drains what exists, then stops
    _chunk(f"{d}/c.json", [_rec(5)])  # new data arrives while down
    assert run(6) == 6  # restart picks up ONLY the new chunk
    keys = [r["key"] for r in spark.read.parquet(out).collect()]
    assert len(keys) == len(set(keys)) == 6  # exactly once per record


def test_stream_composes_with_watermarked_aggregation(spark, tmp_path):
    """The custom Python source feeding a REAL stateful pipeline:
    kafka_replay → from_json → event-time watermark → windowed count.
    Proves the offset lifecycle composes with Spark's stateful engine
    (what any custom enterprise source must support), not just
    pass-through reads."""
    import json as _json
    import time

    register_kafka_replay_source(spark)
    d = str(tmp_path / "replay")

    def ev(i, minute):
        return {
            "key": str(i),
            "value": _json.dumps(
                {"user": i % 3, "ts": f"2024-01-01 10:{minute:02d}:00"}
            ),
            "topic": "t",
            "partition": i % 2,
            "offset": i,
        }

    # two chunks: minutes 0-9 (10 events), then 30-34 (5 events) — the
    # second chunk's event time closes the first 10-minute window
    _chunk(f"{d}/a.json", [ev(i, i) for i in range(10)])
    _chunk(f"{d}/b.json", [ev(100 + i, 30 + i) for i in range(5)])

    stream = spark.readStream.format("kafka_replay").option("path", d).load()
    parsed = (
        stream.select(
            F.from_json(F.col("value"), "user long, ts timestamp").alias("j")
        )
        .select("j.user", "j.ts")
        .withWatermark("ts", "1 minute")
    )
    agg = parsed.groupBy(F.window("ts", "10 minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    name = "kr_agg_out"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and spark.table(name).count() < 1:
        time.sleep(0.3)
    q.stop()
    rows = {
        r["window"].start.strftime("%H:%M"): r["n"]
        for r in spark.table(name).collect()
    }
    # append mode emits the 10:00 window once the watermark (10:34-1min)
    # passes its end; the 10:30 window stays open (correctly unemitted)
    assert rows == {"10:00": 10}
