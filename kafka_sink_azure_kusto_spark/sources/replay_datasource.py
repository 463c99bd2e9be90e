"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
exposing the NDJSON replay directory as a first-class ``kafka_replay``
format — batch AND streaming.

Why it exists: the repo's replay harness (``sources/replay.py``) stands
in for a Kafka broker; this wraps it in the public DataSource V2 Python
API so the same directories are readable as
``spark.read.format("kafka_replay")`` / ``spark.readStream.format(
"kafka_replay")`` with real offset/commit semantics — one replay chunk
file = one source partition = one streaming micro-batch, mirroring how
the Kafka source maps topic-partitions to tasks (C1).

Positioning: this is the API-surface / test-harness path. Rows are
parsed in Python (the DataSource Python API is row-based by contract),
so the hot production path remains the JVM file/Kafka sources — same
stance as the pure-Python codecs: spec-complete, measured, and NOT the
default. The streaming reader implements the full offset lifecycle
(initialOffset → latestOffset → partitions(start, end) → read →
commit), which is exactly what a custom enterprise source (REST feed,
queue, changelog) would need; replay files stand in for the remote
stream.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

try:  # pragma: no cover - import guard exercised by tests
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    DATASOURCE_API_AVAILABLE = True
except ImportError:  # pyspark < 4.0
    DATASOURCE_API_AVAILABLE = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


REPLAY_SCHEMA_DDL = (
    "key string, value string, topic string, partition bigint, offset bigint"
)


def _list_chunks(path: str) -> list[str]:
    """Replay chunk files in micro-batch order: (mtime, name) — the
    same order the JVM file stream source uses, so both sources replay
    identical batch sequences."""
    if not os.path.isdir(path):
        raise FileNotFoundError(f"kafka_replay path does not exist: {path}")
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".json") and not f.startswith(("_", "."))
    ]
    return sorted(files, key=lambda p: (os.path.getmtime(p), p))


def _read_file(path: str) -> Iterator[tuple]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            yield (
                d.get("key"),
                d.get("value"),
                d.get("topic"),
                int(d["partition"]) if d.get("partition") is not None else None,
                int(d["offset"]) if d.get("offset") is not None else None,
            )


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KafkaReplayBatchReader(DataSourceReader):
    """One input partition per chunk file — scan parallelism equals
    chunk count, like Kafka topic-partitions map to tasks."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kafka_replay requires the 'path' option")

    def partitions(self):
        return [_ChunkPartition(p) for p in _list_chunks(self.path)]

    def read(self, partition: "_ChunkPartition"):
        yield from _read_file(partition.path)


class KafkaReplayStreamReader(DataSourceStreamReader):
    """Streaming reader with the full offset lifecycle. Offsets are
    ``{"index": N, "last": <basename>}`` — N files consumed, the Nth
    identified BY NAME (not just by position); ``commit`` is a no-op
    (files are immutable); a real queue source would acknowledge
    upstream here.

    Offset-identity lesson (round-6 advice): a purely positional offset
    (``{"index": N}``) silently breaks if a file ever arrives whose
    (mtime, name) sorts BEFORE already-committed files — a copy that
    preserves mtime, clock skew, or an mtime tie with an
    earlier-sorting name. The index→file mapping shifts and committed
    offsets resolve to DIFFERENT files after a restart, re-serving or
    skipping records. So offsets carry the last-consumed basename and
    ``partitions(start, end)`` resolves by identity, cross-checking
    that the named file still sits at the committed position; any
    drift raises instead of corrupting the replay (the same stance as
    the JVM FileStreamSource's seen-files log).

    Offset-monotonicity lesson (found by the restart test, kept as the
    design note): ``latestOffset`` MUST report the durable on-disk
    truth, never throttled in-memory reader state. An earlier version
    advanced an in-process counter by ``maxFilesPerTrigger`` per call;
    after a checkpoint restart the fresh reader's counter restarted
    below the committed offset, the engine happily planned a batch
    whose end REGRESSED, and the next catch-up batch re-served an
    already-committed file under a NEW batch id — a duplicate the
    file sink's per-batch idempotence cannot dedupe. Rate limiting
    belongs to the engine or to durable reader state, not to a
    counter that dies with the process. Multi-batch behavior now comes
    from what it models in production: data ARRIVING over time (files
    appearing between triggers), not from artificially slicing a
    fully-arrived directory."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kafka_replay requires the 'path' option")

    def initialOffset(self):
        return {"index": 0, "last": None}

    def latestOffset(self):
        files = _list_chunks(self.path)
        return {
            "index": len(files),
            "last": os.path.basename(files[-1]) if files else None,
        }

    @staticmethod
    def _resolve(offset, names: list[str]) -> int:
        """Map an offset dict to a position in the current listing,
        verifying file IDENTITY: the basename recorded at commit time
        must still sit at the committed position. ``last`` missing
        (pre-upgrade checkpoint) degrades to positional with a
        length-only check."""
        idx = int(offset["index"])
        if idx == 0:
            return 0
        if idx > len(names):
            raise RuntimeError(
                f"kafka_replay: committed offset {idx} exceeds current "
                f"listing ({len(names)} files) — committed files were removed"
            )
        last = offset.get("last")
        if last is not None and names[idx - 1] != last:
            raise RuntimeError(
                "kafka_replay: committed prefix changed — offset "
                f"{idx} was committed at file {last!r} but the listing "
                f"now has {names[idx - 1]!r} there (a file arrived "
                "sorting before committed files, or one was replaced); "
                "refusing to replay with a shifted index→file mapping"
            )
        return idx

    def partitions(self, start, end):
        files = _list_chunks(self.path)
        names = [os.path.basename(p) for p in files]
        lo = self._resolve(start, names)
        hi = self._resolve(end, names)
        return [_ChunkPartition(p) for p in files[lo:hi]]

    def read(self, partition: "_ChunkPartition"):
        yield from _read_file(partition.path)

    def commit(self, end):
        pass


class KafkaReplayDataSource(DataSource):
    """``spark.dataSource.register(KafkaReplayDataSource)`` then
    ``spark.read.format("kafka_replay").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA_DDL

    def reader(self, schema):
        return KafkaReplayBatchReader(self.options)

    def streamReader(self, schema):
        return KafkaReplayStreamReader(self.options)


def register_kafka_replay_source(spark) -> bool:
    """Register the custom source on this session (idempotent). Returns
    False (no-op) when the DataSource API is unavailable."""
    if not DATASOURCE_API_AVAILABLE:
        return False
    spark.dataSource.register(KafkaReplayDataSource)
    return True
