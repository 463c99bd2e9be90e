"""The foreachBatch sink orchestrator — the data plane of the rebuild
(SURVEY §3.2): tombstone-filter → route → encode → stage gzipped rolled
files → ingest with retry → DLQ/raise per behavior.on.error → metrics.

Delivery semantics (R1): Structured Streaming writes the checkpoint
``commits/`` entry only after foreachBatch returns without raising, so a
failed ingest replays the whole micro-batch — the same at-least-once
guarantee as the reference's lastCommittedOffset scheme with replay
granularity of a micro-batch instead of a file (SURVEY §7.4).

Scale notes:
- Encoding is JVM-side (``to_json``/``concat_ws``; whole-stage codegen).
- File staging runs on executors via ``applyInPandas`` grouped by
  (topic, partition, file_seq): each Kafka partition's records land in
  rolled files exactly like one TopicPartitionWriter, groups are bounded
  by flush_size_bytes so no group can OOM an executor, and the only
  shuffle is keyed on the natural (topic, partition) parallelism unit.
- Only the tiny per-file manifest is collected to the driver; record
  data never is.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_sink_azure_kusto_spark.config import (
    BehaviorOnError,
    KustoSinkConfig,
    TopicToTableMapping,
)
from kafka_sink_azure_kusto_spark.functions.encoders import encode_for_format
from kafka_sink_azure_kusto_spark.functions.filters import drop_tombstones
from kafka_sink_azure_kusto_spark.operators.batching import with_file_assignment
from kafka_sink_azure_kusto_spark.streaming.backends import (
    IngestBackend,
    IngestionProperties,
)
from kafka_sink_azure_kusto_spark.streaming.metrics import SinkMetrics
from kafka_sink_azure_kusto_spark.streaming.retry import retry_with_backoff

log = logging.getLogger(__name__)

_MANIFEST_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("topic", StringType(), False),
        StructField("partition", LongType(), False),
        StructField("file_offset", LongType(), False),
        StructField("records", LongType(), False),
        StructField("raw_bytes", LongType(), False),
    ]
)


@dataclass(frozen=True)
class StagedFile:
    path: str
    topic: str
    partition: int
    file_offset: int
    records: int
    raw_bytes: int


def _stage_writer(out_dir: str, fmt: str, binary_mode: bool = False):
    """Build the applyInPandas group writer: one rolled gzipped file per
    (topic, partition, file_seq) group, named per B4
    (TopicPartitionWriter.java:235-242), owner-only perms like
    FileWriter.openFile (FileWriter.java:93-154).

    ``binary_mode`` is the E4 bytes passthrough: payloads are written
    verbatim with no newline separator (Avro bytes = one complete
    container file per message, ByteRecordWriterProvider.java:21-39)."""
    import gzip

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        topic = str(pdf["topic"].iloc[0])
        partition = int(pdf["partition"].iloc[0])
        file_offset = int(pdf["file_offset"].iloc[0])
        name = f"kafka_{topic}_{partition}_{file_offset}.{fmt}.gz"
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, name)
        if binary_mode:
            body = b"".join(bytes(b) for b in pdf["line"])
        else:
            body = ("\n".join(pdf["line"].astype(str)) + "\n").encode("utf-8")
        with open(path, "wb") as raw:
            os.fchmod(raw.fileno(), 0o600)
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
                gz.write(body)
        return pd.DataFrame(
            [
                {
                    "path": path,
                    "topic": topic,
                    "partition": partition,
                    "file_offset": file_offset,
                    "records": len(pdf),
                    "raw_bytes": len(body),
                }
            ]
        )

    return write_group


class KustoSparkSink:
    """Composable sink: ``sink.attach(stream_df)`` starts the query;
    ``sink.process_batch(df, epoch)`` is the foreachBatch body (also
    callable on a static DataFrame for tests/batch backfills, mirroring
    the reference's put()-driven unit tests)."""

    def __init__(
        self,
        config: KustoSinkConfig,
        backend: IngestBackend,
        metrics: Optional[SinkMetrics] = None,
        dlq_writer=None,
    ):
        self.config = config
        self.backend = backend
        self.metrics = metrics or SinkMetrics()
        # K3 — dlq_writer: callable(list[dict]) shipping failed records;
        # defaults to an NDJSON file DLQ under staging (Kafka DLQ in prod:
        # df.write.format("kafka"), TopicPartitionWriter.java:210-233).
        self._dlq_writer = dlq_writer
        if config.validate_tables:
            # V1–V4 startup probes, errors aggregated across mappings then
            # thrown once (validateTableMappings, KustoSinkTask.java:342-375).
            errors = []
            for m in config.mappings:
                try:
                    self.backend.validate(self._props_for(m))
                except Exception as e:  # noqa: BLE001
                    errors.append(f"{m.db}.{m.table}: {e}")
            if errors:
                raise RuntimeError(
                    "table mapping validation failed: " + " | ".join(errors)
                )

    # ------------------------------------------------------------------ utils
    @staticmethod
    def _props_for(m: TopicToTableMapping) -> IngestionProperties:
        return IngestionProperties(
            database=m.db,
            table=m.table,
            format=m.ingest_format,
            mapping_reference=m.mapping,
            streaming=m.streaming,
        )

    def _mapped_topics(self) -> list[str]:
        return [m.topic for m in self.config.mappings if not m.is_wildcard]

    # ------------------------------------------------------- the data plane
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """SURVEY §3.2 collapsed: kafkaDF → filter tombstones → per-mapping
        (filter topic → encode → stage → ingest-with-retry → else DLQ)."""
        df = drop_tombstones(batch_df)  # F1
        exact_topics = self._mapped_topics()
        for m in self.config.mappings:
            if m.is_wildcard:
                sub = df.filter(~F.col("topic").isin(exact_topics))  # F3 remainder
            else:
                sub = df.filter(F.col("topic") == m.topic)  # F3 exact
            self._process_mapping(sub, m, epoch_id)

    def _process_mapping(
        self, df: DataFrame, m: TopicToTableMapping, epoch_id: int
    ) -> None:
        fmt = m.ingest_format
        value_type = df.schema["value"].dataType.typeName()
        # E4 special case — pre-serialized Avro payloads: one message is a
        # complete container file, forcing an immediate roll per record
        # (FileWriter.java:320-323,298; the reference's B3 degenerate mode).
        avro_bytes_mode = fmt in ("avro", "apacheavro") and value_type == "binary"
        # E1/E3/E4 encode to one line per record, JVM-side. Dispatch mirrors
        # FileWriter.initializeRecordWriter (F4): a struct payload is
        # serialized per the mapping's format; a string/binary payload
        # already IS the line (String/ByteRecordWriterProvider).
        if "line" not in df.columns:
            if avro_bytes_mode:
                line = F.col("value")  # raw container bytes, untouched
            elif value_type == "struct":
                struct_df = df.select("value.*")
                if fmt in ("avro", "apacheavro"):
                    raise NotImplementedError(
                        "struct→Avro container encode requires the spark-avro "
                        "package (to_avro), not present on this classpath; "
                        "pre-serialized Avro bytes (E4) are supported"
                    )
                line = encode_for_format(
                    df, fmt, cols=[f"value.{c}" for c in struct_df.columns]
                )
                if fmt == "multijson":
                    line = F.to_json(F.col("value"))
            else:
                line = F.col("value").cast("string")
            df = df.withColumn("line", line)
        # F2 — empty serializations are skipped (JsonRecordWriterProvider.java:53-56).
        df = df.filter(F.length("line") > 0)
        # B1 — size-based file assignment on UNCOMPRESSED bytes (+1 newline,
        # matching CountingOutputStream accounting, FileWriter.java:332-362).
        # avro-bytes: threshold 1 ⇒ every record rolls its own file (E4/B3).
        df = df.withColumn("serialized_size", F.length("line").cast("long") + F.lit(1))
        threshold = 1 if avro_bytes_mode else self.config.flush_size_bytes
        df = with_file_assignment(df, threshold)
        out_dir = os.path.join(
            self.config.staging_dir, f"epoch={epoch_id}", m.db, m.table
        )
        manifest_df = (
            df.select("topic", "partition", "offset", "line", "file_seq", "file_offset")
            .groupBy("topic", "partition", "file_seq")
            .applyInPandas(
                _stage_writer(out_dir, fmt, binary_mode=avro_bytes_mode),
                schema=_MANIFEST_SCHEMA,
            )
        )
        staged = [
            StagedFile(**row.asDict()) for row in manifest_df.collect()
        ]  # tiny: one row per rolled file
        if not staged:
            return  # lazy-init parity: no empty files (FileWriter.java:185-190)
        props = self._props_for(m)
        total_records = sum(s.records for s in staged)
        try:
            for s in staged:
                self._ingest_with_retry(s, props)
            self.metrics.incr("records_written", total_records)
        except Exception as e:  # noqa: BLE001 — R4 dispatch
            self.metrics.incr("records_failed", total_records)
            if self.config.behavior_on_error is BehaviorOnError.FAIL:
                raise
            if self.config.behavior_on_error is BehaviorOnError.LOG:
                log.error("ingestion failed for %s.%s: %s", m.db, m.table, e)
            self._send_to_dlq(staged, m, e)
        finally:
            for s in staged:
                try:
                    os.remove(s.path)  # B5 — delete local file after roll
                except OSError:
                    pass

    def _ingest_with_retry(self, s: StagedFile, props: IngestionProperties) -> None:
        """R2 constant backoff + R3 permanent classification around K1/K2."""
        from kafka_sink_azure_kusto_spark.streaming.backends import classify_ingest_error

        classify = getattr(self.backend, "classify", classify_ingest_error)

        def attempt():
            result = self.backend.ingest_file(s.path, props)
            if not result.accepted:
                raise RuntimeError(f"ingestion final status {result.status}")
            return result

        try:
            retry_with_backoff(
                attempt,
                max_attempts=self.config.max_retry_attempts,
                backoff_ms=self.config.retry_backoff_time_ms,
                is_permanent=classify,
                on_attempt=lambda _: self.metrics.incr("ingestion_attempts"),
            )
            self.metrics.incr("ingestion_successes")
        except Exception:
            self.metrics.incr("ingestion_failures")
            raise

    def _send_to_dlq(
        self, staged: Iterable[StagedFile], m: TopicToTableMapping, err: Exception
    ) -> None:
        """K3 — key = error-coordinates string, value = record line
        (TopicPartitionWriter.java:210-233)."""
        records = []
        import gzip

        for s in staged:
            try:
                with gzip.open(s.path, "rt", encoding="utf-8") as f:
                    lines = [ln for ln in f.read().splitlines() if ln]
            except OSError:
                continue
            for ln in lines:
                records.append(
                    {
                        "key": f"Failed to write record to KustoDB with the following kafka coordinates, "
                        f"topic={s.topic}, partition={s.partition}, offset={s.file_offset}.",
                        "value": ln,
                    }
                )
        if not records:
            return
        if self._dlq_writer is not None:
            self._dlq_writer(records)
        else:
            dlq_dir = os.path.join(self.config.staging_dir, "_dlq")
            os.makedirs(dlq_dir, exist_ok=True)
            import json

            with open(
                os.path.join(dlq_dir, f"dlq_{m.db}_{m.table}.jsonl"), "a"
            ) as f:
                for r in records:
                    f.write(json.dumps(r) + "\n")
        self.metrics.incr("dlq_records_sent", len(records))

    # --------------------------------------------------------- control plane
    def attach(
        self,
        stream_df: DataFrame,
        query_name: str = "kusto_sink",
        available_now: bool = False,
    ):
        """SURVEY §3.1 — start the streaming query. The processing-time
        trigger plays the reference's flush.interval.ms role (B2): every
        trigger flushes whatever is buffered. ``available_now=True``
        drains the source then stops (backfill / test mode — the analog
        of the reference's drain-on-stop close path)."""
        writer = stream_df.writeStream.queryName(query_name).foreachBatch(
            self.process_batch
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.config.trigger_processing_time)
        if self.config.checkpoint_location:
            writer = writer.option("checkpointLocation", self.config.checkpoint_location)
        return writer.start()

    @staticmethod
    def close(query, timeout_s: float = 60.0) -> None:
        """R6 — graceful close: stop triggering first (no new ingestion),
        then wait for the in-flight batch to finish
        (KustoSinkTask.java:413-433,473-494)."""
        query.stop()
        query.awaitTermination(timeout_s)
