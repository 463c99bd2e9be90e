"""kafka_sink_azure_kusto_spark — a PySpark-native rebuild of the
Azure/kafka-sink-azure-kusto Kafka→Kusto sink connector, plus
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

The reference (read-only at /root/reference, v5.3.1) is a Kafka
Connect sink: consume records → filter tombstones → route
topic→(db, table, format) → serialize (json/avro/csv/bytes) →
gzipped rolling files → ingest into Kusto (queued/streaming) →
at-least-once offset commit → retry/DLQ on failure.

This package re-expresses that dataflow Spark-first:

- ``config``      — job config + topic→table mapping (KustoSinkConfig.java parity)
- ``functions``   — pure DataFrame→DataFrame transforms (filters, routing,
                    encoders, text analysis, dedup, similarity, multimodal)
- ``sources``     — Kafka readStream builder + file-replay test source
- ``streaming``   — the foreachBatch sink orchestrator, ingest backends,
                    retry/DLQ, metrics
- ``operators``   — batching/staging (size+time flush, file naming)
- ``plans``       — query registry backing __spark_entry__ (queries + oracles)
"""

__version__ = "0.1.0"

from kafka_sink_azure_kusto_spark.config import (  # noqa: F401
    BehaviorOnError,
    KustoSinkConfig,
    TopicToTableMapping,
)
