"""Training-data curation queries (north-star additions): deterministic
sampling, stratified sampling, and sequence packing — the reproducible
building blocks between raw corpus and training batches. Every oracle
runs the literally-same integer/md5 arithmetic as the Spark plan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.sampling import (
    hash_sample,
    md5_unit_interval_sql,
    stratified_sample,
)
from kafka_sink_azure_kusto_spark.functions.text import token_count
from kafka_sink_azure_kusto_spark.operators.packing import pack_sequences, pack_stats
from kafka_sink_azure_kusto_spark.plans.registry import _workdir, register
from kafka_sink_azure_kusto_spark.sources.tables import load_table

_U = md5_unit_interval_sql("event_id", salt="s1")


@register(
    "deterministic_sample",
    f"""
    SELECT event_id, user_id, event_type
    FROM events WHERE {_U} < 0.25
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~25% sample of events keyed on event_id (md5 unit
    interval < fraction). Unlike ``df.sample``, the kept-set is a pure
    function of the key — stable across replays, partitionings and
    engines (the oracle applies the same filter and must keep the
    identical rows, not merely the same count)."""
    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", 0.25, salt="s1").select(
        "event_id", "user_id", "event_type"
    )


_U2 = md5_unit_interval_sql("event_id", salt="s2")


@register(
    "stratified_sample",
    f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_U2} < (CASE event_type
                   WHEN 'click' THEN 0.1
                   WHEN 'view' THEN 0.05
                   WHEN 'purchase' THEN 1.0
                   ELSE 0.0 END)
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic rates (downsample abundant strata, keep
    rare ones whole) — the curation move that rebalances a corpus without
    a shuffle: one CASE resolves the fraction, one md5 decides, the
    filter pushes down to the scan."""
    ev = load_table(spark, sf_dir, "events")
    return stratified_sample(
        ev,
        key_col="event_id",
        stratum_col="event_type",
        fractions={"click": 0.1, "view": 0.05, "purchase": 1.0},
        salt="s2",
    ).select("event_id", "event_type")


@register(
    "sequence_packing",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(doc_id % 8 AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    pre AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS pack_tokens_before
      FROM toks)
    SELECT shard, CAST(FLOOR(pack_tokens_before / 512.0) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           ROUND(SUM(n_tokens) / 512.0, 6) AS fill_ratio
    FROM pre GROUP BY shard, pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM context-window packing (operators/packing.py): shard by key,
    prefix-sum-bucket documents into ≤512-token packs, report per-pack
    utilization. The oracle replays the identical prefix-sum arithmetic,
    so pack boundaries — not just totals — are verified."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    packed = pack_sequences(
        docs, token_col="n_tokens", key_col="doc_id", max_tokens=512, num_shards=8
    )
    return pack_stats(packed, max_tokens=512)


@register(
    "parquet_stage_roundtrip",
    """
    SELECT event_id, user_id, event_type, value
    FROM events ORDER BY event_id LIMIT 500
    """,
)
def parquet_stage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet staging (extension beyond the reference's NDJSON/CSV/Avro
    writer set — Kusto ingests parquet natively and it's the natural
    staged format for a Spark pipeline): struct records → pyarrow parquet
    container per rolled file → emulator binary ingest → read back with
    the ordinary ``spark.read.parquet`` scan. Identity oracle over the
    deterministic subset ⇒ the round trip must be type- and
    value-lossless."""
    import kafka_sink_azure_kusto_spark as pks
    from kafka_sink_azure_kusto_spark.streaming import (
        KustoSparkSink,
        LocalEmulatorBackend,
    )

    work = _workdir("pq_rt_")
    ev = load_table(spark, sf_dir, "events").orderBy("event_id").limit(500)
    records = ev.select(
        F.col("event_id").cast("string").alias("key"),
        F.struct("event_id", "user_id", "event_type", "value").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 4).cast("long").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
    )
    cfg = pks.KustoSinkConfig(
        ingest_url="https://ingest.example.kusto.windows.net",
        mappings=[
            pks.TopicToTableMapping(topic="events", db="db", table="t", format="parquet")
        ],
        staging_dir=os.path.join(work, "staging"),
        flush_size_bytes=16 * 1024,
    )
    backend = LocalEmulatorBackend(os.path.join(work, "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(records, epoch_id=0)
    table_dir = os.path.join(work, "kusto", "db", "t")
    return spark.read.parquet(os.path.join(table_dir, "part-*.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
