"""Additional engine-surface queries: sessionization, skew-safe
aggregation, SQL passthrough, and the streaming round-trip (rows-only).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.operators.skew import salted_sum_count
from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table, register_temp_views


@register(
    "events_sessionization",
    """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                       OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM seq)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) via lag + running
    sum — the batch shape of a session window; the streaming analog is
    ``F.session_window`` with a watermark (see streaming tests)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    seq = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = seq.withColumn("session_id", F.sum("new_session").over(w2).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "skew_salted_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation — must equal the direct groupBy (the
    oracle IS the direct aggregation): correctness proof that salting
    changes the plan, not the result. Decimal partials keep the
    two-phase sum exact."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_sum_count(
        ev, ["event_type"], "value_dec", salt_buckets=8, salt_on="event_id"
    )
    return out.select(
        "event_type",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "n",
    )


@register(
    "sql_passthrough",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: register the tables as temp views and
    run the user's SQL verbatim through spark.sql — the oracle is the
    same statement, demonstrating ANSI-SQL compatibility end-to-end."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderpriority
        """
    )


@register("streaming_sink_roundtrip", None)  # rows-only: full streaming pipeline
def streaming_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming pipeline as a queryable operator:
    events → Kafka-record shape → replay file stream → foreachBatch sink
    (tombstone filter, routing, NDJSON encode, rolled gzipped staging,
    emulated ingestion) → read the ingested table back. Rows-only check:
    the driver verifies count/schema stability; oracle omitted because
    the result passes through the streaming engine, not SQL."""
    import kafka_sink_azure_kusto_spark as pks
    from kafka_sink_azure_kusto_spark.sources.replay import (
        as_kafka_records,
        replay_stream,
        stage_replay_dir,
    )
    from kafka_sink_azure_kusto_spark.streaming import (
        KustoSparkSink,
        LocalEmulatorBackend,
    )

    work = tempfile.mkdtemp(prefix="stream_rt_")
    ev = load_table(spark, sf_dir, "events").limit(500)
    records = as_kafka_records(
        ev.withColumn("v", F.to_json(F.struct("event_id", "user_id", "event_type"))),
        topic_col="event_type",
        value_col="v",
        key_col="event_id",
    )
    stage_replay_dir(records, os.path.join(work, "replay"), chunks=2)
    cfg = pks.KustoSinkConfig(
        ingest_url="https://ingest.example.kusto.windows.net",
        mappings=[pks.TopicToTableMapping(topic="*", db="db", table="t", format="json")],
        staging_dir=os.path.join(work, "staging"),
        checkpoint_location=os.path.join(work, "chk"),
    )
    backend = LocalEmulatorBackend(os.path.join(work, "kusto"))
    sink = KustoSparkSink(cfg, backend)
    q = sink.attach(replay_stream(spark, os.path.join(work, "replay")), available_now=True)
    q.awaitTermination(120)
    KustoSparkSink.close(q)
    table_dir = os.path.join(work, "kusto", "db", "t")
    out = spark.read.json(f"{table_dir}/part-*")
    return out.select("event_id", "user_id", "event_type").orderBy("event_id")
