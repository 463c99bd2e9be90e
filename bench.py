#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop writer (full column
evaluation — count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference-parity dataflow
    "flagship_pack_all",
    "tombstone_filter",
    "topic_routing",
    "json_decode",
    "ndjson_encode",
    "file_assignment",
    # analytics
    "q1_pricing_summary",
    "q3_top_orders",
    "region_rollup",
    "window_topn_per_customer",
    "event_time_windows",
    "events_sessionization",
    "semi_join_active_customers",
    "distinct_user_counts",
    "skew_salted_agg",
    # north-star training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "similarity_lsh_bucketed",
    "text_quality",
    "text_token_counts",
    "multimodal_decode",
    # curation + custom joins (r2)
    "deterministic_sample",
    "sequence_packing",
    "asof_join_attribution",
]


def _scale10x_timings(spark, sf_dir: str) -> dict[str, float]:
    """10×-synthesized-corpus pass (the scale-factor ratchet): documents/
    embeddings are fixed at 500 rows per TESTDATA.md, and no sf1 parquet
    exists, so the 10× step is synthesized deterministically with the
    scale-probe generators (tools/scale_probe.py) and the heavier TPC-H
    tables are replicated 10× with shifted keys. Timings cover the ops
    whose cost actually scales with corpus size."""
    import time

    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions import dedup as D
    from kafka_sink_azure_kusto_spark.functions import similarity as S
    from kafka_sink_azure_kusto_spark.sources.tables import load_table
    from tools.scale_probe import synth_docs, synth_embeddings

    timings: dict[str, float] = {}

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    docs = synth_docs(spark, load_table(spark, sf_dir, "documents"), 5000).cache()
    docs.count()
    timed("dedup_exact_10x", D.dedup_exact(docs))
    timed("dedup_minhash_lsh_10x", D.minhash_lsh_pairs(docs, jaccard_threshold=0.5))
    timed("dedup_simhash_10x", D.simhash_pairs(docs, max_hamming=8))
    docs.unpersist()

    emb = synth_embeddings(spark, 5000).cache()
    emb.count()
    q = emb.filter(F.col("vec_id") < 50)
    timed("similarity_topk_bruteforce_10x", S.brute_force_topk(emb, q, k=10))
    timed("similarity_topk_ivf_10x", S.ivf_topk(emb, q, k=10))
    emb.unpersist()

    # 10× replicated events: shifted ids keep key cardinality realistic.
    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()
    n_users = 1 + (ev.agg(F.max("user_id")).collect()[0][0] or 0)
    ev10 = (
        ev.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * n_users)
        .drop("rep")
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
        .cache()
    )
    ev10.count()
    timed(
        "event_windows_10x",
        ev10.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        ),
    )
    timed(
        "distinct_users_10x",
        ev10.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")),
    )
    ev10.unpersist()
    return timings


def _sink_throughput(spark, sf_dir: str) -> dict:
    """Records/sec through the full sink data plane (encode → roll →
    stage → concurrent emulated ingest) on the events table — the
    connector-parity throughput number (the reference publishes none;
    BASELINE.md, so this self-ratchets round over round)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    import kafka_sink_azure_kusto_spark as pks
    from kafka_sink_azure_kusto_spark.sources.tables import load_table
    from kafka_sink_azure_kusto_spark.streaming import (
        KustoSparkSink,
        LocalEmulatorBackend,
    )

    work = tempfile.mkdtemp(prefix="bench_sink_")
    try:
        ev = load_table(spark, sf_dir, "events")
        records = ev.select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias(
                "value"
            ),
            F.col("event_type").alias("topic"),
            (F.col("event_id") % 8).cast("long").alias("partition"),
            F.col("event_id").cast("long").alias("offset"),
        ).cache()
        n = records.count()
        cfg = pks.KustoSinkConfig(
            ingest_url="https://ingest.example.kusto.windows.net",
            mappings=[pks.TopicToTableMapping(topic="*", db="db", table="t", format="json")],
            staging_dir=os.path.join(work, "staging"),
        )
        sink = KustoSparkSink(cfg, LocalEmulatorBackend(os.path.join(work, "kusto")))
        t0 = time.perf_counter()
        sink.process_batch(records, epoch_id=0)
        dt = time.perf_counter() - t0
        records.unpersist()
        return {"records": n, "sec": round(dt, 3), "records_per_sec": round(n / dt)}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kafka_sink_azure_kusto_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warmup on a tiny table so q1 doesn't pay startup cost.
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    scale10x = _scale10x_timings(spark, sf_dir)
    sink_tp = _sink_throughput(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "scale10x": {
                    "note": "synthesized 10x corpora (scale_probe generators)",
                    "value": round(sum(scale10x.values()), 3),
                    "queries": scale10x,
                },
                "sink_throughput": sink_tp,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
