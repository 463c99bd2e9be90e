"""Curation-operator tests: deterministic/stratified sampling invariants,
sequence-packing budget guarantees, and the parquet staging round trip
through the sink."""

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.config import KustoSinkConfig, TopicToTableMapping
from kafka_sink_azure_kusto_spark.functions.sampling import (
    hash_sample,
    md5_unit_interval,
    stratified_sample,
)
from kafka_sink_azure_kusto_spark.operators.packing import pack_sequences, pack_stats
from kafka_sink_azure_kusto_spark.streaming.backends import LocalEmulatorBackend
from kafka_sink_azure_kusto_spark.streaming.sink import KustoSparkSink


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    b = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    assert a == b  # same keys every run — df.sample can't promise this
    assert 0.27 < len(a) / 10_000 < 0.33  # ~binomial(10k, .3) 3σ band
    # monotone: raising the fraction only ADDS keys (nested samples)
    bigger = {r.k for r in hash_sample(df, "k", 0.5).collect()}
    assert a <= bigger
    # salting decorrelates
    salted = {r.k for r in hash_sample(df, "k", 0.3, salt="other").collect()}
    assert salted != a


def test_md5_unit_interval_range(spark):
    stats = (
        spark.range(5_000)
        .select(md5_unit_interval(F.col("id")).alias("u"))
        .agg(F.min("u"), F.max("u"), F.avg("u"))
        .collect()[0]
    )
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.45 < stats[2] < 0.55  # uniform mean ≈ 0.5


def test_stratified_sample_rates(spark):
    df = spark.range(9_000).select(
        F.col("id").alias("k"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")), (F.col("id") % 3 + 1).cast("int")
        ).alias("g"),
    )
    out = stratified_sample(df, "k", "g", {"a": 1.0, "b": 0.2}).groupBy("g").count()
    counts = {r.g: r["count"] for r in out.collect()}
    assert counts["a"] == 3000  # fraction 1.0 keeps the whole stratum
    assert 450 < counts["b"] < 750  # ~20% of 3000
    assert "c" not in counts  # default fraction 0 drops unlisted strata


def test_pack_sequences_budget_invariants(spark):
    df = spark.range(1_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300 + 1).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(df, max_tokens=512, num_shards=4)
    assert packed.count() == 1_000  # packing never drops documents
    stats = pack_stats(packed, max_tokens=512)
    rows = stats.collect()
    # A pack may overshoot by at most ONE document (roll-after-write
    # semantics, same as file assignment); every multi-doc prefix fits.
    over = stats.join(
        packed.groupBy("shard", "pack_id").agg(F.max("n_tokens").alias("max_doc")),
        ["shard", "pack_id"],
    ).filter(F.col("pack_tokens") - F.col("max_doc") >= 512)
    assert over.count() == 0
    # utilization is high on average (the point of packing)
    import statistics

    fills = [r.fill_ratio for r in rows]
    assert statistics.mean(fills) > 0.7


def test_parquet_stage_roundtrip_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ("a", 1.5, 10)), (2, ("b", None, None))],
        "offset long, value struct<s:string,d:double,i:long>",
    ).select(
        F.lit("t1").alias("topic"),
        F.lit(0).cast("long").alias("partition"),
        "offset",
        "value",
    )
    cfg = KustoSinkConfig(
        ingest_url="https://ingest.example.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t1", db="d", table="t", format="parquet")],
        staging_dir=str(tmp_path / "staging"),
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    sink = KustoSparkSink(cfg, backend)
    sink.process_batch(df, epoch_id=0)
    files = backend.table_files("d", "t")
    assert len(files) == 1 and files[0].endswith(".parquet")
    back = spark.read.parquet(files[0]).orderBy("s").collect()
    assert [(r.s, r.d, r.i) for r in back] == [("a", 1.5, 10), ("b", None, None)]
    assert backend.ingest_log()[0]["records"] == 2  # footer-counted


def test_orc_stage_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ("a", 10)), (2, ("b", None))],
        "offset long, value struct<s:string,i:long>",
    ).select(
        F.lit("t1").alias("topic"),
        F.lit(0).cast("long").alias("partition"),
        "offset",
        "value",
    )
    cfg = KustoSinkConfig(
        ingest_url="https://ingest.example.kusto.windows.net",
        mappings=[TopicToTableMapping(topic="t1", db="d", table="t", format="orc")],
        staging_dir=str(tmp_path / "staging"),
    )
    backend = LocalEmulatorBackend(str(tmp_path / "kusto"))
    KustoSparkSink(cfg, backend).process_batch(df, epoch_id=0)
    files = backend.table_files("d", "t")
    assert len(files) == 1 and files[0].endswith(".orc")
    back = spark.read.orc(files[0]).orderBy("s").collect()
    assert [(r.s, r.i) for r in back] == [("a", 10), ("b", None)]
    assert backend.ingest_log()[0]["records"] == 2  # ORC-counted


def test_dedup_keep_best_one_exemplar_per_cluster(spark):
    from kafka_sink_azure_kusto_spark.plans.registry import QUERIES

    out = QUERIES["dedup_keep_best"][0](spark, "/root/testdata/sf0.001").cache()
    rows = out.collect()
    # exactly one kept doc per cluster, and it's a longest member
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.kept == 1]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} kept"
        assert kept[0].n_tokens == max(m.n_tokens for m in members)
        # stable tie-break: lowest doc_id among the longest
        longest = [m.doc_id for m in members if m.n_tokens == kept[0].n_tokens]
        assert kept[0].doc_id == min(longest)
    out.unpersist()


def test_tfidf_top_terms_rank_invariants(spark):
    from kafka_sink_azure_kusto_spark.plans.registry import QUERIES

    out = QUERIES["tfidf_top_terms"][0](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, terms in by_doc.items():
        ranks = sorted(t.rank for t in terms)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        ordered = sorted(terms, key=lambda t: t.rank)
        # scores non-increasing with rank
        assert all(a.tfidf >= b.tfidf for a, b in zip(ordered, ordered[1:]))
