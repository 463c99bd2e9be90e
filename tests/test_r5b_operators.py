"""Unit + property tests for the round-5 second batch: sketches
(count-min / KMV), FK-integrity audit, PageRank, and the weighted-WOR
sampler's invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.integrity import fk_audit, fk_audit_many
from kafka_sink_azure_kusto_spark.functions.sketches import (
    countmin_estimates,
    kmv_distinct,
)
from kafka_sink_azure_kusto_spark.operators.graph import pagerank, pagerank_sql


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_countmin_never_undercounts(spark):
    df = spark.createDataFrame(
        [Row(k=f"key{i % 37}") for i in range(500)]
    )
    est = {r["k"]: r["est"] for r in countmin_estimates(df, "k", depth=4, width=16).collect()}
    true = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, f"count-min undercounted {k}: est={est[k]} true={t}"


def test_countmin_exact_when_width_exceeds_keys(spark):
    # 5 distinct keys into width-1024 rows: collisions are possible but
    # with 4 independent rows at least one row should isolate each key
    df = spark.createDataFrame([Row(k=str(i % 5)) for i in range(100)])
    est = {r["k"]: r["est"] for r in countmin_estimates(df, "k", depth=4, width=1024).collect()}
    assert est == {str(i): 20 for i in range(5)}


def test_countmin_rejects_bad_params(spark):
    df = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError):
        countmin_estimates(df, "k", depth=0)
    with pytest.raises(ValueError):
        countmin_estimates(df, "k", width=0)


def test_countmin_sketch_is_bounded(spark):
    """The sketch aggregation the shuffle carries is depth*width cells,
    independent of input size — the property that makes it a sketch."""
    df = spark.createDataFrame([Row(k=str(i)) for i in range(1000)])
    key = F.col("k")
    from kafka_sink_azure_kusto_spark.functions.sketches import cm_bucket

    cells = df.select(
        F.posexplode(
            F.array(*[cm_bucket(key, r, 8) for r in range(3)])
        ).alias("cm_row", "cm_bucket")
    )
    sketch = cells.groupBy("cm_row", "cm_bucket").count()
    assert sketch.count() <= 3 * 8


def test_countmin_sketch_is_mergeable(spark):
    """Sketches of two shards merge by cell-wise ADDITION into exactly
    the whole-input sketch — the property that lets per-day / per-
    partition sketches combine without touching raw keys."""
    from kafka_sink_azure_kusto_spark.functions.sketches import cm_bucket

    rows = [Row(k=f"key{i % 13}", shard=i % 2) for i in range(200)]
    df = spark.createDataFrame(rows)

    def sketch(frame):
        cells = frame.select(
            F.posexplode(
                F.array(*[cm_bucket(F.col("k"), r, 32) for r in range(3)])
            ).alias("cm_row", "cm_bucket")
        )
        return {
            (r["cm_row"], r["cm_bucket"]): r["n"]
            for r in cells.groupBy("cm_row", "cm_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    whole = sketch(df)
    s0 = sketch(df.filter(F.col("shard") == 0))
    s1 = sketch(df.filter(F.col("shard") == 1))
    merged: dict = {}
    for s in (s0, s1):
        for cell, n in s.items():
            merged[cell] = merged.get(cell, 0) + n
    assert merged == whole


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_mergeable(spark):
    """Keeping the k smallest hashes of the UNION of two per-shard
    k-minimum sets yields the whole-input estimate exactly."""
    import heapq

    from kafka_sink_azure_kusto_spark.functions.sampling import md5_unit_interval

    k = 8
    df = spark.createDataFrame([Row(k_val=i, shard=i % 2) for i in range(100)])
    hashed = df.withColumn("u", md5_unit_interval(F.col("k_val"), salt="kmv:"))

    def kmin(frame):
        return heapq.nsmallest(k, [r["u"] for r in frame.select("u").distinct().collect()])

    whole = kmin(hashed)
    merged = heapq.nsmallest(
        k, kmin(hashed.filter(F.col("shard") == 0)) + kmin(hashed.filter(F.col("shard") == 1))
    )
    assert merged == whole
    # and the per-shard sketches really carry k hashes each
    rows = kmv_distinct(df, ["shard"], "k_val", k=k).collect()
    assert all(r["n_hashes"] == k for r in rows)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [Row(g="a", k=i % 7) for i in range(50)] + [Row(g="b", k=i % 3) for i in range(9)]
    )
    rows = {r["g"]: r for r in kmv_distinct(df, ["g"], "k", k=16).collect()}
    assert rows["a"]["est_distinct"] == 7.0 and rows["a"]["n_hashes"] == 7
    assert rows["b"]["est_distinct"] == 3.0 and rows["b"]["n_hashes"] == 3


def test_kmv_estimate_in_ballpark_above_k(spark):
    n = 500
    df = spark.createDataFrame([Row(g="g", k=i) for i in range(n)])
    [row] = kmv_distinct(df, ["g"], "k", k=64).collect()
    assert row["n_hashes"] == 64
    # theta-sketch relative error ~ 1/sqrt(k-2); allow 4 sigma
    rel = abs(row["est_distinct"] - n) / n
    assert rel < 4 / math.sqrt(62), f"KMV estimate off by {rel:.2%}"


def test_kmv_rejects_small_k(spark):
    df = spark.createDataFrame([Row(g="g", k=1)])
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "k", k=1)


def test_kmv_null_keys_dropped_before_hashing(spark):
    """Round-6 advice: NULL keys hash to NULL and would shift the
    rank-k hash differently in Spark (NULLS FIRST) vs DuckDB (NULLS
    LAST); the sketch must drop them, like COUNT(DISTINCT) does."""
    with_nulls = spark.createDataFrame(
        [Row(g="a", k=str(i)) for i in range(30)]
        + [Row(g="a", k=None)] * 5
        + [Row(g="b", k=None)]  # group with ONLY null keys
    )
    rows = {r["g"]: r for r in kmv_distinct(with_nulls, ["g"], "k", k=8).collect()}
    clean = spark.createDataFrame([Row(g="a", k=str(i)) for i in range(30)])
    [crow] = kmv_distinct(clean, ["g"], "k", k=8).collect()
    assert rows["a"]["est_distinct"] == crow["est_distinct"]
    assert rows["a"]["n_hashes"] == crow["n_hashes"]
    assert "b" not in rows  # no non-null keys → no sketch row


# ---------------------------------------------------------------------------
# FK audit
# ---------------------------------------------------------------------------


def test_fk_audit_counts_orphans_nulls_and_clean(spark):
    parent = spark.createDataFrame([Row(pk=i) for i in range(5)])
    child = spark.createDataFrame(
        [Row(fk=0), Row(fk=1), Row(fk=1), Row(fk=99), Row(fk=98), Row(fk=99), Row(fk=None)]
    )
    [row] = fk_audit(child, "fk", parent, "pk", "child->parent").collect()
    assert row["relation"] == "child->parent"
    assert row["n_rows"] == 7
    assert row["n_null_fk"] == 1
    assert row["n_orphan_rows"] == 3  # 99, 98, 99
    assert row["n_orphan_keys"] == 2  # {98, 99}


def test_fk_audit_sql_null_parent_pk(spark):
    """Round-6 advice: a NULL pk in the parent must not blind the
    oracle. NOT IN with a NULL on the right never evaluates TRUE (so
    orphans would read 0); the generated SQL now uses NOT EXISTS and
    must agree with the Spark left_anti count."""
    import duckdb

    from kafka_sink_azure_kusto_spark.functions.integrity import fk_audit_sql

    parent = spark.createDataFrame([Row(pk=1), Row(pk=None)])
    child = spark.createDataFrame([Row(fk=1), Row(fk=99), Row(fk=99)])
    [srow] = fk_audit(child, "fk", parent, "pk", "rel").collect()
    assert srow["n_orphan_rows"] == 2 and srow["n_orphan_keys"] == 1

    con = duckdb.connect()
    con.execute("CREATE TABLE parent AS SELECT 1 AS pk UNION ALL SELECT NULL")
    con.execute(
        "CREATE TABLE child AS SELECT 1 AS fk UNION ALL SELECT 99 UNION ALL SELECT 99"
    )
    orow = con.execute(fk_audit_sql("child", "fk", "parent", "pk", "rel")).fetchone()
    # (relation, n_rows, n_null_fk, n_orphan_rows, n_orphan_keys)
    assert orow[3] == srow["n_orphan_rows"] and orow[4] == srow["n_orphan_keys"]


def test_fk_audit_many_unions_rows(spark):
    parent = spark.createDataFrame([Row(pk=1)])
    child = spark.createDataFrame([Row(fk=1)])
    out = fk_audit_many(
        [
            fk_audit(child, "fk", parent, "pk", "r1"),
            fk_audit(child, "fk", parent, "pk", "r2"),
        ]
    ).collect()
    assert sorted(r["relation"] for r in out) == ["r1", "r2"]
    with pytest.raises(ValueError):
        fk_audit_many([])


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _ranks(spark, edges, nodes, **kw):
    e = spark.createDataFrame([Row(src=s, dst=d, w=float(w)) for s, d, w in edges])
    n = spark.createDataFrame([Row(node=x) for x in nodes])
    return {r["node"]: r["rank"] for r in pagerank(n, e, **kw).collect()}


def test_pagerank_uniform_on_symmetric_cycle(spark):
    ranks = _ranks(
        spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], ["a", "b", "c"]
    )
    assert all(abs(v - 1 / 3) < 2e-6 for v in ranks.values())  # rank is round(.,6)


def test_pagerank_sums_below_one_with_dangling(spark):
    # "c" is dangling: its mass leaks (documented simplified form)
    ranks = _ranks(spark, [("a", "c", 1), ("b", "c", 1)], ["a", "b", "c"])
    assert ranks["c"] > ranks["a"] == ranks["b"]
    assert sum(ranks.values()) < 1.0 + 1e-5


def test_pagerank_weight_bias(spark):
    # a splits 3:1 between b and c → b should outrank c
    ranks = _ranks(
        spark,
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        ["a", "b", "c"],
        iterations=5,
    )
    assert ranks["b"] > ranks["c"]


def test_pagerank_isolated_node_gets_teleport_mass(spark):
    ranks = _ranks(spark, [("a", "b", 1)], ["a", "b", "z"])
    assert abs(ranks["z"] - (1 - 0.85) / 3) < 2e-6


def test_pagerank_validates_params(spark):
    e = spark.createDataFrame([Row(src="a", dst="b", w=1.0)])
    n = spark.createDataFrame([Row(node="a")])
    with pytest.raises(ValueError):
        pagerank(n, e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(n, e, damping=1.5)
    with pytest.raises(ValueError):
        pagerank_sql("SELECT 1 AS node", "SELECT 1", iterations=0)


def test_pagerank_sql_matches_spark_on_duckdb(spark):
    """The generated CTE chain computes the same recurrence as the
    DataFrame loop — checked end-to-end through DuckDB."""
    import duckdb

    edges = [("a", "b", 2.0), ("b", "a", 1.0), ("a", "c", 1.0), ("c", "b", 4.0)]
    nodes = ["a", "b", "c"]
    got = _ranks(spark, edges, nodes, iterations=4)
    edge_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst, {w} AS w" for s, d, w in edges
    )
    node_rows = " UNION ALL ".join(f"SELECT '{x}' AS node" for x in nodes)
    sql = pagerank_sql(node_rows, edge_rows, iterations=4)
    want = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6


def test_r5b_operators_tolerate_empty_input(spark):
    """Sketches, audit, and PageRank on empty sources: empty frames (or
    a well-defined zero row for the audit), never a crash — the first
    batch of a backfill is often empty."""
    empty_keys = spark.createDataFrame([], "k string")
    assert countmin_estimates(empty_keys, "k").count() == 0
    empty_gk = spark.createDataFrame([], "g string, k long")
    assert kmv_distinct(empty_gk, ["g"], "k").count() == 0

    parent = spark.createDataFrame([], "pk long")
    child = spark.createDataFrame([], "fk long")
    [row] = fk_audit(child, "fk", parent, "pk", "empty").collect()
    assert (row["n_rows"], row["n_null_fk"], row["n_orphan_rows"], row["n_orphan_keys"]) == (
        0,
        0,
        0,
        0,
    )

    nodes = spark.createDataFrame([Row(node="a"), Row(node="b")])
    no_edges = spark.createDataFrame([], "src string, dst string, w double")
    ranks = {r["node"]: r["rank"] for r in pagerank(nodes, no_edges).collect()}
    # pure teleport mass everywhere when the graph has no edges
    assert all(abs(v - (1 - 0.85) / 2) < 2e-6 for v in ranks.values())


# ---------------------------------------------------------------------------
# Weighted WOR sampling invariants
# ---------------------------------------------------------------------------


def test_weighted_wor_prefers_heavy_docs(spark, sf_dir):
    """Longer docs should be over-represented vs a uniform sample:
    check the mean n_chars of the weighted sample exceeds the corpus
    mean (deterministic data, deterministic hash, so this is a fixed
    fact, not a flaky statistical bound)."""
    from kafka_sink_azure_kusto_spark.plans.registry_r5b import weighted_sample_wor
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    sample = weighted_sample_wor(spark, sf_dir)
    m_sample = sample.agg(F.avg("n_chars")).collect()[0][0]
    m_all = load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    assert m_sample > m_all
    # exactly 20 per source (or the stratum size if smaller)
    per = sample.groupBy("source").count().collect()
    assert all(r["count"] <= 20 for r in per)


def test_hll_estimate_accuracy_and_small_range(spark):
    """r8 HyperLogLog: standard error for m=256 is 1.04/sqrt(256) =
    6.5% — assert the estimate lands within 4 sigma on a 20k-distinct
    corpus, and that the small-range linear-counting branch activates
    for a 50-distinct group (where raw HLL would bias high)."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.sketches import hll_distinct

    big = spark.range(20_000).select(
        F.lit("big").alias("g"), F.col("id").alias("k")
    )
    small = spark.range(50).select(
        F.lit("small").alias("g"), F.col("id").alias("k")
    )
    est = {
        r.g: (r.est_distinct, r.registers_used)
        for r in hll_distinct(big.unionByName(small), ["g"], "k").collect()
    }
    e_big, used_big = est["big"]
    assert abs(e_big - 20_000) / 20_000 < 0.26, e_big  # 4 sigma
    e_small, used_small = est["small"]
    assert used_small < 256  # linear-counting branch territory
    assert abs(e_small - 50) / 50 < 0.2, e_small
    # duplicates must not move the estimate (cardinality, not count)
    dup = big.unionByName(big)
    e_dup = hll_distinct(dup, ["g"], "k").collect()[0].est_distinct
    assert e_dup == e_big


def test_hll_merge_equals_single_shot_and_reingest_safe(spark):
    """Merged-of-parts == computed-once, and re-ingesting a day
    (duplicate register frame) changes nothing (MAX idempotence)."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.sketches import (
        hll_distinct,
        hll_merge_estimate,
        hll_registers,
    )

    df = spark.range(5_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    single = {r.g: r.est_distinct for r in hll_distinct(df, ["g"], "k").collect()}
    days = [
        hll_registers(df.filter(F.col("k") % 4 == d), ["g"], "k")
        for d in range(4)
    ]
    merged = days[0]
    for d in days[1:]:
        merged = merged.unionByName(d)
    got = {r.g: r.est_distinct
           for r in hll_merge_estimate(merged, ["g"]).collect()}
    assert got == single
    # re-ingest day 2: idempotent
    got2 = {r.g: r.est_distinct
            for r in hll_merge_estimate(merged.unionByName(days[2]), ["g"]).collect()}
    assert got2 == single
