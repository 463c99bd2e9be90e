"""Bucketed co-located join: both sides bucketed on the join key ⇒ the
join plans with no shuffle exchange (the amortize-the-shuffle-once
pattern for 100 TB fact tables)."""

import re

from kafka_sink_azure_kusto_spark.operators.bucketing import bucketed_join, write_bucketed
from kafka_sink_azure_kusto_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        write_bucketed(li, "li_bkt", "l_orderkey", num_buckets=4)
        write_bucketed(o, "o_bkt", "l_orderkey", num_buckets=4)
        joined = bucketed_join(spark, "li_bkt", "o_bkt", on="l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        # sanity: the join actually produces rows
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_signature_store_bucketed_join_exchanges_batch_side_only(spark, tmp_path):
    """The incremental near-dup scale claim made executable: the
    persisted banded-signature store is bucketed on (band_id,
    band_hash), so the candidate join reads it WITHOUT an exchange —
    only the (small) new-batch side shuffles."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.dedup import banded_signatures
    from kafka_sink_azure_kusto_spark.operators.bucketing import write_bucketed

    history = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon token{i} zeta eta") for i in range(40)],
        ["doc_id", "text"],
    )
    spark.sql("DROP TABLE IF EXISTS sig_store_bkt")
    write_bucketed(
        banded_signatures(history, "text", "doc_id", 16, 4, 3),
        "sig_store_bkt",
        ["band_id", "band_hash"],
        num_buckets=4,
    )
    batch = spark.createDataFrame(
        [(100 + i, f"alpha beta gamma delta epsilon token{i} zeta eta") for i in range(5)],
        ["doc_id", "text"],
    )
    bb = banded_signatures(batch, "text", "doc_id", 16, 4, 3)
    store = spark.table("sig_store_bkt").select(
        F.col("id").alias("h_id"), F.col("sig").alias("h_sig"), "band_id", "band_hash"
    )
    # disable auto-broadcast: at production scale the store is far past
    # the broadcast threshold and the join is sort-merge — the shape
    # the bucketing claim is about (broadcast would bypass buckets)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bb.join(store, ["band_id", "band_hash"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the store scan reads its bucket layout directly...
        assert "Bucketed: true" in plan, plan
        # ...and the ONLY band-key exchange is the batch side's
        n_band_exchanges = plan.count("Exchange hashpartitioning(band_id")
        assert n_band_exchanges == 1, f"expected only the batch-side exchange:\n{plan}"
        # and the join still finds the near-dup candidates
        assert joined.filter(F.col("id") != F.col("h_id")).count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS sig_store_bkt")


def test_signature_store_compaction_defragments_and_keeps_buckets(spark):
    """r7 (VERDICT r6 #7): N daily `append_bucketed` deltas fragment
    each bucket into N files; `compact_bucketed_table` rewrites to one
    file per bucket, PRESERVES the bucket spec, loses no rows, and the
    post-compaction probe join still exchanges only the batch side."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.dedup import banded_signatures
    from kafka_sink_azure_kusto_spark.operators.bucketing import (
        append_bucketed,
        compact_bucketed_table,
        table_file_count,
        write_bucketed,
    )

    def sigs(lo, hi):
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon token{i} zeta eta")
             for i in range(lo, hi)],
            ["doc_id", "text"],
        )
        return banded_signatures(docs, "text", "doc_id", 16, 4, 3)

    spark.sql("DROP TABLE IF EXISTS sig_store_cpt")
    spark.sql("DROP TABLE IF EXISTS sig_store_cpt__compact_staging")
    try:
        write_bucketed(sigs(0, 30), "sig_store_cpt", ["band_id", "band_hash"],
                       num_buckets=4)
        for day in range(3):  # three daily delta appends
            append_bucketed(sigs(100 * (day + 1), 100 * (day + 1) + 20),
                            "sig_store_cpt", ["band_id", "band_hash"],
                            num_buckets=4)
        total_rows = spark.table("sig_store_cpt").count()
        frag_files = table_file_count(spark, "sig_store_cpt")
        assert frag_files > 4, f"appends should fragment: {frag_files} files"

        n_files = compact_bucketed_table(
            spark, "sig_store_cpt", ["band_id", "band_hash"], num_buckets=4
        )
        assert n_files <= 4, f"compaction should leave ≤1 file/bucket: {n_files}"
        assert spark.table("sig_store_cpt").count() == total_rows

        # post-compaction: probe join exchanges ONLY the batch side
        batch = banded_signatures(
            spark.createDataFrame(
                [(999, "alpha beta gamma delta epsilon token5 zeta eta")],
                ["doc_id", "text"],
            ),
            "text", "doc_id", 16, 4, 3,
        )
        store = spark.table("sig_store_cpt").select(
            F.col("id").alias("h_id"), "band_id", "band_hash"
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = batch.join(store, ["band_id", "band_hash"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, plan
            assert plan.count("Exchange hashpartitioning(band_id") == 1, plan
            assert joined.count() > 0  # token5 doc still matches history
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_store_cpt")
        spark.sql("DROP TABLE IF EXISTS sig_store_cpt__compact_staging")


def test_compact_swap_leaves_no_auxiliary_tables(spark):
    """ADVICE r7 #5: the three-step rename swap must leave exactly the
    live table — no staging, no __compact_old — and the live table
    stays queryable with the full row count."""
    from kafka_sink_azure_kusto_spark.operators.bucketing import (
        compact_bucketed_table,
        write_bucketed,
    )

    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    for suffix in ("", "__compact_staging", "__compact_old"):
        spark.sql(f"DROP TABLE IF EXISTS swap_tbl{suffix}")
    try:
        write_bucketed(df, "swap_tbl", "k", num_buckets=4)
        compact_bucketed_table(spark, "swap_tbl", "k", num_buckets=4)
        tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
        assert "swap_tbl" in tables
        assert "swap_tbl__compact_staging" not in tables
        assert "swap_tbl__compact_old" not in tables
        assert spark.table("swap_tbl").count() == 100
    finally:
        for suffix in ("", "__compact_staging", "__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS swap_tbl{suffix}")
