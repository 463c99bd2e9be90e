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
