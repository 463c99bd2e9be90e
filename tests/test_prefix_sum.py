"""Distributed ordered-prefix-sum tests: exactness against a single-node
cumsum, partition-count invariance, budget-boundary semantics."""

import pandas as pd
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.operators.prefix_sum import (
    ordered_prefix_sum,
    token_budget_select,
)


def _expected_cum_before(pdf: pd.DataFrame) -> dict:
    pdf = pdf.sort_values(["score", "k"], ascending=[False, True])
    cum = pdf["v"].cumsum().shift(fill_value=0)
    return dict(zip(pdf["k"], cum))


def _frame(spark, n=1000):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7 + 1).cast("long").alias("v"),
            # many exact ties in score — the doc_id tie-break must decide
            (F.col("id") % 13).cast("double").alias("score"),
        )
    )


def test_prefix_sum_matches_single_node_cumsum(spark):
    df = _frame(spark)
    out = ordered_prefix_sum(
        df, [F.col("score").desc(), F.col("k").asc()], "v", num_partitions=8
    )
    got = {r.k: r.cum_before for r in out.collect()}
    want = _expected_cum_before(df.toPandas())
    assert got == {k: int(v) for k, v in want.items()}


def test_prefix_sum_partition_count_invariant(spark):
    df = _frame(spark, n=500)
    order = [F.col("score").desc(), F.col("k").asc()]
    one = {r.k: r.cum_before for r in
           ordered_prefix_sum(df, order, "v", num_partitions=1).collect()}
    many = {r.k: r.cum_before for r in
            ordered_prefix_sum(df, order, "v", num_partitions=17).collect()}
    assert one == many  # boundaries shift, the global scan does not


def test_token_budget_select_boundary(spark):
    # v=10 each, budget 35: kept iff cum_before in {0,10,20,30} — the
    # budget may be EXCEEDED by exactly the straddling document (cum 30
    # + 10 = 40 > 35), never undershot.
    df = spark.createDataFrame(
        [(i, 10, float(i)) for i in range(10)], "k long, v long, score double"
    )
    kept = token_budget_select(
        df, [F.col("score").asc(), F.col("k").asc()], "v", budget=35,
        num_partitions=3,
    )
    assert sorted(r.k for r in kept.collect()) == [0, 1, 2, 3]


def test_prefix_sum_empty_frame(spark):
    df = spark.createDataFrame([], "k long, v long, score double")
    out = ordered_prefix_sum(df, [F.col("score").asc()], "v", num_partitions=4)
    assert out.count() == 0
    assert "cum_before" in out.columns


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_prefix_sum_plan_never_single_partition(spark):
    # the whole point of the operator: the cumsum window is partitioned
    # by the staged partition label, never a one-task global window
    df = _frame(spark, n=2000)
    out = ordered_prefix_sum(
        df, [F.col("score").desc(), F.col("k").asc()], "v", num_partitions=8
    )
    plan = _executed_plan(out)
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(_pid" in plan  # partition-local cumsum
    assert "BroadcastHashJoin" in plan  # offsets join is broadcast


def test_registry_plan_assertions(spark):
    # scale-shape locks for the late-r3 registry queries: no cartesian
    # products or nested-loop joins anywhere, broadcast where claimed
    from kafka_sink_azure_kusto_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("tfidf_top_terms", "semantic_outlier_score",
                 "sequence_pack_texts", "embedding_label_centroids"):
        plan = _executed_plan(QUERIES[name][0](spark, sf))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    outlier = _executed_plan(QUERIES["semantic_outlier_score"][0](spark, sf))
    assert "BroadcastHashJoin" in outlier  # centroids broadcast back


def test_prefix_sum_fractional_values_truncate_once(spark):
    # Non-integral value_col: per-row cast to long BEFORE both passes, so
    # driver partials and the local window sum identical integers —
    # cum_before equals the cumsum of the truncated values regardless of
    # partitioning.
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 5 + 0.9).cast("double").alias("v"),
    )
    out = ordered_prefix_sum(
        df, [F.col("k").asc()], "v", num_partitions=7
    ).orderBy("k").collect()
    acc = 0
    for r in out:
        assert r["cum_before"] == acc, (r["k"], r["cum_before"], acc)
        acc += int(r["k"] % 5 + 0.9)  # truncation toward zero per row


def test_curation_pipeline_plan_shape(spark):
    # end-to-end curation composition keeps the audited scale shape:
    # no cartesian/nested-loop joins; the one-task global window never
    # appears (prefix sums are the two-pass distributed form)
    from kafka_sink_azure_kusto_spark.plans.registry import QUERIES

    df = QUERIES["curation_pipeline"][0](spark, "/root/testdata/sf0.001")
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
