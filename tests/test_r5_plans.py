"""Physical-plan assertions for the round-5 operators: the scale claims
in the docstrings (broadcast prefilters, shuffle-hash salting, no
accidental cartesians) must be visible in the executed plan, not just
asserted in prose."""

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    from kafka_sink_azure_kusto_spark.plans import registry

    df = registry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_segment_dedup_plan_broadcasts_hot_set(spark):
    plan = _plan(spark, "segment_dedup")
    assert "BroadcastHashJoin" in plan  # hot fingerprints → anti-join
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_prefilter_plan_is_broadcast_probed(spark):
    plan = _plan(spark, "contamination_bloom_prefilter")
    # 3 hash-position probes + exact verify all broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_plan_uses_shuffled_hash(spark):
    plan = _plan(spark, "skew_salted_join")
    assert "ShuffledHashJoin" in plan  # hint honored — not broadcast
    assert "BroadcastHashJoin" not in plan


def test_funnel_plan_no_cartesian(spark):
    plan = _plan(spark, "funnel_conversion")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_and_scd2_single_exchange_family(spark):
    for name in ("events_rolling_features", "scd2_user_state_history"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        # every Exchange is hash-partitioned on user_id — no
        # SinglePartition window anywhere
        assert "SinglePartition" not in plan


def test_kmeans_step_plan_broadcasts_seeds(spark):
    plan = _plan(spark, "kmeans_lloyd_step")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the corpus side must not shuffle before assignment: the only
    # exchanges are the argmax agg and the (cell, dim) reduction
    assert "CartesianProduct" not in plan


def test_gap_fill_axis_is_broadcast(spark):
    plan = _plan(spark, "timeseries_gap_fill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partitioned_write_prune_pushes_partition_filters(spark):
    from kafka_sink_azure_kusto_spark.plans import registry

    df = registry.queries()["partitioned_write_prune"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the event_type filter must resolve against partition DIRECTORIES,
    # not row values: PartitionFilters populated, no event_type in the
    # pushed data filters
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in seg


def test_gate_priority_has_no_duplicates():
    """ADVICE r7 #4: duplicate names in _GATE_PRIORITY are phantom
    entries against the 50-slot gate window."""
    from kafka_sink_azure_kusto_spark.plans.registry import _GATE_PRIORITY

    seen = set()
    dups = [n for n in _GATE_PRIORITY if n in seen or seen.add(n)]
    assert dups == [], f"duplicate gate entries: {dups}"


def test_ivf_index_probe_uses_dynamic_partition_pruning(spark, tmp_path):
    """r8 persisted-index lifecycle: the probe joins the broadcast
    query side on the index's PARTITION column, so Spark plans runtime
    (dynamic) partition pruning — a probe reads n_probe cells of
    parquet, never the whole index."""
    import os

    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions import similarity as S
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    emb = load_table(spark, str(os.environ.get(
        "SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")), "embeddings")
    idx = str(tmp_path / "idx")
    emb.withColumnRenamed("label", "cell").write.partitionBy("cell").parquet(idx)
    out = S.ivf_topk(
        spark.read.parquet(idx), emb.filter(F.col("vec_id") < 5),
        k=10, cell_col="cell",
    )
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
