"""Plan-shape + semantics tests for the window-surface batch
(registry_windows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry_windows import (
    customer_order_gaps,
    equidepth_bins,
    nation_revenue_share,
    orders_trailing_30d_revenue,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_trailing_frame_partitions_by_customer(spark, sf_dir):
    df = orders_trailing_30d_revenue(spark, sf_dir)
    plan = _plan(df)
    assert "Window" in plan
    # the window must be keyed — a SinglePartition window over the fact
    # table would serialize the whole dataset through one task
    assert "SinglePartition" not in plan


def test_trailing_frame_includes_self_and_only_past(spark, sf_dir):
    df = orders_trailing_30d_revenue(spark, sf_dir)
    rows = df.filter(F.col("n_orders_30d") == 1).limit(5).collect()
    # singleton frames: trailing revenue equals the order's own price
    o = {r["o_orderkey"]: r for r in rows}
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin(list(o)))
        .collect()
    )
    for r in orders:
        assert abs(o[r["o_orderkey"]]["trailing_rev"] - round(r["o_totalprice"], 2)) < 1e-6


def test_equidepth_bins_are_balanced_and_ordered(spark, sf_dir):
    rows = equidepth_bins(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, bins in by_type.items():
        bins.sort(key=lambda r: r["decile"])
        assert [b["decile"] for b in bins] == list(range(1, 11))
        sizes = [b["n"] for b in bins]
        assert max(sizes) - min(sizes) <= 1, f"{t}: unbalanced {sizes}"
        # bin ranges are non-decreasing
        for a, b in zip(bins, bins[1:]):
            assert a["hi"] <= b["lo"] + 1e-12


def test_nation_shares_sum_to_one(spark, sf_dir):
    rows = nation_revenue_share(spark, sf_dir).collect()
    assert abs(sum(r["share_global"] for r in rows) - 1.0) < 1e-9
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["r_name"]] = by_region.get(r["r_name"], 0.0) + r["share_in_region"]
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-9, f"{region}: shares sum to {s}"


def test_order_gaps_first_null_and_seq_dense(spark, sf_dir):
    df = customer_order_gaps(spark, sf_dir)
    firsts = df.filter(F.col("order_seq") == 1)
    assert firsts.filter(F.col("days_since_prev").isNotNull()).count() == 0
    assert df.filter((F.col("order_seq") > 1) & F.col("days_since_prev").isNull()).count() == 0
    # exactly one latest order per customer
    latest = df.filter(F.col("is_latest")).groupBy("o_custkey").count()
    assert latest.filter(F.col("count") != 1).count() == 0


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """Decimal associativity: base+delta partial-agg merge must be
    bit-identical to the one-shot rollup."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.plans.registry_windows import (
        incremental_agg_maintenance,
    )
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    merged = {
        r["nationkey"]: (r["revenue"], r["n"])
        for r in incremental_agg_maintenance(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    full = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {r["nationkey"]: (r["revenue"], r["n"]) for r in full.collect()}
    assert merged == want  # exact equality, not approx


def test_winsorize_bounds_and_clip_flags(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.plans.registry_windows import value_winsorize

    df = value_winsorize(spark, sf_dir)
    # winsorized values stay inside [lo, hi] per group: min/max of the
    # winsorized column equal the cut values attained by some rows
    stats = df.groupBy("event_type").agg(
        F.min("winsorized").alias("wmin"),
        F.max("winsorized").alias("wmax"),
        F.sum(F.col("clipped").cast("int")).alias("n_clipped"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in stats.collect():
        assert r["n_clipped"] > 0  # p05/p95 clipping touches ~10%
        assert r["n_clipped"] < 0.2 * r["n"]
    # unclipped rows keep their value
    assert df.filter(~F.col("clipped") & (F.col("value") != F.col("winsorized"))).count() == 0
    # clipped rows land exactly on a bound
    bad = df.filter(
        F.col("clipped")
        & (F.col("winsorized") != F.col("value"))
        & ~F.col("winsorized").isin(
            [r["wmin"] for r in stats.collect()] + [r["wmax"] for r in stats.collect()]
        )
    )
    assert bad.count() == 0
