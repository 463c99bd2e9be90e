"""Independent semantic checks for the attribution batch — properties
the oracle mirror cannot falsify because both engines run the same
algorithm: attribution credits really are same-user, preceding,
in-window clicks; the golden record really carries the latest values;
co-purchase pairs really co-occur."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry_attribution import (
    attribution_last_touch,
    copurchase_pairs,
    record_survivorship,
    value_drift_psi,
)
from kafka_sink_azure_kusto_spark.sources.tables import load_table


def test_attribution_credits_are_valid_clicks(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    att = attribution_last_touch(spark, sf_dir).filter(F.col("click_id").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    joined = att.join(clicks, "click_id").join(purchases, "purchase_id")
    n = joined.count()
    assert n == att.count()  # every credited click exists
    # same user, click not after purchase, within 7 days
    bad = joined.filter(
        (F.col("cu") != F.col("user_id"))
        | (F.col("click_ts") > F.col("p_ts"))
        | (
            F.unix_micros("p_ts") - F.unix_micros("click_ts")
            > 7 * 24 * 3600 * 1_000_000
        )
    )
    assert bad.count() == 0
    # gap matches the joined timestamps exactly
    mism = joined.filter(
        F.col("gap_us") != F.unix_micros("p_ts") - F.unix_micros("click_ts")
    )
    assert mism.count() == 0


def test_attribution_credits_the_latest_click(spark, sf_dir):
    """No same-user click lies strictly between the credited click and
    the purchase (last-touch, not first-touch)."""
    ev = load_table(spark, sf_dir, "events")
    att = attribution_last_touch(spark, sf_dir).filter(F.col("click_id").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    credited = att.join(
        clicks.select(
            F.col("c_id").alias("click_id"), F.col("c_ts").alias("credited_ts")
        ),
        "click_id",
    ).join(purchases, "purchase_id")
    later = credited.join(
        clicks,
        (F.col("cu") == F.col("user_id"))
        & (F.col("c_ts") > F.col("credited_ts"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    )
    assert later.count() == 0


def test_survivorship_latest_purchase_amount(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    golden = record_survivorship(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("value").cast("decimal(18,2)").cast("double").alias("want_amount"),
        )
    )
    joined = golden.join(want, "user_id")
    assert joined.filter(
        F.col("last_purchase_amount") != F.col("want_amount")
    ).count() == 0
    # users with NO purchase carry NULL
    no_purch = golden.join(want, "user_id", "left_anti")
    assert no_purch.filter(F.col("last_purchase_amount").isNotNull()).count() == 0


def test_copurchase_pairs_canonical_and_supported(spark, sf_dir):
    pairs = copurchase_pairs(spark, sf_dir)
    assert pairs.filter(F.col("p1") >= F.col("p2")).count() == 0
    assert pairs.filter(F.col("n_orders") < 2).count() == 0
    # spot-check one pair really co-occurs in that many orders
    row = pairs.orderBy(F.col("n_orders").desc(), "p1", "p2").first()
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.filter(F.col("l_partkey") == row["p1"]).select("l_orderkey")
    b = items.filter(F.col("l_partkey") == row["p2"]).select("l_orderkey")
    assert a.join(b, "l_orderkey").count() == row["n_orders"]


def test_psi_is_nonnegative_and_small_for_same_distribution(spark, sf_dir):
    """PSI >= 0 always (Jensen); and the month halves of a stationary
    synthetic stream should not look wildly drifted."""
    rows = value_drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["psi"] >= 0.0
        assert r["psi"] < 0.5, f"{r['event_type']}: implausible drift {r['psi']}"
