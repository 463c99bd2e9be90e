"""Round-5 attribution / entity-resolution batch: last-touch marketing
attribution with a staleness tolerance, CDC golden-record survivorship,
and market-basket co-purchase mining — the event-to-entity shapes that
sit beside the CDC/SCD-2 family in a production warehouse.

All three are one-shuffle-per-entity-key plans with deterministic
total orders; the attribution carry is the same union-sort
carry-forward idea as ``operators/asof.py`` specialized to the same
table (no union needed — one window pass).

No reference citations: north-star additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table


@register(
    "attribution_last_touch",
    """
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS last_click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER w AS last_click_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                THEN last_click_id END AS click_id,
           CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                THEN epoch_us(ts) - epoch_us(last_click_ts) END AS gap_us
    FROM seq WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution with a 7-day staleness tolerance: each
    purchase is credited to the user's most recent click, unless the
    click is older than the window (then NULL — organic). One
    carry-forward window per user (``last(..., ignorenulls)`` over the
    (ts, event_id) total order) — the same-table special case of the
    as-of join, with the tolerance as a post-carry predicate; gap is
    exact integer epoch-micros."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    fresh = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return seq.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(fresh, F.col("last_click_id")).alias("click_id"),
        F.when(
            fresh, F.unix_micros("ts") - F.unix_micros("last_click_ts")
        ).alias("gap_us"),
    )


@register(
    "record_survivorship",
    """
    WITH attrs AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'signup'
                  THEN 'acct-' || CAST(event_id AS VARCHAR) END AS account_mark,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2)) END AS purchase_amount,
             CASE WHEN event_type = 'error' THEN ts END AS error_ts
      FROM events),
    seq AS (
      SELECT user_id, ts, event_id,
             last_value(account_mark IGNORE NULLS) OVER w AS last_account,
             last_value(purchase_amount IGNORE NULLS) OVER w AS last_purchase_amount,
             last_value(error_ts IGNORE NULLS) OVER w AS last_error_ts,
             COUNT(*) OVER w AS n_events,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM attrs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT user_id, last_account,
           CAST(last_purchase_amount AS DOUBLE) AS last_purchase_amount,
           last_error_ts, n_events, ts AS last_seen
    FROM seq WHERE rn = 1
    """,
)
def record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC golden-record survivorship: one merged row per user carrying
    the LATEST NON-NULL value of each sparse attribute (attributes only
    present on some event types — the shape of merging partial updates
    from many feeds). Recency rule = last-non-null over the (ts,
    event_id) total order; the final row per entity is rank-1 on the
    reversed order. One shuffle on the entity key, no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    attrs = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "signup",
            F.concat(F.lit("acct-"), F.col("event_id").cast("string")),
        ).alias("account_mark"),
        F.when(
            F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)")
        ).alias("purchase_amount"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias("error_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = attrs.select(
        "user_id",
        "ts",
        F.last("account_mark", ignorenulls=True).over(w).alias("last_account"),
        F.last("purchase_amount", ignorenulls=True)
        .over(w)
        .alias("last_purchase_amount"),
        F.last("error_ts", ignorenulls=True).over(w).alias("last_error_ts"),
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.row_number().over(w_desc).alias("rn"),
    )
    return seq.filter(F.col("rn") == 1).select(
        "user_id",
        "last_account",
        F.col("last_purchase_amount").cast("double").alias("last_purchase_amount"),
        "last_error_ts",
        "n_events",
        F.col("ts").alias("last_seen"),
    )


@register(
    "copurchase_pairs",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT p1, p2, n_orders FROM pairs WHERE n_orders >= 2
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase pairs: parts appearing together in at
    least two orders. The self-join is keyed on the ORDER (basket), so
    pair blow-up is bounded by basket size squared (≤ ~7 items/order ⇒
    ≤ 21 pairs), never corpus-quadratic — the same blocking discipline
    as the LSH band joins; ``p1 < p2`` halves the pairs and
    canonicalizes them. Support threshold prunes before any downstream
    lift/affinity computation would run."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
