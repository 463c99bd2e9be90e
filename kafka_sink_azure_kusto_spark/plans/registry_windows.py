"""Round-5 window-function surface: RANGE-interval trailing frames,
equi-depth binning (ntile), share-of-total ratios, and lead/lag
inter-event gaps — the analytics shapes a feature-engineering pipeline
leans on, each with a deterministic total order and exact arithmetic
(DECIMAL sums, integer day/second math) so the DuckDB oracle matches
hash-for-hash.

Scale note common to all four: one shuffle on the partition key, state
bounded by the frame; no SinglePartition windows anywhere (asserted in
tests/test_r5_plans.py pattern).

No reference citations: north-star additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table


@register(
    "orders_trailing_30d_revenue",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS trailing_rev,
           COUNT(*) OVER w AS n_orders_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY epoch_us(o_orderdate) // 1000000
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def orders_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day revenue per customer at every order — a RANGE
    frame over integer epoch-seconds (2 592 000 s = 30 d). RANGE frames
    include ALL rows with equal order keys in both engines, so same-day
    orders see each other symmetrically — no tie-break needed. One
    shuffle on the customer key; frame state is the 30-day run."""
    o = load_table(spark, sf_dir, "orders")
    sec = F.expr("unix_micros(o_orderdate) div 1000000")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(sec)
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_rev"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@register(
    "equidepth_bins",
    """
    WITH binned AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events)
    SELECT event_type, decile, COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM binned GROUP BY event_type, decile
    """,
)
def equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) binning of the metric distribution per event
    type — the feature-binning / monitoring primitive. NTILE's
    remainder-to-first-buckets rule is identical across engines, and
    the (value, event_id) total order makes bucket membership exact,
    not approximate. At scale this is the exact counterpart to
    approx-quantile bucketing: one shuffle on the group key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
    )


@register(
    "nation_revenue_share",
    """
    WITH nat AS (
      SELECT n.n_name, r.r_name,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n ON n.n_nationkey = c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY n.n_name, r.r_name)
    SELECT n_name, r_name,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
             AS share_in_region,
           CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share_global
    FROM nat
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total ratios at two grouping levels (region, global)
    via window sums OVER the aggregated nation rollup — the ratios are
    double divisions of EXACT decimal sums, identical in both engines.
    The windows run over ≤ nations rows (post-aggregation), so the
    empty/global frame is a 25-row problem, never a data-sized one."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    rev_d = F.col("rev").cast("double")
    return nat.select(
        "n_name",
        "r_name",
        rev_d.alias("revenue"),
        (rev_d / F.sum("rev").over(w_region).cast("double")).alias("share_in_region"),
        (rev_d / F.sum("rev").over(w_all).cast("double")).alias("share_global"),
    )


@register(
    "customer_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_latest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order day gaps per customer (lag), order sequence number,
    and latest-order flag (lead IS NULL) — the churn-feature shape.
    Integer day arithmetic on the (orderdate, orderkey) total order;
    first orders carry NULL gaps in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
        F.lead("o_orderdate").over(w).isNull().alias("is_latest"),
    )


@register(
    "events_ewma",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             list(CAST(value AS DOUBLE))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
      FROM events)
    SELECT event_id, user_id,
           list_sum(list_transform(list_zip(arr, range(len(arr))),
                    p -> p[1] * pow(0.8, len(arr) - 1 - p[2])))
           / list_sum(list_transform(range(len(arr)), k -> pow(0.8, k)))
             AS ewma
    FROM w
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted exponentially-weighted moving average (α=0.2) of the
    metric per user — the smoothing feature every monitoring/feature
    pipeline wants, expressed EXACTLY as a bounded window: the true
    EWMA recurrence is not window-expressible, but truncating at 20
    events (weight 0.8²⁰ ≈ 1.2%) makes it a pure frame computation both
    engines evaluate identically — collect the frame as an array, fold
    position-weighted terms with higher-order functions (zip_with +
    aggregate in Spark; list_zip + list_transform in DuckDB), normalize
    by the weight sum. One shuffle on the user key; per-row state is
    the 20-element frame; no UDF, all codegen'd built-ins."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    arr = F.collect_list(F.col("value").cast("double")).over(w)
    out = ev.select("event_id", "user_id", arr.alias("arr"))
    n = F.size("arr")
    weighted = F.zip_with(
        F.col("arr"),
        F.sequence(F.lit(0), n - 1),
        lambda v, k: v * F.pow(F.lit(0.8), (n - 1 - k).cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda k: F.pow(F.lit(0.8), k.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.select("event_id", "user_id", (num / den).alias("ewma"))


@register(
    "incremental_agg_maintenance",
    """
    WITH base AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
    delta AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
    base_agg AS (
      SELECT c_nationkey AS nationkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, COUNT(*) AS n
      FROM base JOIN customer ON c_custkey = o_custkey GROUP BY 1),
    delta_agg AS (
      SELECT c_nationkey AS nationkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, COUNT(*) AS n
      FROM delta JOIN customer ON c_custkey = o_custkey GROUP BY 1),
    merged AS (
      SELECT COALESCE(b.nationkey, d.nationkey) AS nationkey,
             COALESCE(b.rev, 0) + COALESCE(d.rev, 0) AS rev,
             COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n
      FROM base_agg b FULL OUTER JOIN delta_agg d ON b.nationkey = d.nationkey)
    SELECT nationkey, CAST(rev AS DOUBLE) AS revenue, n FROM merged
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the per-nation
    revenue rollup updated by MERGING a delta batch's partial aggregate
    into the stored base aggregate (full-outer join + coalesced decimal
    addition) — never re-scanning base facts. The oracle composes the
    same two partials, and because DECIMAL addition is associative the
    merged result is bit-identical to a full recompute (asserted in
    tests). This is the algebraic property that makes a 100 TB rollup
    maintainable: the nightly job touches only the delta."""
    cut = F.to_timestamp(F.lit("2000-01-01"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    def agg_of(part: DataFrame) -> DataFrame:
        return (
            part.join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    base = agg_of(orders.filter(F.col("o_orderdate") < cut))
    delta = agg_of(orders.filter(F.col("o_orderdate") >= cut))
    b = base.select(
        F.col("nationkey").alias("b_key"), F.col("rev").alias("b_rev"), F.col("n").alias("b_n")
    )
    d = delta.select(
        F.col("nationkey").alias("d_key"), F.col("rev").alias("d_rev"), F.col("n").alias("d_n")
    )
    merged = b.join(d, F.col("b_key") == F.col("d_key"), "full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        F.coalesce(F.col("b_key"), F.col("d_key")).alias("nationkey"),
        (F.coalesce(F.col("b_rev"), zero) + F.coalesce(F.col("d_rev"), zero))
        .cast("double")
        .alias("revenue"),
        (F.coalesce(F.col("b_n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0))).alias(
            "n"
        ),
    )


@register(
    "value_winsorize",
    """
    WITH ranked AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    cuts AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN value END) AS lo,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS hi
      FROM ranked GROUP BY event_type)
    SELECT r.event_id, r.event_type,
           CAST(r.value AS DOUBLE) AS value,
           CAST(LEAST(GREATEST(r.value, c.lo), c.hi) AS DOUBLE) AS winsorized,
           (r.value < c.lo OR r.value > c.hi) AS clipped
    FROM ranked r JOIN cuts c ON r.event_type = c.event_type
    """,
)
def value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at exact p05/p95 per event type — the outlier-
    clipping step before any mean/regression feature. Cut points are
    EXACT order statistics (rank ceil(q·n) on the (value, event_id)
    total order — no interpolation, no approximation), broadcast back
    onto the rows as a tiny per-group cut table. Two passes over the
    metric column, one shuffle each."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"), F.col("value")
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("value")
            )
        ).alias("hi"),
    )
    return ranked.join(
        F.broadcast(cuts.withColumnRenamed("event_type", "ct")),
        F.col("event_type") == F.col("ct"),
    ).select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
        .cast("double")
        .alias("winsorized"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )


@register(
    "orders_metrics_unpivot",
    """
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
             CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
             CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, metric, value FROM wide
    UNPIVOT (value FOR metric IN (n_orders, total_price, min_price, max_price))
    """,
)
def orders_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long metric reshaping via the native ``DataFrame.unpivot``
    (melt) — the metrics-catalog / dashboard-feed shape. The wide
    aggregate is 5 rows, so the unpivot is free; the point is the API
    surface and the exact DECIMAL-backed values surviving the reshape.
    DuckDB's UNPIVOT drops NULL cells by default and so does Spark's
    ``unpivot`` — semantics align without options."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "min_price", "max_price"],
        "metric",
        "value",
    )
