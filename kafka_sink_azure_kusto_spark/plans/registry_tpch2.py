"""Second TPC-H analog batch (r9b): Q12/Q13/Q14/Q16 shapes adapted to
the driver's schema (no partsupp / l_shipmode / p_container columns —
``l_linestatus`` stands in for shipmode in Q12 and the Q16 supplier
count runs over lineitem's supplier keys). Same decimal discipline as
``registry_r5b``: DECIMAL(18,2) partials so sums are exact and
order-independent, cast to double only at the output boundary.

No reference citations: analytics breadth additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "q12_linestatus_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for l_shipmode):
    per line status, how many 1996-shipped lines belong to urgent/high
    vs lower-priority orders. The shipdate filter pushes to the
    lineitem scan; orders joins on the orderkey; the pivot is two
    conditional sums — one exchange on the tiny group key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer order-count DISTRIBUTION —
    zero-order customers included via the left join (COUNT of the
    right-side key, not COUNT(*)). Two exchanges: custkey for the
    per-customer count, then the tiny c_count key. The classic
    histogram-of-activity query for retention dashboards."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    ).select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")


@register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END)
                AS DOUBLE) AS promo_revenue,
           CAST(SUM({_REV}) AS DOUBLE) AS total_revenue,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                       THEN {_REV} ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 6) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for a shipdate window.
    The part dimension broadcasts; both revenue sums are exact
    DECIMAL(18,2) partials (order-independent), divided as doubles
    only at the output — the ratio is bit-stable across partitionings."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    agg = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


@register(
    "q16_supplier_brand_count",
    """
    SELECT p_brand, CAST(p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
         JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_brand <> 'Brand#9'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND s_acctbal >= 0
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_brand_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety per part attribute, partsupp
    stood in by lineitem's supplier keys): distinct suppliers per
    (brand, size) excluding one brand, a size IN-list, and
    negative-balance suppliers (the complaint-supplier exclusion
    analog). Both dimensions broadcast; the COUNT DISTINCT is the one
    wide operation, keyed on the small (brand, size) space."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    ).filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    ).filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .select(
            "p_brand", F.col("p_size").cast("int").alias("p_size"),
            "supplier_cnt",
        )
    )


@register(
    "q8_market_share",
    f"""
    WITH flat AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {_REV} AS rev,
             ns.n_name AS supp_nation
      FROM lineitem
           JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ns ON ns.n_nationkey = s_nationkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation nc ON nc.n_nationkey = c_nationkey
           JOIN region ON r_regionkey = nc.n_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                         ELSE 0 END) AS DOUBLE) AS nation_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of the STANDARD-part
    revenue sold into EUROPE-region customers per order year, the
    share supplied by one nation. Seven-table star join — every
    dimension (part, supplier, customer, nation×2, region) broadcasts;
    lineitem and orders are the only fact-sized sides and join on the
    orderkey. Revenue partials are exact DECIMAL(18,2); the share
    divides doubles at the output boundary."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    ns = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    flat = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region), F.col("r_regionkey") == F.col("cn_region")
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            "supp_nation",
        )
    )
    target = F.when(
        F.col("supp_nation") == "NATION_3", F.col("rev")
    ).otherwise(F.lit(0))
    agg = flat.groupBy("o_year").agg(
        F.sum(target).cast("double").alias("nation_revenue"),
        F.sum("rev").cast("double").alias("total_revenue"),
    )
    return agg.select(
        F.col("o_year").cast("bigint").alias("o_year"),
        "nation_revenue",
        "total_revenue",
        F.round(
            F.col("nation_revenue") / F.col("total_revenue"), 6
        ).alias("mkt_share"),
    )


@register(
    "k_anonymity_audit",
    """
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             COUNT(*) AS cell_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(cell_size AS BIGINT) AS cell_size,
           CAST(cell_size < 5 AS INT) AS suppress
    FROM cells
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ANONYMITY audit over quasi-identifiers (nation, market
    segment, banded account balance): every equivalence-class cell
    with its size and a suppress flag for cells below k=5 — the
    data-governance gate run before releasing joined training data.
    One map-side-combined groupBy on the quasi-identifier tuple;
    banding (floor to 1000s) is the generalization step. At 100 TB the
    cell table is |quasi-value-space| rows — the suppression list
    broadcasts back into the release filter."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
    cells = (
        cust.groupBy(
            "c_nationkey", "c_mktsegment", band.alias("bal_band")
        )
        .agg(F.count(F.lit(1)).alias("cell_size"))
    )
    return cells.select(
        "c_nationkey", "c_mktsegment", "bal_band",
        F.col("cell_size").cast("bigint").alias("cell_size"),
        (F.col("cell_size") < 5).cast("int").alias("suppress"),
    )


@register(
    "rfm_segmentation",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(ts),
                            (SELECT MAX(ts) FROM events)) AS BIGINT)
                 AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                 AS monetary_cents
      FROM events GROUP BY user_id),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             NTILE(4) OVER (ORDER BY recency_days ASC, user_id)
                 AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id)
                 AS f_score,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id)
                 AS m_score
      FROM per_user)
    SELECT user_id, recency_days, frequency, monetary_cents,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
                WHEN r_score >= 3 AND f_score >= 3 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) user segmentation: per-user
    aggregates in one exchange, quartile scores via NTILE over total
    orders (deterministic user_id tie-break — exactly reproducible),
    champion/at-risk/regular labels. Monetary is exact integer cents
    (value·100 per event, summed as BIGINT) so the quartile boundaries
    can't drift on float summation order. The NTILE is a global sort
    of per-USER rows — |users| ≪ |events| at any scale (the same
    post-aggregation-window pattern as nation_revenue_share)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("_gmax"))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("_umax"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(max_ts))
        .select(
            "user_id",
            F.datediff(F.to_date("_gmax"), F.to_date("_umax"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r = F.ntile(4).over(
        Window.orderBy(F.col("recency_days").asc(), F.col("user_id"))
    )
    f = F.ntile(4).over(
        Window.orderBy(F.col("frequency").desc(), F.col("user_id"))
    )
    m = F.ntile(4).over(
        Window.orderBy(F.col("monetary_cents").desc(), F.col("user_id"))
    )
    scored = per.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        r.cast("int").alias("r_score"),
        f.cast("int").alias("f_score"),
        m.cast("int").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1),
               F.lit("champion"))
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3),
              F.lit("at_risk"))
        .otherwise(F.lit("regular"))
    )
    return scored.withColumn("segment", seg)
