"""Third TPC-H analog batch (r10): Q2/Q9/Q11/Q20/Q21 shapes — the five
analogs the registry was missing. The driver schema has NO partsupp
table, so these run over a DERIVED partsupp: 4 suppliers per part with
hash-free integer-arithmetic availqty/supplycost (cents), identical in
both engines (``_partsupp`` / ``_PS_SQL``). Supply cost stays in
integer CENTS end-to-end; revenue uses the repo's DECIMAL(18,2)
discipline; doubles appear only at output boundaries.

No reference citations: analytics breadth additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table

# 4 suppliers per part: suppkey = (p_partkey*4 + i) mod n_supp (stride-1
# block — distinct for n_supp ≥ 4); availqty ∈ [1, 9999] and supplycost
# cents ∈ [100, 100099] are integer polynomials of (part, supplier), so
# both engines derive the identical relation with zero I/O.
_PS_SQL = """
    ps AS (
      SELECT p_partkey,
             (p_partkey * 4 + i.i) % ns.n AS ps_suppkey,
             (p_partkey * 7 + ((p_partkey * 4 + i.i) % ns.n) * 11) % 9999
                 + 1 AS ps_availqty,
             (p_partkey * 31 + ((p_partkey * 4 + i.i) % ns.n) * 17) % 100000
                 + 100 AS ps_cost_cents
      FROM part
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      CROSS JOIN (SELECT MAX(s_suppkey) + 1 AS n FROM supplier) ns)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PS_SQL. The supplier-count scalar rides in as
    a broadcast 1-row frame (no driver round trip)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    ns = load_table(spark, sf_dir, "supplier").agg(
        (F.max("s_suppkey") + 1).alias("_n")
    )
    sk = F.pmod(F.col("p_partkey") * 4 + F.col("i"), F.col("_n")).cast("long")
    return (
        part.crossJoin(F.broadcast(ns))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .select(
            "p_partkey",
            sk.alias("ps_suppkey"),
            (F.pmod(F.col("p_partkey") * 7 + sk * 11, F.lit(9999)) + 1)
            .cast("long").alias("ps_availqty"),
            (F.pmod(F.col("p_partkey") * 31 + sk * 17, F.lit(100000)) + 100)
            .cast("long").alias("ps_cost_cents"),
        )
    )


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_SQL},
    eursup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
               FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE'),
    cand AS (SELECT ps.p_partkey, ps.ps_cost_cents,
                    e.s_name, e.s_acctbal, e.n_name
             FROM ps JOIN eursup e ON ps.ps_suppkey = e.s_suppkey
             WHERE ps.p_partkey % 5 = 0),
    mn AS (SELECT p_partkey, MIN(ps_cost_cents) AS min_cents
           FROM cand GROUP BY p_partkey)
    SELECT c.p_partkey, p.p_brand, c.s_name, c.n_name,
           ROUND(c.s_acctbal, 2) AS s_acctbal,
           c.ps_cost_cents AS supplycost_cents
    FROM cand c
    JOIN mn ON c.p_partkey = mn.p_partkey
           AND c.ps_cost_cents = mn.min_cents
    JOIN part p ON p.p_partkey = c.p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for every 5th part, the
    EUROPE-region supplier(s) offering the minimum supply cost —
    the correlated-MIN-subquery pattern as a groupBy-min + equi-join
    back (ties kept, like Q2). Supplier/nation/region dims broadcast;
    the only large-side shuffle is the per-part min over the derived
    partsupp. Costs stay integer cents → exact."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    eursup = (
        sup.join(F.broadcast(nat),
                 sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        _partsupp(spark, sf_dir)
        .filter(F.col("p_partkey") % 5 == 0)
        .join(F.broadcast(eursup),
              F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "ps_cost_cents", "s_name", "s_acctbal", "n_name")
    )
    mn = cand.groupBy("p_partkey").agg(
        F.min("ps_cost_cents").alias("min_cents")
    ).select(F.col("p_partkey").alias("mn_partkey"), "min_cents")
    return (
        cand.join(
            mn,
            (F.col("p_partkey") == F.col("mn_partkey"))
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("pt_partkey"),
                                    "p_brand")),
            F.col("p_partkey") == F.col("pt_partkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.col("ps_cost_cents").alias("supplycost_cents"),
        )
    )


@register(
    "q9_product_profit",
    f"""
    WITH {_PS_SQL}
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2))))
                      AS DOUBLE)
                 - CAST(SUM(ps_cost_cents * CAST(l_quantity AS BIGINT))
                        AS DOUBLE) / 100.0, 6) AS profit
    FROM lineitem
    JOIN ps ON ps.p_partkey = l_partkey AND ps.ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier nation per
    order year, revenue minus supply cost over lineitems that match a
    derived partsupp row. Revenue sums in DECIMAL(18,2) (exact,
    order-free), cost in integer cents × integral quantity (exact
    int64); the subtraction happens once per group in double. Nation
    broadcast; lineitem shuffles once on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    ps = _partsupp(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    cost_cents = F.col("ps_cost_cents") * F.col("l_quantity").cast("bigint")
    return (
        li.join(
            ps,
            (ps["p_partkey"] == li["l_partkey"])
            & (ps["ps_suppkey"] == li["l_suppkey"]),
        )
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(rev).cast("double")
                - F.sum(cost_cents).cast("double") / 100.0,
                6,
            ).alias("profit")
        )
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PS_SQL},
    asiasup AS (SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'),
    val AS (SELECT p_partkey,
                   CAST(SUM(ps_cost_cents * ps_availqty) AS BIGINT) AS value_cents
            FROM ps JOIN asiasup ON ps_suppkey = s_suppkey
            GROUP BY p_partkey),
    tot AS (SELECT SUM(value_cents) AS t FROM val)
    SELECT p_partkey, value_cents
    FROM val, tot WHERE value_cents * 1000 > t
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    (cost × availqty, integer cents) over ASIA-region suppliers, kept
    when the part's value exceeds 1/1000 of the total — the scalar
    aggregate threshold as a broadcast 1-row cross join, the same
    shape as q22's. All integer arithmetic → exact; the ×1000
    comparison stays far inside int64."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asiasup = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(asiasup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey")
        .agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_availqty"))
            .cast("bigint").alias("value_cents")
        )
    )
    tot = val.agg(F.sum("value_cents").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("t"))
        .select("p_partkey", "value_cents")
    )


@register(
    "q20_promotion_candidates",
    f"""
    WITH {_PS_SQL},
    shipped AS (SELECT l_partkey, l_suppkey,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_partkey, l_suppkey),
    excess AS (SELECT ps.ps_suppkey, ps.p_partkey
               FROM ps JOIN shipped
                 ON ps.p_partkey = l_partkey AND ps.ps_suppkey = l_suppkey
               WHERE ps.ps_availqty > 2 * qty)
    SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
    FROM excess
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY s_name, n_name
    """,
)
def q20_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers): suppliers whose
    derived availqty exceeds 2× what they actually shipped of that
    part in 1996 — the EXISTS-with-aggregate-subquery pattern as an
    aggregate + equi-join + filter. The shipdate filter pushes to the
    lineitem scan; supplier/nation broadcast; counts exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty")
    )
    ps = _partsupp(spark, sf_dir)
    excess = ps.join(
        shipped,
        (ps["p_partkey"] == shipped["l_partkey"])
        & (ps["ps_suppkey"] == shipped["l_suppkey"]),
    ).filter(F.col("ps_availqty") > 2 * F.col("qty"))
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        excess.join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_excess_parts"))
    )


@register(
    "q21_waiting_orders",
    """
    WITH ol AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
                FROM lineitem GROUP BY l_orderkey, l_suppkey),
    om AS (SELECT l_orderkey, MAX(last_ship) AS omax, MIN(last_ship) AS omin,
                  COUNT(*) AS nsupp
           FROM ol GROUP BY l_orderkey),
    waiting AS (SELECT ol.l_orderkey, ol.l_suppkey
                FROM ol JOIN om USING (l_orderkey)
                WHERE om.nsupp >= 2 AND ol.last_ship = om.omax
                  AND om.omin < om.omax)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM waiting JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): in every
    multi-supplier order, the supplier(s) whose latest shipment IS the
    order's last — while some other supplier finished strictly earlier.
    Q21's EXISTS/NOT-EXISTS double correlation becomes two aggregations
    over the same per-(order, supplier) frame plus one equi-join back:
    lineitem shuffles once on (orderkey, suppkey), the order-level
    rollup reuses that partitioning's prefix, supplier broadcasts.
    Counts exact; ties (two suppliers sharing the max) both count, like
    Q21's EXISTS semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    ol = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    om = ol.groupBy("l_orderkey").agg(
        F.max("last_ship").alias("omax"),
        F.min("last_ship").alias("omin"),
        F.count(F.lit(1)).alias("nsupp"),
    )
    waiting = ol.join(om, "l_orderkey").filter(
        (F.col("nsupp") >= 2)
        & (F.col("last_ship") == F.col("omax"))
        & (F.col("omin") < F.col("omax"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
