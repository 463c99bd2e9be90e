"""Plan-shape regression tests for the round-5 second-wave queries:
the properties that make them survive 100 TB, asserted on the actual
executed plan so refactors can't silently regress them."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_q6_filters_reach_the_parquet_scan(plans):
    plan = plans("q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # shipdate/discount/quantity must appear among the pushed filters
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q19_part_join_is_broadcast(plans):
    plan = plans("q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q18_uses_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans("q18_large_volume_customers")


def test_copurchase_lift_top50_never_global_sorts(plans):
    plan = plans("copurchase_lift")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_attribution_windows_are_keyed(plans):
    for q in ("attribution_last_touch", "record_survivorship", "scd1_upsert",
              "events_ewma", "value_winsorize"):
        plan = plans(q)
        assert "Window" in plan, q
        assert "SinglePartition" not in plan, f"{q}: data-sized single-partition stage"


def test_countmin_probe_joins_broadcast_sketch(plans):
    plan = plans("countmin_heavy_hitters")
    assert "BroadcastHashJoin" in plan


def test_streaming_free_queries_have_no_cartesian(plans):
    for q in (
        "q4_priority_exists",
        "q7_bilateral_trade",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q22_dormant_high_balance",
        "distinct_kmv_estimate",
        "weighted_sample_wor",
        "pagerank_nation_trade",
        "value_drift_psi",
        "incremental_agg_maintenance",
        "timeseries_profile_similarity",
        "copurchase_pairs",
        "bpe_iterative_merges",
    ):
        assert "CartesianProduct" not in plans(q), q
