"""Plan-shape regression tests for the round-14 operators — the
100 TB-bearing properties pinned on executed plans (the r12/r13
discipline): the composed IVF-PQ serving read must keep every small
side (codebook, distance table, probed cells, queries) broadcast, scan
the code store cell-pruned, and never plan a cartesian or a
code-store-side sort-merge join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def served(spark, sf_dir):
    from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
        ivfpq_serving_pipeline,
    )

    df = ivfpq_serving_pipeline(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_serving_pipeline_no_cartesian(served):
    assert "CartesianProduct" not in served


def test_serving_pipeline_all_joins_broadcast(served):
    """Every join in the read is small-side-broadcast: the corpus-
    cardinality frames (code store, raw vectors for rerank) only ever
    join against broadcast relations (codebook / distance table /
    probed cells / shortlist / queries) — a SortMergeJoin would mean a
    corpus-side shuffle snuck into the serving path."""
    assert "BroadcastHashJoin" in served
    assert "SortMergeJoin" not in served


def test_serving_pipeline_scans_code_store(served):
    """The shortlist stage reads the parquet CODE store (8-byte codes),
    not re-derived in-memory codes — the scan is what cell-partitioning
    prunes at 100 TB."""
    assert "sv_codes_" in served
