"""Plan-shape regression tests for the round-13 operators — the
100 TB-bearing properties pinned on executed plans (the r12
discipline): the nn-descent layer builder must never plan an unbounded
cartesian, and the nprobe ADC serving read must keep the probed-cells
relation broadcast with the cell as an equi-key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions import similarity as S


@pytest.fixture(scope="module")
def dbl(spark, sf_dir):
    from kafka_sink_azure_kusto_spark.plans.registry_r12 import _hl_corpus

    d, _ = _hl_corpus(spark, sf_dir)
    return d.localCheckpoint()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_nn_descent_layer_build_no_cartesian(spark, dbl):
    """Layer-0 nn-descent construction (the knn_graph_build_exact
    replacement): candidate generation is banded bucket equi-joins +
    id-keyed two-hop expansion — a CartesianProduct anywhere means the
    all-pairs stage snuck back in."""
    edges = S.nn_descent_refine(
        dbl.select(F.col("vec_id").alias("nid"), "v"),
        id_col="nid", vec_col="v",
        num_planes=6, k=6, bucket_cap=256, bands=2,
    )
    plan = _plan(edges)
    assert "CartesianProduct" not in plan


def test_nprobe_adc_broadcasts_probe_relation(spark, dbl):
    """The nprobe>1 serving read: distance table and probed-cells
    relation ride broadcast; the code store joins on (m, code, cell)
    hash keys. No cartesian, no code-store-side sort."""
    cb = (
        S.subvectors(dbl.filter(F.col("vec_id") < 16), 8, 8, vec_col="v")
        .select("m", F.col("id").alias("code"), F.col("sv").alias("c"))
        .localCheckpoint()
    )
    codes = (
        S.pq_encode(dbl, cb, 8, 8, vec_col="v")
        .join(dbl.select("vec_id", F.col("label").alias("cell")), "vec_id")
        .select("vec_id", "m", "code", "cell")
        .localCheckpoint()
    )
    cents = S.cell_centroids(dbl, cell_col="label", vec_col="v").select(
        "cell", F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid")
    )
    queries = dbl.filter(F.col("vec_id") < 8)
    qcells = S.multiprobe_cells(
        queries.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qvec")),
        cents, 2,
    )
    out = S.pq_adc_topk(
        codes, queries, cb, 8, 8, k=10, query_vec_col="v",
        codes_cell_col="cell", query_cells=qcells,
    )
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # dtab×qcells side stays broadcast
