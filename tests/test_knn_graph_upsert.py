"""knn_graph_upsert: incremental maintenance of the exact kNN graph.

The contract under test is STRICT: after any sequence of upsert /
update / tombstone batches, the persisted adjacency equals
``knn_graph_build_exact`` over the final corpus row-for-row — which is
what the streaming gate's rebuilt-from-scratch oracle relies on."""

import os

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.similarity import (
    knn_graph_build_exact,
    knn_graph_upsert,
)

K = 3
NB = 4


def _vec(i, dim=8):
    # deterministic, non-degenerate directions
    return [float((i * 31 + j * 7) % 17 - 8) + 0.25 for j in range(dim)]


def _seed(spark, tmp_path, ids):
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, v array<double>"
    )
    vec_dir = str(tmp_path / "vecs")
    graph_dir = str(tmp_path / "graph")
    corpus.withColumn(
        "block", (F.col("vec_id") % NB).cast("int")
    ).write.partitionBy("block").parquet(vec_dir)
    knn_graph_build_exact(corpus, k=K, n_blocks=NB).write.partitionBy(
        "block"
    ).parquet(graph_dir)
    return vec_dir, graph_dir


def _adj(spark, graph_dir):
    return {
        (r.src, r.dst): round(r.score, 9)
        for r in spark.read.parquet(graph_dir).collect()
    }


def _expect(spark, vec_dir):
    corpus = spark.read.parquet(vec_dir).select("vec_id", "v")
    return {
        (r.src, r.dst): round(r.score, 9)
        for r in knn_graph_build_exact(corpus, k=K, n_blocks=NB).collect()
    }


def test_insert_update_tombstone_matches_scratch_rebuild(spark, tmp_path):
    vec_dir, graph_dir = _seed(spark, tmp_path, range(0, 20))
    # batch: 3 inserts, 2 updates (direction flips), 2 tombstones
    rows = (
        [(i, _vec(i)) for i in (100, 101, 102)]
        + [(4, [-x for x in _vec(4)]), (7, _vec(777))]
        + [(2, None), (9, None)]
    )
    batch = spark.createDataFrame(rows, "vec_id long, v array<double>")
    stats = knn_graph_upsert(batch, graph_dir, vec_dir, k=K, n_blocks=NB)
    assert stats["n_frontier"] >= 5  # at least the live batch nodes
    assert _adj(spark, graph_dir) == _expect(spark, vec_dir)
    live_ids = {r.vec_id for r in spark.read.parquet(vec_dir).collect()}
    assert live_ids == (set(range(20)) - {2, 9}) | {100, 101, 102}


def test_last_write_wins_within_batch(spark, tmp_path):
    vec_dir, graph_dir = _seed(spark, tmp_path, range(0, 12))
    batch = spark.createDataFrame(
        [(5, _vec(999), 0), (5, None, 1), (30, _vec(30), 0)],
        "vec_id long, v array<double>, seq int",
    )
    knn_graph_upsert(batch, graph_dir, vec_dir, k=K, n_blocks=NB, seq_col="seq")
    live_ids = {r.vec_id for r in spark.read.parquet(vec_dir).collect()}
    assert 5 not in live_ids and 30 in live_ids
    assert _adj(spark, graph_dir) == _expect(spark, vec_dir)


def test_untouched_blocks_not_rewritten(spark, tmp_path):
    vec_dir, graph_dir = _seed(spark, tmp_path, [0, 1, 2, 3, 5, 6, 7, 9, 10, 11])

    def files(d, blk):
        p = os.path.join(d, f"block={blk}")
        return sorted(f for f in os.listdir(p) if f.endswith(".parquet"))

    # id 200 lands in block 0; find a block whose nodes are untouched:
    # use a far-away vector so no existing top-3 changes outside block 0
    before = {b: files(graph_dir, b) for b in range(NB)}
    batch = spark.createDataFrame(
        [(200, [1000.0 + i for i in range(8)])], "vec_id long, v array<double>"
    )
    stats = knn_graph_upsert(batch, graph_dir, vec_dir, k=K, n_blocks=NB)
    assert _adj(spark, graph_dir) == _expect(spark, vec_dir)
    # blocks NOT in affected kept byte-identical adjacency files
    untouched = set(range(NB)) - set(stats["affected_blocks"])
    for b in untouched:
        assert files(graph_dir, b) == before[b]


def test_tombstone_draining_block_removes_partition(spark, tmp_path):
    # ids 3, 7, 11 are block 3 (mod 4); tombstone all of them
    vec_dir, graph_dir = _seed(spark, tmp_path, range(0, 12))
    batch = spark.createDataFrame(
        [(3, None), (7, None), (11, None)], "vec_id long, v array<double>"
    )
    stats = knn_graph_upsert(batch, graph_dir, vec_dir, k=K, n_blocks=NB)
    assert 3 in stats["emptied_blocks"]
    assert not os.path.exists(os.path.join(graph_dir, "block=3"))
    assert not os.path.exists(os.path.join(vec_dir, "block=3"))
    assert _adj(spark, graph_dir) == _expect(spark, vec_dir)


def test_frontier_guard_raises(spark, tmp_path):
    vec_dir, graph_dir = _seed(spark, tmp_path, range(0, 10))
    batch = spark.createDataFrame(
        [(50, _vec(50)), (51, _vec(51))], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="max_broadcast_frontier"):
        knn_graph_upsert(
            batch, graph_dir, vec_dir, k=K, n_blocks=NB,
            max_broadcast_frontier=1,
        )


def test_streaming_knn_graph_loop_stats_and_parity(spark, sf_dir):
    # the live loop: per-epoch bounded frontier + block-scoped rewrites,
    # and the final search equals the scratch-rebuilt-graph search
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.similarity import (
        graph_search_topk,
        knn_graph_build_exact,
    )
    from kafka_sink_azure_kusto_spark.plans.registry_r11 import (
        _KG_BEAM,
        _KG_ENTRY,
        _KG_K,
        _KG_ROUNDS,
        _KG_TOPK,
        _run_knn_graph_stream_loop,
    )
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    stats = {}
    out = _run_knn_graph_stream_loop(spark, sf_dir, stats=stats).collect()
    assert len(stats) == 2  # two micro-batches
    for st in stats.values():
        assert st["n_frontier"] > 0
        assert st["affected_blocks"]
    # scratch rebuild on the final corpus → identical search results
    emb = load_table(spark, sf_dir, "embeddings")
    final = (
        emb.filter(F.col("vec_id") % 15 != 0)
        .select(
            "vec_id",
            F.when(
                F.col("vec_id") % 9 == 0,
                F.expr("transform(embedding, x -> CAST(x AS DOUBLE) + 1.0)"),
            )
            .otherwise(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
            .alias("v"),
        )
    )
    edges = knn_graph_build_exact(final, k=_KG_K, vec_col="v").select("src", "dst")
    expect = graph_search_topk(
        final, final.filter(F.col("vec_id") < 8), edges,
        k=_KG_TOPK, rounds=_KG_ROUNDS, beam=_KG_BEAM,
        entry_stride=_KG_ENTRY, vec_col="v", query_vec_col="v",
    ).collect()
    got = {(r.query_id, r.neighbor_id, r.rank, r.score) for r in out}
    want = {(r.query_id, r.neighbor_id, r.rank, r.score) for r in expect}
    assert got == want and len(want) > 0
