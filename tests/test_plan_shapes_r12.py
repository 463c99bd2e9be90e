"""Plan-shape regression tests for the round-12 operators: the
properties that make them survive 100 TB, asserted on the actual
executed plan so refactors can't silently regress them. (The streaming
loops are exercised end-to-end by their gates; here we pin the
plan shapes of their SERVING/TRAINING building blocks.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dbl(spark, sf_dir):
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).localCheckpoint()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pq_encode_broadcasts_codebook_no_corpus_shuffle(spark, dbl):
    """The per-batch encode path of every PQ upsert kernel: the
    codebook joins in broadcast; the only exchange is the fixed-width
    (id, m) argmin aggregate — a corpus-side sort or cartesian here
    would scale with the index, not the batch."""
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        pq_encode,
        subvectors,
    )

    cb = subvectors(dbl.filter(F.col("vec_id") < 16), 8, 8, vec_col="v").select(
        "m", F.col("id").alias("code"), F.col("sv").alias("c")
    )
    plan = _plan(pq_encode(dbl, cb, 8, 8, vec_col="v"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_cell_pruned_adc_joins_on_cell(spark, dbl):
    """pq_adc_topk with the cell equi-key: the distance table stays
    broadcast and the ADC join carries the cell — no cartesian, no
    corpus-side sort-merge."""
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        pq_adc_topk,
        pq_encode,
        subvectors,
    )

    cb = subvectors(dbl.filter(F.col("vec_id") < 16), 8, 8, vec_col="v").select(
        "m", F.col("id").alias("code"), F.col("sv").alias("c")
    )
    codes = pq_encode(dbl, cb, 8, 8, vec_col="v").join(
        dbl.select("vec_id", F.col("label").alias("cell")), "vec_id"
    )
    out = pq_adc_topk(
        codes.select("vec_id", "m", "code", "cell"),
        dbl.filter(F.col("vec_id") < 5).withColumn("qcell", F.col("label")),
        cb, 8, 8, k=10, query_vec_col="v",
        codes_cell_col="cell", query_cell_col="qcell",
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hierarchical_search_no_unbounded_cartesian(spark, dbl, sf_dir):
    """The layered searcher's only cross product is queries × top-layer
    members (both bounded by construction); everything else must be
    hash equi-joins."""
    from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
        _hl_corpus,
        _hl_layers,
    )
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        hierarchical_graph_search_topk,
    )

    corpus, qs = _hl_corpus(spark, sf_dir)
    edges0, layers = _hl_layers(corpus)
    out = hierarchical_graph_search_topk(
        corpus, qs, edges0, layers, k=5, rounds=2, beam=3,
        vec_col="v", query_vec_col="v",
    )
    plan = _plan(out)
    # the entries cross product is a BroadcastNestedLoopJoin over two
    # bounded sides; a CartesianProduct (both sides partitioned =
    # unbounded) must never appear. SortMergeJoin IS allowed: the
    # per-round visited-set LEFT ANTI joins plan as SMJ over two
    # per-query-bounded candidate frames (≤ entries + rounds·beam·
    # degree rows per query) — bounded sides, not a scale hazard.
    assert "CartesianProduct" not in plan


def test_unigram_encode_single_doc_shuffle(spark, sf_dir):
    """The id-emission path: the capped PIECE table broadcasts, the
    word→ids mapping joins on the word key WITHOUT a forced broadcast
    (it scales with corpus vocabulary — ADVICE r12 #1; AQE picks
    broadcast when it fits), and per-doc arrays are assembled through a
    doc_id-keyed exchange. Pins: no cartesian, no data-sized
    single-partition stage, and the mapping join is NOT hint-forced."""
    from kafka_sink_azure_kusto_spark.functions import unigram as U
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = U.word_counts(docs, max_word_len=8).localCheckpoint()
    vocab, _ = U.unigram_train(words, 8, 4, 48, 40, em_iters=1)
    vocab = vocab.localCheckpoint()
    segs = U.viterbi_segment(words, vocab.select("piece", "lp"), 8, 4)
    enc = U.unigram_encode(docs, vocab, segs.localCheckpoint(), unk_id=40)
    plan = _plan(enc)
    assert "CartesianProduct" not in plan
    # hashpartitioning exchanges only (word-keyed mapping join +
    # doc-keyed assembly); no data-sized single-partition stage.
    # SortMergeJoin on the word key is ALLOWED — that is exactly the
    # huge-vocabulary fallback the unforced join strategy buys.
    assert "SinglePartition" not in plan
    # the logical plan must not force the vocabulary-sized side: no
    # broadcast hint survives into the analyzed plan for the seg_ids
    # join (the piece-table broadcast inside seg_ids itself is fine —
    # that side is trainer-capped)
    analyzed = enc._jdf.queryExecution().analyzed().toString()
    # exactly one hint total: broadcast(vocab) inside seg_ids
    assert analyzed.count("UnresolvedHint") == 0
    assert analyzed.count("ResolvedHint") <= 1
