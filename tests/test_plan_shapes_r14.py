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


class TestUnigramEncodeJoinRegimes:
    """The measured broadcast bound on the encode's word→ids mapping
    (PERF.md r14, closing VERDICT r13 #4): under the bound the token
    join is broadcast; above it, it shuffles on word. Both regimes
    pinned on executed plans."""

    def _encode_plan(self, spark, sf_dir, monkeypatch, bound):
        from kafka_sink_azure_kusto_spark.functions import unigram as U
        from kafka_sink_azure_kusto_spark.sources.tables import load_table

        monkeypatch.setattr(U, "_ENCODE_BROADCAST_WORDS", bound)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        words = U.word_counts(docs, max_word_len=8)
        lp = U.lp_table(U.seed_substring_counts(words, 4), 48)
        segs = U.viterbi_segment(words, lp, 8, 4)
        wid_w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
        from pyspark.sql import functions as F

        vocab = lp.withColumn(
            "tid",
            (F.row_number().over(
                wid_w.orderBy(F.col("cnt").desc(), F.col("piece").asc())
            ) - 1).cast("int"),
        ).select("tid", "piece")
        out = U.unigram_encode(docs, vocab, segs, unk_id=48)
        out.write.format("noop").mode("overwrite").save()
        return out._jdf.queryExecution().executedPlan().toString()

    def test_under_bound_broadcasts(self, spark, sf_dir, monkeypatch):
        plan = self._encode_plan(spark, sf_dir, monkeypatch, 100_000)
        assert "SortMergeJoin" not in plan

    def test_over_bound_shuffles(self, spark, sf_dir, monkeypatch):
        plan = self._encode_plan(spark, sf_dir, monkeypatch, 0)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
