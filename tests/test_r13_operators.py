"""Independent-implementation tests for round 13: the per-document
word-count store (functions/unigram.word_count_upsert), the nn-descent
layered index builder (functions/similarity.hierarchical_layers_
nn_descent), and the nprobe>1 ADC serving path (pq_adc_topk's
query_cells relation). Numeric claims are recomputed in plain
python/numpy — no DuckDB, no shared CTE text.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions import similarity as S
from kafka_sink_azure_kusto_spark.functions import unigram as U


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, seq int")


def _store_counts(spark, store):
    return {
        (r["doc_id"], r["word"]): r["cnt"]
        for r in spark.read.parquet(store).collect()
    }


class TestWordCountUpsert:
    def test_block_routing(self, spark, tmp_path):
        store = str(tmp_path / "store")
        seed = _docs(spark, [(0, "a b a", 0), (8, "b c", 0), (17, "c", 0)])
        st = U.word_count_upsert(seed, store, n_blocks=8)
        assert st["batch_docs"] == 3
        assert st["affected_blocks"] == 2  # docs 0,8 → block 0; 17 → 1

    def test_store_and_deltas_exact(self, spark, tmp_path):
        store = str(tmp_path / "store")
        seed = _docs(spark, [(0, "a b a", 0), (1, "b c", 0), (2, "c c d", 0)])
        st = U.word_count_upsert(seed, store, n_blocks=4)
        assert st["batch_docs"] == 3 and st["affected_blocks"] == 3
        assert _store_counts(spark, store) == {
            (0, "a"): 2, (0, "b"): 1, (1, "b"): 1, (1, "c"): 1,
            (2, "c"): 2, (2, "d"): 1,
        }
        deltas = {r["word"]: r["delta"] for r in st["deltas"].collect()}
        assert deltas == {"a": 2, "b": 2, "c": 3, "d": 1}

        # re-delivery (doc 1 gets new text) + tombstone (doc 2) in one
        # batch, with an in-batch duplicate resolved by seq
        b = _docs(spark, [
            (1, "a a", 0),         # stale delivery, superseded by seq 1
            (1, "e", 1),           # last write wins
            (2, None, 1),          # tombstone
        ])
        st2 = U.word_count_upsert(b, store, n_blocks=4, seq_col="seq")
        assert st2["batch_docs"] == 2
        assert _store_counts(spark, store) == {
            (0, "a"): 2, (0, "b"): 1, (1, "e"): 1,
        }
        d2 = {r["word"]: r["delta"] for r in st2["deltas"].collect()}
        # doc1: -b -c +e; doc2: -c -c -d → b:-1 c:-3 d:-1 e:+1
        assert d2 == {"b": -1, "c": -3, "d": -1, "e": 1}
        # merged registers == histogram of the surviving corpus
        merged = Counter(deltas) + Counter(d2)
        surviving = Counter("a b a".split()) + Counter("e".split())
        assert {w: c for w, c in merged.items() if c != 0} == dict(surviving)

    def test_emptied_block_removed(self, spark, tmp_path):
        store = str(tmp_path / "store")
        U.word_count_upsert(
            _docs(spark, [(3, "x y", 0)]), store, n_blocks=4
        )
        st = U.word_count_upsert(
            _docs(spark, [(3, None, 0)]), store, n_blocks=4
        )
        assert st["emptied_blocks"] == 1
        # a fully-tombstoned store must not brick later upserts
        # (the r12 self-review regression, word-store edition)
        st2 = U.word_count_upsert(
            _docs(spark, [(7, "z", 0)]), store, n_blocks=4
        )
        assert st2["batch_docs"] == 1
        assert _store_counts(spark, store) == {(7, "z"): 1}


class TestHierarchicalNnDescentBuild:
    def test_layer_shapes_and_degree_bounds(self, spark, sf_dir):
        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _HL_GK0,
            _HL_GK1,
            _HL_S1,
            _HL_S2,
            _hl_corpus,
        )
        from kafka_sink_azure_kusto_spark.plans.registry_r13 import _HB_SPECS

        dbl, _ = _hl_corpus(spark, sf_dir)
        edges0, layers = S.hierarchical_layers_nn_descent(
            dbl, _HB_SPECS, id_col="vec_id", vec_col="v",
            bands=2, bucket_cap=256,
        )
        # top-first: layers[0] is the sparsest (stride _HL_S2)
        m_top = {r["nid"] for r in layers[0]["members"].collect()}
        m_mid = {r["nid"] for r in layers[1]["members"].collect()}
        assert m_top == {n for n in m_mid if n % _HL_S2 == 0}
        assert all(n % _HL_S1 == 0 for n in m_mid)
        # per-node out-degree respects each layer's k
        for edges, k, members in (
            (edges0, _HL_GK0, None),
            (layers[1]["edges"], _HL_GK1, m_mid),
            (layers[0]["edges"], _HL_GK1, m_top),
        ):
            deg = (
                edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
                .agg(F.max("d")).collect()[0][0]
            )
            assert deg <= k
            if members is not None:
                nodes = {r["src"] for r in edges.select("src").collect()} | {
                    r["dst"] for r in edges.select("dst").collect()
                }
                assert nodes <= members

    def test_edges_are_refined_not_seed(self, spark, sf_dir):
        """The builder's layer-0 edges must equal nn_descent_refine's
        output (seed + two-hop rescoring), not the raw LSH seed."""
        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _HL_GK0,
            _hl_corpus,
        )

        dbl, _ = _hl_corpus(spark, sf_dir)
        edges0, _ = S.hierarchical_layers_nn_descent(
            dbl,
            [{"stride": 1, "k": _HL_GK0, "num_planes": 6}],
            id_col="vec_id", vec_col="v", bands=2, bucket_cap=256,
        )
        ref = S.nn_descent_refine(
            dbl.select(F.col("vec_id").alias("nid"), "v"),
            id_col="nid", vec_col="v",
            num_planes=6, k=_HL_GK0, bucket_cap=256, bands=2,
        ).select("src", "dst")
        assert {(r["src"], r["dst"]) for r in edges0.collect()} == {
            (r["src"], r["dst"]) for r in ref.collect()
        }


class TestAdcQueryCells:
    def _fixture(self, spark):
        # 2 cells × 2 vectors, 1 subspace of length 2 — hand-checkable
        vecs = [
            (0, [0.0, 0.0], 0), (1, [1.0, 1.0], 0),
            (2, [10.0, 10.0], 1), (3, [11.0, 11.0], 1),
        ]
        corpus = spark.createDataFrame(
            vecs, "vec_id long, v array<double>, cell int"
        )
        cb = spark.createDataFrame(
            [(0, 0, [0.0, 0.0]), (0, 1, [10.0, 10.0])],
            "m int, code long, c array<double>",
        )
        codes = S.pq_encode(corpus, cb, 1, 2, vec_col="v").join(
            corpus.select("vec_id", "cell"), "vec_id"
        )
        queries = corpus.filter(F.col("vec_id") == 0)
        return corpus, cb, codes, queries

    def test_multi_cell_relation_prunes_and_expands(self, spark):
        corpus, cb, codes, queries = self._fixture(spark)
        one = spark.createDataFrame([(0, 0)], "query_id long, cell int")
        both = spark.createDataFrame(
            [(0, 0), (0, 1)], "query_id long, cell int"
        )
        r1 = S.pq_adc_topk(
            codes, queries, cb, 1, 2, k=10, query_vec_col="v",
            codes_cell_col="cell", query_cells=one,
        ).collect()
        r2 = S.pq_adc_topk(
            codes, queries, cb, 1, 2, k=10, query_vec_col="v",
            codes_cell_col="cell", query_cells=both,
        ).collect()
        assert {r["neighbor_id"] for r in r1} == {1}
        assert {r["neighbor_id"] for r in r2} == {1, 2, 3}
        # probing ALL cells == no cell pruning at all
        r_all = S.pq_adc_topk(
            codes.drop("cell"), queries, cb, 1, 2, k=10, query_vec_col="v",
        ).collect()
        assert sorted((r["neighbor_id"], r["adc_d2"]) for r in r2) == sorted(
            (r["neighbor_id"], r["adc_d2"]) for r in r_all
        )

    def test_query_cells_guards(self, spark):
        corpus, cb, codes, queries = self._fixture(spark)
        qc = spark.createDataFrame([(0, 0)], "query_id long, cell int")
        with pytest.raises(ValueError, match="mutually exclusive"):
            S.pq_adc_topk(
                codes, queries.withColumn("qcell", F.lit(0)), cb, 1, 2,
                query_vec_col="v", codes_cell_col="cell",
                query_cell_col="qcell", query_cells=qc,
            )
        with pytest.raises(ValueError, match="requires codes_cell_col"):
            S.pq_adc_topk(
                codes.drop("cell"), queries, cb, 1, 2,
                query_vec_col="v", query_cells=qc,
            )


class TestVocabLoopPlumbing:
    def test_oov_gate_discriminates(self, spark, sf_dir):
        """The audit's retrain column must be non-vacuous: False on the
        seed baseline, True on the drifted epoch, False again after
        retrain (the whole point of a gate is that it can say no)."""
        from kafka_sink_azure_kusto_spark.plans.registry_r13 import (
            _run_vocab_stream_loop,
        )

        _, audit, _ = _run_vocab_stream_loop(spark, sf_dir)
        rows = {r["arm"]: r for r in audit.collect()}
        assert not rows["seed_baseline"]["retrain"]
        assert rows["epoch_0"]["retrain"]
        assert rows["stream_merged"]["retrain"]
        assert not rows["final_retrained_vocab"]["retrain"]
        assert (
            rows["final_retrained_vocab"]["n_oov"]
            < rows["final_seed_vocab"]["n_oov"]
        )
