"""Independent-implementation tests for round 14: multi-round
nn-descent construction (VERDICT r13 #1), the composed IVF-PQ serving
pipeline (VERDICT r13 #2), and the vocab-store serving read (VERDICT
r13 #5). Numeric claims recomputed in plain python/numpy — no DuckDB,
no shared CTE text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions import similarity as S


class TestRerankL2sq:
    def test_l2sq_metric_exact_on_hand_fixture(self, spark):
        corpus = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [3.0, 4.0]),
             (3, [0.0, 2.0])],
            "vec_id long, v array<double>",
        )
        queries = corpus.filter(F.col("vec_id") == 0)
        cands = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "query_id long, neighbor_id long"
        )
        rows = S.rerank_topk(
            cands, corpus, queries, k=2, vec_col="v", query_vec_col="v",
            metric="l2sq",
        ).collect()
        # true d2: 1→1.0, 3→4.0, 2→25.0; top-2 ascending
        assert [(r["neighbor_id"], r["d2"], r["rank"]) for r in rows] == [
            (1, 1.0, 1), (3, 4.0, 2)
        ]

    def test_unknown_metric_raises(self, spark):
        corpus = spark.createDataFrame(
            [(0, [0.0])], "vec_id long, v array<double>"
        )
        import pytest

        with pytest.raises(ValueError, match="unknown metric"):
            S.rerank_topk(
                corpus.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("vec_id").alias("neighbor_id"),
                ),
                corpus, corpus, metric="dotproduct",
            )


class TestIvfpqServingPipeline:
    def test_final_distances_are_true_l2sq(self, spark, sf_dir):
        """Independent grade: every (query, neighbor, d2) row of the
        composed read must carry the TRUE squared-L2 distance on the
        boosted corpus (numpy recompute), ascending per query."""
        import numpy as np

        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _hl_corpus,
        )
        from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
            ivfpq_serving_pipeline,
        )

        dbl, _ = _hl_corpus(spark, sf_dir)
        vecs = {r["vec_id"]: np.array(r["v"]) for r in dbl.collect()}
        rows = ivfpq_serving_pipeline(spark, sf_dir).collect()
        assert rows
        per_q: dict = {}
        for r in rows:
            true_d2 = float(
                ((vecs[r["query_id"]] - vecs[r["neighbor_id"]]) ** 2).sum()
            )
            assert abs(r["d2"] - true_d2) < 1e-5
            per_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["d2"])
            )
        for q, rs in per_q.items():
            rs.sort()
            d2s = [d for _, d in rs]
            assert d2s == sorted(d2s)

    def test_audit_invariants(self, spark, sf_dir):
        """Recall is monotone in the shortlist budget, never exceeds
        the probed-cells ceiling, and reaches the ceiling once the
        budget covers the whole exposure."""
        from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
            _SV_BUDGETS,
            ivfpq_serving_recall_audit,
        )

        rows = ivfpq_serving_recall_audit(spark, sf_dir).collect()
        ceiling = next(
            r for r in rows if r["arm"] == "probed_cells_ceiling"
        )["n_hits"]
        arms = sorted(
            (r["shortlist"], r["n_hits"])
            for r in rows
            if r["arm"] != "probed_cells_ceiling"
        )
        assert [b for b, _ in arms] == sorted(_SV_BUDGETS)
        hits = [h for _, h in arms]
        assert hits == sorted(hits)
        assert all(h <= ceiling for h in hits)
        # at the tiny test sf the max budget covers the whole exposure
        assert hits[-1] == ceiling


class TestResidualServing:
    def test_residual_beats_plain_at_fixed_budget(self, spark, sf_dir):
        """The gain claim, pinned: at every non-saturated shortlist
        budget, residual encoding recovers at least as many true
        neighbors as plain PQ under identical probing and rerank."""
        from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
            ivfpq_residual_gain_audit,
        )

        rows = ivfpq_residual_gain_audit(spark, sf_dir).collect()
        by = {(r["encoding"], r["shortlist"]): r["n_hits"] for r in rows}
        budgets = sorted({b for _, b in by})
        assert all(
            by[("residual", b)] >= by[("plain", b)] for b in budgets
        )

    def test_residual_pipeline_distances_are_true_l2sq(
        self, spark, sf_dir
    ):
        """The composed residual read still reranks on ORIGINAL
        vectors: every output d2 must be the true squared-L2 on the
        boosted corpus (numpy recompute)."""
        import numpy as np

        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _hl_corpus,
        )
        from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
            ivfpq_residual_serving_pipeline,
        )

        dbl, _ = _hl_corpus(spark, sf_dir)
        vecs = {r["vec_id"]: np.array(r["v"]) for r in dbl.collect()}
        rows = ivfpq_residual_serving_pipeline(spark, sf_dir).collect()
        assert rows
        for r in rows:
            true_d2 = float(
                ((vecs[r["query_id"]] - vecs[r["neighbor_id"]]) ** 2).sum()
            )
            assert abs(r["d2"] - true_d2) < 1e-5


class TestVocabStoreServing:
    def test_encode_contract(self, spark, sf_dir):
        """(doc_id, tpos, tid) rows: positions contiguous from 0 per
        doc, ids within [0, UNK], and the post-retrain vocabulary must
        cover some of the drifted 'z'-words (the whole point of serving
        off the LIVE store rather than the seed vocabulary)."""
        from kafka_sink_azure_kusto_spark.plans.registry_r13 import (
            _VB_CAP,
        )
        from kafka_sink_azure_kusto_spark.plans.registry_r14 import (
            _VE_FRESH_MOD,
            _VE_FRESH_OFF,
            vocab_store_incremental_encode,
        )

        rows = vocab_store_incremental_encode(spark, sf_dir).collect()
        assert rows
        per_doc: dict = {}
        for r in rows:
            assert r["doc_id"] % _VE_FRESH_MOD == _VE_FRESH_OFF
            assert 0 <= r["tid"] <= _VB_CAP
            per_doc.setdefault(r["doc_id"], []).append(r["tpos"])
        for pos in per_doc.values():
            assert sorted(pos) == list(range(len(pos)))
        # the batch contains mutated (vowel→'z') docs; under the
        # RETRAINED vocab they must not collapse entirely to UNK
        non_unk = sum(1 for r in rows if r["tid"] < _VB_CAP)
        assert non_unk > 0.5 * len(rows)


class TestMultiRoundNnDescent:
    def test_build_rounds_2_equals_iterated_refine(self, spark, sf_dir):
        """hierarchical_layers_nn_descent with build_rounds=2 must equal
        nn_descent_refine fed its own round-1 output as the seed — the
        exact feedback contract the SQL oracle replays."""
        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _HL_GK0,
            _hl_corpus,
        )

        dbl, _ = _hl_corpus(spark, sf_dir)
        edges0, _ = S.hierarchical_layers_nn_descent(
            dbl,
            [{"stride": 1, "k": _HL_GK0, "num_planes": 6,
              "build_rounds": 2}],
            id_col="vec_id", vec_col="v", bands=2, bucket_cap=256,
        )
        members = dbl.select(F.col("vec_id").alias("nid"), "v")
        r1 = S.nn_descent_refine(
            members, id_col="nid", vec_col="v",
            num_planes=6, k=_HL_GK0, bucket_cap=256, bands=2,
        )
        r2 = S.nn_descent_refine(
            members, id_col="nid", vec_col="v",
            num_planes=6, k=_HL_GK0, bucket_cap=256, bands=2,
            seed=r1.select("src", "dst", "score").localCheckpoint(),
        ).select("src", "dst")
        assert {(r["src"], r["dst"]) for r in edges0.collect()} == {
            (r["src"], r["dst"]) for r in r2.collect()
        }

    def test_second_round_improves_edge_recall(self, spark, sf_dir):
        """The iteration claim, measured: round-2 edges recover at
        least as many exact-kNN edges as round-1's (strictly more on
        the fixture — the docstring's 93→96% claim)."""
        from kafka_sink_azure_kusto_spark.plans.registry_r12 import (
            _HL_GK0,
            _hl_corpus,
        )

        dbl, _ = _hl_corpus(spark, sf_dir)
        members = dbl.select(F.col("vec_id").alias("nid"), "v")
        exact = {
            (r["src"], r["dst"])
            for r in S.knn_graph_build_exact(
                members, id_col="nid", vec_col="v", k=_HL_GK0
            ).select("src", "dst").collect()
        }
        r1 = S.nn_descent_refine(
            members, id_col="nid", vec_col="v",
            num_planes=6, k=_HL_GK0, bucket_cap=256, bands=2,
        )
        got1 = {(r["src"], r["dst"])
                for r in r1.select("src", "dst").collect()}
        r2 = S.nn_descent_refine(
            members, id_col="nid", vec_col="v",
            num_planes=6, k=_HL_GK0, bucket_cap=256, bands=2,
            seed=r1.select("src", "dst", "score").localCheckpoint(),
        )
        got2 = {(r["src"], r["dst"])
                for r in r2.select("src", "dst").collect()}
        assert len(exact & got2) > len(exact & got1)

    def test_audit_hits_done_bar(self, spark, sf_dir):
        """VERDICT r13 #1 done-bar, pinned as a test: the nn-descent
        arm recovers ≥90% of the exact arm's hits at matched budget."""
        from kafka_sink_azure_kusto_spark.plans.registry_r13 import (
            hierarchical_build_recall_audit,
        )

        rows = {
            r["strategy"]: r
            for r in hierarchical_build_recall_audit(spark, sf_dir).collect()
        }
        ex, nn = rows["exact_built"], rows["nn_descent_built"]
        assert nn["n_hits"] >= 0.9 * ex["n_hits"]
        # matched budget: candidate counts within 10% of each other
        assert abs(nn["n_candidates"] - ex["n_candidates"]) <= (
            0.1 * ex["n_candidates"]
        )
