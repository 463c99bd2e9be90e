"""Round-9 second-batch registry queries — four training-data-pipeline
operators that had no coverage:

- ``text_within_doc_dedup`` — C4's "discard duplicate lines within a
  page" rule (within-document repeated-segment removal, keep-first);
  complements corpus-wide ``segment_dedup``. Zero-exchange narrow plan.
- ``vocab_coverage_curve`` — tokenizer-planning curve: minimal
  vocabulary size covering t% of corpus token mass, computed from the
  COUNT-OF-COUNTS histogram so no global vocabulary sort exists at any
  scale.
- ``theta_sketch_setops`` — mergeable distinct-count SET operations
  (|A|, |B|, |A∪B|, |A∩B|, Jaccard) between every pair of event types
  from k-minimum-value theta sketches; the raw table is scanned once.
- ``knn_graph_mutual`` — mutual k-NN graph over embeddings via LSH
  buckets: self-join candidate generation (no corpus broadcast),
  per-node top-k, edges kept only when both endpoints agree.

No reference citations: north-star additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.corpus import (
    vocab_coverage,
    vocab_coverage_sql,
    within_doc_segment_dedup,
    within_doc_segment_dedup_sql,
)
from kafka_sink_azure_kusto_spark.functions.sampling import (
    md5_unit_interval_sql,
)
from kafka_sink_azure_kusto_spark.functions.sketches import (
    theta_setops_pairs,
    theta_setops_sql,
)
from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table

_SEG = 2


@register(
    "text_within_doc_dedup",
    within_doc_segment_dedup_sql("documents", "text", "doc_id", _SEG),
)
def text_within_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-segment removal (C4's duplicate-line
    rule over 2-token tumbling segments): keep the FIRST occurrence of
    each distinct segment per document, reassemble in order, report the
    drop ratio. Pure narrow projection — zero exchanges at any scale
    (`functions/corpus.within_doc_segment_dedup`)."""
    docs = load_table(spark, sf_dir, "documents")
    return within_doc_segment_dedup(docs, "text", "doc_id", seg_tokens=_SEG)


@register(
    "vocab_coverage_curve",
    vocab_coverage_sql("documents", "text", (50, 90, 95, 99)),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-planning vocabulary coverage curve: for each threshold
    t ∈ {50, 90, 95, 99}%, the minimal top-frequency vocabulary size
    whose occurrences cover ≥ t% of corpus tokens. Computed from the
    count-of-counts histogram — bounded state after one map-side-
    combined frequency groupBy, NO global vocabulary sort
    (`functions/corpus.vocab_coverage`)."""
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", thresholds=(50, 90, 95, 99))


_THETA_K = 64


@register(
    "theta_sketch_setops",
    theta_setops_sql("events", "event_type", "user_id", _THETA_K),
)
def theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations between every pair of event types:
    distinct-user estimates for each side, their union and
    intersection, and the Jaccard estimate — derived entirely from
    64-hash KMV sketches (one scan of events, bounded sketch state,
    deterministic md5 hashing so the oracle reproduces the estimates
    exactly; sketches merge across shards/days by keep-k-smallest)
    (`functions/sketches.theta_setops_pairs`)."""
    ev = load_table(spark, sf_dir, "events")
    return theta_setops_pairs(ev, "event_type", "user_id", k=_THETA_K)


_KNN_PLANES = 6
_KNN_K = 3
_KNN_CAP = 256


def _hv(expr: str) -> str:
    return (
        f"(CASE WHEN ascii({expr}) >= 97 THEN ascii({expr}) - 87 "
        f"ELSE ascii({expr}) - 48 END)"
    )


def _knn_comp_sql(p: int) -> str:
    h = f"md5('{p}:' || d)"
    return (
        f"list_transform(range(0, 64), d -> "
        f"((16 * {_hv(f'substr({h}, 1, 1)')} + {_hv(f'substr({h}, 2, 1)')})"
        f" / 255.0) * 2 - 1)"
    )


_KNN_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_dot_product(v, {_knn_comp_sql(p)}) >= 0 "
    f"THEN '1' ELSE '0' END)"
    for p in range(_KNN_PLANES)
)


@register(
    "knn_graph_mutual",
    f"""
    WITH e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS v
               FROM embeddings),
    b AS (SELECT nid, v, {_KNN_BUCKET_SQL} AS bucket FROM e),
    capped AS (SELECT nid, v, bucket FROM (
        SELECT nid, v, bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket
                   ORDER BY {md5_unit_interval_sql("nid", salt="knncap:")},
                            nid) AS cr
        FROM b) WHERE cr <= {_KNN_CAP}),
    scored AS (SELECT l.nid AS src, r.nid AS dst,
                      list_dot_product(l.v, r.v) /
                      (sqrt(list_dot_product(l.v, l.v)) *
                       sqrt(list_dot_product(r.v, r.v))) AS score
               FROM capped l JOIN capped r USING (bucket)
               WHERE l.nid <> r.nid),
    topk AS (SELECT src, dst, score, rnk FROM (
        SELECT src, dst, score,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst ASC) AS rnk
        FROM scored) WHERE rnk <= {_KNN_K})
    SELECT x.src, x.dst, ROUND(x.score, 6) AS score,
           CAST(x.rnk AS BIGINT) AS rank_src,
           CAST(y.rnk AS BIGINT) AS rank_dst
    FROM topk x JOIN topk y ON x.src = y.dst AND x.dst = y.src
    WHERE x.src < x.dst
    """,
)
def knn_graph_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph over the embedding corpus: LSH-bucket
    candidate self-join (no corpus broadcast — both sides shuffle once
    on the bucket key, membership capped at 256 by deterministic md5
    rank), exact cosine top-3 per node, edge kept only when BOTH
    endpoints rank each other. The NN-descent / graph-clustering /
    SemDeDup seeding primitive
    (`functions/similarity.knn_graph_mutual`)."""
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        knn_graph_mutual as build,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return build(
        emb, "vec_id", "embedding",
        num_planes=_KNN_PLANES, k=_KNN_K, bucket_cap=_KNN_CAP,
    )


_NND_SEED_SQL = f"""
    e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS v
          FROM embeddings),
    b AS (SELECT nid, v, {_KNN_BUCKET_SQL} AS bucket FROM e),
    capped AS (SELECT nid, v, bucket FROM (
        SELECT nid, v, bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket
                   ORDER BY {md5_unit_interval_sql("nid", salt="knncap:")},
                            nid) AS cr
        FROM b) WHERE cr <= {_KNN_CAP}),
    scored0 AS (SELECT l.nid AS src, r.nid AS dst,
                       list_dot_product(l.v, r.v) /
                       (sqrt(list_dot_product(l.v, l.v)) *
                        sqrt(list_dot_product(r.v, r.v))) AS score
                FROM capped l JOIN capped r USING (bucket)
                WHERE l.nid <> r.nid),
    seed AS (SELECT src, dst, score, rnk FROM (
        SELECT src, dst, score,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst ASC) AS rnk
        FROM scored0) WHERE rnk <= {_KNN_K})
"""


@register(
    "knn_graph_nn_descent",
    f"""
    WITH {_NND_SEED_SQL},
    fwd AS (SELECT src, dst FROM seed),
    rev AS (SELECT dst AS src, src AS dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY dst
                                  ORDER BY score DESC, src ASC) AS rr
        FROM seed) WHERE rr <= {_KNN_K}),
    nbrs AS (SELECT DISTINCT src, dst FROM
             (SELECT * FROM fwd UNION ALL SELECT * FROM rev)),
    hop2 AS (SELECT a.src AS src, bb.dst AS dst
             FROM nbrs a JOIN nbrs bb ON a.dst = bb.src
             WHERE a.src <> bb.dst),
    cand AS (SELECT DISTINCT src, dst FROM
             (SELECT * FROM fwd UNION ALL SELECT * FROM hop2)),
    sc AS (SELECT cand.src, cand.dst,
                  list_dot_product(es.v, ed.v) /
                  (sqrt(list_dot_product(es.v, es.v)) *
                   sqrt(list_dot_product(ed.v, ed.v))) AS score
           FROM cand JOIN e es ON cand.src = es.nid
                     JOIN e ed ON cand.dst = ed.nid),
    ref AS (SELECT src, dst, score, rnk FROM (
        SELECT src, dst, score,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst ASC) AS rnk
        FROM sc) WHERE rnk <= {_KNN_K}),
    kth AS (SELECT src, MIN(score) AS seed_kth FROM seed GROUP BY src)
    SELECT ref.src, ref.dst, ROUND(ref.score, 6) AS score,
           CAST(ref.rnk AS BIGINT) AS rank,
           COALESCE(ref.rnk = {_KNN_K} AND ref.score > kth.seed_kth,
                    FALSE) AS improved
    FROM ref LEFT JOIN kth USING (src)
    """,
)
def knn_graph_nn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-descent refinement round over the LSH-seeded k-NN lists:
    candidates = seed top-3 ∪ two-hop expansion through the undirected
    (forward ∪ reverse-capped) neighbor sets, re-scored exactly and
    re-ranked; ``improved`` marks nodes whose 3rd-best strictly beat
    the seed round. Per-node fan-out ≤ 4k² regardless of corpus size;
    every stage an equi-join — the iterate-to-converge kNN-graph
    builder at 100 TB (`functions/similarity.nn_descent_refine`)."""
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        nn_descent_refine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return nn_descent_refine(
        emb, "vec_id", "embedding",
        num_planes=_KNN_PLANES, k=_KNN_K, bucket_cap=_KNN_CAP,
    )
