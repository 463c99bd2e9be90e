"""Round-9 registry queries.

- ``dedup_substring_spans`` — token-level exact substring dedup
  (VERDICT r8 #5): the one standard training-data operator previously
  absent. Documents sharing a >= k-token verbatim span are found via
  bucketed anchor k-grams + diagonal run extension (never a driver-side
  suffix array); each document gets a trim/drop decision.
- ``multimodal_resize_bilinear`` / ``multimodal_resample_sinc`` —
  production interpolation kernels (VERDICT r8 #8), the promised
  upgrades of the nearest-neighbor resize / 4 kHz gather resample,
  same decode-once single-MapInPandas plan shape.

No reference citations: north-star additions (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import register
from kafka_sink_azure_kusto_spark.sources.tables import load_table

_SPAN_K = 6
_SPAN_CAP = 20

_SUBSTRING_SPANS_ORACLE = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
    g AS (SELECT doc_id, t.i AS p,
                 md5(array_to_string(ws[t.i:t.i+{_SPAN_K - 1}], ' ')) AS h
          FROM words,
               unnest(range(1, greatest(len(ws) - {_SPAN_K - 2}, 1))) AS t(i)),
    capped AS (SELECT doc_id, p, h FROM (
        SELECT doc_id, p, h,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) AS rnk
        FROM g) WHERE rnk <= {_SPAN_CAP}),
    pairs AS (SELECT l.doc_id AS l_id, r.doc_id AS r_id, l.p AS pl,
                     l.p - r.p AS diag
              FROM capped l JOIN capped r
                ON l.h = r.h AND l.doc_id < r.doc_id),
    runs AS (SELECT l_id, r_id, diag,
                    pl - ROW_NUMBER() OVER (
                        PARTITION BY l_id, r_id, diag ORDER BY pl) AS grp
             FROM pairs),
    spans AS (SELECT l_id, r_id,
                     MAX(cnt) AS span
              FROM (SELECT l_id, r_id, diag, grp,
                           COUNT(*) + {_SPAN_K - 1} AS cnt
                    FROM runs GROUP BY l_id, r_id, diag, grp)
              GROUP BY l_id, r_id),
    sym AS (SELECT l_id AS doc_id, r_id AS partner_id, span FROM spans
            UNION ALL
            SELECT r_id, l_id, span FROM spans),
    best AS (SELECT doc_id, partner_id, span FROM (
        SELECT doc_id, partner_id, span,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY span DESC, partner_id) AS rk
        FROM sym) WHERE rk = 1)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(b.span, 0) AS BIGINT) AS span_tokens,
           b.partner_id,
           CASE WHEN b.partner_id IS NULL THEN 'keep'
                WHEN b.span * 2 >= len(string_split(d.text, ' '))
                     THEN 'drop'
                ELSE 'trim' END AS action
    FROM documents d LEFT JOIN best b USING (doc_id)
"""


@register("dedup_substring_spans", _SUBSTRING_SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level exact substring dedup (r9): per document, the
    longest >= 6-token span shared VERBATIM with another document, the
    partner that shares it, and the decision — drop when the span
    covers >= half the document, trim when shorter, keep when no span.
    Anchor k-grams bucket-capped at 20 members (deterministic by
    (doc_id, position) so the oracle replicates capped results
    exactly); spans = runs of consecutive anchors on one (l, r)
    diagonal. All joins equi-key; worst-case bucket fan-out cap² —
    the 100 TB-safe rendition of suffix-array substring dedup.
    `functions/dedup.substring_span_dedup`."""
    from kafka_sink_azure_kusto_spark.functions.dedup import (
        substring_span_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return substring_span_dedup(
        docs, "text", "doc_id", k=_SPAN_K, bucket_cap=_SPAN_CAP,
        drop_num=1, drop_den=2,
    )
