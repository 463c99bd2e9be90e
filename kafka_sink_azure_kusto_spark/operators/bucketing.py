"""Bucketed-table utilities (100 TB design): pre-shuffle fact tables
into hash buckets on their join key so repeated joins/aggregations on
that key run WITHOUT an exchange — Spark's answer to co-located joins.

At 100 TB, a lineitem⋈orders join shuffles both sides on every query;
bucketing both tables by the join key at write time pays the shuffle
once and amortizes it over every downstream query. The same applies to
dedup pipelines that repeatedly group by doc fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: "str | list[str]",
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucket count should match downstream `spark.sql.shuffle.partitions`
    (or divide it evenly) so the bucketed layout satisfies the join's
    required distribution exactly. ``bucket_col`` may be a list for
    composite keys (e.g. the LSH signature store bucketed on
    (band_id, band_hash) so incremental near-dup joins exchange only
    the new-batch side).
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *cols)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two bucketed tables on their bucket key — when both sides are
    bucketed with the same bucket count, Catalyst plans a SortMergeJoin
    with NO Exchange on either side (verify with .explain: zero
    `Exchange hashpartitioning` under the join)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
