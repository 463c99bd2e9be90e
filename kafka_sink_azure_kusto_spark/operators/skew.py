"""Skew-mitigation operators (100 TB design, SURVEY §7.4): salted
two-phase aggregation for hot keys.

A single hot key (one Kafka topic carrying 90% of traffic, one document
`source` dominating a corpus) turns a groupBy into a straggler task. The
standard fix: append a deterministic salt to the key, partially
aggregate on (key, salt) — map-side combine plus N-way fan-out of the
hot key — then finish on the key alone. AQE's skew-join handling covers
joins; this covers aggregations, which AQE does not re-balance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, on: str | Column) -> DataFrame:
    """Deterministic salt in [0, salt_buckets) derived from a row
    expression (NOT rand() — reruns/retries must salt identically so
    at-least-once replays stay idempotent)."""
    c = F.col(on) if isinstance(on, str) else on
    return df.withColumn("_salt", F.pmod(F.hash(c), F.lit(salt_buckets)))


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_col: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: sum + count per ``group_cols``.

    Phase 1 shuffles on (group_cols…, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 shuffles the tiny partial rows on
    the group key alone. Decomposable aggregates only (sum/count/min/
    max/avg-via-sum+count).
    """
    salt_src = salt_on or sum_col
    salted = with_salt(df, salt_buckets, salt_src)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(sum_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").alias(f"sum_{sum_col}"),
        F.sum("_pcnt").alias("n"),
    )


def salted_replicated_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side, REPLICATE the dim
    side ``salt_buckets``× (explode over all salts), join on
    (key, salt). The result is row-identical to the plain join — salting
    changes only the physical distribution.

    When to use: the dim side is too big to broadcast (so AQE can't
    convert to a broadcast join) AND the fact side has hot keys that
    straggle a shuffle join. One hot key then spreads over
    ``salt_buckets`` reducers at the cost of dim_rows × salt_buckets
    replicated build rows — cheap for a dimension, fatal for a fact, so
    never salt both sides this way (use AQE skew-join splitting when
    both sides are large). The fact salt derives from a row expression,
    NOT rand(): replays under at-least-once delivery must salt
    identically.

    A `shuffle_hash` hint pins the intended physical strategy (sort-merge
    would also work; broadcast would make salting pointless — if the dim
    broadcasts, just broadcast it).
    """
    salt_src = salt_on or fact_key
    f = with_salt(fact, salt_buckets, salt_src)
    d = dim.withColumn(
        "_dsalt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = f.join(
        d.hint("shuffle_hash"),
        (F.col(fact_key) == F.col(dim_key)) & (F.col("_salt") == F.col("_dsalt")),
        how,
    )
    return joined.drop("_salt", "_dsalt")
