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
