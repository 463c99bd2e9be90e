"""As-of (point-in-time) join and bucketed range join — custom operators
Spark's API lacks (north-star additions; the shapes every
feature-store / market-data / attribution pipeline needs).

Both are built so the physical plan is ONE hash shuffle keyed on the
join key, never a range-exploded cross product:

- ``asof_join``: the classic merge-semantics trick — union both sides
  tagged, sort within each key by (ts, side), and carry the last right
  value forward with ``last(..., ignorenulls=True)`` over a running
  window. Cost = one shuffle + one sort per key group, identical to the
  sort-merge join Spark would pick for an equi-join; no inequality-join
  fallback to broadcast-nested-loop, no per-row range probe.
- ``range_join_bucketed``: interval containment via coarse bucketing —
  explode each interval into the fixed-width buckets it overlaps,
  equi-join points to buckets, then apply the exact predicate. The
  equi-join keeps Catalyst in hash-join land; bucket width trades
  explode factor against post-filter selectivity.

The DuckDB oracles use the engine's NATIVE ``ASOF JOIN`` and a plain
inequality join respectively — fully independent implementations, so a
hash match is strong evidence of correct semantics, not mirrored bugs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the same ``by`` group (inclusive —
    a right row AT the left timestamp matches, like ``ASOF JOIN ...
    ON l.ts >= r.ts``). Left rows with no prior right row keep nulls
    (left-join semantics).

    ``value_cols`` are the right-side columns to carry (default: all
    non-key, non-ts columns). Carried columns are renamed with
    ``suffix`` to avoid collisions.

    Right-side ties on (by, right_ts) are resolved by taking the row
    with the greatest value per carried column independently — callers
    needing row-atomic ties should pre-aggregate the right side."""
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {right_ts}]
    value_cols = list(value_cols)
    # Pre-dedup right on (by, ts): one row per event time keeps the
    # carry-forward deterministic under ties in either engine.
    r = right.groupBy(*by, F.col(right_ts).alias("_ts")).agg(
        *[F.max(c).alias(f"{c}{suffix}") for c in value_cols]
    )
    # Carry the WHOLE matched row as one struct. A struct from a matched
    # right row is non-null even when every value field inside it is NULL,
    # so ``last(_rv, ignorenulls=True)`` skips only left rows (which get a
    # NULL struct) — never a genuinely matched right row with NULL values.
    # (Carrying value columns individually would fall through NULLs to an
    # older row's value: silent wrong data for nullable columns.)
    r = r.withColumn(
        "_rv",
        F.struct(
            F.col("_ts").alias("_matched_ts"),
            *[F.col(f"{c}{suffix}") for c in value_cols],
        ),
    )
    rv_type = r.schema["_rv"].dataType
    left_payload = [c for c in left.columns if c not in set(by) | {left_ts}]
    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r_tagged = r.select(
        *by,
        "_ts",
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts ⇒ inclusive
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        "_rv",
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("_rv", ignorenulls=True).over(w).alias("_rv")
    return (
        u.select(*by, "_ts", "_side", *left_payload, carried)
        .filter(F.col("_side") == 1)
        .select(*by, F.col("_ts").alias(left_ts), *left_payload,
                *[F.col("_rv")[f"{c}{suffix}"].alias(f"{c}{suffix}")
                  for c in value_cols])
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point to every interval (same ``by`` keys) containing it
    (``start <= ts < end``). Intervals explode into the coarse buckets
    they overlap; the join is a pure equi-join on (by, bucket) and the
    exact range predicate filters afterwards — no inequality join, no
    broadcast-nested-loop, scale governed by interval_len/bucket ratio."""
    by = list(by)

    # Bucket at MICROSECOND precision. Casting a timestamp to long first
    # truncates sub-second fractions, so an interval whose end's whole
    # second is bucket-aligned loses its final fractional window (points
    # in [end_floor, end) would land in a bucket the interval never
    # exploded into). unix_micros keeps both sides on the same exact
    # integer timeline; (u - u % B) / B is an exact integer floor-div
    # (numerator < 2^53, exactly divisible).
    micros = bucket_seconds * 1_000_000

    def _bucket_of(col):
        u = F.unix_micros(col)
        return ((u - (u % F.lit(micros))) / F.lit(micros)).cast("long")

    def _last_bucket_of(col):  # exclusive end → bucket of (end - 1µs)
        u = F.unix_micros(col) - F.lit(1)
        return ((u - (u % F.lit(micros))) / F.lit(micros)).cast("long")

    p = points.withColumn("_bucket", _bucket_of(F.col(point_ts)))
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_col)),
                _last_bucket_of(F.col(end_col)),
            )
        ),
    )
    joined = p.join(iv, on=by + ["_bucket"], how="inner")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    ).drop("_bucket")
