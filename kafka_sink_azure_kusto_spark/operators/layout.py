"""Data-layout operators (100 TB design): multi-dimensional clustering
keys for scan pruning.

Parquet file skipping works off per-file min/max column statistics — a
table sorted on one column prunes scans on that column only. A Z-order
(Morton) key interleaves the bits of several columns so that sorting by
the single key co-locates rows that are close in EVERY dimension:
min/max footers then stay tight on each dimension and a filter on any
of them skips files (the Delta/Iceberg ``OPTIMIZE ZORDER BY``
construction, built here from pure codegen bit arithmetic — no UDF).

Usage at scale::

    keyed = zorder_key(df, ["user_id", "event_id"], bits=16)
    keyed.repartitionByRange(n, "zkey").sortWithinPartitions("zkey") \
         .write.parquet(path)

The range partitioning bounds the per-file key span; the within-file
sort tightens footer stats further.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each column: output bit
    (i·n_cols + j) = bit i of cols[j]. All shift amounts are Python
    literals, so the whole key is one codegen'd expression tree."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a Z-order (Morton) clustering key over ``cols``.

    Each input column is masked to its ``bits`` low bits (columns must
    be non-negative integers; pre-bucket continuous values first — e.g.
    ``floor(ts_epoch / 3600)`` — so low bits carry locality). Total key
    width = bits × len(cols) ≤ 63.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits × len(cols) = {bits * len(cols)} exceeds 63 (long width)"
        )
    mask = (1 << bits) - 1
    masked = [F.col(c).cast("long").bitwiseAND(F.lit(mask).cast("long")) for c in cols]
    return df.withColumn(key_col, _interleave(masked, bits))


def zorder_sql(col_exprs: Sequence[str], bits: int = 16) -> str:
    """The ANSI-SQL mirror of ``zorder_key`` (DuckDB-runnable) —
    generated from the same loop, not hand-kept, so the two cannot
    drift. ``col_exprs`` are SQL expressions for the already-non-negative
    integer inputs."""
    n = len(col_exprs)
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        for j, e in enumerate(col_exprs):
            terms.append(
                f"((((CAST({e} AS BIGINT) & {mask}) >> {i}) & 1) << {i * n + j})"
            )
    return "(" + " | ".join(terms) + ")"


def hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    key_col: str = "hkey",
) -> DataFrame:
    """Append a 2-D HILBERT-curve clustering key over (x, y) — the
    locality-preserving upgrade to ``zorder_key``: consecutive Hilbert
    indices are ALWAYS spatially adjacent (Morton order jumps at
    quadrant boundaries), so range scans over the sorted layout touch
    tighter (x, y) regions and parquet min/max footers prune better on
    both dimensions. Standard xy→d construction (per-level quadrant
    accumulation + rotate/reflect), unrolled ``bits`` levels into flat
    integer column arithmetic — zero Python at runtime, and the SQL
    oracle (``hilbert_sql``) is generated from the same loop. Inputs
    are masked to ``bits`` low bits like zorder_key."""
    mask = (1 << bits) - 1
    # one PROJECTION per level (withColumns evaluates its dict against
    # the CURRENT frame — simultaneous assignment, like the SQL
    # oracle's one-subquery-per-level chain). Building the whole
    # recurrence as a single Column tree is exponential: each level
    # references the previous level's x AND y several times, Column
    # trees duplicate rather than share, and the 8-level tree OOM'd the
    # driver at plan conversion (found live).
    out = df.withColumns(
        {
            "_hx": F.col(x_col).cast("long").bitwiseAND(
                F.lit(mask).cast("long")
            ),
            "_hy": F.col(y_col).cast("long").bitwiseAND(
                F.lit(mask).cast("long")
            ),
            "_hd": F.lit(0).cast("long"),
        }
    )
    s = 1 << (bits - 1)
    while s > 0:
        x, y = F.col("_hx"), F.col("_hy")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        out = out.withColumns(
            {
                "_hd": F.col("_hd")
                + F.lit(s).cast("long") * F.lit(s).cast("long")
                * ((F.lit(3) * rx).bitwiseXOR(ry)).cast("long"),
                # rotate/reflect the quadrant: when ry == 0, (x, y)
                # swap, and when additionally rx == 1 both reflect
                # within the s-square
                "_hx": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1).cast("long") - y)
                    .otherwise(y),
                ).otherwise(x),
                "_hy": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1).cast("long") - x)
                    .otherwise(x),
                ).otherwise(y),
            }
        )
        s //= 2
    return out.withColumn(key_col, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB mirror of ``hilbert_key``: the same per-level loop
    rendered as a chain of nested subqueries (one level each — inlining
    the rotate/reflect recurrence into one expression would blow up
    exponentially). Produces a scalar-joinable relation: SELECT the
    caller's row key alongside. The caller embeds it as
    ``FROM ({hilbert_sql(...)}) h`` with ``_hx0``/``_hy0`` provided by
    the innermost ``src`` alias."""
    mask = (1 << bits) - 1
    inner = (
        f"SELECT *, CAST({x_expr} AS BIGINT) & {mask} AS hx, "
        f"CAST({y_expr} AS BIGINT) & {mask} AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM __HSRC__"
    )
    s = 1 << (bits - 1)
    while s > 0:
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        step = (
            f"SELECT * REPLACE ("
            f"hd + CAST({s} AS BIGINT) * {s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - hy ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - hx ELSE hx END) ELSE hy END AS hy) "
            f"FROM ({inner})"
        )
        inner = step
        s //= 2
    return inner
