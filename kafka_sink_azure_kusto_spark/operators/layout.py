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
