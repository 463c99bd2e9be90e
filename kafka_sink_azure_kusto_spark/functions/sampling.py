"""Deterministic sampling for training-data curation (north-star op).

``df.sample()`` is seed-dependent on partitioning and row order, which
makes pipelines non-reproducible across replays and cluster sizes. The
curation-grade alternative: hash each row's stable key into a uniform
[0, 1) coordinate and keep rows below the target fraction. Properties a
100 TB pipeline needs:

- **Reproducible**: same key ⇒ same verdict, on any cluster layout, in
  any engine (md5 + integer arithmetic only — the DuckDB oracle runs the
  literally-same computation).
- **Consistent across tables**: sampling two tables by the same key
  keeps them join-compatible (both keep the same key subset).
- **Incremental**: new data gets the same treatment as old — no global
  shuffle, no state; the filter is embarrassingly parallel and pushes
  down to the scan.
- **Stratified**: per-group fractions (e.g. downsample boilerplate-heavy
  web text, keep all books) as one codegen'd CASE expression.

Salting (``salt``) decorrelates independent samples over the same keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^8 — the first 8 md5 hex digits as an integer's value range.
_HEX8_SPAN = 16**8


# Portable hex-digit primitive shared with the SimHash implementation —
# ONE definition so the cross-engine oracle contract can't drift.
from kafka_sink_azure_kusto_spark.functions.dedup import (  # noqa: E402
    _hex_digit_value,
)


def md5_unit_interval(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) coordinate from a stable key: value of the first 8
    md5 hex digits / 16^8.

    Spark side uses one ``conv(hex, 16, 10)`` (exact integer parse of 8
    hex digits, max 2^32-1 — no long overflow); the SQL oracle mirrors
    the VALUE with portable per-digit ascii arithmetic
    (``md5_unit_interval_sql``) since DuckDB lacks ``conv`` — the two
    are bit-identical on every input."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    acc = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return acc / F.lit(float(_HEX8_SPAN))


def md5_unit_interval_sql(key_expr: str, salt: str = "") -> str:
    """The ANSI-SQL mirror of ``md5_unit_interval`` (DuckDB-runnable) —
    generated, not hand-kept, so the two can't drift."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    acc = "CAST(0 AS BIGINT)"  # INT32 overflows at 16^8 in DuckDB
    for i in range(8):
        d = f"ascii(substr({h}, {i + 1}, 1))"
        val = f"(CASE WHEN {d} >= 97 THEN {d} - 87 ELSE {d} - 48 END)"
        acc = f"({acc} * 16 + {val})"
    return f"({acc} / {float(_HEX8_SPAN)})"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-key (deterministic)."""
    return df.filter(md5_unit_interval(F.col(key_col), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: one CASE expression resolves
    each row's target fraction, one hash decides. Strata missing from
    ``fractions`` fall back to ``default_fraction`` (0 ⇒ drop)."""
    frac: Column = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(md5_unit_interval(F.col(key_col), salt) < frac)
