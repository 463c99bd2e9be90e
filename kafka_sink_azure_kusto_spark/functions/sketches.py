"""Deterministic frequency / cardinality sketches (north-star ops).

At 100 TB you cannot afford an exact ``groupBy(key)`` for every
"roughly how often does X occur?" question — the sketch family answers
them in one pass over bounded state:

- **Count-min** (`countmin_estimates`): ``depth`` md5-salted hash rows
  of ``width`` buckets each; a key's frequency estimate is the MIN of
  its bucket sums across rows (never under-counts, over-counts only on
  collisions). The aggregated sketch is ``depth × width`` longs —
  mergeable across partitions/days by plain addition, which is why the
  pattern survives at scale: the shuffle carries the sketch, never the
  keys.
- **KMV / k-minimum-values** (`kmv_distinct`): the classic theta-sketch
  estimator. Hash every key to a uniform [0, 1) coordinate; keep the k
  smallest per group; the k-th smallest value ``u_k`` estimates the
  distinct count as ``(k-1)/u_k``. Per-group state is k doubles, and
  two sketches merge by keeping the k smallest of the union.

Everything is md5 + integer arithmetic so the DuckDB oracle can run the
LITERALLY same computation (no engine-specific hash functions) — the
estimates are deterministic, not merely statistically similar.

No reference citation: the reference connector has no analytic surface;
these are the north-star additions (SURVEY §7.5, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.sampling import (
    md5_hex8_long,
    md5_hex8_long_sql,
    md5_hex15_long,
    md5_hex_prefix_long_sql,
    md5_unit_interval,
    md5_unit_interval_sql,
)


def cm_bucket(key: Column, row: int, width: int) -> Column:
    """Count-min bucket of ``key`` in hash row ``row`` (md5-salted)."""
    return (md5_hex8_long(key, salt=f"cm{row}:") % F.lit(int(width))).cast("int")


def cm_bucket_sql(key_expr: str, row: int, width: int) -> str:
    """ANSI-SQL mirror of ``cm_bucket`` — generated from the same salt
    layout so the two cannot drift."""
    return f"CAST(({md5_hex8_long_sql(key_expr, salt=f'cm{row}:')} % {int(width)}) AS INT)"


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min frequency estimate for every distinct value of
    ``key_col`` → ``(key_col, est)`` with ``est >= true count``.

    Plan shape (the part that matters at 100 TB): ONE pass builds the
    sketch — explode each row into its ``depth`` (row, bucket) cells and
    aggregate counts, so the shuffle moves at most ``depth × width``
    grouped cells per map task (map-side partial aggregation collapses
    the input long before the exchange). The distinct-key probe then
    joins against the BROADCAST sketch (``depth × width`` rows by
    construction — bounded, independent of data size). Querying a known
    key list instead of all distinct keys makes the whole thing
    collect-free and sub-linear.
    """
    if depth < 1 or width < 1:
        raise ValueError("countmin_estimates needs depth >= 1 and width >= 1")
    key = F.col(key_col)
    # one row per (hash row, bucket) cell hit — posexplode over the
    # depth bucket expressions stays narrow (no shuffle until the agg)
    cells = df.select(
        F.posexplode(F.array(*[cm_bucket(key, r, width) for r in range(depth)])).alias(
            "cm_row", "cm_bucket"
        )
    )
    sketch = cells.groupBy("cm_row", "cm_bucket").agg(
        F.count(F.lit(1)).alias("cm_count")
    )
    probes = df.select(key.alias(key_col)).distinct()
    probe_cells = probes.select(
        key,
        F.posexplode(F.array(*[cm_bucket(key, r, width) for r in range(depth)])).alias(
            "cm_row", "cm_bucket"
        ),
    )
    joined = probe_cells.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cm_count"), F.lit(0))).alias("est")
    )


def countmin_estimates_sql(
    table: str, key_expr: str, key_alias: str, depth: int = 4, width: int = 64
) -> str:
    """DuckDB oracle for ``countmin_estimates`` — generated from the
    same (row, salt, width) layout."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {r} AS cm_row, {cm_bucket_sql(key_expr, r, width)} AS cm_bucket FROM {table}"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_alias}, {r} AS cm_row, "
        f"{cm_bucket_sql(key_alias, r, width)} AS cm_bucket FROM probes"
        for r in range(depth)
    )
    return f"""
    WITH cells AS ({cell_rows}),
    sketch AS (SELECT cm_row, cm_bucket, COUNT(*) AS cm_count
               FROM cells GROUP BY cm_row, cm_bucket),
    probes AS (SELECT DISTINCT {key_expr} AS {key_alias} FROM {table}),
    probe_cells AS ({probe_rows})
    SELECT p.{key_alias}, MIN(COALESCE(s.cm_count, 0)) AS est
    FROM probe_cells p LEFT JOIN sketch s
      ON p.cm_row = s.cm_row AND p.cm_bucket = s.cm_bucket
    GROUP BY p.{key_alias}
    """


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 16,
) -> DataFrame:
    """KMV distinct-count estimate of ``key_col`` per group →
    ``(group_cols..., est_distinct, n_hashes)``.

    ``est_distinct`` = (k-1)/u_k where u_k is the k-th smallest md5
    unit-interval hash of the distinct keys; groups with fewer than k
    distinct keys report the EXACT count (the sketch holds every hash,
    so no estimation error — mirrors production theta sketches).

    Scale: distinct-reduce on (group, key) → per-group rank on the hash
    — two exchanges on the group key, per-group state bounded at k.

    NULL keys are dropped BEFORE hashing (standard sketch semantics —
    COUNT(DISTINCT) ignores NULL). This also pins cross-engine rank
    parity: a NULL key hashes to a NULL kmv_u, and Spark's default
    ascending sort puts NULLS FIRST while DuckDB's ROW_NUMBER default is
    NULLS LAST, so leaving NULLs in would shift u_k between engines
    (round-6 advice).
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    u = md5_unit_interval(F.col(key_col), salt="kmv:")
    pairs = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col))
        .distinct()
        .withColumn("kmv_u", u)
    )
    w = Window.partitionBy(*group_cols).orderBy("kmv_u", key_col)
    ranked = pairs.withColumn("kmv_rank", F.row_number().over(w))
    per_group = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct_seen"),
        F.max(F.when(F.col("kmv_rank") == k, F.col("kmv_u"))).alias("u_k"),
    )
    est = F.when(
        F.col("n_distinct_seen") < k, F.col("n_distinct_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("u_k"))
    return per_group.select(
        *group_cols,
        F.round(est, 6).alias("est_distinct"),
        F.least(F.col("n_distinct_seen"), F.lit(k)).alias("n_hashes"),
    )


def kmv_distinct_sql(
    table: str, group_expr: str, group_alias: str, key_expr: str, k: int = 16
) -> str:
    """DuckDB oracle for ``kmv_distinct`` (same hash, same estimator,
    same NULL-key drop before hashing)."""
    u_sql = md5_unit_interval_sql("kmv_key", salt="kmv:")
    return f"""
    WITH pairs AS (SELECT DISTINCT {group_expr} AS {group_alias},
                          {key_expr} AS kmv_key FROM {table}
                   WHERE {key_expr} IS NOT NULL),
    hashed AS (SELECT {group_alias}, kmv_key, {u_sql} AS kmv_u FROM pairs),
    ranked AS (SELECT {group_alias}, kmv_u,
                      ROW_NUMBER() OVER (PARTITION BY {group_alias}
                                         ORDER BY kmv_u, kmv_key) AS kmv_rank
               FROM hashed),
    per_group AS (SELECT {group_alias}, COUNT(*) AS n_distinct_seen,
                         MAX(CASE WHEN kmv_rank = {k} THEN kmv_u END) AS u_k
                  FROM ranked GROUP BY {group_alias})
    SELECT {group_alias},
           ROUND(CASE WHEN n_distinct_seen < {k}
                      THEN CAST(n_distinct_seen AS DOUBLE)
                      ELSE {float(k - 1)} / u_k END, 6) AS est_distinct,
           LEAST(n_distinct_seen, {k}) AS n_hashes
    FROM per_group
    """


# ------------------------------------------------------------ HyperLogLog

#: HLL geometry: 256 registers (top 8 bits of the 60-bit md5-prefix
#: value), rank over the low 52 bits (rho ∈ 1..53; 53 = the 52-bit
#: field is 0). A 52-bit rank field keeps the estimator unbiased far
#: past the ~4·10^9 ceiling a 32-bit hash imposes (standard HLL uses a
#: 64-bit hash; 60 is the widest md5 prefix that fits a signed long in
#: BOTH engines) — the "billions of distinct keys per group at 100 TB"
#: claim needs this width.
HLL_M = 256
HLL_REST_BITS = 52
#: bias constant alpha_m = 0.7213 / (1 + 1.079/m) — the published HLL
#: constant for m ≥ 128; written as the formula (not a rounded float)
#: so both engines constant-fold the identical double.
HLL_ALPHA_EXPR = f"(0.7213 / (1.0 + 1.079 / {HLL_M}))"


def _hll_rho(rest: Column) -> Column:
    """rho = leading zeros of the 24-bit field + 1 (1..25), as a pure
    integer comparison chain — no float log2, so the value is exact in
    any engine. Generated from the same loop as ``_hll_rho_sql``."""
    chain = F.when(rest >= (1 << (HLL_REST_BITS - 1)), 1)
    for r in range(2, HLL_REST_BITS + 1):
        chain = chain.when(rest >= (1 << (HLL_REST_BITS - r)), r)
    return chain.otherwise(HLL_REST_BITS + 1)


def _hll_rho_sql(rest_expr: str) -> str:
    parts = [
        f"WHEN {rest_expr} >= {1 << (HLL_REST_BITS - r)} THEN {r}"
        for r in range(1, HLL_REST_BITS + 1)
    ]
    return "CASE " + " ".join(parts) + f" ELSE {HLL_REST_BITS + 1} END"


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``key_col`` per group →
    ``(group_cols..., est_distinct, registers_used)`` — the
    fixed-state sibling of ``kmv_distinct`` (KMV state grows with k;
    HLL state is exactly m=256 six-bit registers per group, mergeable
    by element-wise MAX — the production shape for billions of groups
    at 100 TB).

    Determinism is total, not statistical-only: the register harmonic
    sum Σ_j 2^(−M_j) is computed as the EXACT integer
    Σ_j 2^(53 − M_j) (each term ≤ 2^52, total ≤ 2^60 — exact in a
    signed long in both engines), so summation order cannot drift;
    the int64→double conversion before the final divide is the same
    IEEE round-to-nearest in both engines, so the only floats are the
    final α·m²·2^53 / S divide and the small-range linear-counting
    branch m·ln(m/V) (identical formulas both sides). The hash is the
    60-bit md5 prefix (8-bit register index + 52-bit rank field), so
    there is no ~4e9 saturation ceiling. NULL keys drop before
    hashing (COUNT DISTINCT semantics, same as KMV)."""
    v = md5_hex15_long(F.col(key_col), salt="hll:")
    idx = F.shiftrightunsigned(v, HLL_REST_BITS)
    rest = v.bitwiseAND(F.lit((1 << HLL_REST_BITS) - 1))
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, idx.alias("hll_idx"), _hll_rho(rest).alias("rho"))
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("rho").alias("r"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REST_BITS + 1} - r)")
        ).alias("s_seen"),
    )
    m = HLL_M
    zeros = F.lit(m) - F.col("used")
    s_total = F.col("s_seen") + zeros * F.lit(1 << (HLL_REST_BITS + 1))
    alpha = F.expr(HLL_ALPHA_EXPR)
    raw = alpha * m * m * float(1 << (HLL_REST_BITS + 1)) / s_total
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(est, 6).alias("est_distinct"),
        F.col("used").cast("long").alias("registers_used"),
    )


def hll_distinct_sql(
    table: str, group_expr: str, group_alias: str, key_expr: str
) -> str:
    """DuckDB oracle for ``hll_distinct`` — generated from the same
    geometry constants so the engines cannot drift."""
    m = HLL_M
    rb = HLL_REST_BITS
    v = md5_hex_prefix_long_sql(key_expr, 15, salt="hll:")
    return f"""
    WITH hv AS (SELECT {group_expr} AS {group_alias},
                       ({v}) // {1 << rb} AS hll_idx,
                       ({v}) % {1 << rb} AS rest
                FROM {table} WHERE {key_expr} IS NOT NULL),
    regs AS (SELECT {group_alias}, hll_idx,
                    MAX({_hll_rho_sql("rest")}) AS r
             FROM hv GROUP BY {group_alias}, hll_idx),
    pg AS (SELECT {group_alias},
                  COUNT(*) AS used,
                  SUM(CAST(1 AS BIGINT) << ({rb + 1} - r)) AS s_seen
           FROM regs GROUP BY {group_alias}),
    est AS (SELECT {group_alias}, used,
                   {HLL_ALPHA_EXPR} * {m} * {m} * {float(1 << (rb + 1))}
                     / (s_seen + ({m} - used) * {1 << (rb + 1)}) AS raw
            FROM pg)
    SELECT {group_alias},
           round(CASE WHEN raw <= {2.5 * m} AND used < {m}
                      THEN {float(m)} * ln({float(m)} / ({m} - used))
                      ELSE raw END, 6) AS est_distinct,
           CAST(used AS BIGINT) AS registers_used
    FROM est
    """


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """The PERSISTABLE HLL state: (group_cols..., hll_idx, r) register
    rows — what a daily job writes. Sketches merge by element-wise MAX
    over (group, register): ``hll_merge_estimate`` of N days equals
    the single-shot ``hll_distinct`` of the union, exactly (MAX is
    associative/commutative/idempotent — re-ingest is harmless)."""
    v = md5_hex15_long(F.col(key_col), salt="hll:")
    idx = F.shiftrightunsigned(v, HLL_REST_BITS)
    rest = v.bitwiseAND(F.lit((1 << HLL_REST_BITS) - 1))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, idx.alias("hll_idx"), _hll_rho(rest).alias("rho"))
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge_estimate(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge persisted register frames (pre-unioned) and estimate —
    identical math to ``hll_distinct`` from the merged registers."""
    regs = registers.groupBy(*group_cols, "hll_idx").agg(
        F.max("r").alias("r")
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REST_BITS + 1} - r)")
        ).alias("s_seen"),
    )
    m = HLL_M
    zeros = F.lit(m) - F.col("used")
    s_total = F.col("s_seen") + zeros * F.lit(1 << (HLL_REST_BITS + 1))
    alpha = F.expr(HLL_ALPHA_EXPR)
    raw = alpha * m * m * float(1 << (HLL_REST_BITS + 1)) / s_total
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(est, 6).alias("est_distinct"),
        F.col("used").cast("long").alias("registers_used"),
    )
