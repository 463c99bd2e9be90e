"""Temporal/CDC operators: SCD-2 state compaction and per-key rolling
features (north-star additions — the reference connector streams change
events INTO a warehouse; these are the warehouse-side shapes those
events feed: slowly-changing-dimension history and time-series
featurization).

Scale notes (100 TB): both operators are single-shuffle shapes — one
exchange on the entity key, then window functions evaluated inside each
partition in one sort. Run lengths and window frames never cross the
key boundary, so partition width is bounded by per-entity history, and
skewed entities are the usual salting candidates upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_compact(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Compact an event stream into SCD-2 validity intervals → (key,
    run_id, state, valid_from, valid_to, is_current, n_events).

    Consecutive events (per key, ordered by ``ts_col`` then
    ``tiebreak_col`` for a total order) carrying the same ``attr_col``
    collapse into one run; each run becomes a versioned dimension row
    whose interval is [its first event, the next run's first event), the
    classic gaps-and-islands → type-2 history build that a CDC pipeline
    performs downstream of the connector. The final run per key has
    ``valid_to`` NULL and ``is_current`` 1.

    Plan: lag → running sum (island numbering) → groupBy(key, run) →
    lead. All windows share the one (key)-partitioned sort; the groupBy
    shuffles run rows keyed on the same key.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    marked = df.withColumn(
        "_new", F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    )
    run = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    runs = marked.withColumn("_run", run)
    g = runs.groupBy(key_col, "_run").agg(
        F.max(attr_col).alias("state"),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_run")
    nxt = F.lead("valid_from").over(w2)
    return g.select(
        key_col,
        F.col("_run").cast("long").alias("run_id"),
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
        "n_events",
    )


def rolling_features(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    window_rows: int = 5,
) -> DataFrame:
    """Per-key ordered rolling features over an event stream: appends
    (seq, moving_avg, delta_prev, micros_since_prev) to every row.

    - ``seq``: 1-based event index per key,
    - ``moving_avg``: mean of ``val_col`` over the trailing
      ``window_rows`` rows (current inclusive), rounded to 6 dp,
    - ``delta_prev``: value change vs the previous event (6 dp),
    - ``micros_since_prev``: exact integer microseconds since the
      previous event (NULL on the first).

    Determinism: the moving sum runs over DECIMAL(18,6) — decimal
    addition is exact and associative, so the engine's frame-evaluation
    strategy (running sum vs segment tree) cannot perturb low bits the
    way a double sum can; the single cast-to-double + divide + round
    happens once per row. Time deltas use integer epoch-microseconds
    (``unix_micros``) — no float timestamps anywhere.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    frame = w.rowsBetween(-(window_rows - 1), 0)
    dec = F.col(val_col).cast("decimal(18,6)")
    mavg = F.round(
        F.sum(dec).over(frame).cast("double") / F.count(F.lit(1)).over(frame), 6
    )
    micros = F.unix_micros(F.col(ts_col))
    return df.select(
        "*",
        F.row_number().over(w).cast("long").alias("seq"),
        mavg.alias("moving_avg"),
        F.round(F.col(val_col) - F.lag(val_col).over(w), 6).alias("delta_prev"),
        (micros - F.lag(micros).over(w)).alias("micros_since_prev"),
    )


def funnel_stages(
    df: DataFrame,
    steps: "tuple[str, ...]" = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the first time it reached
    each step IN ORDER (step i counts only strictly after step i−1's
    first completion) → (key, ts_<step>…, funnel_stage).

    ``funnel_stage`` is the number of consecutive steps completed (0 =
    never did step 1). A click before any view does NOT open the click
    stage — that ordering constraint is what distinguishes a funnel from
    per-type min(ts) and what makes the metric resistant to
    out-of-order/replayed events.

    Plan: one aggregation + left join PER STEP, every one keyed on
    ``key_col`` — after the first exchange the joins are co-partitioned,
    so step count adds map-side work, not new shuffle width.
    """
    base = df.select(key_col).distinct()
    out = base
    prev = None
    for step in steps:
        ev = df.filter(F.col(type_col) == step)
        if prev is not None:
            ev = ev.join(
                out.select(key_col, prev).filter(F.col(prev).isNotNull()), key_col
            ).filter(F.col(ts_col) > F.col(prev))
        t = ev.groupBy(key_col).agg(F.min(ts_col).alias(f"ts_{step}"))
        out = out.join(t, key_col, "left")
        prev = f"ts_{step}"
    # forward build: each later step's WHEN wraps the earlier chain, so
    # the deepest completed step is checked first in the final CASE
    stage = F.lit(0)
    for idx, step in enumerate(steps, start=1):
        stage = F.when(F.col(f"ts_{step}").isNotNull(), F.lit(idx)).otherwise(stage)
    return out.select(
        key_col, *[f"ts_{s}" for s in steps], stage.cast("int").alias("funnel_stage")
    )


def calendar_fill(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Dense time-series: aggregate per (group, time bucket) and FILL the
    missing buckets with zeros over the corpus-wide [min, max] span →
    (group, bucket_start, n, total_value).

    Downstream window math (moving averages, lag deltas,
    anomaly baselines) silently mis-computes over sparse series — a
    missing hour must be a zero row, not an absent row. The dense axis
    is built with one global min/max aggregate (1 row), a
    sequence+explode over the span (narrow), and a cross join of the
    tiny (groups × buckets) dimension frame against the aggregated
    counts via a left join — the raw events are touched exactly once.
    """
    bucket = F.date_trunc("hour", F.col(ts_col))
    agg = df.groupBy(F.col(group_col).alias("g"), bucket.alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(val_col).cast("decimal(18,6)")).alias("tv"),
    )
    span = df.select(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    axis = span.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket_start")
    )
    groups = df.select(F.col(group_col).alias(group_col)).distinct()
    dims = groups.crossJoin(F.broadcast(axis))
    return (
        dims.join(
            agg,
            (dims[group_col] == agg["g"]) & (dims["bucket_start"] == agg["b"]),
            "left",
        )
        .select(
            group_col,
            "bucket_start",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("tv").cast("double"), F.lit(0.0)).alias("total_value"),
        )
    )


def series_zscores(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-group hourly-count anomaly z-scores over the DENSE series →
    (group, bucket_start, n, zscore).

    Composes ``calendar_fill`` (zero rows for silent hours — an outage
    IS the anomaly a sparse series would hide), then computes each
    group's mean/variance FROM INTEGER SUMS (Σn, Σn², H are exact
    BIGINTs; variance = (Σn² − H·mean²)/(H−1) evaluated once in double)
    — no engine-dependent streaming-variance fold, so the oracle matches
    bit-for-bit after one round. Groups with a degenerate series
    (H < 2 or zero variance) are dropped rather than emitting ±inf.

    Scale: counts aggregate once (map-side combined); the per-group
    moment table is group-cardinality-sized and broadcasts back.
    """
    dense = calendar_fill(df, group_col=group_col, ts_col=ts_col, val_col=val_col)
    moments = dense.groupBy(group_col).agg(
        F.sum("n").alias("_s"),
        F.sum(F.col("n") * F.col("n")).alias("_ss"),
        F.count(F.lit(1)).alias("_h"),
    )
    mean = F.col("_s").cast("double") / F.col("_h")
    var = (F.col("_ss").cast("double") - F.col("_h") * mean * mean) / (
        F.col("_h") - 1
    )
    stats = moments.select(
        group_col, mean.alias("_mean"), var.alias("_var")
    ).filter((F.col("_var") > 0))
    z = (F.col("n") - F.col("_mean")) / F.sqrt(F.col("_var"))
    return (
        dense.join(F.broadcast(stats), group_col)
        .select(
            group_col,
            "bucket_start",
            "n",
            F.round(z, 6).alias("zscore"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Monthly retention-cohort triangle: users grouped by their FIRST
    active month, counted in each subsequent month they return →
    (cohort_month, month_offset, n_users).

    The classic product-analytics rollup; month arithmetic is pure
    integers (year·12 + month), so offsets are engine-exact. Plan: one
    min-aggregate per key (first month), one distinct on (key, month),
    one join keyed on the entity key, one fixed-width count — the entity
    key partitioning is reused across all three.
    """
    first = df.groupBy(key_col).agg(
        F.date_trunc("month", F.min(ts_col)).alias("cohort_month")
    )
    active = df.select(
        key_col, F.date_trunc("month", F.col(ts_col)).alias("_am")
    ).distinct()
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        active.join(first, key_col)
        .select(
            "cohort_month",
            (months(F.col("_am")) - months(F.col("cohort_month")))
            .cast("int")
            .alias("month_offset"),
            key_col,
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
