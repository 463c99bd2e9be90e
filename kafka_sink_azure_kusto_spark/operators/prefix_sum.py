"""Distributed ordered prefix-sum and token-budget corpus selection.

A running total over a GLOBAL ordering is the textbook thing a naive
Spark plan gets wrong: ``Window.orderBy(...)`` with no partition key
collapses the whole dataset into ONE task. The scalable shape is the
classic two-pass scan (vector-model prefix sum):

1. range-partition by the sort keys (this is exactly what a global sort
   does) and compute ONE partial sum per partition;
2. collect the P partials (P rows — driver-side size is O(partitions),
   never O(rows)), exclusive-scan them on the driver, and broadcast the
   tiny per-partition offset table back;
3. each row's global running total = its partition-local running total
   + its partition's offset.

The staged (range-partitioned, sorted) frame is materialized with an
eager ``localCheckpoint`` between the two passes so both read the same
frozen partitioning — partition boundaries come from sampling, so
recomputing the exchange in a second job could legally re-draw them.
localCheckpoint (not ``persist``) because it truncates lineage — a
re-draw is structurally impossible, not merely cached away — and its
blocks are released by the ContextCleaner when the result goes out of
scope, where an unpaired ``persist`` would pin a corpus-sized cache
entry per call. At 100 TB the same role is played by staging to
parquet.

No reference citation: the reference connector has no analytics surface
(north-star addition). The algorithm is Blelloch's exclusive scan
mapped onto Spark partitions.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OrderCol = Union[str, Column]


def ordered_prefix_sum(
    df: DataFrame,
    order_by: Sequence[OrderCol],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = the EXCLUSIVE running sum of ``value_col`` over
    the total order given by ``order_by`` (first row gets 0). The
    ordering must be total (include a unique tie-breaker column) for the
    result to be well-defined.

    Cost at scale: one range exchange (the sort), one hash exchange on
    the partition label for the partition-local window, and an O(P)
    driver aggregate — versus the one-task global window Spark would
    otherwise plan. Both exchanges move each row once; no skew beyond
    the sort's own sampling."""
    spark = df.sparkSession
    n = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    staged = (
        # Cast the summed value to long ONCE, per-row, before either
        # pass: driver partials and the partition-local window then sum
        # identical integers, so a fractional value_col can't truncate
        # at two different points and skew the cumulative result.
        # (Non-integral inputs are truncated toward zero per SQL cast.)
        df.withColumn("_v", F.col(value_col).cast("long"))
        .repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        # lazy: the partials job below is what materializes the
        # checkpoint — one pass over the staged frame instead of an
        # eager-checkpoint pass followed by a partials pass
        .localCheckpoint(eager=False)
    )
    # Pass 1: per-partition totals -> exclusive scan on the driver.
    partials = staged.groupBy("_pid").agg(F.sum("_v").alias("_t")).collect()
    acc = 0
    offset_rows = []
    for r in sorted(partials, key=lambda r: r["_pid"]):
        offset_rows.append((r["_pid"], acc))
        acc += int(r["_t"] or 0)
    offsets = spark.createDataFrame(
        offset_rows or [(0, 0)], "_pid int, _poff long"
    )
    # Pass 2: partition-local exclusive running sum + broadcast offset.
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("_v").over(w), F.lit(0)).cast("long")
    return (
        staged.withColumn("_local", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_poff")).cast("long"))
        .drop("_pid", "_local", "_poff", "_v")
    )


def token_budget_select(
    df: DataFrame,
    order_by: Sequence[OrderCol],
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy budgeted selection: walk the corpus in ``order_by`` order
    (best first) and keep documents while the running token total is
    under ``budget`` — the standard "top-quality slice under a global
    token budget" curation step. A document is kept iff the sum of
    tokens BEFORE it is < budget (so the budget may be exceeded by at
    most one document, never undershot by boundary ties)."""
    out = ordered_prefix_sum(
        df, order_by, token_col, out_col="cum_before", num_partitions=num_partitions
    )
    return out.filter(F.col("cum_before") < budget)
