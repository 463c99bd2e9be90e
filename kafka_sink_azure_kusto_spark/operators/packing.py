"""Sequence packing for LLM training pipelines (north-star op).

Training consumes documents concatenated into fixed-size context windows
("packing"); unpacked short documents waste compute as padding. This
operator assigns each document a (shard, pack) coordinate such that the
token sum per pack stays ≤ the context budget — the training-data twin
of the sink's size-based file rolling (operators/batching.py), and it
reuses the same scale-safe shape:

- Documents are sharded by a deterministic key hash; each shard packs
  independently with a window prefix-sum (one narrow shuffle keyed on
  the shard id — no global ordering, no driver loop, no sequential
  dependency across shards). At 100 TB, shards ≫ executors and each
  window partition is bounded.
- Within a shard, docs pack in stable key order; pack boundaries are the
  prefix-sum bucket ``floor(cum_tokens_before / budget)`` — the same
  deviation from sequential first-fit as file assignment (documented in
  with_file_assignment): a pack may overshoot by at most one document,
  and a document longer than the budget occupies its own pack(s).
  Deterministic and engine-portable, so the DuckDB oracle runs the
  literally-same computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    max_tokens: int = 2048,
    num_shards: int = 64,
) -> DataFrame:
    """Adds ``shard`` (key modulo bucket), ``pack_id`` (0-based within
    shard) and ``pack_tokens_before`` (prefix sum — the document's start
    offset inside its pack stream). Output rows = input rows.

    ``key_col`` must be an integral column (the shard is ``key mod
    num_shards`` — the engine-portable choice the oracle replays; a
    silent cast of a string key would null out the shard and collapse
    the corpus into one window partition, so non-integral keys are
    rejected here). Callers with non-uniform integral keys (e.g. ids
    strided by a multiple of ``num_shards``) should pre-hash into a
    surrogate key first."""
    key_type = df.schema[key_col].dataType.typeName()
    if key_type not in ("long", "integer", "short", "byte"):
        raise TypeError(
            f"pack_sequences key_col {key_col!r} must be integral, got "
            f"{key_type}; pre-hash string keys into a numeric surrogate"
        )
    df = df.withColumn("shard", F.pmod(F.col(key_col), F.lit(num_shards)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("pack_tokens_before", before).withColumn(
        "pack_id", (before / F.lit(max_tokens)).cast("bigint")
    )


def pack_texts(
    packed: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    sep: str = "<|eos|>",
) -> DataFrame:
    """Materialize each pack as one training sequence: documents
    concatenated in stable ``key_col`` order with an EOS separator —
    the tokenizer-ready output of the packing pipeline. One hash
    aggregation on (shard, pack_id); `array_sort` on (key, text)
    structs gives the deterministic in-pack order without a window
    (the struct sort is row-local, and key uniqueness makes it total),
    so both the grouping and the ordering are engine-portable for the
    oracle's ``string_agg(... ORDER BY key)``."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(key_col).alias("k"), F.col(text_col).alias("t")))
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.transform(ordered, lambda s: s["t"]), sep).alias("pack_text"),
    )


def pack_stats(packed: DataFrame, max_tokens: int = 2048) -> DataFrame:
    """Per-(shard, pack) utilization: docs, tokens, fill ratio — the
    padding-waste observable a packing pipeline monitors."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("pack_tokens") / F.lit(float(max_tokens)), 6),
        )
    )
