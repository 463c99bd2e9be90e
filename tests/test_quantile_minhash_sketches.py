"""Unit tests for the r9 sketch additions: the mergeable fixed-grid
quantile histogram and the group-level mergeable minhash signature.

The load-bearing properties (the ones the lifecycle gates rely on):
- quantile registers SUM-merge: merged-of-parts == computed-once,
  under any split of the input;
- minhash registers MIN-merge: merged-of-parts == computed-once AND
  re-ingesting a day is a no-op (MIN is idempotent);
- the grid clamps out-of-range values into edge bins (never drops);
- the rank arithmetic is exact-integer (ceil via DIV), pinned on tiny
  closed-form inputs where the quantiles are known by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_sink_azure_kusto_spark.functions.sketches import (
    MHG_HASHES,
    group_minhash_merge,
    group_minhash_pair_estimates,
    group_minhash_registers,
    quantile_histogram_registers,
    quantile_merge_estimate,
)


def _est_map(df):
    return {(r.g, r.q): (r.est_value, r.n_values) for r in df.collect()}


def test_quantile_merge_equals_single_shot(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 1000).cast("double").alias("v"),
        F.col("id"),
    )
    single = _est_map(
        quantile_merge_estimate(
            quantile_histogram_registers(df, ["g"], "v", 0.0, 1000.0, 32),
            ["g"], 0.0, 1000.0, 32,
        )
    )
    days = [
        quantile_histogram_registers(
            df.filter(F.col("id") % 5 == d), ["g"], "v", 0.0, 1000.0, 32
        )
        for d in range(5)
    ]
    merged_frame = days[0]
    for d in days[1:]:
        merged_frame = merged_frame.unionByName(d)
    merged = _est_map(
        quantile_merge_estimate(merged_frame, ["g"], 0.0, 1000.0, 32)
    )
    assert merged == single
    assert len(single) == 9  # 3 groups x 3 quantiles


def test_quantile_known_values_and_clamping(spark):
    # 1..100 in one group: grid [0,100) x 10 bins, each bin holds 10
    # values, so interpolation recovers ranks exactly at bin edges.
    df = spark.range(1, 101).select(
        F.lit("a").alias("g"), F.col("id").cast("double").alias("v")
    )
    est = _est_map(
        quantile_merge_estimate(
            quantile_histogram_registers(df, ["g"], "v", 0.0, 100.0, 10),
            ["g"], 0.0, 100.0, 10,
        )
    )
    # p50 -> rank 50; bin 5 covers values 50..59 ranks 50..59 (value 50
    # lands in bin 5), cum_before=49? No: values 1..100; bin b holds
    # v in [10b, 10b+10) -> bin 5 = 50..59 (10 values, ranks 50..59).
    # rank 50 is the first in bin 5: est = 0 + 10*(5 + 1/10) = 51.0.
    assert est[("a", "p50")] == (51.0, 100)
    # p90 -> rank 90, bin 9 holds 90..100 (11 values, ranks 90..100);
    # est = 10*(9 + 1/11)
    assert est[("a", "p90")][0] == pytest.approx(10 * (9 + 1 / 11), abs=1e-6)
    # out-of-range values clamp into edge bins, never drop
    oob = spark.createDataFrame(
        [("a", -5.0), ("a", 1e9)], ["g", "v"]
    )
    regs = quantile_histogram_registers(oob, ["g"], "v", 0.0, 100.0, 10)
    rows = {r.qh_bin: r.cnt for r in regs.collect()}
    assert rows == {0: 1, 9: 1}
    # NULLs drop (aggregate semantics)
    withnull = spark.createDataFrame([("a", None), ("a", 1.0)], "g string, v double")
    n = quantile_histogram_registers(withnull, ["g"], "v", 0.0, 100.0, 10)
    assert n.agg(F.sum("cnt")).collect()[0][0] == 1


def test_group_minhash_merge_and_reingest_idempotent(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 4}", f"tok{i % 7} tok{i % 11} tok{(i * 3) % 13}")
         for i in range(200)],
        ["doc_id", "source", "text"],
    )
    single = {
        (r.source, r.mh_h): r.minv
        for r in group_minhash_registers(df, ["source"], "text").collect()
    }
    days = [
        group_minhash_registers(
            df.filter(F.col("doc_id") % 3 == d), ["source"], "text"
        )
        for d in range(3)
    ]
    # re-ingest day 1 twice: MIN is idempotent, result must not move
    frame = days[0].unionByName(days[1]).unionByName(days[2]).unionByName(days[1])
    merged = {
        (r.source, r.mh_h): r.minv
        for r in group_minhash_merge(frame, ["source"]).collect()
    }
    assert merged == single
    assert len(single) == 4 * MHG_HASHES


def test_group_minhash_pair_estimates_bounds(spark):
    # identical token sets -> every component matches -> est 1.0;
    # disjoint sets -> (almost surely) no component matches.
    df = spark.createDataFrame(
        [("a", "x y z w"), ("b", "x y z w"), ("c", "p q r s")],
        ["source", "text"],
    )
    sig = group_minhash_registers(df, ["source"], "text")
    est = {
        (r.group_a, r.group_b): r.est_jaccard
        for r in group_minhash_pair_estimates(sig, "source").collect()
    }
    assert est[("a", "b")] == 1.0
    assert est[("a", "c")] == 0.0
    # duplicate tokens cannot affect a MIN: "x x y" == "x y"
    dup = spark.createDataFrame(
        [("a", "x x y y"), ("b", "x y")], ["source", "text"]
    )
    sig2 = group_minhash_pair_estimates(
        group_minhash_registers(dup, ["source"], "text"), "source"
    )
    assert sig2.collect()[0].est_jaccard == 1.0
