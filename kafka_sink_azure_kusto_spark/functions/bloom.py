"""Distributed Bloom-filter build + probe (100 TB decontamination path).

The broadcast-the-benchmark pattern (`corpus.contamination_overlap`)
assumes the benchmark n-gram set fits in a broadcast. When it doesn't
(a multi-GB eval-suite union, or an allow/deny list with billions of
keys), the scalable move is to broadcast a *bitmap* instead: a Bloom
filter over the benchmark keys is m/8 bytes regardless of key count
(2^24 bits = 2 MB handles ~10^6 keys at ~1% FP with k=7), so the corpus
side still probes in its scan stage with zero shuffle. Bloom membership
has false positives but NO false negatives, so a downstream exact
verify join — now over the tiny candidate set only — restores exact
semantics: the filter changes the *plan*, never the *answer*.

Spark's own `DataFrame.stat.bloomFilter` collects to the driver and
returns a local object; this implementation keeps both build and probe
as DataFrame ops (the build is a fixed-width `bit_or` aggregation, the
probe is k broadcast hash joins against the m/64-row bitmap frame), so
it composes with Catalyst and never funnels benchmark bytes through the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(key, i: int, num_bits: int):
    """i-th Bloom position for a key: xxhash64(key, i) mod num_bits.
    Seeding via an extra hashed literal (xxhash64 is variadic) gives k
    independent hash functions from one primitive."""
    return F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Aggregate a key set into a Bloom bitmap frame (word_idx BIGINT,
    bits BIGINT) with at most ``num_bits/64`` rows.

    One explode (k positions per key, fixed width) + one `bit_or`
    aggregation — map-side partial combine applies, so the shuffle
    carries at most ``num_bits/64`` rows per map task no matter how many
    keys the build side has. Absent words mean all-zero bits.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    positions = F.array(
        *[_position(F.col(key_col), i, num_bits) for i in range(num_hashes)]
    )
    return (
        df.select(F.explode(positions).alias("_pos"))
        # Python F.shiftleft only takes a literal shift amount; the SQL
        # function accepts a column, so the variable shift goes via expr.
        .select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    flag_col: str = "bloom_maybe",
) -> DataFrame:
    """Append ``flag_col`` (boolean): true iff all ``num_hashes`` Bloom
    positions of ``key_col`` are set in ``bitmap``.

    Plan: k broadcast hash joins against the bitmap frame (≤
    num_bits/64 rows — a few MB even at 2^26 bits), each resolving one
    position's word; the probe side never shuffles, so this runs inside
    the corpus scan stage. All k joins broadcast the IDENTICAL
    un-renamed bitmap subplan (per-join column renames happen ABOVE
    the join, via qualified refs), so the bitmap aggregation builds
    ONCE and ReusedExchange serves joins 2..k — the r8 plan rebuilt
    and re-broadcast the 128 KB bitmap once per hash function
    (VERDICT r8 #3). Build and probe MUST agree on num_bits and
    num_hashes — a mismatch silently probes wrong positions.
    """
    out = df
    hits = []
    for i in range(num_hashes):
        word = (_position(F.col(key_col), i, num_bits) / 64).cast("long")
        out = out.withColumn(
            f"_bit{i}", (_position(F.col(key_col), i, num_bits) % 64).cast("int")
        )
        bm = F.broadcast(bitmap).alias(f"_bm{i}")
        out = (
            out.join(bm, word == F.col(f"_bm{i}.word_idx"), "left")
            .withColumn(f"_b{i}", F.col(f"_bm{i}.bits"))
            .drop(F.col(f"_bm{i}.word_idx"))
            .drop(F.col(f"_bm{i}.bits"))
        )
        # variable shift amount → SQL shiftrightunsigned (the Python
        # wrapper only accepts a literal)
        hits.append(
            F.expr(
                f"shiftrightunsigned(COALESCE(_b{i}, CAST(0 AS BIGINT)), _bit{i}) "
                f"& CAST(1 AS BIGINT)"
            )
            == 1
        )
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    drop = [c for i in range(num_hashes) for c in (f"_b{i}", f"_bit{i}")]
    return out.withColumn(flag_col, flag).drop(*drop)
