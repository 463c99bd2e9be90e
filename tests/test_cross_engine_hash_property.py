"""Hypothesis property: the generated-SQL hash mirrors are BIT-IDENTICAL
to their Spark expressions on arbitrary inputs — the foundation every
md5-deterministic operator (sampling, sketches, splits, shuffle index)
stands on. The oracle sweep checks this on table data; here random
strings/longs get the same guarantee.

Examples are batched into ONE Spark job + ONE DuckDB query per property
so hypothesis's example count doesn't multiply session round-trips.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.sampling import (
    md5_hex8_long,
    md5_hex8_long_sql,
    md5_unit_interval,
    md5_unit_interval_sql,
)
from kafka_sink_azure_kusto_spark.functions.sketches import cm_bucket, cm_bucket_sql

# arbitrary unicode (minus NUL, which DuckDB varchars reject and no
# real key contains) and the integer keys real tables use
_keys = st.one_of(
    st.text(
        alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=-(2**62), max_value=2**62),
)


def _duck_rows_over_keys(keys: list, expr_sql: str) -> list:
    """Evaluate one SQL expression per key WITHOUT embedding the key as
    a literal (hypothesis feeds control characters that no quoting
    discipline should have to survive) — the keys travel as a registered
    pandas frame."""
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": [str(k) for k in keys]}))
    return con.execute(f"SELECT k, {expr_sql} FROM t").fetchall()


@settings(max_examples=20, deadline=None)
@given(st.lists(_keys, min_size=1, max_size=20, unique=True))
def test_md5_hex8_long_matches_sql(spark, keys):
    df = spark.createDataFrame([Row(k=str(k)) for k in keys])
    got = {
        r["k"]: r["h"]
        for r in df.select("k", md5_hex8_long(F.col("k"), salt="s:").alias("h")).collect()
    }
    want = {k: h for k, h in _duck_rows_over_keys(keys, f"{md5_hex8_long_sql('k', salt='s:')} AS h")}
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=20, unique=True),
    st.integers(min_value=1, max_value=6),  # widths 2..64
)
def test_cm_bucket_matches_sql(spark, keys, wexp):
    width = 2**wexp
    df = spark.createDataFrame([Row(k=k) for k in keys])
    got = {
        r["k"]: (r["b0"], r["b1"])
        for r in df.select(
            "k",
            cm_bucket(F.col("k"), 0, width).alias("b0"),
            cm_bucket(F.col("k"), 3, width).alias("b1"),
        ).collect()
    }
    rows = _duck_rows_over_keys(
        keys, f"{cm_bucket_sql('k', 0, width)} AS b0, {cm_bucket_sql('k', 3, width)} AS b1"
    )
    want = {int(k): (b0, b1) for k, b0, b1 in rows}
    assert got == want
    # buckets are in range
    assert all(0 <= b < width for pair in got.values() for b in pair)


@settings(max_examples=15, deadline=None)
@given(st.lists(_keys, min_size=1, max_size=20, unique=True))
def test_md5_unit_interval_matches_sql(spark, keys):
    df = spark.createDataFrame([Row(k=str(k)) for k in keys])
    got = {
        r["k"]: r["u"]
        for r in df.select(
            "k", md5_unit_interval(F.col("k"), salt="wor:").alias("u")
        ).collect()
    }
    want = {
        k: u
        for k, u in _duck_rows_over_keys(keys, f"{md5_unit_interval_sql('k', salt='wor:')} AS u")
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == want[k], f"unit interval drift for {k!r}"
        assert 0.0 <= got[k] < 1.0
