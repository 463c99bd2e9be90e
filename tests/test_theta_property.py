"""Property-based tests (hypothesis) for the theta-sketch family —
the invariants the merge lifecycles and set operations rely on, for
ANY key multiset (not just fixtures):

- lossless merge: the k smallest hashes of a union equal the k
  smallest of the per-part k-smallest sets, under ANY split;
- exactness below k: when every group holds < k distinct keys, the
  set-operation estimates are EXACT counts;
- estimator sanity: est_union >= max(est_a, est_b) - slack and
  intersection <= min side when exhaustive.

Spark round-trips are slow per example, so examples are small and few
(the batched-multiset pattern of test_corpus_property.py doesn't fit
here — each example IS a whole grouped table).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.sketches import (
    theta_setops_pairs,
    theta_sketch_rows,
)

keys_st = st.lists(
    st.integers(min_value=0, max_value=400), min_size=1, max_size=120
)


@settings(max_examples=8, deadline=None)
@given(keys_st, st.integers(min_value=2, max_value=5))
def test_theta_merge_lossless_under_any_split(spark, keys, parts):
    """k smallest of the union of per-part sketches == single-shot."""
    k = 16
    df = spark.createDataFrame([("g", u) for u in keys], ["g", "u"])
    single = sorted(
        r.kmv_u for r in theta_sketch_rows(df, "g", "u", k=k).collect()
    )
    shards = [
        theta_sketch_rows(
            df.filter(F.col("u") % parts == m), "g", "u", k=k
        ).select("g", "kmv_u")
        for m in range(parts)
    ]
    merged = shards[0]
    for p in shards[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy("g").orderBy("kmv_u")
    remerged = sorted(
        r.kmv_u
        for r in merged.distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .collect()
    )
    assert remerged == single


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
)
def test_theta_setops_exact_below_k(spark, a_keys, b_keys):
    """Exhaustive sketches (k > distinct keys) give EXACT set sizes."""
    rows = [("A", u) for u in a_keys] + [("B", u) for u in b_keys]
    df = spark.createDataFrame(rows, ["g", "u"])
    out = theta_setops_pairs(df, "g", "u", k=64).collect()
    assert len(out) == 1
    r = out[0]
    sa, sb = set(a_keys), set(b_keys)
    assert r.est_a == float(len(sa))
    assert r.est_b == float(len(sb))
    assert r.est_union == float(len(sa | sb))
    assert r.est_intersect == float(len(sa & sb))
    if len(sa | sb):
        assert abs(r.est_jaccard - len(sa & sb) / len(sa | sb)) < 1e-6
