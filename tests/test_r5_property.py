"""Property-based tests (hypothesis) for the round-5 operators — the
invariants that must hold for ANY input, not just fixtures. Each
property batches all hypothesis examples into ONE DataFrame (Spark
round-trips are slow per example) and checks per-row."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.bloom import bloom_build, bloom_probe
from kafka_sink_azure_kusto_spark.functions.corpus import segment_dedup
from kafka_sink_azure_kusto_spark.operators.layout import zorder_key
from kafka_sink_azure_kusto_spark.operators.timeline import scd2_compact

token_st = st.text(alphabet="abcd", min_size=1, max_size=3)
doc_st = st.lists(token_st, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="xyz0-", min_size=1, max_size=12), min_size=1, max_size=50))
def test_bloom_membership_never_false_negative(spark, keys):
    df = spark.createDataFrame([(k,) for k in set(keys)], ["k"])
    bm = bloom_build(df, "k", num_bits=1 << 10, num_hashes=4)
    probed = bloom_probe(df, bm, "k", num_bits=1 << 10, num_hashes=4)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=30))
def test_segment_dedup_is_identity_when_cap_unreachable(spark, docs):
    """With max_occurrences beyond the corpus size nothing is hot: every
    doc reconstructs verbatim, n_dropped = 0 everywhere."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           segment_dedup(df, seg_tokens=4, max_occurrences=len(docs) * 100).collect()}
    assert set(out) == set(range(len(docs)))
    for i, text in enumerate(docs):
        assert out[i]["clean_text"] == text
        assert out[i]["n_dropped"] == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(doc_st, min_size=2, max_size=30))
def test_segment_dedup_conservation(spark, docs):
    """kept + dropped segments = total segments per surviving doc, and a
    doc survives iff it kept at least one segment."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = segment_dedup(df, seg_tokens=4, max_occurrences=2).collect()
    for r in out:
        # a surviving doc kept >= 1 segment, and the kept text has
        # exactly (n_segments - n_dropped) segments' worth of tokens
        n_kept = r["n_segments"] - r["n_dropped"]
        assert n_kept >= 1 and r["n_dropped"] >= 0
        assert len(r["clean_text"].split(" ")) <= n_kept * 4


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
                min_size=1, max_size=80))
def test_zorder_key_is_bit_exact_morton(spark, pts):
    def morton(x, y, bits=10):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["i", "x", "y"]
    )
    got = {r["i"]: r["zkey"] for r in zorder_key(df, ["x", "y"], bits=10).collect()}
    for i, (x, y) in enumerate(pts):
        assert got[i] == morton(x, y)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40))
def test_scd2_partitions_the_event_sequence(spark, states):
    """Runs tile the per-key sequence: n_events sums to the row count,
    run states alternate (no two consecutive runs share a state), and
    exactly one run is current."""
    base = datetime.datetime(2026, 1, 1)
    rows = [
        (1, i, base + datetime.timedelta(seconds=10 * i), s)
        for i, s in enumerate(states)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    out = sorted(scd2_compact(df).collect(), key=lambda r: r["run_id"])
    assert sum(r["n_events"] for r in out) == len(states)
    assert [r["is_current"] for r in out].count(1) == 1
    assert out[-1]["is_current"] == 1 and out[-1]["valid_to"] is None
    for a, b in zip(out, out[1:]):
        assert a["state"] != b["state"]  # maximal runs
        assert a["valid_to"] == b["valid_from"]  # intervals tile
