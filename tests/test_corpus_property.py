"""Property-based tests (hypothesis) for corpus curation ops — the
invariants that must hold for ANY document, not just fixtures. Spark
round-trips are slow per example, so each property batches all
hypothesis examples into ONE DataFrame and checks per-row."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.corpus import (
    chunk_documents,
    repetition_stats,
)

token_st = st.text(alphabet="abcd", min_size=1, max_size=3)
doc_st = st.lists(token_st, min_size=1, max_size=40).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=60))
def test_chunking_covers_and_reconstructs(spark, docs):
    """Every token is covered in order: dropping each non-first chunk's
    ``overlap``-token prefix and concatenating reconstructs the doc."""
    chunk_tokens, overlap = 7, 3
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        toks = docs[doc_id].split(" ")
        rebuilt = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            ctoks = r["chunk_text"].split(" ")
            assert ctoks[:overlap] == rebuilt[-overlap:]  # windows agree
            rebuilt += ctoks[overlap:]
        assert rebuilt == toks
        for r in rows:
            assert r["n_tokens"] == len(r["chunk_text"].split(" "))
            assert r["n_tokens"] <= chunk_tokens


@settings(max_examples=10, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=60))
def test_repetition_stats_bounds_and_exactness(spark, docs):
    """Fractions live in [0, 1); totals match a literal recount."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    for doc_id, text in enumerate(docs):
        toks = text.split(" ")
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if not grams:
            assert doc_id not in out
            continue
        r = out[doc_id]
        assert r["total_2grams"] == len(grams)
        assert r["dup_2gram_frac"] == pytest.approx(1 - len(set(grams)) / len(grams))
        top = max(grams.count(g) for g in set(grams))
        assert r["top_2gram_frac"] == pytest.approx(top / len(grams))
        assert 0 <= r["dup_2gram_frac"] < 1
        assert 0 < r["top_2gram_frac"] <= 1
