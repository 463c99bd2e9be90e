"""Unit tests for corpus-level curation ops (functions/corpus.py):
contamination detection, repetition stats, domain-mix rebalancing."""

import pytest
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.corpus import (
    contamination_overlap,
    domain_mix_rates,
    rebalance_sample,
    repetition_stats,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "a"),
        (1, "one two three four five six seven", "a"),
        # contains the benchmark 4-gram "alpha beta gamma delta"
        (2, "xx alpha beta gamma delta yy", "b"),
        (3, "totally unrelated words here nothing shared", "b"),
        # highly repetitive: "spam ham" repeated
        (4, "spam ham spam ham spam ham spam ham", "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_contamination_flags_planted_overlap(docs):
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination_overlap(docs, bench, n=4).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}  # every doc reported, zeros included
    assert out[0] == (3, 1)  # the benchmark doc itself: all 3 of its 4-grams
    assert out[2] == (1, 1)  # planted overlap caught
    assert out[1] == (0, 0) and out[3] == (0, 0) and out[4] == (0, 0)


def test_repetition_stats_separates_repetitive_doc(docs):
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=2).collect()}
    # doc 4: 7 bigrams, only 2 distinct ("spam ham" x4, "ham spam" x3)
    assert out[4]["total_2grams"] == 7
    assert out[4]["dup_2gram_frac"] == pytest.approx(1 - 2 / 7)
    assert out[4]["top_2gram_frac"] == pytest.approx(4 / 7)
    # doc 0: all bigrams unique
    assert out[0]["dup_2gram_frac"] == 0.0
    # short-doc edge: a 1-token doc yields no bigrams, so no row
    one = docs.sparkSession.createDataFrame([(9, "solo", "a")], ["doc_id", "text", "source"])
    assert repetition_stats(one, n=2).count() == 0


def test_domain_mix_rates_cap_and_share(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 80, "big").otherwise("small").alias("source"),
    )
    rates = {
        r["source"]: r["keep_rate"]
        for r in domain_mix_rates(
            df, "source", {"small": 0.5}, default_share=0.5, total_keep=40
        ).collect()
    }
    # big: 0.5*40/80 = 0.25 ; small: 0.5*40/20 = 1.0 capped
    assert rates["big"] == pytest.approx(0.25)
    assert rates["small"] == 1.0


def test_rebalance_sample_deterministic_and_bounded(spark):
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    kw = dict(
        group_col="source",
        key_col="doc_id",
        shares={"s0": 0.4},
        default_share=0.2,
        total_keep=200,
        salt="t",
    )
    a = sorted(r["doc_id"] for r in rebalance_sample(df, **kw).collect())
    b = sorted(r["doc_id"] for r in rebalance_sample(df, **kw).collect())
    assert a == b  # pure function of (key, salt, counts)
    per = (
        rebalance_sample(df, **kw)
        .groupBy("source")
        .count()
        .collect()
    )
    counts = {r["source"]: r["count"] for r in per}
    # s0 rate 0.4*200/100=0.8, others 0.2*200/100=0.4 — allow hash noise
    assert 65 <= counts["s0"] <= 95
    for s in ("s1", "s2", "s3"):
        assert 25 <= counts[s] <= 55


def test_chunk_documents_windows_and_tail(spark):
    from kafka_sink_azure_kusto_spark.functions.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b c")], ["doc_id", "text"]
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    )
    assert out == [
        (1, 0, "t1 t2 t3 t4", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t5 t6 t7 t8", 4),
        (1, 3, "t7 t8 t9 t10", 4),
        (2, 0, "a b c", 3),
    ]
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pii_redact_patterns(spark):
    from kafka_sink_azure_kusto_spark.functions.corpus import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp-a.example.org now"),
            (2, "server 192.168.1.254 down"),
            (3, "call +1 555 123 4567 today"),
            (4, "clean text without secrets"),
        ],
        ["i", "text"],
    )
    out = {r["i"]: r["red"] for r in df.select("i", pii_redact("text").alias("red")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server <IP> down"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text without secrets"


# ----------------------------------------------------- tokenizer encode
def test_bpe_encode_literal_map_and_join_agree(spark):
    """The two encode implementations (literal-map zero-shuffle vs
    broadcast-join scale path) must produce identical id sequences,
    with OOV tokens mapped to unk."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.corpus import (
        bpe_apply_merges,
        bpe_encode,
        bpe_encode_join,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown cat sits under the lazy dog"),
            (2, "completely unseen words only here"),
        ],
        ["doc_id", "text"],
    )
    merges = ["the quick", "lazy dog"]
    vocab = {"the@@quick": 0, "brown": 1, "fox": 2, "lazy@@dog": 3,
             "the": 4, "over": 5}
    unk = 99
    a = {r["doc_id"]: list(r["token_ids"])
         for r in bpe_encode(docs, merges, vocab, unk).collect()}
    vocab_df = spark.createDataFrame(
        [(t, i) for t, i in vocab.items()], ["tok", "tid"]
    )
    b = {r["doc_id"]: list(r["token_ids"])
         for r in bpe_encode_join(docs, merges, vocab_df, unk).collect()}
    assert a == b
    # merges applied, vocab hit, OOV → unk
    assert a[0][0] == 0            # "the quick" merged → id 0
    assert a[0][-1] == 3           # "lazy dog" merged → id 3
    assert all(x == unk for x in a[2])  # all unseen → unk
    # raw token sanity: merged text of doc 0 has 7 tokens
    merged = docs.filter(F.col("doc_id") == 0).select(
        F.split(F.trim(bpe_apply_merges("text", merges)), " ").alias("t")
    ).collect()[0]["t"]
    assert merged[0] == "the@@quick" and merged[-1] == "lazy@@dog"
    assert len(a[0]) == len(merged)


def test_bpe_encode_vocab_size_guard(spark):
    from kafka_sink_azure_kusto_spark.functions.corpus import bpe_encode
    import pytest

    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    huge = {f"t{i}": i for i in range(65537)}
    with pytest.raises(ValueError, match="65536"):
        bpe_encode(docs, [], huge, unk_id=0)
