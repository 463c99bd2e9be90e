"""Text-analysis operators for training-data pipelines (north-star
additions, SURVEY §7.3.6 — no reference citation; additive scope).

All pure built-in-function compositions (split / regexp / aggregate) —
JVM-side, whole-stage-codegen'd, zero Python in the hot path, no
shuffles. Designed so every output is reproducible in ANSI SQL for the
DuckDB oracle (md5-based fingerprints, single-space tokenization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio language
# heuristic. Deliberately small + deterministic (oracle-reproducible).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (single-space split, matching the oracle's
    string_split semantics exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """BPE-ish subword estimate: words + punctuation runs counted
    separately (a regex proxy for tokenizer behavior: ~1 token per word
    piece of ≤4 chars)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(F.split(F.trim(c), "\\s+"))
    # long words split into ceil(len/4) pieces — approximate BPE fan-out
    chars = F.length(F.regexp_replace(c, "\\s", ""))
    return F.greatest(words, F.ceil(chars / F.lit(4)).cast("int"))


def stopword_count(col: str | Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (aggregate over the
    token array — no explode, no shuffle)."""
    toks = tokens(col)
    sw = STOPWORDS[lang]
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(sw), 1).otherwise(0),
    )


def language_id(col: str | Column = "text") -> Column:
    """Heuristic language ID: pick the language whose stopword list has
    the most hits; 'und' (undetermined) when no stopword matches."""
    c = F.col(col) if isinstance(col, str) else col
    counts = {lang: stopword_count(c, lang) for lang in STOPWORDS}
    best = F.greatest(*counts.values())
    # deterministic tie-break priority en > es > de (the SQL oracle's CASE
    # evaluates in the same order); built inside-out so the first priority
    # ends up as the outermost WHEN.
    expr = F.lit("und")
    for lang in reversed(["en", "es", "de"]):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio — the standard
    heuristic-filter family for pretraining corpora."""
    c = F.col(col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, "[A-Z]", ""))
    n_stop = stopword_count(c, "en")
    return df.select(
        "*",
        n_chars.cast("bigint").alias("q_chars"),
        n_tokens.cast("bigint").alias("q_tokens"),
        (n_chars.cast("double") / n_tokens).alias("q_mean_token_len"),
        (n_punct.cast("double") / n_chars).alias("q_punct_ratio"),
        (n_upper.cast("double") / n_chars).alias("q_upper_ratio"),
        (n_stop.cast("double") / n_tokens).alias("q_stopword_ratio"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features (monotone simple
    blend — tune per corpus; the shape is what matters for the pipeline)."""
    feats = quality_features(df, col)
    score = (
        F.when(F.col("q_tokens") < 5, 0.0)
        .otherwise(
            F.least(
                F.lit(1.0),
                0.4 * F.least(F.lit(1.0), F.col("q_tokens") / 100.0)
                + 0.3 * (1.0 - F.least(F.lit(1.0), F.col("q_punct_ratio") * 5.0))
                + 0.3 * F.least(F.lit(1.0), F.col("q_stopword_ratio") * 10.0),
            )
        )
        .alias("quality_score")
    )
    return feats.select("*", score)


def fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the normalized text (lowercase,
    collapsed whitespace). md5 is available in both Spark and DuckDB with
    identical hex output → exact-oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return F.md5(normalized)


def rolling_hashes(col: str | Column, k: int = 8) -> Column:
    """Array of rolling k-token window fingerprints (winnowing-style
    document fingerprinting): md5 of each k-gram of tokens."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )


# ---------------------------------------------------------------- classifier

#: hashed-feature table size for the linear quality classifier — 256
#: buckets so the bucket id is EXACTLY the first two md5 hex digits
#: (no modulo bias, and the oracle's per-digit arithmetic stays 2 terms)
CLF_BUCKETS = 256

#: deterministic stand-in for trained weights: per-bucket integer
#: milli-weight w_b = ((1103515245·b + 12345) mod 2001) − 1000 ∈
#: [−1000, 1000]. A real deployment swaps this formula for a broadcast
#: lookup of fastText/fasttext-style trained weights; the formula keeps
#: the gate oracle closed-form and both engines in exact integer math.
CLF_WEIGHT_MULT = 1103515245
CLF_WEIGHT_ADD = 12345
CLF_WEIGHT_MOD = 2001


def _clf_bucket(feature: Column) -> Column:
    """Feature → bucket id 0..255: integer value of the first two md5
    hex digits (conv is an exact 2-digit parse; identical to the
    oracle's ascii-arithmetic per-digit form)."""
    return F.conv(F.substring(F.md5(feature), 1, 2), 16, 10).cast("long")


def _clf_milliweight(bucket: Column) -> Column:
    """Bucket → integer milli-weight (see CLF_WEIGHT_*)."""
    return (bucket * CLF_WEIGHT_MULT + CLF_WEIGHT_ADD) % CLF_WEIGHT_MOD - 1000


def quality_classifier(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """fastText-style hashed bag-of-ngrams linear quality classifier:
    unigram (``u:tok``) and bigram (``b:tok1 tok2``) features hash into
    a 256-bucket weight table; the document logit is the MEAN feature
    weight; score = sigmoid(logit), label = score ≥ 0.5.

    Shape notes for 100 TB: zero shuffles and zero Python — the whole
    computation is one codegen'd projection per document (split →
    transform → integer aggregate → one exp()). Feature weights are
    summed in exact INTEGER milli-units so the result is independent of
    summation order (cross-engine and cross-partition deterministic);
    the only floating-point steps are the final divide and sigmoid.
    This is the scoring half of the classifier-filter family
    (CCNet/fastText quality filters); training stays offline and ships
    as the weight table.

    NULL-text documents are dropped (no tokens ⇒ no features ⇒ no
    score — same row-membership rule as the DuckDB oracle's
    unnest + GROUP BY, which never emits a group for a NULL token
    array; round-9 advice closed the latent divergence where the Spark
    side used to emit a NULL-scored row).

    Parallelism: the projection is evaluated where the rows are — a
    sub-parallelism input (one-file corpus, single micro-batch) is
    widened first so the per-token hashing doesn't serialize onto one
    core (2.56 s → 0.4 s on the sf0.1 gate fixture). At production
    partition counts the widening is a structural no-op and the plan
    stays exchange-free."""
    from kafka_sink_azure_kusto_spark.functions.parallelism import (
        ensure_min_parallelism,
    )

    df = ensure_min_parallelism(df.filter(F.col(col).isNotNull()))
    c = F.col(col)
    toks = tokens(c)
    n = F.size(toks)
    uni_w = F.transform(
        toks, lambda t: _clf_milliweight(_clf_bucket(F.concat(F.lit("u:"), t)))
    )
    bi_w = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: _clf_milliweight(
            _clf_bucket(
                F.concat(
                    F.lit("b:"),
                    F.element_at(toks, i),
                    F.lit(" "),
                    F.element_at(toks, i + 1),
                )
            )
        ),
    )
    zero = F.lit(0).cast("long")
    milli_sum = F.aggregate(uni_w, zero, lambda a, x: a + x) + F.when(
        n > 1, F.aggregate(bi_w, zero, lambda a, x: a + x)
    ).otherwise(zero)
    n_features = (n + F.greatest(n - 1, F.lit(0))).cast("long")
    logit = milli_sum.cast("double") / 1000.0 / n_features
    score = 1.0 / (1.0 + F.exp(-logit))
    return df.select(
        F.col(id_col),
        n_features.alias("n_features"),
        milli_sum.cast("long").alias("milliweight_sum"),
        score.alias("clf_score"),
        (score >= 0.5).alias("clf_keep"),
    )
