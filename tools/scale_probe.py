"""Scale-stress probe: the driver's documents/embeddings tables are
fixed at 500 rows, so this synthesizes larger corpora deterministically
and measures how the dedup/ANN operators scale. Results → PERF.md.

Usage: python tools/scale_probe.py [--sizes 5000,20000,80000]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def synth_docs(spark, base_docs, n_target: int):
    """Deterministic corpus expansion: each replica drops a different
    hash-selected ~1/3 of tokens and appends a unique token, so replicas
    of one document are NOT near-duplicates of each other (keeps the
    LSH candidate count realistic instead of quadratic)."""
    n_base = base_docs.count()
    replicas = (n_target + n_base - 1) // n_base
    r = base_docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "replica")
    )
    toks = F.split(F.col("text"), " ")
    kept = F.filter(
        toks,
        lambda t: F.pmod(
            F.hash(F.concat(t, F.lit(":"), F.col("doc_id"), F.lit(":"), F.col("replica"))),
            F.lit(3),
        )
        != 0,
    )
    text = F.concat_ws(
        " ",
        F.concat_ws(" ", kept),
        F.concat(F.lit("uid"), F.col("doc_id"), F.lit("_"), F.col("replica")),
    )
    return (
        r.select(
            (F.col("doc_id") + F.col("replica") * n_base).alias("doc_id"),
            text.alias("text"),
        )
        .filter(F.col("doc_id") < n_target)
        .repartition(32)
    )


def synth_embeddings(spark, n: int, dim: int = 64):
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.randn(seed=42) .cast("float"),
    )
    # randn(seed) per element would correlate; derive from hash instead
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            (
                F.pmod(F.hash(F.concat(F.col("vec_id"), F.lit(":"), d)), F.lit(10_000))
                / 5_000.0
            )
            - 1.0
        ).cast("float"),
    )
    return df.select("vec_id", vec.alias("embedding"), (F.col("vec_id") % 32).cast("int").alias("label")).repartition(32)


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main():
    sizes = [5000, 20000, 80000]
    if len(sys.argv) > 2 and sys.argv[1] == "--sizes":
        sizes = [int(x) for x in sys.argv[2].split(",")]

    from pyspark.sql import SparkSession

    from kafka_sink_azure_kusto_spark.functions import corpus as C
    from kafka_sink_azure_kusto_spark.functions import dedup as D
    from kafka_sink_azure_kusto_spark.functions import similarity as S
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    results: dict[str, dict[int, float]] = {}
    for n in sizes:
        docs = synth_docs(spark, base, n).cache()
        n_actual = docs.count()
        print(f"--- corpus n={n_actual}")
        results.setdefault("dedup_exact", {})[n] = timed(
            f"dedup_exact@{n}", D.dedup_exact(docs)
        )
        results.setdefault("minhash_lsh", {})[n] = timed(
            f"minhash_lsh@{n}", D.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
        )
        results.setdefault("simhash", {})[n] = timed(
            f"simhash@{n}", D.simhash_pairs(docs, max_hamming=8)
        )
        bench_docs = docs.filter(F.col("doc_id") % 50 == 0)
        results.setdefault("contamination", {})[n] = timed(
            f"contamination@{n}", C.contamination_overlap(docs, bench_docs, n=4)
        )
        results.setdefault("repetition", {})[n] = timed(
            f"repetition@{n}",
            C.repetition_stats(docs.repartition("doc_id"), n=2),
        )
        results.setdefault("chunk_pii", {})[n] = timed(
            f"chunk_pii@{n}",
            C.chunk_documents(docs, chunk_tokens=32, overlap=8).select(
                "doc_id", "chunk_id", C.pii_redact("chunk_text").alias("t")
            ),
        )
        from kafka_sink_azure_kusto_spark.functions.text import quality_score
        from kafka_sink_azure_kusto_spark.operators.prefix_sum import (
            token_budget_select,
        )

        scored = quality_score(docs, "text").select(
            "doc_id",
            F.col("q_tokens").cast("bigint").alias("n_tokens"),
            "quality_score",
        )
        results.setdefault("token_budget", {})[n] = timed(
            f"token_budget@{n}",
            token_budget_select(
                scored,
                order_by=[F.col("quality_score").desc(), F.col("doc_id").asc()],
                token_col="n_tokens",
                budget=n * 20,  # budget grows with the corpus
            ),
        )
        docs.unpersist()

    for n in [10_000, 50_000]:
        emb = synth_embeddings(spark, n).cache()
        emb.count()
        queries = emb.filter(F.col("vec_id") < 50)
        print(f"--- vectors n={n}")
        results.setdefault("ann_bruteforce_50q", {})[n] = timed(
            f"ann_bruteforce@{n}", S.brute_force_topk(emb, queries, k=10)
        )
        results.setdefault("ann_ivf_50q", {})[n] = timed(
            f"ann_ivf@{n}", S.ivf_topk(emb, queries, k=10)
        )
        # recall@10 vs brute force with a real IVF index (nearest-seed
        # assignment + one k-means refinement) across n_probe — the IVF
        # recall knob, measured not guessed. The synthetic vectors are
        # uniform random (worst case for IVF: no cluster structure), so
        # these are floor numbers.
        seeds = emb.filter(F.col("vec_id") < 32).select(
            F.col("vec_id").cast("int").alias("cell"),
            F.col("embedding").alias("centroid"),
        )
        indexed = S.assign_cells(emb, seeds).cache()
        indexed.count()
        cents = S.cell_centroids(indexed, cell_col="cell").cache()
        cents.count()
        q_idx = indexed.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
        truth = S.brute_force_topk(indexed, q_idx, k=10).select(
            "query_id", "neighbor_id"
        ).cache()
        n_truth = truth.count()
        for probe in (1, 2, 4, 8):
            approx = S.ivf_topk(
                indexed, q_idx, k=10, cell_col="cell",
                n_probe=probe, centroids=cents,
            ).select("query_id", "neighbor_id")
            hits = truth.join(approx, ["query_id", "neighbor_id"]).count()
            rec = hits / n_truth
            results.setdefault(f"ann_ivf_recall@10 probe={probe}", {})[n] = rec
            print(f"ann_ivf_recall@10 probe={probe} n={n}: {rec:.3f}")
        # PQ/ADC recall@10: 8 subspaces × 16 codes (codebook from the
        # first 16 vectors), asymmetric distance vs exact brute force.
        cb = S.subvectors(emb.filter(F.col("vec_id") < 16), 8, 8).select(
            "m", F.col("id").alias("code"), F.col("sv").alias("c")
        ).cache()
        cb.count()
        codes = S.pq_encode(emb, cb, num_subspaces=8, sub_len=8).select(
            "vec_id", "m", "code"
        ).cache()
        codes.count()
        t0 = time.perf_counter()
        pq_approx = S.pq_adc_topk(
            codes, emb.filter(F.col("vec_id") < 50), cb,
            num_subspaces=8, sub_len=8, k=10,
        ).select("query_id", "neighbor_id")
        hits = truth.join(pq_approx, ["query_id", "neighbor_id"]).count()
        rec = hits / n_truth
        results.setdefault("ann_pq_adc_recall@10", {})[n] = rec
        print(f"ann_pq_adc_recall@10 n={n}: {rec:.3f} "
              f"({time.perf_counter()-t0:.2f}s)")
        cb.unpersist()
        codes.unpersist()
        truth.unpersist()
        cents.unpersist()
        indexed.unpersist()
        emb.unpersist()

    print("\nRESULTS")
    for op, xs in results.items():
        print(op, {k: round(v, 2) for k, v in xs.items()})


if __name__ == "__main__":
    main()
