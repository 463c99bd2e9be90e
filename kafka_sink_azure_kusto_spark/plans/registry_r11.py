"""Round-11 registry queries — the kNN-graph index lifecycle and coarse
graph-search entry points (VERDICT r10 #3/#4).

- ``streaming_knn_graph_maintenance`` — live incremental maintenance of
  a persisted exact-kNN-graph index through the real streaming engine:
  vector upserts + Kafka NULL tombstones arrive in micro-batches, each
  batch recomputes a BOUNDED frontier (batch ids ∪ reverse neighbors ∪
  displaced nodes) and rewrites only affected adjacency blocks
  (``functions/similarity.knn_graph_upsert``); the gate runs
  ``graph_search_topk`` over the post-stream graph and grades it
  against a rebuilt-from-scratch oracle with integer parity.
- ``graph_entry_strategy_audit`` — stride-sample vs centroid-medoid
  entry points at equal rounds×beam, graded as exact integer hit
  counts against brute-force ground truth.

Reference parity note: the reference sink has no ANN surface
(kafka-sink-azure-kusto is a delivery connector); these are north-star
additions per SURVEY §7.3.6, with DuckDB oracles generated from the
same parameters as the Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.plans.registry import _drain_stream, register
from kafka_sink_azure_kusto_spark.plans.registry_r10 import _cos
from kafka_sink_azure_kusto_spark.sources.tables import load_table

# ---------------------------------------------------------------------
# streaming kNN-graph maintenance

_KG_K = 4          # adjacency degree of the maintained graph
_KG_BLOCKS = 8     # adjacency partitions (block = src % _KG_BLOCKS)
_KG_ROUNDS = 2
_KG_BEAM = 4
_KG_TOPK = 10
_KG_ENTRY = 50     # entry points: vec_id % 50 == 0


def _graph_rounds_sql(
    prefix: str,
    entries_cte: str,
    rounds: int,
    beam: int,
    und_cte: str = "und",
    q_cte: str = "xq",
    vec_cte: str = "e",
) -> str:
    """Unrolled beam-search CTEs over an undirected edge CTE —
    parameterized twin of registry_r10's ``_search_rounds_sql`` so the
    r11 oracles (different corpus CTEs, per-query entry sets) generate
    from the same loop as the Spark search. ``entries_cte`` must yield
    (qid, nid) start pairs."""
    p = prefix
    parts = [f"""
    {p}s0 AS MATERIALIZED (
        SELECT en.qid, en.nid, {_cos(f"{q_cte}.qv", "n.v")} AS score
        FROM {entries_cte} en
        JOIN {vec_cte} n ON en.nid = n.nid
        JOIN {q_cte} ON en.qid = {q_cte}.qid),
    {p}vis0 AS MATERIALIZED (SELECT qid, nid, score FROM {p}s0)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""
    {p}f{r} AS MATERIALIZED (SELECT qid, nid FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, nid ASC) AS br
        FROM {p}s{r - 1}) WHERE br <= {beam}),
    {p}c{r} AS MATERIALIZED (SELECT DISTINCT f.qid, u.dst AS nid
             FROM {p}f{r} f JOIN {und_cte} u ON f.nid = u.src
             WHERE NOT EXISTS (SELECT 1 FROM {p}vis{r - 1} vv
                               WHERE vv.qid = f.qid AND vv.nid = u.dst)),
    {p}s{r} AS MATERIALIZED (
        SELECT c.qid, c.nid, {_cos(f"{q_cte}.qv", "n.v")} AS score
        FROM {p}c{r} c JOIN {vec_cte} n ON c.nid = n.nid
                     JOIN {q_cte} ON c.qid = {q_cte}.qid),
    {p}vis{r} AS MATERIALIZED (SELECT qid, nid, score FROM {p}vis{r - 1}
               UNION ALL
               SELECT qid, nid, score FROM {p}s{r})""")
    return ",".join(parts)


# Final-state corpus after the two maintenance batches (same fixture
# algebra as streaming_ivf_index_maintenance): vec_id % 15 == 0 deleted;
# vec_id % 9 == 0 at +1.0/dim; everything else original.
_KG_STATE_SQL = """
    e AS MATERIALIZED (
      SELECT vec_id AS nid,
             CASE WHEN vec_id % 9 = 0
                  THEN list_transform(embedding::DOUBLE[], x -> x + 1.0)
                  ELSE embedding::DOUBLE[] END AS v
      FROM embeddings WHERE vec_id % 15 <> 0)
"""

# rebuilt-from-scratch exact kNN graph over the final corpus, then the
# undirected expansion substrate the search hops over
_KG_EDGES_SQL = f"""
    gk AS MATERIALIZED (SELECT src, dst FROM (
        SELECT a.nid AS src, b.nid AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.nid
                                  ORDER BY {_cos("a.v", "b.v")} DESC,
                                           b.nid ASC) AS rk
        FROM e a JOIN e b ON a.nid <> b.nid) WHERE rk <= {_KG_K}),
    und AS MATERIALIZED (SELECT src, dst FROM gk
                         UNION
                         SELECT dst AS src, src AS dst FROM gk)
"""


def _run_knn_graph_stream_loop(
    spark: SparkSession, sf_dir: str, stats: dict | None = None
) -> DataFrame:
    """Engine of ``streaming_knn_graph_maintenance``; ``stats`` (tests)
    records per-epoch frontier sizes and affected/emptied blocks."""
    import os

    from kafka_sink_azure_kusto_spark.functions.similarity import (
        knn_graph_build_exact,
        knn_graph_upsert,
    )
    from kafka_sink_azure_kusto_spark.plans.registry import _workdir
    from kafka_sink_azure_kusto_spark.plans.registry_streaming2 import (
        _stage_chunks,
    )

    work = _workdir("stream_knng_")
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    vec_dir = os.path.join(work, "vecs")
    graph_dir = os.path.join(work, "graph")
    from kafka_sink_azure_kusto_spark.functions.parallelism import (
        run_concurrently,
    )

    # checkpoint the seed ONCE before forking (VERDICT r14 #1): the r14
    # overlap had both thunks scan the same LAZY filter concurrently,
    # so the cheap store write contended with the all-pairs graph
    # build for the same scan instead of sharing a materialized frame
    seed = dbl.filter(F.col("vec_id") % 3 == 0).localCheckpoint()
    # seed vector store and seed exact graph are independent writes —
    # overlap them (guide §2.6); on-disk state unchanged
    run_concurrently(
        lambda: seed.withColumn(
            "block", (F.col("vec_id") % _KG_BLOCKS).cast("int")
        ).write.partitionBy("block").parquet(vec_dir),
        lambda: knn_graph_build_exact(
            seed, k=_KG_K, vec_col="v", n_blocks=_KG_BLOCKS
        ).write.partitionBy("block").parquet(graph_dir),
    )

    plus1 = F.expr("transform(v, x -> x + CAST(1.0 AS DOUBLE))")
    b0 = (
        dbl.filter(F.col("vec_id") % 3 == 1)
        .unionByName(
            dbl.filter(F.col("vec_id") % 9 == 0).withColumn("v", plus1)
        )
        .withColumn("seq", F.lit(0))
    )
    b1 = (
        dbl.filter(F.col("vec_id") % 3 == 2)
        .unionByName(
            dbl.filter(F.col("vec_id") % 15 == 0).withColumn(
                "v", F.lit(None).cast("array<double>")
            )
        )
        .withColumn("seq", F.lit(1))
    )
    chunks = [
        [
            r[0]
            for r in b.select(
                F.to_json(F.struct("vec_id", "v", "seq"))
            ).collect()
        ]
        for b in (b0, b1)
    ]
    replay = os.path.join(work, "replay")
    _stage_chunks(chunks, replay)

    from kafka_sink_azure_kusto_spark.functions.similarity import (
        graph_search_topk,
    )

    probes_dir = os.path.join(work, "probes")

    def upsert_and_probe(batch_df, epoch_id: int) -> None:
        mb = batch_df.sparkSession
        st = knn_graph_upsert(
            batch_df, graph_dir, vec_dir,
            k=_KG_K, n_blocks=_KG_BLOCKS,
            id_col="vec_id", vec_col="v", seq_col="seq",
        )
        # serve BETWEEN batches off the updated on-disk index —
        # epoch-keyed overwrite so a micro-batch retry rewrites its
        # own directory (the exactly-once recipe the IVF loop uses)
        corpus = mb.read.parquet(vec_dir).select("vec_id", "v")
        edges = mb.read.parquet(graph_dir).select("src", "dst")
        graph_search_topk(
            corpus, corpus.filter(F.col("vec_id") < 8), edges,
            k=_KG_TOPK, rounds=_KG_ROUNDS, beam=_KG_BEAM,
            entry_stride=_KG_ENTRY, vec_col="v", query_vec_col="v",
        ).write.mode("overwrite").parquet(
            os.path.join(probes_dir, f"epoch={int(epoch_id)}")
        )
        if stats is not None:
            stats[int(epoch_id)] = st

    stream = (
        spark.readStream.schema("vec_id long, v array<double>, seq int")
        .option("maxFilesPerTrigger", 1)
        .json(replay)
    )
    q = (
        stream.writeStream.foreachBatch(upsert_and_probe)
        .option("checkpointLocation", os.path.join(work, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    _drain_stream(q, 180)

    res = spark.read.parquet(probes_dir)
    last = res.groupBy().agg(F.max("epoch").alias("epoch"))
    return res.join(F.broadcast(last), "epoch").select(
        "query_id", "neighbor_id", "score", "rank"
    )


@register(
    "streaming_knn_graph_maintenance",
    f"""
    WITH {_KG_STATE_SQL},
    {_KG_EDGES_SQL},
    xq AS MATERIALIZED (SELECT nid AS qid, v AS qv FROM e WHERE nid < 8),
    xen AS MATERIALIZED (SELECT xq.qid, n.nid FROM xq
                         CROSS JOIN (SELECT nid FROM e
                                     WHERE nid % {_KG_ENTRY} = 0) n),
    {_graph_rounds_sql("x", "xen", _KG_ROUNDS, _KG_BEAM)}
    SELECT qid AS query_id, nid AS neighbor_id,
           ROUND(score, 6) AS score, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT qid, nid, score,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY score DESC, nid ASC) AS rnk
          FROM xvis{_KG_ROUNDS} WHERE nid <> qid)
    WHERE rnk <= {_KG_TOPK}
    """,
)
def streaming_knn_graph_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LIVE kNN-graph index maintenance through the real streaming
    engine (VERDICT r10 #3 — the graph twin of
    ``streaming_ivf_index_maintenance``): micro-batches of vector
    upserts + NULL tombstones arrive over a block-partitioned exact-kNN
    adjacency; each batch recomputes ONLY the bounded frontier (batch
    ids ∪ reverse neighbors ∪ displaced nodes — nodes whose stored k-th
    score an incoming vector beats) and rewrites only affected
    adjacency blocks (`functions/similarity.knn_graph_upsert`, dynamic
    partition overwrite, last-write-wins within a batch, emptied blocks
    removed), then SERVES a ``graph_search_topk`` probe off the updated
    on-disk index between batches (epoch-keyed overwrite — the same
    serve-while-maintaining shape as the IVF loop). Gate = the FINAL
    probe vs an oracle that rebuilds the kNN graph FROM SCRATCH on the
    final corpus and replays the identical unrolled beam search — a
    stale adjacency row, missed tombstone edge, or unrecomputed
    displaced node changes the walked topology and flips the value
    hash."""
    return _run_knn_graph_stream_loop(spark, sf_dir)


# ---------------------------------------------------------------------
# graph-search entry strategy audit

_ES_QMOD = 25      # queries: vec_id % 25 == 7 (DISJOINT from any entry
_ES_QOFF = 7       # id set — %25==0 would make half the queries their
#                    own entry points and grade self-discovery, not the
#                    strategy; measured live while building this audit)
_ES_CELLS = 3      # centroid strategy: 3 nearest cells' medoids
_ES_K = 3          # graded against exact top-3
_ES_GK = 6         # exact-kNN edge degree of the search substrate
_ES_ROUNDS = 3
_ES_BEAM = 4
_ES_BOOST = 2.0    # planted cluster separation (see _ES_BASE_SQL)


# The corpus: embeddings with PLANTED label-aligned cluster structure —
# component j gets +boost where j % 10 == label. The raw synthetic
# embeddings are near-isotropic (measured: only ~7% of exact top-3
# neighbors share the nearest-centroid cell), and no coarse quantizer
# can navigate structure that isn't there; real embedding corpora are
# strongly clustered, which is the regime this audit grades. The
# transform is closed-form per row, so both engines derive the SAME
# corpus independently. Entry budget: the stride arm uses
# n/10 ≈ 10 entries (corpus-size-relative, like the r10 search's
# stride sample); the centroid arm uses 3 medoids.
_ES_BASE_SQL = f"""
    e AS MATERIALIZED (
      SELECT vec_id AS nid, label,
             list_transform(range(1, len(embedding) + 1),
                            i -> embedding[i]::DOUBLE
                                 + CASE WHEN (i - 1) % 10 = label
                                        THEN {_ES_BOOST} ELSE 0.0 END) AS v
      FROM embeddings),
    gk AS MATERIALIZED (SELECT src, dst FROM (
        SELECT a.nid AS src, b.nid AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.nid
                                  ORDER BY {_cos("a.v", "b.v")} DESC,
                                           b.nid ASC) AS rk
        FROM e a JOIN e b ON a.nid <> b.nid) WHERE rk <= {_ES_GK}),
    und AS MATERIALIZED (SELECT src, dst FROM gk
                         UNION
                         SELECT dst AS src, src AS dst FROM gk),
    xq AS MATERIALIZED (SELECT nid AS qid, v AS qv FROM e
                        WHERE nid % {_ES_QMOD} = {_ES_QOFF}),
    sen AS MATERIALIZED (SELECT xq.qid, n.nid FROM xq
                         CROSS JOIN (SELECT nid FROM e
                                     WHERE nid % (SELECT COUNT(*) // 10
                                                  FROM e) = 0) n),
    pd AS (SELECT label AS cell, unnest(range(1, len(v) + 1)) AS i, v
           FROM e),
    cd AS (SELECT cell, i, AVG(v[i]) AS m FROM pd GROUP BY cell, i),
    cent AS MATERIALIZED (SELECT cell,
                                 list(round(m, 6) ORDER BY i) AS centroid
                          FROM cd GROUP BY cell),
    med AS MATERIALIZED (SELECT cell, nid FROM (
        SELECT c.cell, e.nid,
               ROW_NUMBER() OVER (PARTITION BY c.cell
                                  ORDER BY {_cos("e.v", "c.centroid")} DESC,
                                           e.nid ASC) AS mr
        FROM e JOIN cent c ON e.label = c.cell) WHERE mr <= 1),
    cen AS MATERIALIZED (SELECT qid, nid FROM (
        SELECT xq.qid, med.nid,
               ROW_NUMBER() OVER (PARTITION BY xq.qid
                                  ORDER BY {_cos("xq.qv", "c.centroid")} DESC,
                                           c.cell ASC) AS cr
        FROM xq CROSS JOIN cent c JOIN med ON med.cell = c.cell)
        WHERE cr <= {_ES_CELLS})
"""


@register(
    "graph_entry_strategy_audit",
    f"""
    WITH {_ES_BASE_SQL},
    {_graph_rounds_sql("st", "sen", _ES_ROUNDS, _ES_BEAM)},
    {_graph_rounds_sql("ct", "cen", _ES_ROUNDS, _ES_BEAM)},
    gt AS MATERIALIZED (SELECT qid, nid FROM (
        SELECT xq.qid, c.nid,
               ROW_NUMBER() OVER (PARTITION BY xq.qid
                                  ORDER BY {_cos("xq.qv", "c.v")} DESC,
                                           c.nid ASC) AS rnk
        FROM xq JOIN e c ON c.nid <> xq.qid) WHERE rnk <= {_ES_K}),
    tot AS (SELECT COUNT(*) AS n_possible FROM gt),
    sres AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY score DESC, nid ASC) AS rnk
        FROM stvis{_ES_ROUNDS} WHERE nid <> qid) WHERE rnk <= {_ES_K}),
    cres AS (SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY score DESC, nid ASC) AS rnk
        FROM ctvis{_ES_ROUNDS} WHERE nid <> qid) WHERE rnk <= {_ES_K}),
    sn AS (SELECT COUNT(*) AS n_candidates FROM stvis{_ES_ROUNDS}
           WHERE nid <> qid),
    cn AS (SELECT COUNT(*) AS n_candidates FROM ctvis{_ES_ROUNDS}
           WHERE nid <> qid),
    sh AS (SELECT COUNT(*) AS n_hits FROM gt
           WHERE EXISTS (SELECT 1 FROM sres r
                         WHERE r.qid = gt.qid AND r.nid = gt.nid)),
    ch AS (SELECT COUNT(*) AS n_hits FROM gt
           WHERE EXISTS (SELECT 1 FROM cres r
                         WHERE r.qid = gt.qid AND r.nid = gt.nid))
    SELECT 'entry_stride' AS strategy, sn.n_candidates, sh.n_hits,
           tot.n_possible,
           ROUND(sh.n_hits / CAST(tot.n_possible AS DOUBLE), 6) AS recall
    FROM sn, sh, tot
    UNION ALL
    SELECT 'entry_centroid' AS strategy, cn.n_candidates, ch.n_hits,
           tot.n_possible,
           ROUND(ch.n_hits / CAST(tot.n_possible AS DOUBLE), 6) AS recall
    FROM cn, ch, tot
    """,
)
def graph_entry_strategy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-point strategy audit for graph search (VERDICT r10 #4):
    the SAME exact-kNN edge substrate and the SAME rounds×beam budget,
    searched twice — once from the blind ``vec_id % stride`` sample,
    once from ``centroid_entry_points`` (per query: the medoids of its
    {_ES_CELLS} nearest cells — the HNSW-upper-layer role). Graded as
    exact integer hit counts against brute-force top-{_ES_K} ground
    truth, with the measured candidate budget in the result so "equal
    budget" is a column, not prose. The centroid strategy starts the
    beam inside the right neighborhood and reaches equal-or-better
    recall from a FRACTION of the entry candidates."""
    from kafka_sink_azure_kusto_spark.functions.similarity import (
        brute_force_topk,
        centroid_entry_points,
        knn_graph_build_exact,
        graph_search_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dbl = emb.select(
        "vec_id", "label",
        F.expr(
            "transform(embedding, (x, j) -> CAST(x AS DOUBLE) + "
            f"CASE WHEN j % 10 = label THEN CAST({_ES_BOOST} AS DOUBLE) "
            "ELSE CAST(0.0 AS DOUBLE) END)"
        ).alias("v"),
    )
    from kafka_sink_azure_kusto_spark.functions.parallelism import (
        run_concurrently,
    )

    queries = dbl.filter(F.col("vec_id") % _ES_QMOD == _ES_QOFF)
    # entry budget ~10 regardless of corpus size (both engines derive
    # the stride from the same COUNT); substrate, ground truth, and
    # count are independent materializations — overlap them (guide
    # §2.6), values unchanged
    (n_dbl, edges, gt) = run_concurrently(
        lambda: dbl.count(),
        lambda: knn_graph_build_exact(
            dbl, k=_ES_GK, vec_col="v", n_blocks=_KG_BLOCKS
        ).select("src", "dst").localCheckpoint(),
        lambda: brute_force_topk(
            dbl, queries, k=_ES_K, vec_col="v", query_vec_col="v"
        ).select(
            F.col("query_id").alias("qid"), F.col("neighbor_id").alias("nid")
        ).localCheckpoint(),
    )
    stride = max(1, n_dbl // 10)
    tot = gt.agg(F.count(F.lit(1)).alias("n_possible"))

    def arm(name: str, entries: DataFrame | None) -> DataFrame:
        vis = (
            graph_search_topk(
                dbl, queries, edges,
                rounds=_ES_ROUNDS, beam=_ES_BEAM, entry_stride=stride,
                vec_col="v", query_vec_col="v",
                return_visited=True, entries=entries,
            )
            .filter(F.col("nid") != F.col("query_id"))
            .select(F.col("query_id").alias("qid"), "nid", "score")
            .localCheckpoint()
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("nid").asc()
        )
        res = (
            vis.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _ES_K)
            .select("qid", "nid")
        )
        hits = gt.join(res, ["qid", "nid"], "left_semi").agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        n_cand = vis.agg(F.count(F.lit(1)).alias("n_candidates"))
        return (
            n_cand.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(name).alias("strategy"),
                "n_candidates", "n_hits", "n_possible",
                F.round(F.col("n_hits") / F.col("n_possible"), 6)
                .alias("recall"),
            )
        )

    cent_entries = centroid_entry_points(
        dbl, queries, n_entry_cells=_ES_CELLS,
        cell_col="label", vec_col="v", query_vec_col="v",
        centroid_round=6,  # both engines rank against 6-dp centroids
    )
    # the two searched arms are independent barrier chains — overlap
    stride_row, cent_row = run_concurrently(
        lambda: arm("entry_stride", None),
        lambda: arm("entry_centroid", cent_entries),
    )
    return stride_row.unionByName(cent_row)


# ---------------------------------------------------------------------
# tokenize-to-IDs end-to-end: fixed context windows (VERDICT r10 #6)

_W_CTX = 128                 # context window length (tokens per window)
_W_EOS = 256 + 1             # vocab ids 0..255, unk=256, EOS=257
_W_PAD = 256 + 2             # trailing-window padding id


def _bpe_pack_windows_sql() -> str:
    """Generated oracle for ``bpe_pack_token_windows``: the shared BPE
    merge CTEs + vocab/id CTEs (identical chain to ``bpe_encode_corpus``
    — one spec, three consumers), then the window algebra: per-shard
    doc start offsets by prefix sum of (n_tokens + 1 EOS), a token
    stream with global positions, EOS rows appended per document, and
    fixed ``_W_CTX``-token windows fingerprinted WITH their padding."""
    from kafka_sink_azure_kusto_spark.plans.registry_r5b import (
        _BPE_BATCH,
        _BPE_ROUNDS,
        _BPE_VOCAB_K,
        _bpe_merge_ctes,
    )

    ctes, final = _bpe_merge_ctes(_BPE_ROUNDS, _BPE_BATCH)
    k = _BPE_VOCAB_K
    ctes += [
        f"vt AS (SELECT doc_id, string_split(trim(txt), ' ') AS ws FROM {final})",
        "vc AS (SELECT tok, COUNT(*) AS cnt FROM "
        "(SELECT unnest(ws) AS tok FROM vt) GROUP BY tok)",
        f"vocab AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) - 1 "
        f"AS tid FROM vc ORDER BY cnt DESC, tok ASC LIMIT {k})",
        "tp AS (SELECT doc_id, ws[pos + 1] AS tok, pos FROM "
        "(SELECT doc_id, ws, unnest(range(0, len(ws))) AS pos FROM vt))",
        f"ti AS (SELECT tp.doc_id, tp.pos, COALESCE(v.tid, {k}) AS tid "
        "FROM tp LEFT JOIN vocab v ON tp.tok = v.tok)",
        "st AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard, "
        "COUNT(*) AS nt FROM ti GROUP BY doc_id)",
        "spre AS (SELECT doc_id, shard, nt, "
        "COALESCE(SUM(nt + 1) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt "
        "FROM st)",
        f"stream AS (SELECT spre.shard, spre.strt + ti.pos AS gpos, ti.tid "
        "FROM ti JOIN spre ON ti.doc_id = spre.doc_id "
        "UNION ALL "
        f"SELECT shard, strt + nt AS gpos, {_W_EOS} AS tid FROM spre)",
        f"win AS (SELECT shard, CAST(gpos // {_W_CTX} AS BIGINT) AS window_id, "
        f"gpos % {_W_CTX} AS wpos, tid FROM stream)",
        "agg AS (SELECT shard, window_id, CAST(COUNT(*) AS BIGINT) AS n_real, "
        "string_agg(tid::VARCHAR, ',' ORDER BY wpos) AS idstr "
        "FROM win GROUP BY shard, window_id)",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT shard, window_id, n_real,
           CAST({_W_CTX} - n_real AS BIGINT) AS n_pad,
           md5(idstr || repeat(',{_W_PAD}', {_W_CTX} - n_real)) AS ids_fp
    FROM agg"""
    )


@register("bpe_pack_token_windows", _bpe_pack_windows_sql())
def bpe_pack_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the tokenizer story (VERDICT r10 #6): train BPE merges
    (same batched loop as ``bpe_iterative_merges``), encode every doc to
    ``array<int>`` ids (same vocab rule as ``bpe_encode_corpus`` — count
    DESC / token ASC → ids 0..255, unk=256), then materialize the
    artifact a trainer actually consumes: documents concatenated per
    shard in doc_id order with an EOS id (257) after every document,
    chopped into FIXED {_W_CTX}-token context windows, the trailing
    partial window padded with PAD (258). The md5 fingerprint covers
    every id of every window INCLUDING padding, so window boundaries,
    in-window order, EOS placement, and pad counts are all value-hashed
    against the oracle's independent CTE replay.

    Scale shape: encode is zero-shuffle (literal replace chain + map);
    the window assembly is a per-token posexplode (linear, fixed-width
    (shard, gpos, tid) rows), ONE per-shard prefix-sum window over doc
    counts, and ONE shuffle keyed (shard, window_id) — windows are
    fixed-size by construction, so the assembly groups are skew-free
    regardless of document length distribution. A 100 TB corpus packs
    with the same plan: the token stream never concentrates, and no
    stage holds more than a window's ids per group."""
    from kafka_sink_azure_kusto_spark.functions.corpus import bpe_encode
    from kafka_sink_azure_kusto_spark.functions.parallelism import (
        ensure_min_parallelism,
    )
    from kafka_sink_azure_kusto_spark.plans.registry_r5b import (
        _BPE_VOCAB_K,
        _train_bpe_merges,
    )

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    merges = _train_bpe_merges(docs)
    from kafka_sink_azure_kusto_spark.functions.corpus import bpe_apply_merges

    merged_toks = F.split(F.trim(bpe_apply_merges("text", merges)), " ")
    vocab_rows = (
        docs.select(F.explode(merged_toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_BPE_VOCAB_K)
        .collect()
    )
    vocab = {r["tok"]: i for i, r in enumerate(vocab_rows)}
    enc = bpe_encode(docs, merges, vocab, unk_id=_BPE_VOCAB_K)
    # shared window contract (functions/corpus.pack_token_windows) —
    # the unigram-LM packer emits the identical shard/window algebra
    from kafka_sink_azure_kusto_spark.functions.corpus import (
        pack_token_windows,
    )

    return pack_token_windows(enc, _W_CTX, _W_EOS, _W_PAD)


# ---------------------------------------------------------------------
# JPEG decode gate (r11): baseline JPEG is LOSSY, so unlike BMP/PPM/PNG
# it cannot join the content-stat value-hash gates (no SQL replays DCT
# rounding). The gate splits the contract: GEOMETRY (width/height/
# sample count — exact, closed-form from doc_id) is oracle-hashed,
# while CONTENT sanity (decoded mean within ±2.0 of the source mean —
# JPEG preserves block DC terms) is asserted INSIDE the kernel, so a
# broken Huffman walk / IDCT / color transform fails the gate as an
# error even though the oracle never sees pixel values.


def _jpeg_geom(doc_id: int) -> tuple[int, int]:
    return 8 + (doc_id % 5) * 4, 8 + (doc_id % 3) * 4


@register(
    "multimodal_jpeg_decode_gate",
    """
    SELECT doc_id,
           'jpeg' AS media_type,
           CAST(8 + (doc_id % 5) * 4 AS BIGINT) AS width,
           CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS height,
           CAST(3 * (8 + (doc_id % 5) * 4) * (8 + (doc_id % 3) * 4)
                AS BIGINT) AS n_samples
    FROM documents
    """,
)
def multimodal_jpeg_decode_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: synthesize a deterministic JPEG (same per-pixel
    arithmetic series as the BMP/PPM/PNG fixtures, quality 90, 4:4:4),
    decode it through the SAME magic-byte dispatch the production
    decode path uses, assert the lossy-content sanity bound in the
    kernel, emit exact geometry. One Arrow-batched mapInPandas pass, no
    shuffle (`functions/jpeg.py`)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_sink_azure_kusto_spark.functions.codecs import (
        decode_media_bytes,
    )
    from kafka_sink_azure_kusto_spark.functions.jpeg import encode_jpeg
    from kafka_sink_azure_kusto_spark.functions.parallelism import (
        ensure_min_parallelism,
    )

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_samples", LongType(), False),
    ])

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {"doc_id": [], "media_type": [], "width": [],
                "height": [], "n_samples": []}
        for pdf in it:
            for d in pdf["doc_id"]:
                doc = int(d)
                w, h = _jpeg_geom(doc)
                i = np.arange(w * h, dtype=np.int64)
                rgb = np.empty(3 * w * h, dtype=np.int64)
                rgb[0::3] = (doc * 31 + i * 7) % 256
                rgb[1::3] = (doc * 37 + i * 11) % 256
                rgb[2::3] = (doc * 41 + i * 13) % 256
                # half the docs emit PROGRESSIVE streams (r11 — the
                # dominant web-JPEG form); coefficients are identical
                # either way, so the mean bound below is form-agnostic
                m = decode_media_bytes(
                    encode_jpeg(
                        w, h, rgb, quality=90, progressive=(doc % 2 == 1)
                    )
                )
                if abs(float(m.samples.mean()) - float(rgb.mean())) > 2.0:
                    raise ValueError(
                        f"jpeg content drift for doc {doc}: decoded mean "
                        f"{m.samples.mean():.2f} vs source {rgb.mean():.2f}"
                    )
                rows["doc_id"].append(doc)
                rows["media_type"].append(m.media_type)
                rows["width"].append(m.width)
                rows["height"].append(m.height)
                rows["n_samples"].append(int(m.samples.size))
        yield pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "media_type": rows["media_type"],
            "width": pd.Series(rows["width"], dtype="int64"),
            "height": pd.Series(rows["height"], dtype="int64"),
            "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
        })

    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(body, schema=schema)


# ---------------------------------------------------------------------
# corpus shard manifest (r11): the reproducibility artifact a 100 TB
# release ships NEXT TO the data card — per shard, an ORDER-SENSITIVE
# hash over the member documents' content fingerprints, so a
# re-materialized shard can be verified bit-for-bit without re-reading
# any other shard. Complements corpus_data_card (per-source summary
# stats): the card says what's in the corpus, the manifest proves a
# copy of shard k IS shard k.

_MANIFEST_SHARDS = 16


@register(
    "corpus_shard_manifest",
    f"""
    WITH per AS (
      SELECT CAST(doc_id % {_MANIFEST_SHARDS} AS INT) AS shard,
             doc_id, md5(text) AS fp, length(text) AS n_chars
      FROM documents)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           md5(string_agg(fp, ',' ORDER BY doc_id)) AS manifest_hash
    FROM per GROUP BY shard
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard release manifest: member count, char volume, id range,
    and md5 over the doc_id-ordered concatenation of per-document
    content fingerprints. One scan computes per-doc facts; ONE shuffle
    keyed by the shard; the collect_list is bounded by shard size (a
    production manifest shards to bound this by construction). Hash is
    ORDER-SENSITIVE on purpose — a shuffled copy of the same documents
    is a different artifact."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        (F.col("doc_id") % _MANIFEST_SHARDS).cast("int").alias("shard"),
        "doc_id",
        F.md5("text").alias("fp"),
        F.length("text").cast("long").alias("n_chars"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id").alias("d"), F.col("fp").alias("f")))
    )
    return per.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.md5(
            F.array_join(F.transform(ordered, lambda s: s["f"]), ",")
        ).alias("manifest_hash"),
    )
