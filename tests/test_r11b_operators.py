"""Independent-implementation tests for the round-11 second wave
(plans/registry_r11b.py): every numeric claim is recomputed in plain
numpy/pandas/python from the parquet fixtures — no DuckDB, no shared
CTE text — so a bug that slipped past the oracle's shared constants
would still be caught here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_sink_azure_kusto_spark.plans import queries

Q = queries()


def _emb(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _li(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


# ---------------------------------------------------------------- MIH


def _sign_words(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    bits = (vecs > 0).astype(np.int64)
    pows = 1 << np.arange(32, dtype=np.int64)
    return bits[:, :32] @ pows, bits[:, 32:] @ pows


def test_binary_hamming_matches_numpy(spark, sf_dir):
    """Full pipeline replay in numpy: sign-bit words, 8×8-bit subword
    candidate generation, Hamming top-32, exact-cosine top-10."""
    emb = _emb(sf_dir).sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    w0, w1 = _sign_words(np.stack(emb["embedding"].to_numpy()))

    def subwords(a0, a1):
        return [(a0 >> (8 * i)) & 255 for i in range(4)] + [
            (a1 >> (8 * i)) & 255 for i in range(4)
        ]

    sub = np.stack(subwords(w0, w1), axis=1)  # (n, 8)
    qmask = ids % 125 == 3
    expect = []
    for qi in np.where(qmask)[0]:
        cand = np.where(
            (sub == sub[qi]).any(axis=1) & (ids != ids[qi])
        )[0]
        ham = np.array(
            [
                bin(int(w0[c] ^ w0[qi])).count("1")
                + bin(int(w1[c] ^ w1[qi])).count("1")
                for c in cand
            ]
        )
        order = np.lexsort((ids[cand], ham))[:32]
        top = cand[order]
        qv = vecs[qi]
        cos = (vecs[top] @ qv) / (
            np.linalg.norm(vecs[top], axis=1) * np.linalg.norm(qv)
        )
        rer = np.lexsort((ids[top], -cos))[:10]
        for rnk, t in enumerate(rer, 1):
            expect.append(
                (
                    int(ids[qi]),
                    int(ids[top[t]]),
                    int(ham[order[t]]),
                    round(float(cos[t]), 6),
                    rnk,
                )
            )
    got = sorted(
        tuple(r)
        for r in Q["similarity_binary_hamming_topk"](spark, sf_dir)
        .toPandas()
        .itertuples(index=False)
    )
    assert got == sorted(expect)


def test_mih_pigeonhole_radius():
    """The candidate-generation guarantee the docstring claims: any two
    64-bit codes within Hamming distance < 8 share at least one of the
    8 exact 8-bit subwords (pigeonhole over the subword partition)."""
    rng = np.random.RandomState(7)
    for _ in range(200):
        a = rng.randint(0, 2, 64)
        b = a.copy()
        flips = rng.choice(64, size=rng.randint(0, 8), replace=False)
        b[flips] ^= 1
        shared = any(
            np.array_equal(a[8 * i : 8 * i + 8], b[8 * i : 8 * i + 8])
            for i in range(8)
        )
        assert shared, f"distance {len(flips)} pair with no shared subword"


# ------------------------------------------------------ triangle count


def _copurchase_edges(li: pd.DataFrame) -> set[tuple[int, int]]:
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    return edges


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    li = _li(sf_dir)
    edges = _copurchase_edges(li)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri_per: dict[int, int] = {}
    total = 0
    for a, b in edges:
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # a < b < c: count each triangle once
                total += 1
                for n in (a, b, c):
                    tri_per[n] = tri_per.get(n, 0) + 1
    got = (
        Q["graph_triangle_count"](spark, sf_dir)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert (got["total_triangles"] == total).all()
    expect = sorted(tri_per.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["node"], got["n_triangles"])) == expect


# ----------------------------------------------------- label propagation


def test_label_propagation_matches_python(spark, sf_dir):
    li = _li(sf_dir)
    edges = _copurchase_edges(li)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for m in ns:
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            new[n] = min(counts, key=lambda k: (-counts[k], k))
        lbl = new
    comm: dict[int, list[int]] = {}
    for n, c in lbl.items():
        comm.setdefault(c, []).append(n)
    expect = sorted(
        (c, len(ms), min(ms), max(ms)) for c, ms in comm.items()
    )
    got = sorted(
        tuple(r)
        for r in Q["graph_label_propagation"](spark, sf_dir)
        .toPandas()
        .itertuples(index=False)
    )
    assert got == expect


# -------------------------------------------------------- eval metrics


def test_retrieval_eval_matches_numpy(spark, sf_dir):
    emb = _emb(sf_dir).sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    expect = {}
    for qi in np.where(ids % 50 == 1)[0]:
        cos = (vecs @ vecs[qi]) / (norms * norms[qi])
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], -cos[mask]))[:10]
        run_ids = ids[mask][order]
        rel_mask = labels[mask][order] == labels[qi]
        n_rel = int(((labels == labels[qi]) & mask).sum())
        hits = np.where(rel_mask)[0]
        n_hits = len(hits)
        mrr = 1.0 / (hits[0] + 1) if n_hits else 0.0
        dcg = sum(1.0 / np.log2(r + 2) for r in hits)
        idcg = sum(1.0 / np.log2(i + 2) for i in range(min(10, n_rel)))
        expect[int(ids[qi])] = (
            n_rel,
            n_hits,
            round(n_hits / 10.0, 6),
            round(n_hits / n_rel, 6),
            round(mrr, 6),
            round(dcg / idcg, 6),
        )
        del run_ids
    got = Q["retrieval_eval_metrics"](spark, sf_dir).toPandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        assert expect[r.query_id] == (
            r.n_rel,
            r.n_hits,
            round(r.precision_at_k, 6),
            round(r.recall_at_k, 6),
            round(r.mrr, 6),
            round(r.ndcg, 6),
        )


# ----------------------------------------------------------- hybrid RRF


def test_hybrid_rrf_invariants(spark, sf_dir):
    got = Q["hybrid_retrieval_rrf"](spark, sf_dir).toPandas()
    assert len(got) > 0
    # every fused row came from at least one arm
    assert ((got["lex_rank"] > 0) | (got["dense_rank"] > 0)).all()
    # the fusion arithmetic is exactly Σ 1/(60+rank) over present arms
    rrf = np.where(got["lex_rank"] > 0, 1.0 / (60 + got["lex_rank"]), 0.0)
    rrf = rrf + np.where(
        got["dense_rank"] > 0, 1.0 / (60 + got["dense_rank"]), 0.0
    )
    assert np.allclose(got["rrf_score"], np.round(rrf, 6), atol=1e-9)
    # fused ranks are 1..k contiguous per query, ordered by rrf desc
    for _, grp in got.groupby("query_id"):
        grp = grp.sort_values("fused_rank")
        assert list(grp["fused_rank"]) == list(range(1, len(grp) + 1))
        assert (np.diff(grp["rrf_score"].to_numpy()) <= 1e-12).all()
    # both arms contribute somewhere (the corpus has lexical AND dense
    # structure; a dead arm means a broken join, not a quiet corpus)
    assert (got["lex_rank"] > 0).any() and (got["dense_rank"] > 0).any()


# ---------------------------------------------------- expectation suite


def test_expectation_suite_detects_real_violation(spark, sf_dir):
    """The synthetic fixtures are clean on 8 of 9 checks, and genuinely
    violate ordering(o_orderdate<=l_shipdate) — shipdates are drawn
    unconstrained. The suite must report the exact violation count."""
    li = _li(sf_dir)
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(
        od[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="left",
    )
    expected_time_viol = int((j["o_orderdate"] > j["l_shipdate"]).sum())

    got = Q["expectation_suite_audit"](spark, sf_dir).toPandas()
    assert len(got) == 9
    by_name = got.set_index("check_name")
    t = by_name.loc["ordering(o_orderdate<=l_shipdate)"]
    assert int(t["n_violations"]) == expected_time_viol
    assert int(t["passed"]) == (1 if expected_time_viol == 0 else 0)
    clean = got[got["check_name"] != "ordering(o_orderdate<=l_shipdate)"]
    assert (clean["n_violations"] == 0).all()
    assert (clean["passed"] == 1).all()
    assert (clean["violation_rate"] == 0.0).all()


def test_expectation_suite_row_counts(spark, sf_dir):
    li_n, od_n = len(_li(sf_dir)), len(pd.read_parquet(f"{sf_dir}/orders.parquet"))
    got = Q["expectation_suite_audit"](spark, sf_dir).toPandas()
    assert set(got[got["dataset"] == "lineitem"]["n_rows"]) == {li_n}
    assert set(got[got["dataset"] == "orders"]["n_rows"]) == {od_n}


# ------------------------------------------------- postings compression


def test_inverted_index_compression_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    posts: dict[str, list[int]] = {}
    for r in docs.itertuples(index=False):
        for t in set(r.text.split(" ")):
            posts.setdefault(t, []).append(r.doc_id)

    def vb(g: int) -> int:
        for n, lim in ((1, 128), (2, 16384), (3, 2097152), (4, 268435456)):
            if g < lim:
                return n
        return 5

    rows = []
    for t, ids in posts.items():
        ids = sorted(ids)
        gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        rows.append((t, len(ids), 8 * len(ids), sum(vb(g) for g in gaps)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    expect = [
        (t, n, rb, cb, round(cb / rb, 6), i + 1)
        for i, (t, n, rb, cb) in enumerate(rows[:50])
    ]
    got = [
        (r.term, r.n_postings, r.raw_bytes, r.compressed_bytes,
         round(r.ratio, 6), r.rank)
        for r in Q["inverted_index_compression"](spark, sf_dir)
        .toPandas()
        .sort_values("rank")
        .itertuples(index=False)
    ]
    assert got == expect


# ------------------------------------------------------ KN trigram LM


def test_kneser_ney_matches_python(spark, sf_dir):
    """Independent dict-based interpolated-KN implementation."""
    import math
    from collections import Counter, defaultdict

    D = 0.75
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tris, bis = Counter(), set()
    doc_tris: dict[int, list[tuple[str, str, str]]] = {}
    for r in docs.itertuples(index=False):
        ws = r.text.split(" ")
        doc_tris[r.doc_id] = [
            (ws[i], ws[i + 1], ws[i + 2]) for i in range(len(ws) - 2)
        ]
        tris.update(doc_tris[r.doc_id])
        bis.update((ws[i], ws[i + 1]) for i in range(len(ws) - 1))
    c2, t_after = Counter(), Counter()
    for (w1, w2, w3), c in tris.items():
        c2[(w1, w2)] += c
        t_after[(w1, w2)] += 1
    n_pre = Counter(w2 for _, w2 in bis)        # N1+(·w)
    n_fol = Counter(w1 for w1, _ in bis)        # N1+(w·)
    mid3 = defaultdict(set)
    for w1, w2, w3 in tris:
        mid3[(w2, w3)].add(w1)
    n_pre3 = {k: len(v) for k, v in mid3.items()}
    n_mid = Counter()
    for (w2, _w3), n in n_pre3.items():
        n_mid[w2] += n
    nb = len(bis)

    expect = {}
    for doc_id, ts in doc_tris.items():
        if not ts:
            continue
        lps = []
        for w1, w2, w3 in ts:
            p1 = n_pre[w3] / nb
            p2 = max(n_pre3[(w2, w3)] - D, 0.0) / n_mid[w2] + (
                D * n_fol[w2] / n_mid[w2]
            ) * p1
            p3 = max(tris[(w1, w2, w3)] - D, 0.0) / c2[(w1, w2)] + (
                D * t_after[(w1, w2)] / c2[(w1, w2)]
            ) * p2
            lps.append(math.log(p3))
        expect[doc_id] = (len(lps), round(sum(lps) / len(lps), 6))

    got = Q["text_kneser_ney_trigram_score"](spark, sf_dir).toPandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        n, lp = expect[r.doc_id]
        assert r.n_trigrams == n
        assert abs(r.avg_logprob - lp) < 2e-6, (r.doc_id, r.avg_logprob, lp)


def test_kneser_ney_probabilities_normalize():
    """On a tiny closed corpus, the interpolated-KN distribution over a
    fixed context sums to 1 across the observed vocabulary — the model
    is a proper distribution, not just a score."""
    import math
    from collections import Counter, defaultdict

    D = 0.75
    corpus = [
        "a b c a b d a b c e".split(),
        "b c a b c d e a b c".split(),
    ]
    tris, bis = Counter(), set()
    for ws in corpus:
        tris.update((ws[i], ws[i + 1], ws[i + 2]) for i in range(len(ws) - 2))
        bis.update((ws[i], ws[i + 1]) for i in range(len(ws) - 1))
    c2, t_after = Counter(), Counter()
    for (w1, w2, w3), c in tris.items():
        c2[(w1, w2)] += c
        t_after[(w1, w2)] += 1
    n_pre = Counter(w2 for _, w2 in bis)
    n_fol = Counter(w1 for w1, _ in bis)
    mid3 = defaultdict(set)
    for w1, w2, w3 in tris:
        mid3[(w2, w3)].add(w1)
    n_pre3 = {k: len(v) for k, v in mid3.items()}
    n_mid = Counter()
    for (w2, _w3), n in n_pre3.items():
        n_mid[w2] += n
    nb = len(bis)
    vocab = sorted({w for ws in corpus for w in ws})

    for ctx in [("a", "b"), ("b", "c")]:
        total = 0.0
        for w3 in vocab:
            p1 = n_pre[w3] / nb
            p2 = max(n_pre3.get((ctx[1], w3), 0) - D, 0.0) / n_mid[ctx[1]] + (
                D * n_fol[ctx[1]] / n_mid[ctx[1]]
            ) * p1
            p3 = max(tris.get((*ctx, w3), 0) - D, 0.0) / c2[ctx] + (
                D * t_after[ctx] / c2[ctx]
            ) * p2
            total += p3
        # the unigram continuation layer normalizes over the observed
        # bigram-type vocabulary; Σ P(w|ctx) == 1 up to float error
        assert abs(total - 1.0) < 1e-9, (ctx, total)
        assert math.isfinite(total)


# ------------------------------------------- streaming expectation monitor


def test_streaming_expectation_monitor_matches_batch(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    expect = {
        "completeness(user_id)": int(ev["user_id"].isna().sum()),
        "completeness(props)": int(
            (ev["props"].isna() | (ev["props"] == "")).sum()
        ),
        "range(value,0,500)": int(((ev["value"] < 0) | (ev["value"] > 500)).sum()),
        "in_set(event_type)": int(
            (~ev["event_type"].isin(["click", "view", "purchase", "signup"])).sum()
        ),
    }
    got = Q["streaming_expectation_monitor"](spark, sf_dir).toPandas()
    assert len(got) == 4
    for r in got.itertuples(index=False):
        assert r.n_rows == len(ev)
        assert r.n_violations == expect[r.check_name], r.check_name
        assert r.passed == (1 if r.n_violations == 0 else 0)
    # the monitor must actually detect: 'error' events violate in_set
    assert (
        got.set_index("check_name").loc["in_set(event_type)", "n_violations"]
        > 0
    )


# ------------------------------------------------------- modularity


def test_modularity_matches_python(spark, sf_dir):
    li = _li(sf_dir)
    edges = _copurchase_edges(li)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for mm in ns:
                counts[lbl[mm]] = counts.get(lbl[mm], 0) + 1
            new[n] = min(counts, key=lambda k: (-counts[k], k))
        lbl = new
    m = len(edges)
    e_in: dict[int, int] = {}
    for a, b in edges:
        if lbl[a] == lbl[b]:
            e_in[lbl[a]] = e_in.get(lbl[a], 0) + 1
    d_sum: dict[int, int] = {}
    members: dict[int, int] = {}
    for n, c in lbl.items():
        d_sum[c] = d_sum.get(c, 0) + len(nbrs[n])
        members[c] = members.get(c, 0) + 1
    contrib = {
        c: e_in.get(c, 0) / m - (d_sum[c] / (2 * m)) ** 2 for c in members
    }
    q_total = sum(contrib.values())

    got = Q["graph_modularity_audit"](spark, sf_dir).toPandas()
    assert len(got) == len(members)
    for r in got.itertuples(index=False):
        assert r.n_members == members[r.community]
        assert r.internal_edges == e_in.get(r.community, 0)
        assert r.degree_sum == d_sum[r.community]
        assert abs(r.contribution - round(contrib[r.community], 6)) < 2e-6
        assert abs(r.modularity - round(q_total, 6)) < 2e-6
    # modularity is a proper score: bounded and, on this clustered
    # basket graph, strictly positive
    assert -0.5 <= got["modularity"].iloc[0] <= 1.0


# --------------------------------------------------- MIH recall audit


def test_mih_recall_audit_matches_numpy(spark, sf_dir):
    """Both audit arms replayed in numpy end to end (corpus transform,
    words, candidates, Hamming top-32, cosine top-10, GT, hits)."""
    emb = _emb(sf_dir).sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    raw = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    j = np.arange(raw.shape[1])
    shift = np.where(j[None, :] % 10 == labels[:, None], 0.35, -0.35)
    arms = {"isotropic": raw, "clustered": raw + shift}

    expect = {}
    for name, vecs in arms.items():
        w0, w1 = _sign_words(vecs)
        sub = np.stack(
            [(w0 >> (8 * i)) & 255 for i in range(4)]
            + [(w1 >> (8 * i)) & 255 for i in range(4)],
            axis=1,
        )
        norms = np.linalg.norm(vecs, axis=1)
        for qi in np.where(ids % 125 == 3)[0]:
            cand = np.where((sub == sub[qi]).any(axis=1) & (ids != ids[qi]))[0]
            ham = np.array(
                [
                    bin(int(w0[c] ^ w0[qi])).count("1")
                    + bin(int(w1[c] ^ w1[qi])).count("1")
                    for c in cand
                ]
            )
            top = cand[np.lexsort((ids[cand], ham))[:32]]
            cos_t = (vecs[top] @ vecs[qi]) / (norms[top] * norms[qi])
            mih = set(ids[top][np.lexsort((ids[top], -cos_t))[:10]])
            cos_all = (vecs @ vecs[qi]) / (norms * norms[qi])
            mask = ids != ids[qi]
            gt = ids[mask][np.lexsort((ids[mask], -cos_all[mask]))[:10]]
            n_hits = sum(1 for g in gt if g in mih)
            expect[(name, int(ids[qi]))] = (n_hits, len(gt))

    got = Q["similarity_mih_recall_audit"](spark, sf_dir).toPandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        nh, np_ = expect[(r.corpus, r.query_id)]
        assert (r.n_hits, r.n_possible) == (nh, np_), (r.corpus, r.query_id)
        assert abs(r.recall - round(nh / np_, 6)) < 1e-9
    # the audit's reason to exist: the clustered regime beats isotropic
    g = got.groupby("corpus")["n_hits"].sum()
    assert g["clustered"] > g["isotropic"]


# --------------------------------------------- MIH code-store upsert


def test_mih_code_upsert_store_invariant(spark, sf_dir, tmp_path):
    """After seed + upsert/tombstone batches, the on-disk code store
    must equal codes recomputed from scratch on the surviving vectors
    (numpy ground truth) — stale rows, missed tombstones, or wrong
    last-write-wins all break this."""
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.similarity import (
        mih_code_upsert,
        sign_bit_words,
    )

    emb = _emb(sf_dir).sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    raw = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    dbl = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, raw)],
        "vec_id long, v array<double>",
    )
    code_dir = str(tmp_path / "codes")
    seed = dbl.filter(F.col("vec_id") % 3 == 0)
    sign_bit_words(seed, "v").withColumn(
        "block", (F.col("vec_id") % 8).cast("int")
    ).select("vec_id", "v", "w0", "w1", "block").write.partitionBy(
        "block"
    ).parquet(code_dir)

    plus1 = F.expr("transform(v, x -> x + CAST(1.0 AS DOUBLE))")
    b0 = (
        dbl.filter(F.col("vec_id") % 3 == 1)
        .unionByName(dbl.filter(F.col("vec_id") % 9 == 0).withColumn("v", plus1))
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
    st0 = mih_code_upsert(b0, code_dir, n_blocks=8, seq_col="seq")
    st1 = mih_code_upsert(b1, code_dir, n_blocks=8, seq_col="seq")
    assert st0["affected_blocks"] <= 8 and st1["affected_blocks"] <= 8

    # numpy ground truth over the final corpus
    survive = ids % 15 != 0
    vecs = raw.copy()
    vecs[ids % 9 == 0] += 1.0
    w0, w1 = _sign_words(vecs)
    expect = {
        int(ids[i]): (int(w0[i]), int(w1[i]))
        for i in range(len(ids))
        if survive[i]
    }

    store = spark.read.parquet(code_dir).toPandas()
    assert len(store) == len(expect)
    for r in store.itertuples(index=False):
        assert expect[r.vec_id] == (r.w0, r.w1), r.vec_id
        assert r.block == r.vec_id % 8


def test_mih_code_upsert_corrupt_store_fails_loud(spark, tmp_path):
    """A read failure on an EXISTING store must propagate, never be
    treated as an empty first run — the silent-empty path would make
    the dynamic overwrite drop every pre-existing row in the affected
    blocks (ADVICE r11 #1). A genuinely missing store still seeds."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_sink_azure_kusto_spark.functions.similarity import (
        mih_code_upsert,
    )

    batch = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, [-1.0, 1.0])], "vec_id long, v array<double>"
    ).withColumn("seq", F.lit(0))

    # missing store → first-run seed succeeds
    fresh = str(tmp_path / "fresh")
    st = mih_code_upsert(batch, fresh, n_blocks=4, seq_col="seq")
    assert st["batch_rows"] == 2
    assert spark.read.parquet(fresh).count() == 2

    # existing-but-unreadable store → loud failure, store untouched
    corrupt = str(tmp_path / "corrupt")
    (tmp_path / "corrupt").mkdir()
    (tmp_path / "corrupt" / "block=1").mkdir()
    (tmp_path / "corrupt" / "block=1" / "part-0.parquet").write_bytes(
        b"not a parquet file"
    )
    with pytest.raises(Exception):
        mih_code_upsert(batch, corrupt, n_blocks=4, seq_col="seq")
    assert (tmp_path / "corrupt" / "block=1" / "part-0.parquet").read_bytes() == (
        b"not a parquet file"
    )
