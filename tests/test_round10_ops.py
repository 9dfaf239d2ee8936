"""Round-10 stats/eval operators q286-q291: independent pandas/numpy
reference recomputations (rank statistics with scipy-free average
ranks) plus the structural invariants the oracle hash checks weakly
(ROC monotonicity, calibration bin partition, tau-b bounds)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from generative_ai_vector_db_spark.operators import stats
from generative_ai_vector_db_spark.tables import load


def _events_pdf(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .toPandas()
    )


def _docs_pdf(spark, sf_dir):
    df = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars", "text")
        .toPandas()
    )
    df["y"] = df["text"].str.split(" ").map(len)
    return df


# --------------------------------------------------------------------------
# q286 ROC curve at exact deciles
# --------------------------------------------------------------------------
def test_q286_roc_matches_reference(spark, sf_dir_t2):
    got = stats.q286_roc_curve(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    ev = ev[ev["event_type"].isin([stats.ROC_POS, stats.ROC_NEG])]
    vals = np.sort(ev["value"].to_numpy())
    n = len(vals)
    na = int((ev["event_type"] == stats.ROC_POS).sum())
    nb = n - na
    assert list(got["decile"]) == list(range(1, 10))
    for r in got.itertuples():
        # threshold = smallest distinct value with cum count >= i*N/10
        thr = vals[int(np.ceil(r.decile * n / 10.0)) - 1]
        # that index may sit inside a tie run; threshold is that value
        assert r.threshold == pytest.approx(thr)
        tp = int(((ev["event_type"] == stats.ROC_POS)
                  & (ev["value"] >= r.threshold)).sum())
        fp = int(((ev["event_type"] == stats.ROC_NEG)
                  & (ev["value"] >= r.threshold)).sum())
        assert (r.tp, r.fp) == (tp, fp)
        assert r.tpr == pytest.approx(tp / na)
        assert r.fpr == pytest.approx(fp / nb)
        assert r.precision == pytest.approx(tp / (tp + fp))
    # raising the threshold can only shrink both rates
    assert (got["tpr"].diff().dropna() <= 1e-12).all()
    assert (got["fpr"].diff().dropna() <= 1e-12).all()


# --------------------------------------------------------------------------
# q287 calibration bins
# --------------------------------------------------------------------------
def test_q287_calibration_matches_reference(spark, sf_dir_t2):
    got = stats.q287_calibration_bins(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    ev = ev[ev["event_type"].isin([stats.ROC_POS, stats.ROC_NEG])].copy()
    p = ev["value"].to_numpy() / ev["value"].max()
    y = (ev["event_type"] == stats.ROC_POS).to_numpy().astype(float)
    b = np.minimum((p * 10).astype(int), 9)
    assert int(got["n"].sum()) == len(ev)
    for r in got.itertuples():
        m = b == r.bin
        assert r.n == int(m.sum())
        assert r.mean_p == pytest.approx(p[m].mean(), rel=1e-12)
        assert r.frac_pos == pytest.approx(y[m].mean(), rel=1e-12)
        assert r.brier == pytest.approx(((p[m] - y[m]) ** 2).mean(), rel=1e-12)
        assert r.ece_part == pytest.approx(
            m.sum() / len(ev) * abs(p[m].mean() - y[m].mean()), rel=1e-10
        )


# --------------------------------------------------------------------------
# q288 Kendall tau-b per source — O(n^2) numpy reference
# --------------------------------------------------------------------------
def test_q288_kendall_matches_bruteforce(spark, sf_dir_t2):
    got = stats.q288_kendall_tau(spark, sf_dir_t2).toPandas()
    docs = _docs_pdf(spark, sf_dir_t2)
    assert set(got["source"]) == set(docs["source"])
    for r in got.itertuples():
        g = docs[docs["source"] == r.source]
        x = g["n_chars"].to_numpy()
        y = g["y"].to_numpy()
        n = len(g)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(n, 1)
        prod = dx[iu] * dy[iu]
        c, d = int((prod > 0).sum()), int((prod < 0).sum())
        assert (r.concordant, r.discordant) == (c, d)
        n0 = n * (n - 1) // 2
        n1 = sum(t * (t - 1) // 2 for t in pd.Series(x).value_counts())
        n2 = sum(t * (t - 1) // 2 for t in pd.Series(y).value_counts())
        assert r.tau_b == pytest.approx(
            (c - d) / np.sqrt((n0 - n1) * (n0 - n2)), rel=1e-12
        )
        assert -1.0 <= r.tau_b <= 1.0


# --------------------------------------------------------------------------
# q289 Kruskal-Wallis — pandas average-rank reference
# --------------------------------------------------------------------------
def test_q289_kruskal_matches_reference(spark, sf_dir_t2):
    got = stats.q289_kruskal_wallis(spark, sf_dir_t2).toPandas().iloc[0]
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("event_type", "value")
        .toPandas()
    )
    ranks = ev["value"].rank(method="average")
    n = len(ev)
    rr = sum(
        ranks[ev["event_type"] == g].sum() ** 2
        / (ev["event_type"] == g).sum()
        for g in ev["event_type"].unique()
    )
    h = 12.0 / (n * (n + 1)) * rr - 3 * (n + 1)
    t = ev["value"].value_counts().to_numpy().astype(float)
    corr = 1.0 - (t**3 - t).sum() / (n**3 - n)
    assert got["n"] == n
    assert got["df"] == ev["event_type"].nunique() - 1
    assert got["h_stat"] == pytest.approx(h, rel=1e-9)
    assert got["h_corrected"] == pytest.approx(h / corr, rel=1e-9)


# --------------------------------------------------------------------------
# q290 Brown-Forsythe — pandas reference
# --------------------------------------------------------------------------
def test_q290_brown_forsythe_matches_reference(spark, sf_dir_t2):
    got = stats.q290_brown_forsythe(spark, sf_dir_t2).toPandas().iloc[0]
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("event_type", "value")
        .toPandas()
    )
    med = ev.groupby("event_type")["value"].median()
    z = (ev["value"] - ev["event_type"].map(med)).abs()
    grand = z.mean()
    k = ev["event_type"].nunique()
    n = len(ev)
    ssb = sum(
        (z[ev["event_type"] == g].mean() - grand) ** 2
        * (ev["event_type"] == g).sum()
        for g in ev["event_type"].unique()
    )
    ssw = sum(
        ((z[ev["event_type"] == g] - z[ev["event_type"] == g].mean()) ** 2).sum()
        for g in ev["event_type"].unique()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (got["df1"], got["df2"]) == (k - 1, n - k)
    assert got["f_stat"] == pytest.approx(f, rel=1e-9)


# --------------------------------------------------------------------------
# q291 Spearman rho — pandas rank + corr reference
# --------------------------------------------------------------------------
def test_q291_spearman_matches_pandas(spark, sf_dir_t2):
    got = stats.q291_spearman_rho(spark, sf_dir_t2).toPandas()
    docs = _docs_pdf(spark, sf_dir_t2)
    for r in got.itertuples():
        g = docs[docs["source"] == r.source]
        rho = (
            g["n_chars"]
            .rank(method="average")
            .corr(g["y"].rank(method="average"))
        )
        assert r.n == len(g)
        assert r.rho == pytest.approx(rho, rel=1e-9)
        assert -1.0 <= r.rho <= 1.0


# --------------------------------------------------------------------------
# q292-q294 graph tier — networkx-free brute-force references on the
# thresholded co-purchase graph
# --------------------------------------------------------------------------
def _copurchase_edges_pdf(spark, sf_dir):
    from generative_ai_vector_db_spark.operators.graph import _copurchase_edges

    return _copurchase_edges(spark, sf_dir).toPandas()


def test_q292_kcore_is_fixpoint_and_exact(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import graph

    got = graph.q292_kcore(spark, sf_dir_t2).toPandas()
    ed = _copurchase_edges_pdf(spark, sf_dir_t2)
    adj = {}
    for s, d in zip(ed["src"], ed["dst"]):
        adj.setdefault(s, set()).add(d)
    # peel to the TRUE fixpoint
    nodes = set(adj)
    while True:
        drop = {v for v in nodes if len(adj[v] & nodes) < graph.KCORE_K}
        if not drop:
            break
        nodes -= drop
    want = sorted(nodes)
    assert list(got["node"]) == want
    for r in got.itertuples():
        assert r.core_deg == len(adj[r.node] & nodes)
        assert r.core_deg >= graph.KCORE_K


def test_q293_link_prediction_scores(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import graph

    got = graph.q293_link_prediction(spark, sf_dir_t2).toPandas()
    ed = _copurchase_edges_pdf(spark, sf_dir_t2)
    adj = {}
    for s, d in zip(ed["src"], ed["dst"]):
        adj.setdefault(s, set()).add(d)
    assert len(got) == graph.LINKPRED_TOP
    prev = None
    for r in got.itertuples():
        na, nb = adj[r.part_a], adj[r.part_b]
        assert r.part_b not in na  # non-adjacent
        common = na & nb
        assert r.cn == len(common)
        assert r.jaccard == pytest.approx(len(common) / len(na | nb))
        ra = sum(graph.AA_SCALE // 1 and int(graph.AA_SCALE / len(adj[z])) for z in common)
        # per-term floor(1e12/deg) recomputed exactly
        ra = sum(int(np.floor(graph.AA_SCALE / len(adj[z]))) for z in common)
        assert r.ra_micro == ra
        key = (-r.ra_micro, r.part_a, r.part_b)
        assert prev is None or key > prev
        prev = key


def test_q294_lpa_matches_sync_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import graph

    got = graph.q294_label_propagation(spark, sf_dir_t2).toPandas()
    ed = _copurchase_edges_pdf(spark, sf_dir_t2)
    adj = {}
    for s, d in zip(ed["src"], ed["dst"]):
        adj.setdefault(s, set()).add(d)
    label = {v: v for v in adj}
    for _ in range(graph.LPA_ROUNDS):
        nxt = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[label[u]] = counts.get(label[u], 0) + 1
            nxt[v] = min(
                (l for l in counts if counts[l] == max(counts.values())),
            )
        label = nxt
    sizes = {}
    for v, l in label.items():
        sizes[l] = sizes.get(l, 0) + 1
    want = sorted(
        ((l, c) for l, c in sizes.items() if c >= 2),
        key=lambda t: (-t[1], t[0]),
    )
    assert list(zip(got["community"], got["community_size"])) == want


# --------------------------------------------------------------------------
# q295-q298 text/corpus pipeline tier
# --------------------------------------------------------------------------
def test_q295_lexical_diversity_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import text as text_ops

    got = text_ops.q295_lexical_diversity(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("source", "text")
        .toPandas()
    )
    for r in got.itertuples():
        toks = []
        for t in docs[docs["source"] == r.source]["text"]:
            toks.extend(t.lower().split(" "))
        vc = pd.Series(toks).value_counts()
        n, types = len(toks), len(vc)
        assert (r.n_tokens, r.n_types) == (n, types)
        assert r.ttr == pytest.approx(types / n)
        assert r.hapax_ratio == pytest.approx((vc == 1).sum() / types)
        assert r.simpson == pytest.approx(
            (vc * (vc - 1)).sum() / (n * (n - 1)), rel=1e-12
        )


def test_q296_char_trigram_lm_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import text as text_ops

    got = text_ops.q296_char_trigram_lm(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    docs["t"] = docs["text"].str.lower()
    docs = docs[docs["t"].str.len() >= 3]
    from collections import Counter

    counts = Counter()
    tris = {}
    for r in docs.itertuples():
        g = [r.t[i : i + 3] for i in range(len(r.t) - 2)]
        tris[r.doc_id] = g
        counts.update(g)
    n_tot, v = sum(counts.values()), len(counts)
    logp = {g: round(np.log((c + 1) / (n_tot + v)), 8) for g, c in counts.items()}
    assert len(got) == text_ops.TRIGRAM_BOTTOM_K
    scores = {
        d: float(np.mean([logp[g] for g in gs])) for d, gs in tris.items()
    }
    order = sorted(scores, key=lambda d: (round(scores[d], 8), d))
    assert list(got["doc_id"]) == order[: text_ops.TRIGRAM_BOTTOM_K]
    for r in got.itertuples():
        assert r.n_trigrams == len(tris[r.doc_id])
        assert r.avg_logp == pytest.approx(scores[r.doc_id], rel=1e-9)


def test_q297_boilerplate_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import corpus

    got = corpus.q297_boilerplate_ngrams(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "source", "text")
        .toPandas()
    )
    from collections import Counter

    n = corpus.BOILER_N
    per_doc = {}
    df = Counter()
    for r in docs.itertuples():
        ws = r.text.lower().split(" ")
        grams = {
            " ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))
        }
        per_doc[r.doc_id] = (r.source, grams)
        df.update(grams)
    hot = {g for g, c in df.items() if c >= corpus.BOILER_MIN_DOCS}
    agg = {}
    for src, grams in per_doc.values():
        a = agg.setdefault(src, [0, 0])
        a[0] += len(grams)
        a[1] += len(grams & hot)
    for r in got.itertuples():
        tot, boil = agg[r.source]
        assert (r.n_shingles, r.n_boiler) == (tot, boil)
        assert r.boiler_frac == pytest.approx(boil / tot)


def test_q298_waterfill_invariants_and_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import corpus

    got = corpus.q298_budget_waterfill(spark, sf_dir_t2).toPandas()
    caps = got.set_index("source")["cap"]
    budget = (
        caps.sum()
        * corpus.WATERFILL_SHARE_NUM
        / corpus.WATERFILL_SHARE_DEN
    )
    # allocations respect caps and exhaust the budget
    assert (got["allocation"] <= got["cap"] + 1e-9).all()
    assert got["allocation"].sum() == pytest.approx(budget, rel=1e-12)
    # bisection reference for the water level
    lo, hi = 0.0, float(caps.max())
    for _ in range(200):
        mid = (lo + hi) / 2
        if np.minimum(caps, mid).sum() < budget:
            lo = mid
        else:
            hi = mid
    level = (lo + hi) / 2
    for r in got.itertuples():
        assert r.allocation == pytest.approx(min(r.cap, level), rel=1e-9)
        assert r.fill_frac == pytest.approx(min(r.cap, level) / r.cap, rel=1e-9)


# --------------------------------------------------------------------------
# q299-q301 retrieval/store tier
# --------------------------------------------------------------------------
def test_q299_int8_rerank_reference_and_recall(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import vector

    got = vector.q299_int8_rerank(spark, sf_dir_t2).toPandas()
    emb = (
        load(spark, sf_dir_t2, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    M = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    qi = int(np.where(ids == vector.BINARY_Q_ID)[0][0])
    # int8 codes reference
    mx = np.abs(M).max(axis=1)
    codes = np.floor(M * (127.0 / mx)[:, None] + 0.5).astype(np.int64)
    approx = codes @ codes[qi] * (mx * mx[qi]) / (127.0 * 127.0)
    mask = ids != vector.BINARY_Q_ID
    order = sorted(
        np.where(mask)[0], key=lambda i: (-approx[i], ids[i])
    )[: vector.INT8_CAND]
    cand = {ids[i] for i in order}
    assert set(got["vec_id"]).issubset(cand)
    # exact cosine over candidates
    qv = M[qi]
    cos = M @ qv / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    pick = sorted(order, key=lambda i: (-round(cos[i], 4), ids[i]))[: vector.K]
    assert list(got["vec_id"]) == [ids[i] for i in pick]
    # recall vs global exact top-k (quality floor, recorded in QUALITY.md)
    exact = sorted(
        np.where(mask)[0], key=lambda i: (-round(cos[i], 4), ids[i])
    )[: vector.K]
    recall = len(set(got["vec_id"]) & {ids[i] for i in exact}) / vector.K
    assert recall >= 0.9


def test_q300_map_eval_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import retrieval

    got = retrieval.q300_map_eval(spark, sf_dir_t2).toPandas()
    per = retrieval._bm25_per_term(spark, sf_dir_t2).toPandas()
    per["score"] = per["contrib"].round(4)
    for r in got.itertuples():
        g = per[per["term"] == r.term].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        rel = (g["tf"] >= retrieval.REL_TF).to_numpy()
        assert r.n_matched == len(g)
        assert r.n_relevant == int(rel.sum())
        if rel.sum() == 0:
            assert pd.isna(r.ap)
            continue
        cum = np.cumsum(rel)
        ranks = np.arange(1, len(g) + 1)
        ap = (cum[rel] / ranks[rel]).mean()
        assert r.ap == pytest.approx(ap, rel=1e-12)
        assert 0.0 < r.ap <= 1.0


def test_q301_snapshot_monotone_and_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import store

    got = store.q301_snapshot_as_of(spark, sf_dir_t2).toPandas()
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
    )
    day0 = ev["ts"].min().normalize()
    assert list(got["snap_day"]) == list(store.SNAPSHOT_DAYS)
    for r in got.itertuples():
        cutoff = day0 + pd.Timedelta(days=int(r.snap_day))
        sub = ev[ev["ts"] < cutoff].sort_values(
            ["user_id", "ts", "event_id"]
        )
        last = sub.groupby("user_id").tail(1)
        live = last[last["event_type"] != "error"]
        assert r.n_live == len(live)
        assert r.n_tombstoned == (last["event_type"] == "error").sum()
        assert r.live_value_sum == pytest.approx(
            round(live["value"].sum(), 4), abs=1e-6
        )
    # keys seen can only grow with the cutoff
    seen = got["n_live"] + got["n_tombstoned"]
    assert (seen.diff().dropna() >= 0).all()


# --------------------------------------------------------------------------
# q302 portable MinHash — full-pipeline Python reference (independent
# reimplementation of the hash chain + banding + verify)
# --------------------------------------------------------------------------
def test_q302_portable_minhash_full_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q302_portable_minhash(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    P, M, W = dedup.PMH_P, dedup.PMH_MULT, dedup.PMH_SHINGLE_W

    def wh(w):
        if not w:
            return 0
        mid = (len(w) + 1) // 2
        return (
            ((len(w) * 31 + ord(w[0])) * 31 + ord(w[mid - 1])) * 31
            + ord(w[-1])
        ) % P

    shingles = {}
    for r in docs.itertuples():
        ws = [wh(w) for w in r.text.lower().split(" ")]
        if len(ws) < W:
            continue
        ss = set()
        for j in range(len(ws) - W + 1):
            acc = 0
            for x in ws[j : j + W]:
                acc = (acc * M + x) % P
            ss.add(acc)
        if ss:
            shingles[r.doc_id] = ss
    sigs = {
        d: [
            min((a * x + b) % P for x in ss)
            for a, b in zip(dedup.PMH_A, dedup.PMH_B)
        ]
        for d, ss in shingles.items()
    }
    buckets = {}
    for d, sg in sigs.items():
        for k in range(dedup.PMH_BANDS):
            acc = 0
            for x in sg[k * dedup.PMH_ROWS : (k + 1) * dedup.PMH_ROWS]:
                acc = (acc * M + x) % P
            buckets.setdefault((k, acc), []).append(d)
    cand = set()
    for (k, key), ds in buckets.items():
        if len(ds) > dedup.PMH_BUCKET_CAP:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(cand):
        inter = len(shingles[a] & shingles[b])
        jac = inter / (len(shingles[a]) + len(shingles[b]) - inter)
        if jac >= dedup.PMH_JMIN:
            est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / len(sigs[a])
            rows.append((a, b, jac, est))
    assert [
        (r.doc_a, r.doc_b) for r in got.itertuples()
    ] == [(a, b) for a, b, _, _ in rows]
    for r, (_, _, jac, est) in zip(got.itertuples(), rows):
        assert r.jaccard == pytest.approx(jac, rel=1e-12)
        assert r.est_jaccard == pytest.approx(est, rel=1e-12)
    assert len(got) > 0  # fixture contains real near-dups


# --------------------------------------------------------------------------
# q303-q306
# --------------------------------------------------------------------------
def test_q303_seq_patterns_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import temporal

    got = temporal.q303_seq_patterns(spark, sf_dir_t2).toPandas()
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
    )
    win = pd.Timedelta(minutes=temporal.SEQ_WINDOW_MIN)
    occ, users = {}, {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for i in range(len(g)):
            for j in range(len(g)):
                if (g.ts[j], g.event_id[j]) <= (g.ts[i], g.event_id[i]):
                    continue
                if g.ts[j] > g.ts[i] + win:
                    continue
                key = (g.event_type[i], g.event_type[j])
                occ[key] = occ.get(key, 0) + 1
                users.setdefault(key, set()).add(g.user_id[i])
    n_users = ev["user_id"].nunique()
    for r in got.itertuples():
        key = (r.from_type, r.to_type)
        assert r.n_occurrences == occ[key]
        assert r.n_users == len(users[key])
        assert r.support == pytest.approx(len(users[key]) / n_users)
    assert len(got) == len(occ)


def test_q304_diversity_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import vector

    got = vector.q304_result_diversity(spark, sf_dir_t2).toPandas().iloc[0]
    emb = (
        load(spark, sf_dir_t2, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    M = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    qi = int(np.where(ids == vector.BINARY_Q_ID)[0][0])
    qv = M[qi]
    cos = M @ qv / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    mask = ids != vector.BINARY_Q_ID
    top = sorted(
        np.where(mask)[0], key=lambda i: (-round(cos[i], 4), ids[i])
    )[: vector.K]
    pcs = []
    for x in range(len(top)):
        for y in range(x + 1, len(top)):
            i, j = top[x], top[y]
            pcs.append(
                round(
                    M[i] @ M[j]
                    / (np.linalg.norm(M[i]) * np.linalg.norm(M[j])),
                    4,
                )
            )
    assert got["n_pairs"] == len(pcs) == vector.K * (vector.K - 1) // 2
    assert got["mean_pairwise_cos"] == pytest.approx(np.mean(pcs), abs=1e-9)
    assert got["max_pairwise_cos"] == pytest.approx(max(pcs), abs=1e-9)
    assert got["redundant_share"] == pytest.approx(
        np.mean([p >= vector.DIVERSITY_DUP_BAR for p in pcs]), abs=1e-12
    )


def test_q305_bootstrap_brackets_mean(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import stats as st

    got = st.q305_poisson_bootstrap(spark, sf_dir_t2).toPandas()
    assert len(got) == 5
    for r in got.itertuples():
        assert r.ci_lo <= r.ci_hi
        # a 95% bootstrap CI of the mean must bracket the sample mean
        # for these near-symmetric fixtures
        assert r.ci_lo <= r.mean_value <= r.ci_hi
        # CI width sane: well under half the mean at n~2000
        assert (r.ci_hi - r.ci_lo) < r.mean_value


def test_q306_welch_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import stats as st

    got = st.q306_welch_ttest(spark, sf_dir_t2).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir_t2)
    a = ev[ev["event_type"] == st.ROC_POS]["value"].to_numpy()
    b = ev[ev["event_type"] == st.ROC_NEG]["value"].to_numpy()
    sea = a.var(ddof=1) / len(a)
    seb = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert (got["na"], got["nb"]) == (len(a), len(b))
    assert got["mean_diff"] == pytest.approx(a.mean() - b.mean(), rel=1e-9)
    assert got["t_stat"] == pytest.approx(t, rel=1e-9)
    assert got["welch_df"] == pytest.approx(df, rel=1e-9)


# --------------------------------------------------------------------------
# q307/q308
# --------------------------------------------------------------------------
def test_q307_blocking_advisor_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q307_blocking_advisor(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "text", "n_chars")
        .toPandas()
    )
    truth = dedup.q302_portable_minhash(spark, sf_dir_t2).toPandas()
    keys = {}
    for r in docs.itertuples():
        t = r.text.lower()
        keys[r.doc_id] = {
            "len_band": str(r.n_chars // dedup.BLOCK_LEN_BAND),
            "first_token": t.split(" ")[0],
            "prefix4": t[:4],
        }
    n = len(docs)
    allp = n * (n - 1) // 2
    for r in got.itertuples():
        vc = pd.Series(
            [keys[d][r.scheme] for d in docs["doc_id"]]
        ).value_counts()
        assert r.n_blocks == len(vc)
        assert r.n_cand_pairs == int((vc * (vc - 1) // 2).sum())
        cov = sum(
            keys[a][r.scheme] == keys[b][r.scheme]
            for a, b in zip(truth["doc_a"], truth["doc_b"])
        )
        assert r.n_covered == cov
        assert r.n_dup_pairs == len(truth)
        assert r.recall == pytest.approx(cov / len(truth))
        assert r.reduction == pytest.approx(1 - r.n_cand_pairs / allp)


def test_q308_batch_knn_matches_per_query(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import vector

    got = vector.q308_batch_knn(spark, sf_dir_t2).toPandas()
    emb = (
        load(spark, sf_dir_t2, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    M = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    qids = np.sort(ids)[: vector.BATCH_Q]
    assert sorted(got["query_id"].unique()) == list(qids)
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        cos = M @ M[qi] / (norms * norms[qi])
        mask = ids != q
        want = sorted(
            np.where(mask)[0], key=lambda i: (-round(cos[i], 4), ids[i])
        )[: vector.K]
        sub = got[got["query_id"] == q].sort_values("rn")
        assert list(sub["vec_id"]) == [ids[i] for i in want]
        assert len(sub) == vector.K


# --------------------------------------------------------------------------
# q309/q310
# --------------------------------------------------------------------------
def test_q309_attribution_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import temporal

    got = temporal.q309_position_attribution(spark, sf_dir_t2).toPandas()
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
    )
    win = pd.Timedelta(days=temporal.ATTRIB_WINDOW_DAYS)
    credit, touches = {}, {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        purchases = g[g["event_type"] == "purchase"]
        others = g[g["event_type"] != "purchase"]
        for p in purchases.itertuples():
            j = others[
                (others["ts"] < p.ts) & (others["ts"] >= p.ts - win)
            ].sort_values(["ts", "event_id"])
            n = len(j)
            for i, t in enumerate(j.itertuples(), 1):
                touches[t.event_type] = touches.get(t.event_type, 0) + 1
                if n == 1:
                    c = 1.0
                elif n == 2:
                    c = 0.5
                elif i in (1, n):
                    c = 0.4
                else:
                    c = 0.2 / (n - 2)
                credit[t.event_type] = credit.get(t.event_type, 0.0) + c
    total = sum(touches.values())
    for r in got.itertuples():
        assert r.n_touches == touches[r.channel]
        assert r.credit == pytest.approx(round(credit[r.channel], 4), abs=1e-6)
        assert r.touch_share == pytest.approx(touches[r.channel] / total)
    # total credit equals the number of attributed journeys
    n_journeys = 0
    for _, g in ev.groupby("user_id"):
        others = g[g["event_type"] != "purchase"]
        for p in g[g["event_type"] == "purchase"].itertuples():
            if len(
                others[(others["ts"] < p.ts) & (others["ts"] >= p.ts - win)]
            ):
                n_journeys += 1
    assert got["credit"].sum() == pytest.approx(n_journeys, abs=1e-2)


def test_q310_ipf_margins_converge(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import quality

    got = quality.q310_ipf_raking(spark, sf_dir_t2).toPandas()
    n = got["n_docs"].sum()
    r = got["lang"].nunique()
    c = got["source"].nunique()
    # column margins exact after the final column scaling
    col = got.groupby("source")["raked_mass"].sum()
    assert np.allclose(col, n / c, rtol=1e-6)
    # row margins near-uniform after 3 rounds (IPF converges fast)
    row = got.groupby("lang")["raked_mass"].sum()
    assert np.allclose(row, n / r, rtol=0.05)
    # mass conserved and weights positive
    assert got["raked_mass"].sum() == pytest.approx(n, rel=1e-6)
    assert (got["raked_mass"] > 0).all()
    assert (
        got["weight_per_doc"]
        == (got["raked_mass"] / got["n_docs"]).round(6)
    ).all()


# --------------------------------------------------------------------------
# q311/q312
# --------------------------------------------------------------------------
def test_q311_syndication_consistent_with_q302(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q311_syndication_matrix(spark, sf_dir_t2).toPandas()
    pairs = dedup.q302_portable_minhash(spark, sf_dir_t2).toPandas()
    src = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "source")
        .toPandas()
        .set_index("doc_id")["source"]
    )
    cells = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        key = tuple(sorted((src[a], src[b])))
        cells[key] = cells.get(key, 0) + 1
    assert int(got["n_pairs"].sum()) == len(pairs)
    for r in got.itertuples():
        assert r.n_pairs == cells[(r.source_x, r.source_y)]
        assert r.within_source == (r.source_x == r.source_y)
        assert r.pair_share == pytest.approx(r.n_pairs / len(pairs))


def test_q312_hits_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import graph

    got = graph.q312_hits_bipartite(spark, sf_dir_t2).toPandas()
    ed = (
        load(spark, sf_dir_t2, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    sup_parts, part_sups = {}, {}
    for s, p in zip(ed["l_suppkey"], ed["l_partkey"]):
        sup_parts.setdefault(s, []).append(p)
        part_sups.setdefault(p, []).append(s)
    h = {s: 1 for s in sup_parts}
    a = None
    for _ in range(graph.HITS_ITERS):
        ar = {p: sum(h[s] for s in ss) for p, ss in part_sups.items()}
        t = sum(ar.values())
        a = {p: v * graph.HITS_SCALE // t for p, v in ar.items()}
        hr = {s: sum(a[p] for p in ps) for s, ps in sup_parts.items()}
        t = sum(hr.values())
        h = {s: v * graph.HITS_SCALE // t for s, v in hr.items()}
    want = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[: graph.HITS_TOP]
    assert [(r.partkey, r.authority_units) for r in got.itertuples()] == want
    for r in got.itertuples():
        assert r.n_suppliers == len(part_sups[r.partkey])


# --------------------------------------------------------------------------
# q313/q314
# --------------------------------------------------------------------------
def test_q313_forecast_eval_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import temporal

    got = temporal.q313_forecast_eval(spark, sf_dir_t2).toPandas()
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("ts", "event_type", "value")
        .toPandas()
    )
    ev["d"] = ev["ts"].dt.date
    for r in got.itertuples():
        s = (
            ev[ev["event_type"] == r.event_type]
            .groupby("d")["value"]
            .sum()
            .round(4)
            .sort_index()
        )
        assert r.test_day == s.index[-1].isoformat()
        assert r.actual == pytest.approx(s.iloc[-1])
        train = s.iloc[:-1]
        assert r.naive_pred == pytest.approx(train.iloc[-1])
        assert r.snaive_pred == pytest.approx(train.iloc[-7])
        drift = train.iloc[-1] + (train.iloc[-1] - train.iloc[0]) / (
            len(train) - 1
        )
        assert r.drift_pred == pytest.approx(round(drift, 4), abs=1e-6)
        assert r.naive_abs_err == pytest.approx(
            round(abs(s.iloc[-1] - train.iloc[-1]), 4), abs=1e-6
        )


def test_q314_clusters_partition_pair_nodes(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q314_dup_cluster_stats(spark, sf_dir_t2).toPandas()
    pairs = dedup.q302_portable_minhash(spark, sf_dir_t2).toPandas()
    # union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    sizes = Counter(Counter(find(x) for x in parent).values())
    want = sorted(
        (s, c, (s - 1) * c) for s, c in sizes.items()
    )
    assert [
        (r.size, r.n_clusters, r.docs_removable) for r in got.itertuples()
    ] == want


# --------------------------------------------------------------------------
# q315/q316
# --------------------------------------------------------------------------
def test_q315_cache_curve_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import scale

    got = scale.q315_cache_hit_curve(spark, sf_dir_t2).toPandas()
    li = load(spark, sf_dir_t2, "lineitem").select("l_partkey").toPandas()
    vc = li["l_partkey"].value_counts()
    order = sorted(vc.index, key=lambda k: (-vc[k], k))
    total = len(li)
    assert list(got["cache_size"]) == sorted(scale.CACHE_SIZES)
    prev = 0.0
    for r in got.itertuples():
        hits = sum(vc[k] for k in order[: r.cache_size])
        assert r.n_hits == hits
        assert r.hit_rate == pytest.approx(hits / total)
        assert r.n_distinct_parts == len(vc)
        assert r.hit_rate >= prev  # curve is monotone in capacity
        prev = r.hit_rate


def test_q316_cvm_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import stats as st

    got = st.q316_cvm_test(spark, sf_dir_t2).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir_t2)
    a = np.sort(ev[ev["event_type"] == st.ROC_POS]["value"].to_numpy())
    b = np.sort(ev[ev["event_type"] == st.ROC_NEG]["value"].to_numpy())
    n, m = len(a), len(b)
    z = np.concatenate([a, b])
    fa = np.searchsorted(a, z, side="right") / n
    fb = np.searchsorted(b, z, side="right") / m
    t = n * m / (n + m) ** 2 * ((fa - fb) ** 2).sum()
    assert (got["n"], got["m"]) == (n, m)
    assert got["t_stat"] == pytest.approx(t, rel=1e-9)
    assert got["t_stat"] >= 0


# --------------------------------------------------------------------------
# q317/q318
# --------------------------------------------------------------------------
def test_q317_fellegi_sunter_properties(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q317_fellegi_sunter(spark, sf_dir_t2).toPandas()
    assert sorted(got["field"]) == ["lang", "len", "pre", "tok"]
    for r in got.itertuples():
        assert 0.0 < r.m < 1.0 and 0.0 < r.u < 1.0
        assert r.w_agree == pytest.approx(round(np.log(r.m / r.u), 8), abs=1e-6)
        assert r.w_disagree == pytest.approx(
            round(np.log((1 - r.m) / (1 - r.u)), 8), abs=1e-6
        )
        if r.field in ("len", "tok", "pre"):
            # content-derived fields: near-dups agree more than random
            # pairs, so agreement adds evidence and disagreement
            # subtracts it. (The lang LABEL is the interesting negative
            # result: this corpus's near-dups are cross-language
            # template copies, so lang agreement carries ~zero lift —
            # m ~ u — exactly what an FS calibration is FOR.)
            assert r.m > r.u
            assert r.w_agree > 0 > r.w_disagree
    # the sample is the unbiased side: n_sample >> n_dup
    assert (got["n_sample_pairs"] > got["n_dup_pairs"] * 10).all()


def test_q318_topk_drift_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import temporal

    got = temporal.q318_topk_drift(spark, sf_dir_t2).toPandas().iloc[0]
    li = (
        load(spark, sf_dir_t2, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        .toPandas()
    )
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    d0, d1 = li["l_shipdate"].min(), li["l_shipdate"].max()
    li["half"] = np.where(
        (li["l_shipdate"] - d0).dt.days * 2 <= (d1 - d0).days, "h1", "h2"
    )
    tops = {}
    for h, g in li.groupby("half"):
        rev = g.groupby("l_partkey")["rev"].sum().round(4)
        order = sorted(rev.index, key=lambda k: (-rev[k], k))
        tops[h] = set(order[: temporal.TOPK_DRIFT_K])
    common = len(tops["h1"] & tops["h2"])
    assert got["n_common"] == common
    assert got["jaccard"] == pytest.approx(
        common / (2 * temporal.TOPK_DRIFT_K - common)
    )
    assert got["churned"] == temporal.TOPK_DRIFT_K - common


# --------------------------------------------------------------------------
# q319 portable SimHash — full-pipeline Python reference
# --------------------------------------------------------------------------
def test_q319_portable_simhash_full_reference(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q319_portable_simhash(spark, sf_dir_t2).toPandas()
    docs = (
        load(spark, sf_dir_t2, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    P, L = dedup.PMH_P, dedup.SIMHASH_LANE

    def wh(w):
        if not w:
            return 0
        mid = (len(w) + 1) // 2
        return (
            ((len(w) * 31 + ord(w[0])) * 31 + ord(w[mid - 1])) * 31
            + ord(w[-1])
        ) % P

    sigs = {}
    for r in docs.itertuples():
        hs = [wh(w) for w in r.text.lower().split(" ")]
        votes = [0] * dedup.SIMHASH_BITS
        for h in hs:
            h2 = (h * dedup.SIMHASH_K2) % P
            for j in range(dedup.SIMHASH_BITS):
                src = h if j < L else h2
                votes[j] += ((src >> (j % L)) & 1) * 2 - 1
        sigs[r.doc_id] = sum(
            1 << j for j in range(dedup.SIMHASH_BITS) if votes[j] >= 0
        )
    mask = (1 << dedup.SIMHASH_BAND_BITS) - 1
    buckets = {}
    for d, s in sigs.items():
        for k in range(dedup.SIMHASH_BANDS):
            buckets.setdefault(
                (k, (s >> (k * dedup.SIMHASH_BAND_BITS)) & mask), []
            ).append(d)
    cand = set()
    for ds in buckets.values():
        if len(ds) > dedup.PMH_BUCKET_CAP:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in cand
        if bin(sigs[a] ^ sigs[b]).count("1") <= dedup.SIMHASH_D
    )
    assert [
        (r.doc_a, r.doc_b, r.hamming) for r in got.itertuples()
    ] == want
    # pigeonhole completeness: EVERY pair with hamming <= D whose
    # bands all fit under the cap is found — check against brute force
    keys = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= dedup.SIMHASH_D
    }
    found = {(r.doc_a, r.doc_b) for r in got.itertuples()}
    # pairs missing can only be cap-dropped buckets
    assert found <= brute
    assert len(brute - found) == 0 or all(
        any(
            len(buckets.get((k, (sigs[a] >> (k * dedup.SIMHASH_BAND_BITS)) & mask), []))
            > dedup.PMH_BUCKET_CAP
            for k in range(dedup.SIMHASH_BANDS)
        )
        for a, b in brute - found
    )
