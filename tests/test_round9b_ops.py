"""Late-round-9 operators q260-q271: independent numpy/pandas reference
recomputations plus structural invariants the oracle hash alone checks
weakly (EWMA fold order, waterfall chaining, PSI non-negativity, NDCG
bounds, equi-depth balance, bloom formula, stream-twin equivalence)."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from generative_ai_vector_db_spark.operators import (
    quality,
    retrieval,
    scale,
    temporal,
    vector,
)
from generative_ai_vector_db_spark.streaming import jobs
from generative_ai_vector_db_spark.tables import load


def _events_pdf(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )


# --------------------------------------------------------------------------
# q260 EWMA — pandas reference fold
# --------------------------------------------------------------------------
def test_q260_ewma_matches_pandas_fold(spark, sf_dir_t2):
    got = temporal.q260_ewma_smoothing(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    ev["d"] = ev["ts"].dt.date
    a = temporal.EWMA_ALPHA
    for r in got.itertuples():
        xs = (
            ev[ev["event_type"] == r.event_type]
            .groupby("d")["value"]
            .sum()
            .sort_index()
        )
        assert r.n_days == len(xs)
        acc = xs.iloc[0]
        best_dev, best_day = -1.0, None
        for t in range(1, len(xs)):
            dev = abs(xs.iloc[t] - acc)
            if dev > best_dev:
                best_dev, best_day = dev, xs.index[t]
            acc = a * xs.iloc[t] + (1 - a) * acc
        assert r.last_ewma == pytest.approx(acc, rel=1e-12)
        assert r.max_abs_dev == pytest.approx(best_dev, rel=1e-12)
        assert r.max_dev_day == best_day.isoformat()


# --------------------------------------------------------------------------
# q261 cohort LTV — accumulation identities
# --------------------------------------------------------------------------
def test_q261_cohort_ltv_identities(spark, sf_dir_t2):
    got = temporal.q261_cohort_ltv(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    for cohort, g in got.groupby("cohort_week"):
        g = g.sort_values("age_weeks")
        # cumulative = running sum of the weekly values
        assert np.allclose(g["cum_value"], g["week_value"].cumsum())
        # LTV is nondecreasing (value is nonnegative in the fixture)
        assert (np.diff(g["ltv_per_user"]) >= -1e-9).all()
        assert (g["n_active"] <= g["n_users"]).all()
    # total value conservation across all cohorts
    final = got.sort_values("age_weeks").groupby("cohort_week").tail(1)
    assert final["cum_value"].sum() == pytest.approx(ev["value"].sum(), rel=1e-9)


# --------------------------------------------------------------------------
# q262 session threshold advisor — monotonicity + identity
# --------------------------------------------------------------------------
def test_q262_threshold_monotone(spark, sf_dir_t2):
    got = (
        temporal.q262_session_threshold_advisor(spark, sf_dir_t2)
        .toPandas()
        .sort_values("threshold_min")
    )
    ev = _events_pdf(spark, sf_dir_t2)
    n_events, n_users = len(ev), ev["user_id"].nunique()
    # same gap population at every threshold; sessions shrink as the
    # threshold grows; n_sessions = users + splitting gaps
    assert got["n_gaps"].nunique() == 1
    assert int(got["n_gaps"].iloc[0]) == n_events - n_users
    assert (np.diff(got["n_sessions"]) <= 0).all()
    assert (got["n_sessions"] == n_users + got["n_splits"]).all()
    assert np.allclose(got["events_per_session"], n_events / got["n_sessions"])


# --------------------------------------------------------------------------
# q263 spectral gap — numpy reference (deflated power iteration)
# --------------------------------------------------------------------------
def test_q263_spectral_gap_matches_numpy(spark, sf_dir):
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    G = X.T @ X

    def power(M):
        v = np.full(M.shape[0], 1.0 / math.sqrt(M.shape[0]))
        for _ in range(vector.POWER_ITERS):
            u = M @ v
            v = u / math.sqrt(float(u @ u))
        return v, float(v @ (M @ v))

    v1, lam1 = power(G)
    _, lam2 = power(G - lam1 * np.outer(v1, v1))
    got = vector.q263_spectral_gap(spark, sf_dir).toPandas().iloc[0]
    assert got["top_eig"] == pytest.approx(lam1, rel=1e-9)
    assert got["second_eig"] == pytest.approx(lam2, rel=1e-9)
    assert got["gap_ratio"] == pytest.approx(lam2 / lam1, rel=1e-9)
    # both Rayleigh estimates are bounded by the true top eigenvalue
    # (phase 2 runs on a deflation of an UNCONVERGED v1 on this
    # near-isotropic fixture, so it may exceed phase 1 — the declared
    # plateau-detector semantics; see the operator header)
    true1 = float(np.linalg.eigvalsh(G)[-1])
    assert 0 < got["top_eig"] <= true1 + 1e-6
    assert 0 < got["second_eig"] <= true1 + 1e-6


def test_q263_planted_collapse_gives_small_gap(spark):
    # rank-1-dominated corpus: phase 1 converges, deflation is
    # accurate, gap_ratio reports a faithful lambda2/lambda1 << 1
    rng = np.random.default_rng(63)
    base = rng.normal(0, 1, 64)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(300):
        v = base + 0.05 * rng.normal(0, 1, 64)
        v /= np.linalg.norm(v)
        rows.append((i, v.astype("float32").tolist(), 0))
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="r9_gap_")
    schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ]
    )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(d, "embeddings.parquet"),
    )
    try:
        got = vector.q263_spectral_gap(spark, d).toPandas().iloc[0]
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ev = np.linalg.eigvalsh(X.T @ X)
        assert got["gap_ratio"] < 0.1
        assert got["gap_ratio"] == pytest.approx(ev[-2] / ev[-1], rel=0.05)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q264 bloom advisor — closed-form check
# --------------------------------------------------------------------------
def test_q264_bloom_formula(spark, sf_dir_t2):
    got = scale.q264_bloom_join_advisor(spark, sf_dir_t2).toPandas()
    assert set(got["target_fpp"]) == set(scale.BLOOM_FPPS)
    for r in got.itertuples():
        m = math.ceil(
            -r.n_build_keys * math.log(r.target_fpp) / math.log(2) ** 2
        )
        assert r.bloom_bits == m
        assert r.n_hashes == round(m / r.n_build_keys * math.log(2))
        assert r.match_rows <= r.probe_rows
        est = r.match_rows + (r.probe_rows - r.match_rows) * r.target_fpp
        assert r.est_rows_after_filter == pytest.approx(est, rel=1e-12)
        assert 0 <= r.scan_reduction <= 1
    # tighter fpp costs more bits
    by = got.sort_values("target_fpp")
    assert (np.diff(by["bloom_bits"]) <= 0).all()


# --------------------------------------------------------------------------
# q265 filter waterfall — chaining + pandas recompute
# --------------------------------------------------------------------------
def test_q265_waterfall_chains_and_matches_pandas(spark, sf_dir_t2):
    got = (
        quality.q265_filter_waterfall(spark, sf_dir_t2)
        .toPandas()
        .sort_values("stage")
    )
    # stage k+1 evaluates exactly stage k's survivors
    assert (got["n_in"].iloc[1:].values == got["n_out"].iloc[:-1].values).all()
    assert (got["n_removed"] == got["n_in"] - got["n_out"]).all()
    docs = load(spark, sf_dir_t2, "documents").toPandas()
    c1 = docs["n_chars"].between(
        quality.WATERFALL_MIN_CHARS, quality.WATERFALL_MAX_CHARS
    )
    c2 = docs["lang"].isin(quality.WATERFALL_LANGS)

    def ttr(t):
        ws = t.strip().lower().split()
        return len(set(ws)) / len(t.strip().split())

    c3 = docs["text"].map(ttr) >= quality.WATERFALL_MIN_TTR
    wl = docs["text"].map(
        lambda t: len(t.replace(" ", "")) / len(t.strip().split())
    )
    c4 = wl.between(quality.WATERFALL_WORDLEN_LO, quality.WATERFALL_WORDLEN_HI)
    expect = [
        len(docs),
        int(c1.sum()),
        int((c1 & c2).sum()),
        int((c1 & c2 & c3).sum()),
        int((c1 & c2 & c3 & c4).sum()),
    ]
    assert list(got["n_in"]) == expect[:4]
    assert list(got["n_out"]) == expect[1:]
    # every stage does real work on the fixture
    assert (got["n_removed"] > 0).all()


# --------------------------------------------------------------------------
# q266 PSI — shares sum to 1, contributions nonnegative, numpy recompute
# --------------------------------------------------------------------------
def test_q266_psi_matches_numpy(spark, sf_dir_t2):
    got = quality.q266_psi_drift(spark, sf_dir_t2).toPandas()
    assert got["p_train"].sum() == pytest.approx(1.0)
    assert got["q_test"].sum() == pytest.approx(1.0)
    # (p-q)ln(p/q) >= 0 always
    assert (got["psi_contrib"] >= -1e-12).all()
    docs = load(spark, sf_dir_t2, "documents").toPandas()
    r = docs["doc_id"] % quality.TRAIN_MOD
    train = docs.loc[r < quality.VAL_RESIDUE, "n_chars"].to_numpy()
    test = docs.loc[r == quality.TRAIN_MOD - 1, "n_chars"].to_numpy()
    bounds = sorted(set(np.quantile(train, quality.PSI_DECILES)))
    def binv(x):
        return (x[:, None] > np.array(bounds)[None, :]).sum(axis=1)
    pt = np.bincount(binv(train), minlength=len(bounds) + 1) / len(train)
    qt = np.bincount(binv(test), minlength=len(bounds) + 1) / len(test)
    eps = quality.PSI_EPS
    psi = sum(
        (max(p, eps) - max(q, eps)) * math.log(max(p, eps) / max(q, eps))
        for p, q in zip(pt, qt)
    )
    assert got["psi_contrib"].sum() == pytest.approx(psi, abs=1e-9)


# --------------------------------------------------------------------------
# q267 NDCG — bounds + pandas recompute per term
# --------------------------------------------------------------------------
def test_q267_ndcg_matches_pandas(spark, sf_dir_t2):
    got = retrieval.q267_ndcg_eval(spark, sf_dir_t2).toPandas()
    assert set(got["term"]) == set(retrieval.QUERY_TERMS)
    assert ((got["ndcg"] > 0) & (got["ndcg"] <= 1 + 1e-12)).all()
    assert (got["dcg"] <= got["idcg"] + 1e-9).all()
    per = retrieval._bm25_per_term(spark, sf_dir_t2).toPandas()
    for r in got.itertuples():
        g = per[per["term"] == r.term].copy()
        assert r.n_matched == len(g)
        g["score"] = g["contrib"].round(4)
        sys_order = g.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )["tf"].to_numpy()
        ideal_order = g.sort_values(
            ["tf", "doc_id"], ascending=[False, True]
        )["tf"].to_numpy()
        k = retrieval.NDCG_K
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        dcg = float((sys_order[:k] * disc[: len(sys_order[:k])]).sum())
        idcg = float((ideal_order[:k] * disc[: len(ideal_order[:k])]).sum())
        assert r.dcg == pytest.approx(dcg, rel=1e-9)
        assert r.idcg == pytest.approx(idcg, rel=1e-9)


# --------------------------------------------------------------------------
# q268 equi-depth histogram — coverage + balance
# --------------------------------------------------------------------------
def test_q268_histogram_coverage_and_balance(spark, sf_dir_t2):
    got = scale.q268_stats_histogram(spark, sf_dir_t2).toPandas()
    li = load(spark, sf_dir_t2, "lineitem").select("l_extendedprice").toPandas()
    assert len(got) == scale.HIST_BUCKETS
    assert got["n_rows"].sum() == len(li)
    assert (got["ndv"] <= got["n_rows"]).all()
    assert (got["lo"] <= got["hi"]).all()
    # buckets are ordered and non-overlapping at their bounds
    assert (got["lo"].iloc[1:].values >= got["hi"].iloc[:-1].values).all()
    # equi-depth on a near-continuous column: within 2x of the mean depth
    assert (got["depth_skew"] < 2.0).all() and (got["depth_skew"] > 0.3).all()


# --------------------------------------------------------------------------
# q269 hour-of-week fingerprint — reference recompute
# --------------------------------------------------------------------------
def test_q269_fingerprint_cells(spark, sf_dir_t2):
    got = temporal.q269_hourweek_fingerprint(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    iso = ev["ts"].dt.dayofweek + 1  # pandas: 0=Mon -> ISO 1=Mon
    cells = (
        pd.DataFrame({"iso_dow": iso, "hour": ev["ts"].dt.hour, "v": ev["value"]})
        .groupby(["iso_dow", "hour"])
        .agg(n=("v", "size"), s=("v", "sum"))
        .reset_index()
    )
    assert len(got) == len(cells)
    merged = got.merge(cells, on=["iso_dow", "hour"])
    assert (merged["n_events"] == merged["n"]).all()
    assert np.allclose(merged["sum_value"], merged["s"])
    mu, sd = cells["n"].mean(), cells["n"].std(ddof=0)
    assert np.allclose(merged["z_events"], (merged["n"] - mu) / sd)


# --------------------------------------------------------------------------
# q270 stream dedup — batch twin equals the streaming execution
# --------------------------------------------------------------------------
def test_q270_batch_twin_matches_stream(spark, sf_dir):
    got = jobs.q270_stream_dedup_profile(spark, sf_dir).toPandas()
    d = tempfile.mkdtemp(prefix="r9_dedup_stream_")
    try:
        shutil.copy(os.path.join(sf_dir, "events.parquet"), d)
        jobs.run_bucket_dedup_stream(spark, d, sink_table="t_bucket_dedup")
        kept = (
            spark.table("t_bucket_dedup")
            .groupBy("event_type")
            .count()
            .toPandas()
            .set_index("event_type")["count"]
        )
        for r in got.itertuples():
            assert kept[r.event_type] == r.n_keys
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q271 lead/lag cross-correlation — bounds + numpy recompute
# --------------------------------------------------------------------------
def test_q271_xcorr_matches_numpy(spark, sf_dir_t2):
    got = temporal.q271_lead_lag_xcorr(spark, sf_dir_t2).toPandas()
    assert (got["xcorr"].abs() <= 1 + 1e-9).all()
    assert set(got["lag"]) == set(range(-temporal.XCORR_MAX_LAG,
                                        temporal.XCORR_MAX_LAG + 1))
    ev = _events_pdf(spark, sf_dir_t2)
    ev["d"] = ev["ts"].dt.date
    a = ev[ev["event_type"] == temporal.XCORR_A].groupby("d")["value"].sum()
    b = ev[ev["event_type"] == temporal.XCORR_B].groupby("d")["value"].sum()
    ma, mb = a.mean(), b.mean()
    ssa, ssb = ((a - ma) ** 2).sum(), ((b - mb) ** 2).sum()
    for r in got.itertuples():
        num = sum(
            (a[d] - ma) * (b[d2] - mb)
            for d in a.index
            for d2 in [d + pd.Timedelta(days=r.lag)]
            if d2 in b.index
        )
        assert r.xcorr == pytest.approx(num / math.sqrt(ssa * ssb), rel=1e-9)
        n_pairs = sum(
            1 for d in a.index if d + pd.Timedelta(days=r.lag) in b.index
        )
        assert r.n_pairs == n_pairs


# --------------------------------------------------------------------------
# q272 centroid silhouette — numpy recompute
# --------------------------------------------------------------------------
def test_q272_silhouette_matches_numpy(spark, sf_dir_t2):
    import pyarrow.parquet as pq

    got = vector.q272_centroid_silhouette(spark, sf_dir_t2).toPandas()
    emb = pq.read_table(
        os.path.join(sf_dir_t2, "embeddings.parquet")
    ).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    cents = {
        lab: X[labels == lab].mean(axis=0) for lab in np.unique(labels)
    }
    C = np.stack([cents[lab] for lab in sorted(cents)])
    order = np.array(sorted(cents))
    d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    own_idx = np.searchsorted(order, labels)
    a = d[np.arange(len(X)), own_idx]
    dm = d.copy()
    dm[np.arange(len(X)), own_idx] = np.inf
    b = dm.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for r in got.itertuples():
        m = labels == r.label
        assert r.n_vecs == int(m.sum())
        assert r.mean_dist_own == pytest.approx(a[m].mean(), rel=1e-9)
        assert r.mean_dist_other == pytest.approx(b[m].mean(), rel=1e-9)
        assert r.silhouette == pytest.approx(s[m].mean(), rel=1e-9)
    # silhouette is bounded
    assert (got["silhouette"].abs() <= 1 + 1e-12).all()


# --------------------------------------------------------------------------
# q273 seasonal decomposition — pandas recompute
# --------------------------------------------------------------------------
def test_q273_decompose_matches_pandas(spark, sf_dir_t2):
    got = temporal.q273_seasonal_decompose(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    daily = ev.groupby(ev["ts"].dt.date)["value"].sum().sort_index()
    x = daily.to_numpy()
    trend = pd.Series(x).rolling(7, center=True).mean().to_numpy()
    keep = ~np.isnan(trend)
    det = x[keep] - trend[keep]
    dows = np.array([d.isoweekday() for d in daily.index])[keep]
    for r in got.itertuples():
        m = dows == r.iso_dow
        assert r.n_days == int(m.sum())
        assert r.seasonal == pytest.approx(det[m].mean(), rel=1e-9)
        resid = det[m] - det[m].mean()
        assert r.resid_std == pytest.approx(
            float(np.sqrt((resid**2).mean())), rel=1e-9
        )
    # additive identity: the day-count-weighted mean of the per-dow
    # seasonal components equals the overall detrended mean (group
    # means aggregate back to the grand mean)
    w = got["n_days"].to_numpy()
    assert (got["seasonal"].to_numpy() * w).sum() / w.sum() == pytest.approx(
        det.mean(), rel=1e-9
    )


# --------------------------------------------------------------------------
# q274 MRR — consistency with the q267 ranking frame
# --------------------------------------------------------------------------
def test_q274_mrr_consistency(spark, sf_dir_t2):
    got = retrieval.q274_mrr_eval(spark, sf_dir_t2).toPandas()
    per = retrieval._bm25_per_term(spark, sf_dir_t2).toPandas()
    for r in got.itertuples():
        g = per[per["term"] == r.term].copy()
        g["score"] = g["contrib"].round(4)
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        g["rank"] = np.arange(1, len(g) + 1)
        best = g["tf"].max()
        first = int(g.loc[g["tf"] == best, "rank"].min())
        assert r.best_tf == best
        assert r.first_rel_rank == first
        assert r.rr == pytest.approx(1.0 / first)
        assert r.hit_at_1 == int(first <= 1)
        assert r.hit_at_5 == int(first <= 5)
        assert r.hit_at_10 == int(first <= 10)


# --------------------------------------------------------------------------
# q275 rules — pandas recompute of the metric identities
# --------------------------------------------------------------------------
def test_q275_rules_match_pandas(spark, sf_dir_t2):
    got = relational_q275(spark, sf_dir_t2)
    li = (
        load(spark, sf_dir_t2, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    n_orders = li["l_orderkey"].nunique()
    counts = li.groupby("l_partkey").size()
    assert len(got) <= 20
    for r in got.itertuples():
        both = len(
            set(li[li["l_partkey"] == r.part_a]["l_orderkey"])
            & set(li[li["l_partkey"] == r.part_b]["l_orderkey"])
        )
        assert r.support == both
        assert r.na == counts[r.part_a] and r.nb == counts[r.part_b]
        assert r.conf_a2b == pytest.approx(both / r.na)
        assert r.conf_b2a == pytest.approx(both / r.nb)
        assert r.lift == pytest.approx(both * n_orders / (r.na * r.nb))
        if r.conf_a2b < 1.0:
            assert r.conviction_a2b == pytest.approx(
                (1 - r.nb / n_orders) / (1 - r.conf_a2b)
            )
    # ranked by forward confidence
    assert (np.diff(got["conf_a2b"]) <= 1e-12).all()


def relational_q275(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import relational

    return relational.q275_rule_confidence(spark, sf_dir).toPandas()


# --------------------------------------------------------------------------
# q276 k-anonymity audit — pandas recompute + monotonicity
# --------------------------------------------------------------------------
def test_q276_kanon_matches_pandas(spark, sf_dir_t2):
    got = quality.q276_kanon_audit(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    cls = (
        pd.DataFrame(
            {
                "et": ev["event_type"],
                "dow": ev["ts"].dt.dayofweek + 1,
                "hour": ev["ts"].dt.hour,
            }
        )
        .groupby(["et", "dow", "hour"])
        .size()
    )
    for r in got.itertuples():
        small = cls[cls < r.k]
        assert r.n_classes == len(cls)
        assert r.n_small_classes == len(small)
        assert r.n_records_at_risk == int(small.sum())
        assert r.risk_share == pytest.approx(small.sum() / len(ev))
    # risk grows with k
    by = got.sort_values("k")
    assert (np.diff(by["risk_share"]) >= -1e-12).all()


# --------------------------------------------------------------------------
# q277 higher moments — numpy recompute from raw values
# --------------------------------------------------------------------------
def test_q277_moments_match_numpy(spark, sf_dir_t2):
    got = quality.q277_higher_moments(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    for r in got.itertuples():
        x = ev.loc[ev["event_type"] == r.event_type, "value"].to_numpy()
        c = np.round(x * 100).astype(np.int64).astype(np.float64)
        mu = c.mean()
        m2 = ((c - mu) ** 2).mean()
        m3 = ((c - mu) ** 3).mean()
        m4 = ((c - mu) ** 4).mean()
        assert r.n == len(x)
        assert r.mean == pytest.approx(mu / 100.0, rel=1e-12)
        assert r.var_pop == pytest.approx(m2 / 1e4, rel=1e-9)
        assert r.skewness == pytest.approx(m3 / m2**1.5, rel=1e-6)
        assert r.kurtosis_excess == pytest.approx(m4 / m2**2 - 3, rel=1e-6)


# --------------------------------------------------------------------------
# q278 one-way ANOVA — numpy recompute
# --------------------------------------------------------------------------
def test_q278_anova_matches_numpy(spark, sf_dir_t2):
    got = quality.q278_anova_oneway(spark, sf_dir_t2).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir_t2)
    c = np.round(ev["value"].to_numpy() * 100)
    groups = [
        c[(ev["event_type"] == et).to_numpy()]
        for et in sorted(ev["event_type"].unique())
    ]
    mu = c.mean()
    ssb = sum(len(g) * (g.mean() - mu) ** 2 for g in groups) / 1e4
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups) / 1e4
    k, n = len(groups), len(c)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["n_groups"] == k and got["n_total"] == n
    assert got["ssb"] == pytest.approx(ssb, rel=1e-9)
    assert got["ssw"] == pytest.approx(ssw, rel=1e-9)
    assert got["f_stat"] == pytest.approx(f, rel=1e-9)


# --------------------------------------------------------------------------
# q261 planted multi-cohort corpus (the sf fixtures front-load all
# users into week 1, so the fixture exercises a single cohort; this
# plants three cohorts and checks the per-cohort accounting)
# --------------------------------------------------------------------------
def test_q261_planted_multicohort(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    # cohorts starting Mon 2024-01-01, 2024-01-08, 2024-01-15; user u of
    # cohort c is active in weeks c..2 with value 10*(c+1) per event
    for c, day0 in enumerate(["2024-01-01", "2024-01-08", "2024-01-15"]):
        assert pd.Timestamp(day0).isoweekday() == 1  # cohort weeks are Mondays
        for u in range(5):
            uid = 100 * (c + 1) + u
            for wk in range(c, 3):
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
                    weeks=wk, days=1, hours=u
                )
                rows.append(
                    (eid, ts.to_pydatetime(), uid, "click", 10.0 * (c + 1), "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    schema = pa.schema(
        [
            pa.field("event_id", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ]
    )
    d = tempfile.mkdtemp(prefix="r9_cohort_")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    try:
        got = temporal.q261_cohort_ltv(spark, d).toPandas()
        # three cohorts; cohort c has 3-c age rows (ages 0..2-c)
        assert got["cohort_week"].nunique() == 3
        for c, cw in enumerate(sorted(got["cohort_week"].unique())):
            g = got[got["cohort_week"] == cw].sort_values("age_weeks")
            assert list(g["age_weeks"]) == list(range(3 - c))
            assert (g["n_users"] == 5).all()
            assert (g["n_active"] == 5).all()
            # 5 users x 10*(c+1) per week, accruing linearly
            assert np.allclose(
                g["ltv_per_user"], [(a + 1) * 10.0 * (c + 1) for a in range(3 - c)]
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q279 Theil-Sen — numpy recompute + robustness property
# --------------------------------------------------------------------------
def test_q279_theil_sen_matches_numpy(spark, sf_dir_t2):
    got = temporal.q279_theil_sen(spark, sf_dir_t2).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir_t2)
    daily = ev.groupby(ev["ts"].dt.date)["value"].sum().sort_index()
    x = np.array(
        [(d - daily.index[0]).days for d in daily.index], dtype=float
    )
    y = daily.to_numpy()
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    assert got["n_days"] == len(x)
    assert got["n_pairs"] == len(slopes)
    assert got["ts_slope"] == pytest.approx(np.median(slopes), rel=1e-9)
    assert got["ts_intercept"] == pytest.approx(
        np.median(y - np.median(slopes) * x), rel=1e-9
    )
    xc, yc = x - x.mean(), y - y.mean()
    assert got["ols_slope"] == pytest.approx(
        (xc * yc).sum() / (xc * xc).sum(), rel=1e-9
    )


# --------------------------------------------------------------------------
# q280 Holt forecast — pandas reference fold
# --------------------------------------------------------------------------
def test_q280_holt_matches_reference_fold(spark, sf_dir_t2):
    got = temporal.q280_holt_forecast(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    ev["d"] = ev["ts"].dt.date
    a, b = temporal.HOLT_ALPHA, temporal.HOLT_BETA
    for r in got.itertuples():
        ys = (
            ev[ev["event_type"] == r.event_type]
            .groupby("d")["value"]
            .sum()
            .sort_index()
            .to_numpy()
        )
        lvl, tr = ys[0], ys[1] - ys[0]
        for y in ys[2:]:
            lnew = a * y + (1 - a) * (lvl + tr)
            tr = b * (lnew - lvl) + (1 - b) * tr
            lvl = lnew
        assert r.n_days == len(ys)
        assert r.level == pytest.approx(lvl, rel=1e-12)
        assert r.trend == pytest.approx(tr, rel=1e-12)
        assert r.fc_1d == pytest.approx(lvl + tr, rel=1e-12)
        assert r.fc_7d == pytest.approx(lvl + 7 * tr, rel=1e-12)


# --------------------------------------------------------------------------
# q281 Tukey contrasts — numpy recompute
# --------------------------------------------------------------------------
def test_q281_contrasts_match_numpy(spark, sf_dir_t2):
    got = quality.q281_tukey_contrasts(spark, sf_dir_t2).toPandas()
    ev = _events_pdf(spark, sf_dir_t2)
    types = sorted(ev["event_type"].unique())
    groups = {t: ev.loc[ev["event_type"] == t, "value"].to_numpy() for t in types}
    n, k = len(ev), len(types)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups.values())
    msw = ssw / (n - k)
    assert len(got) == k * (k - 1) // 2
    for r in got.itertuples():
        ga, gb = groups[r.type_a], groups[r.type_b]
        assert r.na == len(ga) and r.nb == len(gb)
        assert r.mean_diff == pytest.approx(ga.mean() - gb.mean(), rel=1e-9)
        se = math.sqrt(msw * (1 / len(ga) + 1 / len(gb)))
        assert r.se == pytest.approx(se, rel=1e-9)
        assert r.t_stat == pytest.approx((ga.mean() - gb.mean()) / se, rel=1e-9)


# --------------------------------------------------------------------------
# q282 Mann-Whitney — numpy recompute with tie handling
# --------------------------------------------------------------------------
def test_q282_mann_whitney_matches_numpy(spark, sf_dir_t2):
    got = quality.q282_mann_whitney(spark, sf_dir_t2).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir_t2)
    a = ev.loc[ev["event_type"] == quality.MW_A, "value"].to_numpy()
    b = ev.loc[ev["event_type"] == quality.MW_B, "value"].to_numpy()
    combined = np.concatenate([a, b])
    order = pd.Series(combined).rank(method="average").to_numpy()
    ra = order[: len(a)].sum()
    ua = ra - len(a) * (len(a) + 1) / 2
    ub = len(a) * len(b) - ua
    n = len(a) + len(b)
    _, t_counts = np.unique(combined, return_counts=True)
    tie = (t_counts.astype(float) ** 3 - t_counts).sum()
    var_u = len(a) * len(b) / 12 * ((n + 1) - tie / (n * (n - 1)))
    assert got["na"] == len(a) and got["nb"] == len(b)
    assert got["u_a"] == pytest.approx(ua, rel=1e-12)
    assert got["u_b"] == pytest.approx(ub, rel=1e-12)
    assert got["z_stat"] == pytest.approx(
        (ua - len(a) * len(b) / 2) / math.sqrt(var_u), rel=1e-9
    )
    assert got["rank_biserial"] == pytest.approx(
        1 - 2 * ub / (len(a) * len(b)), rel=1e-9
    )


# --------------------------------------------------------------------------
# q283 SNM — pandas recompute + decay property
# --------------------------------------------------------------------------
def test_q283_snm_matches_pandas(spark, sf_dir_t2):
    import re as _re

    from generative_ai_vector_db_spark.operators import dedup

    got = dedup.q283_snm_dedup(spark, sf_dir_t2).toPandas()
    docs = load(spark, sf_dir_t2, "documents").toPandas()
    docs["canon"] = (
        docs["text"]
        .str.lower()
        .map(lambda t: _re.sub(r"[^a-z0-9]+", " ", t).strip())
    )
    docs = docs.sort_values(["canon", "doc_id"]).reset_index(drop=True)

    def sh(c):
        w = c.split(" ")
        return set(
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        ) if len(w) >= 3 else set()

    shs = docs["canon"].map(sh).tolist()
    for r in got.itertuples():
        o = r.sort_offset
        n_cand = len(docs) - o
        matches = 0
        for i in range(n_cand):
            sa, sb = shs[i], shs[i + o]
            u = len(sa | sb)
            if u > 0 and len(sa & sb) / u >= dedup.SNM_JACCARD:
                matches += 1
        assert r.n_candidates == n_cand
        assert r.n_matches == matches
    # SNM decay: offset-1 catches the sorted-adjacent duplicates; far
    # offsets catch (almost) none
    by = got.sort_values("sort_offset")
    assert by["n_matches"].iloc[0] > 0
    assert by["n_matches"].iloc[-1] <= by["n_matches"].iloc[0] // 4


# --------------------------------------------------------------------------
# q284/q285 binary codes — numpy recompute + planted-cluster recall
# --------------------------------------------------------------------------
def _pack_bits(x):
    hi = 0
    for v in x[:32]:
        hi = hi * 2 + (1 if v >= 0 else 0)
    lo = 0
    for v in x[32:]:
        lo = lo * 2 + (1 if v >= 0 else 0)
    return hi, lo


def test_q284_hamming_matches_numpy(spark, sf_dir_t2):
    import pyarrow.parquet as pq

    got = vector.q284_binary_hamming_topk(spark, sf_dir_t2).toPandas()
    emb = pq.read_table(
        os.path.join(sf_dir_t2, "embeddings.parquet")
    ).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    codes = {i: _pack_bits(x) for i, x in zip(ids, X)}
    qh, ql = codes[vector.BINARY_Q_ID]
    dists = sorted(
        (bin(h ^ qh).count("1") + bin(lo ^ ql).count("1"), int(i))
        for i, (h, lo) in codes.items()
        if i != vector.BINARY_Q_ID
    )
    want = dists[: vector.K]
    assert list(zip(got["hamming"], got["vec_id"])) == want
    assert list(got["rn"]) == list(range(1, vector.K + 1))


def test_q285_planted_clusters_high_recall(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(85)
    rows, vid = [], 0
    for c in range(10):
        center = rng.normal(0, 1, 64)
        center /= np.linalg.norm(center)
        for _ in range(20):
            v = center + 0.1 * rng.normal(0, 1, 64)
            v /= np.linalg.norm(v)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    d = tempfile.mkdtemp(prefix="r9_bin_")
    schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ]
    )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(d, "embeddings.parquet"),
    )
    try:
        r = vector.q285_binary_recall_eval(spark, d).toPandas().iloc[0]
        # query (vec 0) lives in cluster 0; sign codes identify the
        # right CLUSTER almost perfectly but cannot fine-rank inside it
        # (1-bit codes carry no within-cluster angle resolution — this
        # is why binary retrieval is a first-stage filter ahead of an
        # exact re-rank, the q284 header's framing). Planted measured
        # recall 0.69 vs ~0.3 on the isotropic fixture.
        assert r["recall"] >= 0.6
        top = vector.q284_binary_hamming_topk(spark, d).toPandas()
        in_cluster = (top["vec_id"] < 20).sum()  # cluster 0 = vec 0..19
        assert in_cluster >= 10
    finally:
        shutil.rmtree(d, ignore_errors=True)
