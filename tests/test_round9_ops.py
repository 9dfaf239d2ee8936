"""Round-9 operators q248-q259: invariant tests on the sf0.001/sf0.01
fixtures plus independent numpy/pandas reference recomputations for the
semantics the oracle hash alone exercises weakly (CDC tombstone
exclusion, Gini rank weighting, Kaplan-Meier fold order, change-point
argmax, pruning monotonicity)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from generative_ai_vector_db_spark.operators import (
    dedup,
    quality,
    relational,
    scale,
    store,
    temporal,
    text,
    vector,
)
from generative_ai_vector_db_spark.tables import load


# --------------------------------------------------------------------------
# q248 CDC apply
# --------------------------------------------------------------------------
def test_q248_cdc_tombstones_and_counts(spark, sf_dir_t2):
    got = store.q248_cdc_apply(spark, sf_dir_t2).toPandas()
    ev = (
        load(spark, sf_dir_t2, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    last = ev.groupby("user_id").tail(1)
    live = set(last[last["event_type"] != "error"]["user_id"])
    assert set(got["user_id"]) == live  # tombstoned keys are gone
    counts = ev.groupby("user_id").size()
    for r in got.itertuples():
        assert r.n_ops == counts[r.user_id]
    # final_value equals the last event's value for a sampled user
    u = got["user_id"].iloc[0]
    want = last[last["user_id"] == u]["value"].iloc[0]
    assert abs(got[got["user_id"] == u]["final_value"].iloc[0] - round(want, 4)) < 1e-9


# --------------------------------------------------------------------------
# q249 A/B lift
# --------------------------------------------------------------------------
def test_q249_ab_lift_consistency(spark, sf_dir_t2):
    r = quality.q249_ab_lift(spark, sf_dir_t2).toPandas().iloc[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert abs(r.rate_a - r.conv_a / r.n_a) < 1e-12
    assert abs(r.abs_lift - (r.rate_b - r.rate_a)) < 1e-12
    # z sign matches the lift direction; conversion is non-degenerate
    assert 0 < r.conv_a < r.n_a or 0 < r.conv_b < r.n_b
    assert np.sign(r.z_stat) == np.sign(r.abs_lift)


# --------------------------------------------------------------------------
# q250 Gini — numpy reference on the collected per-user sums
# --------------------------------------------------------------------------
def test_q250_gini_matches_numpy(spark, sf_dir_t2):
    got = quality.q250_gini_concentration(spark, sf_dir_t2).toPandas()
    ev = load(spark, sf_dir_t2, "events").select(
        "event_type", "user_id", "value"
    ).toPandas()
    for r in got.itertuples():
        g = ev[ev["event_type"] == r.event_type]
        x = (
            g.groupby("user_id")["value"]
            .sum()
            .round(4)
            .reset_index()
            .sort_values(["value", "user_id"])["value"]
            .to_numpy()
        )
        n = len(x)
        rank = np.arange(1, n + 1)
        gini = (2.0 * np.sum(rank * x) - (n + 1.0) * x.sum()) / (n * x.sum())
        assert abs(r.gini - gini) < 1e-9, r.event_type
        assert 0.0 <= r.gini < 1.0


# --------------------------------------------------------------------------
# q251 prune advisor
# --------------------------------------------------------------------------
def test_q251_pruning_monotone_and_exact(spark, sf_dir_t2):
    got = (
        scale.q251_prune_advisor(spark, sf_dir_t2)
        .toPandas()
        .set_index("layout")
    )
    m, o = got.loc["shipdate_month"], got.loc["orderkey_range"]
    # both layouts agree on the ground truth
    assert m.rows_total == o.rows_total and m.rows_matched == o.rows_matched
    # the clustered-by-predicate-column layout never scans more
    assert m.rows_scanned <= o.rows_scanned
    assert m.files_scanned == 3  # Jan/Feb/Mar 1994 files only
    # zone maps are sound: every matching row is inside a scanned file
    assert m.rows_scanned >= m.rows_matched
    assert o.rows_scanned >= o.rows_matched


# --------------------------------------------------------------------------
# q252 readability — recompute one source in pandas
# --------------------------------------------------------------------------
def test_q252_readability_reference(spark, sf_dir):
    import re

    got = text.q252_readability(spark, sf_dir).toPandas()
    docs = load(spark, sf_dir, "documents").select("source", "text").toPandas()
    src = got["source"].iloc[0]
    g = docs[docs["source"] == src]
    w = s = y = 0
    fl = []
    for t in g["text"]:
        tw = len(re.findall(r"[a-z0-9]+", t.lower()))
        ts = max(len(re.findall(r"[.!?]+", t)), 1)
        ty = len(re.findall(r"[aeiouy]+", t.lower()))
        w, s, y = w + tw, s + ts, y + ty
        fl.append(206.835 - 1.015 * (tw / ts) - 84.6 * (ty / tw))
    row = got[got["source"] == src].iloc[0]
    assert row.n_docs == len(g)
    assert abs(row.words_per_sentence - w / s) < 1e-9
    assert abs(row.avg_flesch - np.mean(fl)) < 1e-9


# --------------------------------------------------------------------------
# q253 canonical dedup
# --------------------------------------------------------------------------
def test_q253_prefix_collapses_at_least_canon(spark, sf_dir_t2):
    got = dedup.q253_canonical_dedup(spark, sf_dir_t2).toPandas()
    assert (got["exact_canon_dups"] >= 0).all()
    # the 8-token prefix is a coarsening of the full canon
    assert (got["prefix_dups"] >= got["exact_canon_dups"]).all()
    assert (got["prefix_dup_rate"] <= 1.0).all()
    # the fixture plants boilerplate-headed docs: some source collapses
    assert got["prefix_dups"].sum() > 0


# --------------------------------------------------------------------------
# q254 Kaplan-Meier — numpy reference + shape invariants
# --------------------------------------------------------------------------
def test_q254_survival_matches_numpy(spark, sf_dir_t2):
    got = temporal.q254_survival_retention(spark, sf_dir_t2).toPandas()
    ev = load(spark, sf_dir_t2, "events").select("user_id", "ts").toPandas()
    days = ev.assign(d=ev["ts"].dt.normalize()).groupby("user_id")["d"]
    lt = ((days.max() - days.min()).dt.days).to_numpy()
    surv = 1.0
    for r in got.itertuples():
        n_t = int((lt >= r.t).sum())
        d_t = int((lt == r.t).sum())
        assert r.n_at_risk == n_t and r.n_deaths == d_t, r.t
        surv = surv * (1.0 - d_t / n_t) if n_t else surv
        assert abs(r.survival - surv) < 1e-12, r.t
    # survival curve is monotone non-increasing from 1
    s = got.sort_values("t")["survival"].to_numpy()
    assert s[0] <= 1.0 + 1e-12 and (np.diff(s) <= 1e-12).all()


# --------------------------------------------------------------------------
# q255 effective rank
# --------------------------------------------------------------------------
def test_q255_effective_rank_bounds_and_numpy(spark, sf_dir):
    r = vector.q255_effective_rank(spark, sf_dir).toPandas().iloc[0]
    emb = load(spark, sf_dir, "embeddings").select("embedding").toPandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    G = X.T @ X
    er = np.trace(G) ** 2 / np.sum(G * G)
    assert 1.0 <= r.effective_rank <= r.dim
    assert abs(r.effective_rank - er) < 1e-6 * er
    assert abs(r.rank_fraction - r.effective_rank / r.dim) < 1e-12


# --------------------------------------------------------------------------
# q256 ACF
# --------------------------------------------------------------------------
def test_q256_acf_bounds_and_numpy(spark, sf_dir_t2):
    got = temporal.q256_acf(spark, sf_dir_t2).toPandas()
    assert list(got["lag"]) == [1, 2, 3, 4, 5, 6, 7]
    assert (got["acf"].abs() <= 1.0 + 1e-9).all()
    ev = load(spark, sf_dir_t2, "events").select("ts", "value").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.normalize()).groupby("d")["value"].sum().sort_index()
    )
    x = daily.to_numpy()
    mu = x.mean()
    denom = ((x - mu) ** 2).sum()
    idx = daily.index
    pos = {d: i for i, d in enumerate(idx)}
    for r in got.itertuples():
        num = 0.0
        n_pairs = 0
        for d, i in pos.items():
            j = pos.get(d - pd.Timedelta(days=r.lag))
            if j is not None:
                num += (x[i] - mu) * (x[j] - mu)
                n_pairs += 1
        assert r.n_pairs == n_pairs
        assert abs(r.acf - num / denom) < 1e-9


# --------------------------------------------------------------------------
# q257 change point — brute-force argmax reference
# --------------------------------------------------------------------------
def test_q257_change_point_matches_bruteforce(spark, sf_dir_t2):
    r = temporal.q257_change_point(spark, sf_dir_t2).toPandas().iloc[0]
    ev = load(spark, sf_dir_t2, "events").select("ts", "value").toPandas()
    daily = (
        ev.assign(d=ev["ts"].dt.normalize()).groupby("d")["value"].sum().sort_index()
    )
    x = daily.to_numpy()
    best = None
    for k in range(1, len(x)):
        diff = abs(x[k:].mean() - x[:k].mean())
        if best is None or diff > best[0] + 1e-15:
            best = (diff, k)
    assert r.n_before == best[1]
    assert abs(r.abs_shift - best[0]) < 1e-9
    assert str(daily.index[best[1] - 1].date()) == r.split_day


# --------------------------------------------------------------------------
# q258 BPE pairs
# --------------------------------------------------------------------------
def test_q258_bpe_pairs_shape(spark, sf_dir_t2):
    got = text.q258_bpe_pair_stats(spark, sf_dir_t2).toPandas()
    assert len(got) == text.BPE_TOP_PAIRS
    assert (got["pair"].str.len() == 2).all()
    assert got["pair"].str.fullmatch("[a-z]{2}").all()
    # ordered by count desc then pair
    c = got["n_occurrences"].to_numpy()
    assert (np.diff(c) <= 0).all()
    assert (got["share"] > 0).all() and got["share"].sum() < 1.0
    assert (got["n_distinct_words"] <= got["n_occurrences"]).all()


# --------------------------------------------------------------------------
# q259 fill latency
# --------------------------------------------------------------------------
def test_q259_latency_percentile_ordering(spark, sf_dir_t2):
    got = relational.q259_fill_latency(spark, sf_dir_t2).toPandas()
    assert len(got) == 5  # TPC-H priorities
    assert (got["p50_days"] <= got["p90_days"]).all()
    assert (got["p90_days"] <= got["max_days"] + 1e-9).all()
    assert (got["avg_days"] > 0).all()
    n_orders_with_lines = (
        load(spark, sf_dir_t2, "lineitem").select("l_orderkey").distinct().count()
    )
    assert got["n_orders"].sum() == n_orders_with_lines
