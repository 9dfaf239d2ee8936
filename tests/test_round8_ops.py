"""Round-8 operators: invariant tests on the sf0.001 fixture plus
brute-force-reference property checks on generated corpora for the
semantics the fixture exercises only weakly (island boundaries, OHLC
first/last ties, split cut points, MAD thresholds, vote ties)."""

from __future__ import annotations

import math
import os
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from generative_ai_vector_db_spark.operators import (
    quality,
    retrieval,
    temporal,
    vector,
)

EPOCH = datetime(2024, 1, 1)


def _tmp_table(name: str, pdf: pd.DataFrame) -> str:
    d = tempfile.mkdtemp(prefix=f"r8_{name}_")
    pdf.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
    return d


# --------------------------------------------------------------------------
# q73 stratified temporal split
# --------------------------------------------------------------------------
def test_q73_split_fractions_and_ordering(spark, sf_dir_t2):
    pdf = temporal.q73_temporal_split(spark, sf_dir_t2).toPandas()
    assert set(pdf["split"]) == {"train", "val", "test"}
    for et, g in pdf.groupby("event_type"):
        by = {r.split: r for r in g.itertuples()}
        n = sum(r.n_rows for r in by.values())
        assert by["train"].n_rows == math.floor(0.8 * n)
        assert by["train"].n_rows + by["val"].n_rows == math.floor(0.9 * n)
        # temporal ordering: train ends at-or-before val starts, etc.
        assert by["train"].ts_last <= by["val"].ts_first
        assert by["val"].ts_last <= by["test"].ts_first


def test_q73_split_is_exhaustive(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.tables import load

    total = load(spark, sf_dir_t2, "events").count()
    pdf = temporal.q73_temporal_split(spark, sf_dir_t2).toPandas()
    assert int(pdf["n_rows"].sum()) == total


# --------------------------------------------------------------------------
# q231 OHLC bars vs a pandas reference
# --------------------------------------------------------------------------
def test_q231_ohlc_matches_pandas_reference(spark):
    rng = np.random.default_rng(8)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            # duplicate timestamps on purpose: tie-break is event_id
            "ts": [EPOCH + timedelta(seconds=int(s)) for s in rng.integers(0, 7200, n)],
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.normal(0, 10, n), 6),
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    got = temporal.q231_ohlc_bars(spark, d).toPandas()
    ref = pdf.copy()
    ref["bucket"] = ref["ts"].dt.floor("h")
    rows = []
    for (et, b), g in ref.groupby(["event_type", "bucket"]):
        g = g.sort_values(["ts", "event_id"])
        rows.append(
            {
                "event_type": et,
                "bucket": b.strftime("%Y-%m-%d %H:%M:%S"),
                "open": round(g["value"].iloc[0], 4),
                "high": round(g["value"].max(), 4),
                "low": round(g["value"].min(), 4),
                "close": round(g["value"].iloc[-1], 4),
                "n_events": len(g),
            }
        )
    want = pd.DataFrame(rows).sort_values(["event_type", "bucket"]).reset_index(drop=True)
    got = got.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    for c in ["open", "high", "low", "close"]:
        assert np.allclose(got[c], want[c], atol=1e-9), c
    assert got["n_events"].tolist() == want["n_events"].tolist()


# --------------------------------------------------------------------------
# q233 time-RANGE moving average vs brute force
# --------------------------------------------------------------------------
def test_q233_range_frame_matches_bruteforce(spark):
    rng = np.random.default_rng(33)
    n = 200
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": [
                EPOCH + timedelta(seconds=float(s))
                for s in np.sort(rng.uniform(0, 3000, n))
            ],
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": ["x"] * n,
            "value": rng.normal(0, 5, n),
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    got = (
        temporal.q233_range_frame_ma(spark, d)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000).to_numpy()
    vals = pdf["value"].to_numpy()
    for i in range(0, n, 17):
        mask = (us >= us[i] - temporal.RANGE_MA_US) & (us <= us[i])
        assert int(got.loc[i, "n_in_frame"]) == int(mask.sum())
        assert got.loc[i, "ma_10m"] == pytest.approx(vals[mask].mean(), abs=1e-4)


# --------------------------------------------------------------------------
# q238 gaps-and-islands vs brute force
# --------------------------------------------------------------------------
def test_q238_islands_match_bruteforce(spark):
    rng = np.random.default_rng(38)
    rows = []
    want = {}
    eid = 0
    for uid in range(12):
        days = sorted(rng.choice(60, size=rng.integers(1, 25), replace=False))
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[uid] = (len(days), len(runs), max(runs))
        for day in days:
            rows.append(
                {
                    "event_id": eid,
                    "ts": EPOCH + timedelta(days=int(day), hours=3),
                    "user_id": uid,
                    "event_type": "a",
                    "value": 0.0,
                    "props": "{}",
                }
            )
            eid += 1
    d = _tmp_table("events", pd.DataFrame(rows))
    got = temporal.q238_gaps_islands(spark, d).toPandas()
    for r in got.itertuples():
        assert (r.n_active_days, r.n_islands, r.longest_run) == want[r.user_id]


# --------------------------------------------------------------------------
# q232 correlation profile
# --------------------------------------------------------------------------
def test_q232_corr_bounds_and_counts(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.tables import load

    pdf = quality.q232_source_corr(spark, sf_dir_t2).toPandas()
    assert int(pdf["n_docs"].sum()) == load(spark, sf_dir_t2, "documents").count()
    finite = pdf["corr_chars_tokens"].dropna()
    assert ((finite >= -1.0001) & (finite <= 1.0001)).all()
    assert (pdf["sd_chars"].dropna() >= 0).all()


# --------------------------------------------------------------------------
# q234 mutual information invariants
# --------------------------------------------------------------------------
def test_q234_mi_bounds(spark, sf_dir_t2):
    row = quality.q234_mutual_info(spark, sf_dir_t2).toPandas().iloc[0]
    # MI >= 0 and bounded by each marginal entropy; NMI in [0, 1]
    assert row["mi_nats"] >= -1e-9
    assert row["mi_nats"] <= min(row["h_lang"], row["h_source"]) + 1e-9
    assert -1e-9 <= row["nmi"] <= 1 + 1e-9


def test_q234_mi_independent_is_zero(spark):
    # perfectly independent lang x source grid -> MI exactly 0
    rows = []
    doc = 0
    for lang in ["en", "fr"]:
        for source in ["s1", "s2", "s3"]:
            for _ in range(7):
                rows.append(
                    {
                        "doc_id": doc,
                        "text": "t",
                        "lang": lang,
                        "source": source,
                        "n_chars": 1,
                    }
                )
                doc += 1
    d = _tmp_table("documents", pd.DataFrame(rows))
    row = quality.q234_mutual_info(spark, d).toPandas().iloc[0]
    assert row["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert row["n_cells"] == 6


# --------------------------------------------------------------------------
# q235 MAD outliers vs numpy reference
# --------------------------------------------------------------------------
def test_q235_mad_matches_numpy(spark):
    rng = np.random.default_rng(35)
    vals = np.concatenate([rng.normal(0, 1, 500), [40.0, -35.0, 60.0]])
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype="int64"),
            "ts": [EPOCH + timedelta(seconds=i) for i in range(len(vals))],
            "user_id": np.zeros(len(vals), dtype="int64"),
            "event_type": ["m"] * len(vals),
            "value": vals,
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    got = quality.q235_mad_outliers(spark, d).toPandas().iloc[0]
    med = np.quantile(vals, 0.5)
    mad = np.quantile(np.abs(vals - med), 0.5)
    assert got["med"] == pytest.approx(med, abs=1e-4)
    assert got["mad"] == pytest.approx(mad, abs=1e-4)
    n_out = int((np.abs(vals - med) > 3 * 1.4826 * mad).sum())
    assert int(got["n_outliers"]) == n_out
    assert n_out >= 3  # the planted spikes are caught


# --------------------------------------------------------------------------
# q236 inverted index
# --------------------------------------------------------------------------
def test_q236_postings_sorted_and_df_consistent(spark, sf_dir_t2):
    pdf = retrieval.q236_inverted_index(spark, sf_dir_t2).toPandas()
    assert len(pdf) > 0
    assert (pdf["df"] >= retrieval.INDEX_MIN_DF).all()
    assert (pdf["tf_total"] >= pdf["df"]).all()
    for r in pdf.itertuples():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == r.df


# --------------------------------------------------------------------------
# q237 kNN classify vs brute force
# --------------------------------------------------------------------------
def test_q237_knn_matches_bruteforce(spark, sf_dir_t2):
    import pyarrow.parquet as pq

    emb = pq.read_table(
        os.path.join(sf_dir_t2, "embeddings.parquet")
    ).to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    got = vector.q237_knn_classify(spark, sf_dir_t2).toPandas()
    assert len(got) == vector.N_QUERY
    for r in got.itertuples():
        qi = np.where(ids == r.q_id)[0][0]
        dist = np.round(np.sqrt(((vecs - vecs[qi]) ** 2).sum(axis=1)), 4)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != r.q_id),
            key=lambda i: (dist[i], ids[i]),
        )[: vector.K]
        votes: dict[int, int] = {}
        for i in order:
            votes[labels[i]] = votes.get(labels[i], 0) + 1
        pred = min(votes, key=lambda label: (-votes[label], label))
        assert r.pred_label == pred
        assert r.n_votes == votes[pred]


# --------------------------------------------------------------------------
# q239 RFM segmentation
# --------------------------------------------------------------------------
def test_q239_rfm_partitions_users(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.tables import load

    pdf = quality.q239_rfm_segmentation(spark, sf_dir_t2).toPandas()
    n_users = (
        load(spark, sf_dir_t2, "events").select("user_id").distinct().count()
    )
    assert int(pdf["n_users"].sum()) == n_users
    for seg in pdf["segment"]:
        assert len(seg) == 3 and all(c in "1234" for c in seg)


# --------------------------------------------------------------------------
# q240 Benford first-digit test
# --------------------------------------------------------------------------
def test_q240_benford_digits_and_totals(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.tables import load

    pdf = quality.q240_benford_test(spark, sf_dir_t2).toPandas()
    assert set(pdf["digit"]).issubset(set(range(1, 10)))
    n = load(spark, sf_dir_t2, "orders").where("o_totalprice > 0").count()
    assert int(pdf["n_obs"].sum()) == n
    assert pdf["n_exp"].sum() == pytest.approx(n, rel=1e-3)
    assert (pdf["chi2_part"] >= 0).all()


def test_q240_benford_digit_extraction(spark):
    # known leading digits across magnitudes, incl. values < 1
    vals = [0.042, 0.9, 1.5, 19.99, 250.0, 3999.5, 70000.0]
    pdf = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(vals), dtype="int64"),
            "o_custkey": np.zeros(len(vals), dtype="int64"),
            "o_orderstatus": ["O"] * len(vals),
            "o_totalprice": vals,
            "o_orderdate": [EPOCH] * len(vals),
            "o_orderpriority": ["1-URGENT"] * len(vals),
        }
    )
    d = _tmp_table("orders", pdf)
    got = quality.q240_benford_test(spark, d).toPandas()
    counts = dict(zip(got["digit"], got["n_obs"]))
    assert counts == {1: 2, 2: 1, 3: 1, 4: 1, 7: 1, 9: 1}


# --------------------------------------------------------------------------
# q241 interpolation join vs brute force
# --------------------------------------------------------------------------
def test_q241_interp_matches_bruteforce(spark):
    rng = np.random.default_rng(41)
    rows = []
    eid = 0
    for uid in range(6):
        for _ in range(rng.integers(0, 12)):  # some users have no clicks
            rows.append((eid, EPOCH + timedelta(seconds=float(rng.uniform(0, 5000))),
                         uid, "click", float(rng.normal(10, 3))))
            eid += 1
        for _ in range(rng.integers(1, 8)):
            rows.append((eid, EPOCH + timedelta(seconds=float(rng.uniform(0, 5000))),
                         uid, "error", 0.0))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["props"] = "{}"
    d = _tmp_table("events", pdf)
    got = temporal.q241_interpolation_join(spark, d).toPandas().set_index("event_id")
    us_all = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000
    for r in pdf[pdf["event_type"] == "error"].itertuples():
        clicks = pdf[(pdf["event_type"] == "click") & (pdf["user_id"] == r.user_id)]
        t = us_all[r.Index]
        cus = us_all[clicks.index]
        prev = clicks[(cus <= t).values]
        nxt = clicks[(cus >= t).values]
        g = got.loc[r.event_id]
        if prev.empty and nxt.empty:
            assert g["mode"] == "none" and pd.isna(g["interp_value"])
            continue
        pv = prev.loc[us_all[prev.index].idxmax(), "value"] if not prev.empty else None
        nv = nxt.loc[us_all[nxt.index].idxmin(), "value"] if not nxt.empty else None
        if pv is None:
            assert g["mode"] == "bfill"
            assert g["interp_value"] == pytest.approx(nv, abs=1e-4)
        elif nv is None:
            assert g["mode"] == "ffill"
            assert g["interp_value"] == pytest.approx(pv, abs=1e-4)
        else:
            pt, nt = us_all[prev.index].max(), us_all[nxt.index].min()
            want = pv if nt == pt else pv + (nv - pv) * (t - pt) / (nt - pt)
            assert g["mode"] == "interp"
            assert g["interp_value"] == pytest.approx(want, abs=1e-4)


# --------------------------------------------------------------------------
# q242 BFS shortest paths vs python BFS over the same edges
# --------------------------------------------------------------------------
def test_q242_bfs_matches_python_reference(spark, sf_dir):
    from collections import deque

    from generative_ai_vector_db_spark.operators import graph

    edges = graph._covisit_edges(spark, sf_dir).toPandas()
    adj: dict[int, set[int]] = {}
    for r in edges.itertuples():
        adj.setdefault(int(r.src), set()).add(int(r.dst))
    src = min(adj)
    want = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if want[n] >= graph.BFS_MAX_HOPS:
            continue
        for m in adj.get(n, ()):
            if m not in want:
                want[m] = want[n] + 1
                q.append(m)
    got = graph.q242_shortest_paths(spark, sf_dir).toPandas()
    assert dict(zip(got["node"], got["hops"])) == want


# --------------------------------------------------------------------------
# q243 split leakage with planted cross-split duplicates
# --------------------------------------------------------------------------
def test_q243_planted_leakage(spark):
    # doc_id % 10: 0-7 train, 8 val, 9 test. Plant: val doc 8 dups a
    # train doc; test doc 19 dups a train doc; val doc 18 unique.
    rows = [
        {"doc_id": i, "text": f"train text {i}", "lang": "en",
         "source": "s", "n_chars": 10}
        for i in range(8)
    ]
    rows += [
        {"doc_id": 8, "text": "train text 3", "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 9, "text": "unique test a", "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 18, "text": "unique val b", "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 19, "text": "train text 5", "lang": "en", "source": "s", "n_chars": 10},
    ]
    d = _tmp_table("documents", pd.DataFrame(rows))
    got = quality.q243_split_leakage(spark, d).toPandas().set_index("split")
    assert got.loc["val", "n_docs"] == 2 and got.loc["val", "n_leaked"] == 1
    assert got.loc["test", "n_docs"] == 2 and got.loc["test", "n_leaked"] == 1
    assert got.loc["val", "leak_pct"] == pytest.approx(50.0)


# --------------------------------------------------------------------------
# q244 run-length compaction vs brute force
# --------------------------------------------------------------------------
def test_q244_runs_match_bruteforce(spark):
    rng = np.random.default_rng(44)
    rows = []
    eid = 0
    for uid in range(8):
        seq = rng.choice(["a", "b"], size=rng.integers(1, 30), p=[0.7, 0.3])
        for i, et in enumerate(seq):
            rows.append(
                {"event_id": eid, "ts": EPOCH + timedelta(seconds=i),
                 "user_id": uid, "event_type": str(et), "value": 0.0, "props": "{}"}
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    d = _tmp_table("events", pdf)
    got = temporal.q244_run_length(spark, d).toPandas().set_index("event_type")
    # brute force
    from itertools import groupby

    stats: dict[str, list[int]] = {}
    for uid, g in pdf.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for et, run in groupby(seq):
            stats.setdefault(et, []).append(len(list(run)))
    for et, runs in stats.items():
        assert got.loc[et, "n_runs"] == len(runs)
        assert got.loc[et, "n_events"] == sum(runs)
        assert got.loc[et, "max_run_len"] == max(runs)
        assert got.loc[et, "avg_run_len"] == pytest.approx(
            sum(runs) / len(runs), abs=1e-4
        )


# --------------------------------------------------------------------------
# hypothesis: edge regimes the fixture cannot produce
# --------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=50),  # many ts ties
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(evs=events_strategy)
def test_q73_property_split_sizes_and_order(spark, evs):
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(evs), dtype="int64"),
            "ts": [EPOCH + timedelta(seconds=s) for _, s in evs],
            "user_id": np.zeros(len(evs), dtype="int64"),
            "event_type": [t for t, _ in evs],
            "value": np.zeros(len(evs)),
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    got = temporal.q73_temporal_split(spark, d).toPandas()
    for et, g in pdf.groupby("event_type"):
        n = len(g)
        cells = got[got["event_type"] == et].set_index("split")
        n_train = math.floor(0.8 * n)
        n_val = math.floor(0.9 * n) - n_train
        n_test = n - n_train - n_val
        assert int(cells["n_rows"].sum()) == n
        assert (
            int(cells.loc["train", "n_rows"]) if "train" in cells.index else 0
        ) == n_train
        assert (
            int(cells.loc["val", "n_rows"]) if "val" in cells.index else 0
        ) == n_val
        assert (
            int(cells.loc["test", "n_rows"]) if "test" in cells.index else 0
        ) == n_test
        # time ordering holds whenever both cells exist
        if "train" in cells.index and "test" in cells.index:
            assert cells.loc["train", "ts_last"] <= cells.loc["test", "ts_first"]


values_strategy = st.lists(
    st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(vals=values_strategy)
def test_q235_property_vs_numpy(spark, vals):
    vals = [float(v) for v in vals]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype="int64"),
            "ts": [EPOCH + timedelta(seconds=i) for i in range(len(vals))],
            "user_id": np.zeros(len(vals), dtype="int64"),
            "event_type": ["g"] * len(vals),
            "value": vals,
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    got = quality.q235_mad_outliers(spark, d).toPandas().iloc[0]
    arr = np.array(vals)
    med = np.quantile(arr, 0.5)
    mad = np.quantile(np.abs(arr - med), 0.5)
    assert got["med"] == pytest.approx(med, abs=1e-4)
    assert got["mad"] == pytest.approx(mad, abs=1e-4)
    assert int(got["n_outliers"]) == int(
        (np.abs(arr - med) > 3 * 1.4826 * mad).sum()
    )


# --------------------------------------------------------------------------
# q245 power iteration vs numpy eigendecomposition
# --------------------------------------------------------------------------
def test_q245_power_iteration_matches_numpy(spark, sf_dir_t2):
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(sf_dir_t2, "embeddings.parquet")).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    G = X.T @ X
    # the operator's declared semantics: 10-round Rayleigh estimate
    v = np.full(X.shape[1], 1.0 / np.sqrt(X.shape[1]))
    for _ in range(vector.POWER_ITERS):
        u = G @ v
        v = u / np.sqrt((u * u).sum())
    rayleigh = float(v @ G @ v)
    got = vector.q245_power_iteration(spark, sf_dir_t2).toPandas().iloc[0]
    assert got["n_vec"] == len(emb) and got["dim"] == X.shape[1]
    assert got["top_eig"] == pytest.approx(rayleigh, abs=1e-3)
    assert got["trace_total"] == pytest.approx(float(np.trace(G)), abs=1e-3)
    # sanity: Rayleigh estimate is a lower bound on the true lambda_1
    lam1 = float(np.linalg.eigvalsh(G).max())
    assert got["top_eig"] <= lam1 + 1e-6
    assert got["explained_frac"] == pytest.approx(rayleigh / np.trace(G), abs=1e-4)


def test_q245_planted_anisotropy_detected(spark):
    # rank-1-dominated corpus -> explained_frac near 1
    rng = np.random.default_rng(45)
    base = rng.normal(0, 1, 64)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(200):
        v = base + 0.05 * rng.normal(0, 1, 64)
        v /= np.linalg.norm(v)
        rows.append((i, v.astype("float32").tolist(), 0))
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="r8_aniso_")
    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32()),
    ])
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(d, "embeddings.parquet"),
    )
    got = vector.q245_power_iteration(spark, d).toPandas().iloc[0]
    assert got["explained_frac"] > 0.8  # collapse detected (isotropic ~0.03)


# --------------------------------------------------------------------------
# q246 revenue bridge: the decomposition identity
# --------------------------------------------------------------------------
def test_q246_bridge_effects_sum_to_delta(spark, sf_dir_t2):
    from generative_ai_vector_db_spark.operators import relational

    pdf = relational.q246_revenue_bridge(spark, sf_dir_t2).toPandas()
    assert len(pdf) > 0
    # price_effect + volume_effect == delta exactly (up to output rounding)
    assert np.allclose(
        pdf["price_effect"] + pdf["volume_effect"], pdf["delta"], atol=2e-4
    )
    assert np.allclose(pdf["rev1"] - pdf["rev0"], pdf["delta"], atol=2e-4)


# --------------------------------------------------------------------------
# q247 records & drawdown vs brute force
# --------------------------------------------------------------------------
def test_q247_records_match_bruteforce(spark):
    rng = np.random.default_rng(47)
    rows = []
    eid = 0
    series = {}
    for et in ["a", "b"]:
        vals = rng.normal(100, 30, 40)
        series[et] = vals
        for d, v in enumerate(vals):
            rows.append(
                {"event_id": eid, "ts": EPOCH + timedelta(days=d, hours=1),
                 "user_id": 0, "event_type": et, "value": float(v), "props": "{}"}
            )
            eid += 1
    d = _tmp_table("events", pd.DataFrame(rows))
    got = temporal.q247_records_drawdown(spark, d).toPandas().set_index("event_type")
    for et, vals in series.items():
        runmax = np.maximum.accumulate(vals)
        n_records = 1 + int((vals[1:] > runmax[:-1]).sum())
        assert got.loc[et, "n_days"] == len(vals)
        assert got.loc[et, "n_record_days"] == n_records
        assert got.loc[et, "peak_daily"] == pytest.approx(vals.max(), abs=1e-6)
        assert got.loc[et, "max_drawdown"] == pytest.approx(
            float((runmax - vals).max()), abs=1e-6
        )


# --------------------------------------------------------------------------
# q232 correlation vs numpy on synthetic documents
# --------------------------------------------------------------------------
def test_q232_matches_numpy_reference(spark):
    rng = np.random.default_rng(32)
    rows = []
    for i in range(120):
        n_tok = int(rng.integers(1, 40))
        text = " ".join("w" * int(rng.integers(1, 8)) for _ in range(n_tok))
        rows.append(
            {"doc_id": i, "text": text, "lang": "en",
             "source": f"s{i % 2}", "n_chars": len(text)}
        )
    pdf = pd.DataFrame(rows)
    d = _tmp_table("documents", pdf)
    got = quality.q232_source_corr(spark, d).toPandas().set_index("source")
    for src_name, g in pdf.groupby("source"):
        nc = g["n_chars"].to_numpy(dtype=float)
        nt = np.array([len(t.split()) for t in g["text"]], dtype=float)
        r = got.loc[src_name]
        assert r["n_docs"] == len(g)
        assert r["corr_chars_tokens"] == pytest.approx(
            np.corrcoef(nc, nt)[0, 1], abs=1e-4
        )
        assert r["covar_pop"] == pytest.approx(
            ((nc - nc.mean()) * (nt - nt.mean())).mean(), abs=1e-4
        )
        assert r["sd_chars"] == pytest.approx(nc.std(), abs=1e-4)


# --------------------------------------------------------------------------
# q234 MI vs a manual reference on a random contingency table
# --------------------------------------------------------------------------
def test_q234_matches_manual_reference(spark):
    rng = np.random.default_rng(34)
    rows = []
    doc = 0
    for lang in ["en", "fr", "de"]:
        for source in ["s1", "s2"]:
            for _ in range(int(rng.integers(1, 30))):
                rows.append(
                    {"doc_id": doc, "text": "t", "lang": lang,
                     "source": source, "n_chars": 1}
                )
                doc += 1
    pdf = pd.DataFrame(rows)
    d = _tmp_table("documents", pdf)
    got = quality.q234_mutual_info(spark, d).toPandas().iloc[0]
    ct = pdf.groupby(["lang", "source"]).size()
    n = ct.sum()
    p_l = ct.groupby("lang").sum() / n
    p_s = ct.groupby("source").sum() / n
    mi = sum(
        (c / n) * math.log((c / n) / (p_l[la] * p_s[so]))
        for (la, so), c in ct.items()
    )
    h_l = -sum(p * math.log(p) for p in p_l)
    h_s = -sum(p * math.log(p) for p in p_s)
    assert got["mi_nats"] == pytest.approx(mi, abs=1e-4)
    assert got["h_lang"] == pytest.approx(h_l, abs=1e-4)
    assert got["h_source"] == pytest.approx(h_s, abs=1e-4)
    assert got["nmi"] == pytest.approx(mi / math.sqrt(h_l * h_s), abs=1e-4)


# --------------------------------------------------------------------------
# q236 inverted index vs brute-force postings
# --------------------------------------------------------------------------
def test_q236_matches_bruteforce_postings(spark):
    rng = np.random.default_rng(36)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    truth: dict[str, dict[int, int]] = {}
    for doc in range(40):
        toks = list(rng.choice(vocab, size=rng.integers(3, 25)))
        rows.append(
            {"doc_id": doc, "text": " ".join(toks), "lang": "en",
             "source": "s", "n_chars": 1}
        )
        for t in toks:
            truth.setdefault(t, {})
            truth[t][doc] = truth[t].get(doc, 0) + 1
    d = _tmp_table("documents", pd.DataFrame(rows))
    got = retrieval.q236_inverted_index(spark, d).toPandas().set_index("term")
    for term, posting in truth.items():
        if len(posting) < retrieval.INDEX_MIN_DF:
            assert term not in got.index
            continue
        r = got.loc[term]
        assert r["df"] == len(posting)
        assert r["tf_total"] == sum(posting.values())
        assert r["postings"] == ",".join(str(k) for k in sorted(posting))


def test_q246_bridge_planted_effects(spark):
    # one brand: price doubles, volume halves -> known effects
    from generative_ai_vector_db_spark.operators import relational

    orders_rows = []  # unused by q246 but keep fixture shape minimal
    part = pd.DataFrame(
        {"p_partkey": [1], "p_name": ["p"], "p_brand": ["B1"],
         "p_type": ["t"], "p_size": [1], "p_retailprice": [1.0]}
    )
    li_rows = []
    # 1996: 100 units at 10.0 -> rev0 1000; 1997: 50 units at 20.0 -> rev1 1000
    for i in range(10):
        li_rows.append((i, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O",
                        datetime(1996, 3, 1)))
    for i in range(5):
        li_rows.append((100 + i, 1, 1, 1, 10.0, 200.0, 0.0, 0.0, "N", "O",
                        datetime(1997, 3, 1)))
    li = pd.DataFrame(
        li_rows,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    # fixture parquet uses TIMESTAMP(MICROS); pandas defaults to NANOS
    # which the loader's session rejects for non-events tables
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    d = tempfile.mkdtemp(prefix="r8_bridge_")
    part.to_parquet(os.path.join(d, "part.parquet"), index=False)
    li.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    got = relational.q246_revenue_bridge(spark, d).toPandas().iloc[0]
    # p0 = 1000/100 = 10, p1 = 1000/50 = 20
    assert got["rev0"] == pytest.approx(1000.0)
    assert got["rev1"] == pytest.approx(1000.0)
    assert got["delta"] == pytest.approx(0.0)
    assert got["price_effect"] == pytest.approx((20 - 10) * 50)  # +500
    assert got["volume_effect"] == pytest.approx((50 - 100) * 10)  # -500
