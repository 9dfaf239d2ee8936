"""Hypothesis property tests for round-7 operators against brute-force
python references on GENERATED corpora — edge regimes the fixture
cannot produce: all-tied values, single-row groups, exact-boundary
dominance, duplicate timestamps, single-element samples.

Each example writes a minimal parquet table into a temp sf_dir and
runs the real operator through ``tables.load`` — the same path the
driver exercises."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from generative_ai_vector_db_spark.operators import (
    corpus,
    quality,
    relational,
    temporal,
)

EPOCH = datetime(2024, 1, 1)


def _tmp_table(name: str, pdf: pd.DataFrame) -> str:
    d = tempfile.mkdtemp(prefix=f"prop_{name}_")
    pdf.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
    return d


# --------------------------------------------------------------------------
# q218 pareto front vs brute-force dominance
# --------------------------------------------------------------------------
parts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # price cents (many ties)
        st.integers(min_value=0, max_value=8),  # size
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(parts=parts_strategy)
def test_q218_skyline_matches_bruteforce(spark, parts):
    pdf = pd.DataFrame(
        {
            "p_partkey": np.arange(len(parts), dtype="int64"),
            "p_name": "x",
            "p_brand": "b",
            "p_type": "t",
            "p_size": np.array([s for _, s in parts], dtype="int32"),
            "p_retailprice": [c / 100.0 for c, _ in parts],
        }
    )
    d = _tmp_table("part", pdf)
    try:
        got = sorted(
            relational.q218_pareto_front(spark, d).toPandas()["p_partkey"]
        )
        cents = np.array([c for c, _ in parts])
        sizes = np.array([s for _, s in parts])
        want = [
            int(i)
            for i in range(len(parts))
            if not (
                (cents <= cents[i])
                & (sizes >= sizes[i])
                & ((cents < cents[i]) | (sizes > sizes[i]))
            ).any()
        ]
        assert got == sorted(want)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q220 KS drift vs numpy two-sample KS (integer-valued floats => ties
# across the two samples are common)
# --------------------------------------------------------------------------
samples_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
)


@settings(max_examples=12, deadline=None)
@given(samples=samples_strategy)
def test_q220_ks_matches_numpy(spark, samples):
    xs, ys = samples
    rows = [(quality.KS_TYPE_A, float(v)) for v in xs] + [
        (quality.KS_TYPE_B, float(v)) for v in ys
    ]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": EPOCH,
            "user_id": np.int64(1),
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    try:
        got = quality.q220_ks_drift(spark, d).toPandas()
        a, b = np.sort(np.array(xs, float)), np.sort(np.array(ys, float))
        grid = np.union1d(a, b)
        ks = float(
            np.max(
                np.abs(
                    np.searchsorted(a, grid, side="right") / len(a)
                    - np.searchsorted(b, grid, side="right") / len(b)
                )
            )
        )
        assert int(got["n_a"][0]) == len(xs) and int(got["n_b"][0]) == len(ys)
        assert abs(float(got["ks_stat"][0]) - round(ks, 4)) <= 1e-9
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q222 interval union vs brute-force merge (duplicate starts, nested
# and exactly-touching intervals)
# --------------------------------------------------------------------------
events_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=3),
    values=st.lists(
        # second offsets incl. exact multiples of the 300 s duration so
        # boundary-touching islands (s == cur_end) occur
        st.integers(min_value=0, max_value=3600),
        min_size=1,
        max_size=20,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=12, deadline=None)
@given(series=events_strategy)
def test_q222_interval_union_matches_bruteforce(spark, series):
    rows = [
        (u, EPOCH + timedelta(seconds=s))
        for u, offs in series.items()
        for s in offs
    ]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": [t for _, t in rows],
            "user_id": np.array([u for u, _ in rows], dtype="int64"),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    try:
        got = (
            temporal.q222_interval_union(spark, d)
            .toPandas()
            .set_index("user_id")
        )
        dur = temporal.IVL_DUR_US
        for u, offs in series.items():
            ivs = sorted((s * 1_000_000, s * 1_000_000 + dur) for s in offs)
            islands, covered, cur_s, cur_e = 0, 0, None, None
            for s, e in ivs:
                if cur_s is None or s > cur_e:
                    if cur_s is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e, islands = s, e, islands + 1
                else:
                    cur_e = max(cur_e, e)
            covered += cur_e - cur_s
            assert int(got.loc[u, "n_islands"]) == islands, u
            assert int(got.loc[u, "covered_us"]) == covered, u
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q228 quantile normalize vs pandas min-rank percent_rank (all-tied
# columns and single-doc sources included)
# --------------------------------------------------------------------------
docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # source id
        st.integers(min_value=10, max_value=14),  # n_chars (heavy ties)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(docs=docs_strategy)
def test_q228_percent_rank_matches_pandas(spark, docs):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype="int64"),
            "text": "x",
            "lang": "en",
            "source": [f"src{s}" for s, _ in docs],
            "n_chars": np.array([c for _, c in docs], dtype="int64"),
        }
    )
    d = _tmp_table("documents", pdf)
    try:
        got = (
            corpus.q228_quantile_normalize(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        def pr(vals: pd.Series) -> pd.Series:
            n = len(vals)
            if n == 1:
                return pd.Series([0.0], index=vals.index)
            return ((vals.rank(method="min") - 1) / (n - 1)).round(4)

        want_g = pr(pdf["n_chars"])
        want_s = pdf.groupby("source")["n_chars"].transform(
            lambda v: pr(v)
        )
        assert got["pr_global"].tolist() == want_g.tolist()
        assert got["pr_source"].tolist() == want_s.tolist()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q215 fuzzy blocked dedup vs brute-force levenshtein over distinct
# names (tiny alphabet => typo collisions are common; the length-band
# prefilter must be lossless)
# --------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


names_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # block (p_type)
        st.text(alphabet="ab", min_size=1, max_size=4),  # name
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(rows=names_strategy)
def test_q215_fuzzy_pairs_match_bruteforce(spark, rows):
    from generative_ai_vector_db_spark.operators import dedup

    pdf = pd.DataFrame(
        {
            "p_partkey": np.arange(len(rows), dtype="int64"),
            "p_name": [n for _, n in rows],
            "p_brand": "b",
            "p_type": [f"t{t}" for t, _ in rows],
            "p_size": np.int32(1),
            "p_retailprice": 1.0,
        }
    )
    d = _tmp_table("part", pdf)
    try:
        got = dedup.q215_fuzzy_blocked_dedup(spark, d).toPandas()
        got_pairs = {
            (r.p_type, r.name_a, r.name_b): (int(r.dist), int(r.row_pairs))
            for r in got.itertuples()
        }
        # brute force over distinct (block, name) with multiplicities
        counts: dict[tuple[str, str], int] = {}
        for t, n in rows:
            counts[(f"t{t}", n)] = counts.get((f"t{t}", n), 0) + 1
        want = {}
        keys = sorted(counts)
        for i, (bt, na) in enumerate(keys):
            for bt2, nb in keys[i + 1:]:
                if bt2 != bt or na == nb:
                    continue
                dist = _lev(na, nb)
                if dist <= dedup.FUZZY_MAX_DIST:
                    a, b = sorted((na, nb))
                    want[(bt, a, b)] = (
                        dist,
                        counts[(bt, na)] * counts[(bt, nb)],
                    )
        assert got_pairs == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q216 rolling 7-day distinct users vs brute force (sparse days, users
# active on single days, gaps longer than the window)
# --------------------------------------------------------------------------
activity_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # day offset
        st.integers(min_value=0, max_value=5),  # user
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(acts=activity_strategy)
def test_q216_rolling_distinct_matches_bruteforce(spark, acts):
    rows = [(u, EPOCH + timedelta(days=day, hours=3)) for day, u in acts]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": [t for _, t in rows],
            "user_id": np.array([u for u, _ in rows], dtype="int64"),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    try:
        got = {
            r.day: int(r.users_7d)
            for r in temporal.q216_rolling_distinct(spark, d)
            .toPandas()
            .itertuples()
        }
        days = sorted({day for day, _ in acts})
        want = {}
        for day in days:
            users = {
                u for dd, u in acts if day - 6 <= dd <= day
            }
            want[(EPOCH + timedelta(days=day)).strftime("%Y-%m-%d")] = len(
                users
            )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# q229 graph profile vs networkx-free brute force on controlled
# covisit buckets (distinct (hour, type) buckets of chosen users)
# --------------------------------------------------------------------------
buckets_strategy = st.lists(
    st.sets(st.integers(min_value=0, max_value=7), min_size=2, max_size=5),
    min_size=1,
    max_size=5,
)


@settings(max_examples=10, deadline=None)
@given(buckets=buckets_strategy)
def test_q229_graph_profile_matches_bruteforce(spark, buckets):
    from generative_ai_vector_db_spark.operators import graph

    rows = []
    for h, users in enumerate(buckets):
        for u in users:
            rows.append((u, EPOCH + timedelta(hours=h, minutes=5)))
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": [t for _, t in rows],
            "user_id": np.array([u for u, _ in rows], dtype="int64"),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    d = _tmp_table("events", pdf)
    try:
        got = graph.q229_graph_profile(spark, d).toPandas().iloc[0]
        # brute force: undirected pair set across buckets (cap never
        # binds at <= 5 users/bucket)
        pairs = set()
        for users in buckets:
            us = sorted(users)
            for i, a in enumerate(us):
                for b in us[i + 1:]:
                    pairs.add((a, b))
        deg: dict[int, int] = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        dx, dy = [], []
        for a, b in pairs:
            dx += [deg[a], deg[b]]
            dy += [deg[b], deg[a]]
        dx, dy = np.array(dx, float), np.array(dy, float)
        m = len(dx)
        num = m * (dx * dy).sum() - dx.sum() * dy.sum()
        den = np.sqrt(m * (dx * dx).sum() - dx.sum() ** 2) * np.sqrt(
            m * (dy * dy).sum() - dy.sum() ** 2
        )
        assert int(got["n_nodes"]) == len(deg)
        assert int(got["n_edges"]) == len(pairs)
        assert int(got["max_degree"]) == max(deg.values())
        assert abs(float(got["mean_degree"]) - round(2 * len(pairs) / len(deg), 4)) <= 1e-9
        if den > 0:
            assert abs(float(got["assortativity"]) - round(num / den, 4)) <= 1e-4
        else:
            # degree-regular graph: correlation undefined -> NULL
            assert pd.isna(got["assortativity"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
