"""Round-11 operators: portable hyperplane-LSH ANN (q320/q321),
incremental near-dup vs the store (q322), LSH cap audit (q323) —
independent numpy reference recomputations and the quality floors the
oracle hash checks weakly (planted-corpus recall, probe completeness).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from generative_ai_vector_db_spark.operators import vector
from generative_ai_vector_db_spark.sources.synthetic import (
    planted_cluster_frame,
    write_planted_embeddings,
)


# --------------------------------------------------------------------------
# q320 portable hyperplane ANN
# --------------------------------------------------------------------------
def _numpy_buckets(X: np.ndarray) -> list[np.ndarray]:
    """Independent recomputation of the per-table sign buckets."""
    mx = np.abs(X).max(axis=1, keepdims=True)
    safe = np.where(mx == 0, 1.0, mx)
    C = np.where(mx == 0, 0.0, np.floor(X * 127.0 / safe + 0.5))
    out = []
    for mat in vector._ann_sign_matrices():
        M = np.array(mat)
        dots = C @ M.T
        out.append(((dots >= 0) << np.arange(vector.ANN_PLANES)).sum(axis=1))
    return out


def test_q320_buckets_match_numpy_reference(spark, sf_dir_t2):
    emb = (
        spark.read.parquet(os.path.join(sf_dir_t2, "embeddings.parquet"))
        .select("vec_id", "embedding")
    )
    got = (
        vector._hyperplane_buckets(emb)
        .toPandas()
        .sort_values(["vec_id", "tbl"])
        .reset_index(drop=True)
    )
    pdf = (
        pd.read_parquet(os.path.join(sf_dir_t2, "embeddings.parquet"))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(pdf["embedding"].to_numpy()).astype(float)
    ref = _numpy_buckets(X)
    for t in range(vector.ANN_TABLES):
        g = got[got["tbl"] == t].set_index("vec_id")["bucket"]
        r = pd.Series(ref[t], index=pdf["vec_id"].to_numpy())
        assert (g.sort_index().to_numpy() == r.sort_index().to_numpy()).all()


def test_q320_planted_recall_floor(spark):
    """Planted-cluster corpus: recall@13 = 1.000 at ~32% scan — the
    QUALITY.md floor for the hash-graded ANN config."""
    d = tempfile.mkdtemp(prefix="plant320_")
    try:
        write_planted_embeddings(d)
        got = vector.q320_portable_hyperplane_ann(spark, d).toPandas()
        pdf = planted_cluster_frame()
        X = np.stack(pdf["embedding"].to_numpy()).astype(float)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Xn[0]
        sims[0] = -2
        order = sorted(
            range(len(sims)), key=lambda i: (-round(sims[i], 4), i)
        )[: vector.K]
        recall = len(set(order) & set(got["vec_id"])) / vector.K
        assert recall == 1.0, recall
        # scan fraction stays a FRACTION (the index prunes)
        bucks = _numpy_buckets(X)
        cand: set[int] = set()
        for t in range(vector.ANN_TABLES):
            qb = bucks[t][0]
            probe = {qb ^ f for f in vector.ANN_PROBE_FLIPS}
            cand |= {
                i for i in range(len(X)) if bucks[t][i] in probe and i != 0
            }
        assert len(cand) / len(X) < 0.5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_q321_recall_matches_independent_overlap(spark, sf_dir_t2):
    """q321's graded recall equals an independent numpy overlap of
    multiprobe candidates vs the exact round-4 cosine top-13."""
    got = vector.q321_hyperplane_recall_eval(spark, sf_dir_t2).toPandas()
    pdf = (
        pd.read_parquet(os.path.join(sf_dir_t2, "embeddings.parquet"))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(pdf["embedding"].to_numpy()).astype(float)
    ids = pdf["vec_id"].to_numpy()
    qi = int(np.where(ids == vector.BINARY_Q_ID)[0][0])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn[qi]
    sims[qi] = -2
    order = sorted(
        range(len(sims)), key=lambda i: (-round(sims[i], 4), ids[i])
    )[: vector.K]
    exact = set(ids[order])
    bucks = _numpy_buckets(X)
    cand: set[int] = set()
    for t in range(vector.ANN_TABLES):
        qb = bucks[t][qi]
        probe = {qb ^ f for f in vector.ANN_PROBE_FLIPS}
        sel = np.isin(bucks[t], list(probe))
        cand |= set(ids[sel]) - {vector.BINARY_Q_ID}
    # ANN top-13 from candidates under the same ranking key
    ann = sorted(
        (i for i in range(len(sims)) if ids[i] in cand),
        key=lambda i: (-round(sims[i], 4), ids[i]),
    )[: vector.K]
    n_common = len(exact & {ids[i] for i in ann})
    assert int(got["n_common"].iloc[0]) == n_common
    assert got["recall"].iloc[0] == pytest.approx(n_common / vector.K)
