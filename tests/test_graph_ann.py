"""q214 graph ANN (NN-descent + beam search) and the planted-cluster
validation of all three ANN families.

The fixture embeddings are isotropic (QUALITY.md) — every sublinear
index is information-bounded at recall ~= scan fraction there. These
tests therefore check two complementary things:

1. on the DRIVER'S correctness corpus (sf0.01) the graph index reaches
   HNSW-class recall (>= 0.95 — measured 1.000);
2. on a planted-cluster corpus (the regime real embedding models
   produce) the SAME code paths for q46 LSH, q49 IVF and q214 graph
   all deliver high recall — proving the weak isotropic floors are a
   property of the data, not bugs in the index implementations.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from generative_ai_vector_db_spark.operators import graph_ann, mllib_index, vector
from generative_ai_vector_db_spark.sources.synthetic import write_planted_embeddings


def _recall(exact, approx):
    recs = []
    for q_id, e in exact.groupby("q_id"):
        a = set(approx[approx["q_id"] == q_id]["vec_id"])
        recs.append(len(set(e["vec_id"]) & a) / len(e))
    return sum(recs) / len(recs), min(recs)


def test_q214_graph_ann_recall_fixture(spark, sf_dir):
    """HNSW-class floor on the driver's corpus: measured 1.000/1.000."""
    exact = vector.q26_knn_cosine(spark, sf_dir).toPandas()
    approx = graph_ann.q214_ann_graph(spark, sf_dir).toPandas()
    mean, mn = _recall(exact, approx)
    assert mean >= 0.95, f"mean recall {mean}"
    assert mn >= 0.85, f"min recall {mn}"
    # exactly K rows per query, correctly ranked, self excluded
    for q_id, grp in approx.groupby("q_id"):
        assert q_id not in set(grp["vec_id"])
        assert grp["rn"].tolist() == list(range(1, len(grp) + 1))
        assert (grp.sort_values("rn")["cos_sim"].diff().dropna() <= 1e-9).all()


@pytest.fixture(scope="module")
def planted_dir():
    d = tempfile.mkdtemp(prefix="planted_emb_")
    write_planted_embeddings(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_planted_clusters_all_families(spark, planted_dir):
    """On a clustered corpus, the same operators measure high recall:
    the isotropic-fixture floors (QUALITY.md) are data, not code."""
    exact = vector.q26_knn_cosine(spark, planted_dir).toPandas()
    lsh = vector.q46_ann_lsh_topk(spark, planted_dir).toPandas()
    ivf = mllib_index.q49_ann_ivf(spark, planted_dir).toPandas()
    gr = graph_ann.q214_ann_graph(spark, planted_dir).toPandas()
    m_lsh, _ = _recall(exact, lsh)
    m_ivf, _ = _recall(exact, ivf)
    m_gr, mn_gr = _recall(exact, gr)
    # planted floors are the PRIMARY ANN regression line (QUALITY.md):
    # all three measure 1.000 here; 0.95 leaves headroom for seed-free
    # numeric drift only, not for an implementation regression
    assert m_lsh >= 0.95, f"planted LSH recall {m_lsh}"
    assert m_ivf >= 0.95, f"planted IVF recall {m_ivf}"
    assert m_gr >= 0.95 and mn_gr >= 0.9, f"planted graph {m_gr}/{mn_gr}"


def test_q214_deterministic_rebuild(spark, sf_dir):
    """Clearing the graph cache and rebuilding yields bit-identical
    results (hash init + exact scores + vec_id tie-breaks — no RNG)."""
    first = graph_ann.q214_ann_graph(spark, sf_dir).toPandas()
    graph_ann._GRAPH_CACHE.clear()
    second = graph_ann.q214_ann_graph(spark, sf_dir).toPandas()
    assert first.equals(second)
