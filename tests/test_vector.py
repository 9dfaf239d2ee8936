from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import vector

from .oracle_utils import compare_query

ORACLE_KEYS = sorted(vector.ORACLE)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_vector_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, vector.QUERIES[name], vector.ORACLE[name], name)


def test_knn_k_and_selfexclusion(spark, sf_dir):
    pdf = vector.q25_knn_l2(spark, sf_dir).toPandas()
    assert set(pdf["q_id"].unique()) == {0, 1, 2, 3, 4}
    for q_id, grp in pdf.groupby("q_id"):
        assert len(grp) == vector.K
        assert q_id not in set(grp["vec_id"])
        assert grp["dist"].is_monotonic_increasing


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    exact = vector.q26_knn_cosine(spark, sf_dir).toPandas()
    approx = vector.q46_ann_lsh_topk(spark, sf_dir).toPandas()
    # Every ANN hit must be a real vector and self-excluded; recall against
    # the exact top-13 should be non-trivial even with a single probe.
    overlaps = []
    for q_id in exact["q_id"].unique():
        e = set(exact[exact["q_id"] == q_id]["vec_id"])
        a = set(approx[approx["q_id"] == q_id]["vec_id"])
        assert q_id not in a
        overlaps.append(len(e & a) / len(e))
    assert sum(overlaps) / len(overlaps) > 0.2, f"mean recall too low: {overlaps}"
