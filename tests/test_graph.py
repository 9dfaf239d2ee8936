"""PageRank over the co-visitation graph (q193) vs its unrolled
DuckDB twin, plus the invariants the hash-match alone doesn't show
(mass conservation under floor leakage, symmetry of the edge set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from generative_ai_vector_db_spark.operators import graph

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(graph.ORACLE))
def test_graph_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, graph.QUERIES[name], graph.ORACLE[name], name)


def test_pagerank_mass_and_bounds(spark, sf_dir):
    """Each returned rank is positive and below total mass; integer
    floor-division leaks mass DOWNWARD only, so no node can exceed the
    uniform-start upper envelope d^0 teleport + full inflow."""
    top = graph.q193_graph_pagerank(spark, sf_dir).toPandas()
    assert len(top) > 0
    assert (top["r_units"] > 0).all()
    assert (top["r_units"] < graph.PR_SCALE).all()
    # descending by rank, ties broken by user_id
    assert list(top["r_units"]) == sorted(top["r_units"], reverse=True)


def test_covisit_edges_symmetric(spark, sf_dir):
    e = graph._covisit_edges(spark, sf_dir)
    fwd = e.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert fwd.exceptAll(rev).count() == 0
    assert rev.exceptAll(fwd).count() == 0
    # no self loops
    assert e.where(F.col("src") == F.col("dst")).count() == 0


def test_pagerank_matches_float_reference(spark, sf_dir):
    """The integer micro-unit fixed point is semantically PageRank, not
    just self-consistent: compare against a straightforward float
    implementation of the same 5 iterations over the same edges. The
    integer floor leakage bounds each node's deviation by iterations x
    (max_degree + 1) ulps of 1e-8 — assert agreement to 1e-5 of mass
    and identical top-5 ordering."""
    import numpy as np

    edges = graph._covisit_edges(spark, sf_dir).toPandas()
    nodes = sorted(set(edges["src"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = edges.groupby("src").size().to_dict()
    r = np.full(n, 1.0 / n)
    for _ in range(graph.PR_ITERS):
        nxt = np.full(n, 0.15 / n)
        contrib = r[[idx[s] for s in edges["src"]]] / np.array(
            [deg[s] for s in edges["src"]]
        )
        np.add.at(nxt, [idx[d] for d in edges["dst"]], 0.85 * contrib)
        r = nxt
    got = graph.q193_graph_pagerank(spark, sf_dir).toPandas()
    ref = {u: r[idx[u]] for u in nodes}
    for _, row in got.iterrows():
        assert abs(row["r_units"] / graph.PR_SCALE - ref[row["user_id"]]) < 1e-5
    top_ref = sorted(nodes, key=lambda u: (-ref[u], u))[:5]
    assert list(got["user_id"][:5]) == top_ref


def test_triangle_invariants(spark, sf_dir):
    """Every triangle closes exactly 3 wedges, so 3T <= W and the
    clustering coefficient lies in [0, 1]."""
    got = graph.q210_triangle_count(spark, sf_dir).toPandas()
    assert len(got) == 1
    t, w, c = (
        int(got["n_triangles"][0]),
        int(got["n_wedges"][0]),
        float(got["clustering_coeff"][0]),
    )
    assert 3 * t <= w
    assert 0.0 <= c <= 1.0


def test_personalized_pagerank_concentrates_on_seeds(spark, sf_dir):
    """With teleport restricted to the seed cohort, seed users must
    dominate the top of the ranking (they receive both teleport and
    inflow), and every rank is positive and below total mass."""
    got = graph.q211_personalized_pagerank(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got["r_units"] > 0).all()
    assert (got["r_units"] < graph.PR_SCALE).all()
    # the plurality of the top-N should be seeds on the fixture graph
    assert got["is_seed"].mean() > 0.5
