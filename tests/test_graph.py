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
