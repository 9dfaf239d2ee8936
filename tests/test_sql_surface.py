from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import sql_surface

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(sql_surface.ORACLE))
def test_sql_surface_matches_oracle(spark, sf_dir, name):
    compare_query(
        spark, sf_dir, sql_surface.QUERIES[name], sql_surface.ORACLE[name], name
    )


def test_correlated_subquery_decorrelated(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate+join — no per-row subquery execution."""
    from generative_ai_vector_db_spark.plans.audit import plan_of

    plan = plan_of(sql_surface.q67_correlated_min(spark, sf_dir))
    assert "Join" in plan  # decorrelated into a join
    assert "HashAggregate" in plan
