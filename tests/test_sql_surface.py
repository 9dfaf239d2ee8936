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


def test_grouping_sets_matches_oracle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import sql_surface

    from .oracle_utils import compare_query

    compare_query(
        spark, sf_dir,
        sql_surface.QUERIES["q108_grouping_sets"],
        sql_surface.ORACLE["q108_grouping_sets"],
        "q108_grouping_sets",
    )


def test_grouping_sets_totals_consistent(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import sql_surface

    pdf = sql_surface.q108_grouping_sets(spark, sf_dir).toPandas()
    grand = pdf[(pdf["g_lang"] == 1) & (pdf["g_source"] == 1)]
    per_lang = pdf[(pdf["g_lang"] == 0) & (pdf["g_source"] == 1)]
    per_cell = pdf[(pdf["g_lang"] == 0) & (pdf["g_source"] == 0)]
    assert len(grand) == 1
    # every granularity sums to the same corpus total
    assert per_lang["n_docs"].sum() == grand["n_docs"].iloc[0]
    assert per_cell["n_docs"].sum() == grand["n_docs"].iloc[0]
