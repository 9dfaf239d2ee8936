from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import relational

from .oracle_utils import compare_query

ORACLE_KEYS = sorted(relational.ORACLE)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_relational_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, relational.QUERIES[name], relational.ORACLE[name], name)


def test_approx_count_distinct_tolerance(spark, sf_dir):
    import duckdb

    from .oracle_utils import duck_connection

    pdf = relational.QUERIES["q05_approx_count_distinct"](spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    exact = dict(
        con.sql(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    con.close()
    for _, row in pdf.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_users"] - e) <= max(2, 0.05 * e)


def test_q109_q110_match_oracle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import relational

    from .oracle_utils import compare_query

    for name in ("q109_tpch_q5_shape", "q110_tpch_q18_shape"):
        compare_query(
            spark, sf_dir, relational.QUERIES[name], relational.ORACLE[name], name
        )


def test_q218_pareto_front_is_exact_skyline(spark, sf_dir):
    """Window-algebra skyline == brute-force dominance over all parts."""
    from generative_ai_vector_db_spark.tables import load

    parts = (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .toPandas()
    )
    price_c = (parts["p_retailprice"] * 100).round().astype("int64")
    keep = []
    for i in range(len(parts)):
        dominated = (
            (price_c <= price_c[i])
            & (parts["p_size"] >= parts["p_size"][i])
            & ((price_c < price_c[i]) | (parts["p_size"] > parts["p_size"][i]))
        ).any()
        if not dominated:
            keep.append(int(parts["p_partkey"][i]))
    got = relational.q218_pareto_front(spark, sf_dir).toPandas()
    assert sorted(got["p_partkey"]) == sorted(keep)
