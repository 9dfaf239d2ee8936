from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import relational, temporal

from .oracle_utils import compare_query, duck_connection


@pytest.mark.parametrize("name", sorted(temporal.ORACLE))
def test_temporal_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, temporal.QUERIES[name], temporal.ORACLE[name], name)


def test_q60_sample_matches_oracle(spark, sf_dir):
    compare_query(
        spark,
        sf_dir,
        relational.QUERIES["q60_systematic_sample"],
        relational.ORACLE["q60_systematic_sample"],
        "q60",
    )


def test_q61_approx_quantiles_tolerance(spark, sf_dir):
    pdf = relational.QUERIES["q61_approx_quantiles"](spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    exact = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5), "
            "quantile_cont(o_totalprice, 0.9) FROM orders GROUP BY 1"
        ).fetchall()
    }
    con.close()
    for _, row in pdf.iterrows():
        e50, e90 = exact[row["o_orderstatus"]]
        assert abs(row["p50_approx"] - e50) / e50 < 0.05
        assert abs(row["p90_approx"] - e90) / e90 < 0.05


def test_asof_join_edge_cases(spark):
    """Events before any signup -> null; event at exactly signup ts ->
    matched (inclusive >=); latest of multiple prior signups wins."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),   # before signup
            (2, "2024-01-01 00:01:00", 7, "signup", 1.0, "{}"),
            (3, "2024-01-01 00:01:00", 7, "click", 1.0, "{}"),   # same-ts match
            (4, "2024-01-01 00:02:00", 7, "signup", 1.0, "{}"),
            (5, "2024-01-01 00:03:00", 7, "click", 1.0, "{}"),   # latest signup
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    others = ev.where(F.col("event_type") != "signup").select("event_id", "user_id", "ts")
    out = (
        temporal.asof_join(others, signups, key="user_id", value_cols=["signup_ts"])
        .orderBy("event_id")
        .toPandas()
    )
    assert out.loc[0, "right_signup_ts"] is None or str(out.loc[0, "right_signup_ts"]) == "NaT"
    assert str(out.loc[1, "right_signup_ts"]) == "2024-01-01 00:01:00"
    assert str(out.loc[2, "right_signup_ts"]) == "2024-01-01 00:02:00"


def test_sessionize_matches_oracle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    from .oracle_utils import compare_query

    compare_query(
        spark, sf_dir,
        temporal.QUERIES["q106_sessionize"],
        temporal.ORACLE["q106_sessionize"],
        "q106_sessionize",
    )


def test_sessionize_gap_invariant(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    pdf = temporal.q106_sessionize(spark, sf_dir).toPandas()
    # session sequence numbers are dense per user starting at 1
    for _, g in pdf.groupby("user_id"):
        seqs = sorted(g["session_seq"])
        assert seqs == list(range(1, len(seqs) + 1))
    assert (pdf["duration_sec"] >= 0).all()


def test_retention_cohorts_matches_oracle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    from .oracle_utils import compare_query

    compare_query(
        spark, sf_dir,
        temporal.QUERIES["q107_retention_cohorts"],
        temporal.ORACLE["q107_retention_cohorts"],
        "q107_retention_cohorts",
    )


def test_retention_offsets_nonnegative(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    pdf = temporal.q107_retention_cohorts(spark, sf_dir).toPandas()
    assert (pdf["week_offset"] >= 0).all()
    # offset-0 cell exists for every cohort (a user is active in their
    # own first week by definition)
    assert (pdf.groupby("cohort_week")["week_offset"].min() == 0).all()


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    pdf = temporal.q122_scd2_dimension(spark, sf_dir).toPandas()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("valid_from").reset_index(drop=True)
        # exactly one open (current) interval per user, and it is last
        assert g["is_current"].sum() == 1
        assert bool(g["is_current"].iloc[-1])
        # intervals chain: each valid_to equals the next valid_from
        assert (g["valid_to"].iloc[:-1].values == g["valid_from"].iloc[1:].values).all()
        # consecutive states actually change
        assert (g["state"].iloc[:-1].values != g["state"].iloc[1:].values).all()


def test_q147_block_decomposition_exact(spark, sf_dir, monkeypatch):
    """The blocked prefix-max must equal the single global window for
    ANY block size — shrink LATE_BLOCK so sf0.001 spans many blocks and
    every cross-block seam is exercised."""
    from generative_ai_vector_db_spark.operators import temporal

    baseline = temporal.q147_late_arrival_profile(spark, sf_dir).toPandas()
    monkeypatch.setattr(temporal, "LATE_BLOCK", 37)
    blocked = temporal.q147_late_arrival_profile(spark, sf_dir).toPandas()
    assert baseline.equals(blocked)


def test_q216_rolling_distinct_invariants(spark, sf_dir):
    import pandas as pd

    from generative_ai_vector_db_spark.tables import load
    from pyspark.sql import functions as F

    pdf = temporal.q216_rolling_distinct(spark, sf_dir).toPandas()
    daily = (
        load(spark, sf_dir, "events")
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .count()
        .toPandas()
        .set_index("day")["count"]
    )
    # every observed day appears exactly once, and the 7-day distinct
    # count is sandwiched: >= that day's own distinct users, <= the sum
    # of the trailing week's daily distincts
    assert sorted(pdf["day"]) == sorted(daily.index)
    m = pdf.set_index("day")["users_7d"]
    days = sorted(daily.index)
    for i, d in enumerate(days):
        lo = daily[d]
        window = [x for x in days[max(0, i - 6): i + 1]]
        hi = sum(daily[x] for x in window)
        assert lo <= m[d] <= hi, (d, lo, int(m[d]), hi)


def test_q222_interval_union_bounds(spark, sf_dir):
    """Union length per user is sandwiched between one interval and
    n_events * interval (and islands <= n_events)."""
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.tables import load

    got = temporal.q222_interval_union(spark, sf_dir).toPandas()
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    assert sorted(got["user_id"]) == sorted(per_user.index)
    for r in got.itertuples():
        n = per_user[r.user_id]
        assert 1 <= r.n_islands <= n
        assert temporal.IVL_DUR_US <= r.covered_us <= n * temporal.IVL_DUR_US
