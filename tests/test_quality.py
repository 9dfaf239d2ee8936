"""Quality/curation operators (q93-q96, q99) and TPC-H Q3/Q10 shapes
(q97/q98) vs their DuckDB twins, plus semantic invariants the
hash-match alone doesn't show."""

from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import quality, relational

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(quality.ORACLE))
def test_quality_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, quality.QUERIES[name], quality.ORACLE[name], name)


@pytest.mark.parametrize("name", ["q97_tpch_q3_shape", "q98_tpch_q10_shape"])
def test_tpch_shapes_match_oracle(spark, sf_dir, name):
    compare_query(
        spark, sf_dir, relational.QUERIES[name], relational.ORACLE[name], name
    )


def test_gopher_rules_consistent(spark, sf_dir):
    pdf = quality.q93_gopher_quality(spark, sf_dir).toPandas()
    # keep is the conjunction of the three rules
    assert (pdf["keep"] == (pdf["r_words"] & pdf["r_mean_wl"] & pdf["r_alpha"])).all()
    # the word-count rule actually splits this corpus (not vacuous)
    assert 0 < pdf["r_words"].sum() < len(pdf)
    # recomputed rule from the emitted columns agrees with the flag
    recomputed = (pdf["n_words"] >= quality.MIN_WORDS) & (
        pdf["n_words"] <= quality.MAX_WORDS
    )
    assert (pdf["r_words"] == recomputed).all()


def test_source_cap_bounds(spark, sf_dir):
    pdf = quality.q94_source_cap(spark, sf_dir).toPandas()
    per_source = pdf.groupby("source").size()
    assert (per_source <= quality.SOURCE_CAP).all()
    # within each source the kept docs are the longest ones: rank 1 has
    # the max n_chars of the kept set
    for _, g in pdf.groupby("source"):
        assert g.loc[g["rk"].idxmin(), "n_chars"] == g["n_chars"].max()


def test_kl_divergence_nonnegative(spark, sf_dir):
    pdf = quality.q95_lang_kl_divergence(spark, sf_dir).toPandas()
    # Gibbs' inequality: KL(P||Q) >= 0 (up to the 1e-4 rounding)
    assert (pdf["kl"] >= -1e-4).all()
    assert pdf["n_docs"].sum() > 0


def test_funnel_monotone(spark, sf_dir):
    pdf = quality.q96_event_funnel(spark, sf_dir).toPandas().sort_values("step")
    counts = pdf["n_users"].tolist()
    # each funnel step can only lose users
    assert counts == sorted(counts, reverse=True)
    assert pdf["event_type"].tolist() == ["signup", "view", "click", "purchase"]


def test_rolling_anomaly_window_semantics(spark, sf_dir):
    pdf = quality.q100_rolling_anomaly(spark, sf_dir).toPandas()
    # the very first day of each event type has a 1-row window: no
    # sample stddev, so z must be null there
    # (nth(0), not first(): pandas first() skips NaN cells)
    firsts = pdf.sort_values("day").groupby("event_type").nth(0)
    assert firsts["z"].isna().all()
    # recompute one trailing window by hand and compare avg7
    g = pdf[pdf["event_type"] == "click"].sort_values("day").reset_index(drop=True)
    if len(g) >= quality.ROLL_DAYS:
        i = quality.ROLL_DAYS - 1
        manual = g["daily_value"][: i + 1].mean()
        assert abs(g.loc[i, "avg7"] - manual) < 1e-2


def test_stratified_downsample_deterministic(spark, sf_dir):
    a = quality.q101_stratified_downsample(spark, sf_dir).toPandas()
    b = quality.q101_stratified_downsample(spark, sf_dir).toPandas()
    # no RNG anywhere: byte-identical across runs
    assert a.equals(b)
    # the 'en' stratum is downsampled harder than the default rate
    assert quality.KEEP_PCT["en"] < quality.DEFAULT_PCT


def test_hash_split_partition_of_corpus(spark, sf_dir):
    pdf = quality.q102_hash_split(spark, sf_dir).toPandas()
    # splits partition the corpus: per-split doc counts sum to the total
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert pdf["n_docs"].sum() == total
    assert set(pdf["split"]) == {"train", "val", "test"}
    # ~80/10/10 by construction of the residue split
    by_split = pdf.groupby("split")["n_docs"].sum()
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_length_bucketing_fits(spark, sf_dir):
    pdf = quality.q103_length_bucketing(spark, sf_dir).toPandas()
    assert set(pdf["bucket_len"]).issubset(set(quality.SEQ_BUCKETS))
    # padding is non-negative and waste_frac < 1 by construction
    assert (pdf["pad_tokens"] >= 0).all()
    assert ((pdf["waste_frac"] >= 0) & (pdf["waste_frac"] < 1)).all()


def test_truncation_stats_conservation(spark, sf_dir):
    pdf = quality.q104_truncation_stats(spark, sf_dir).toPandas()
    # kept + dropped = total tokens (conservation), and drop_frac agrees
    frac = pdf["tokens_dropped"] / (pdf["tokens_kept"] + pdf["tokens_dropped"])
    assert (abs(frac - pdf["drop_frac"]) < 1e-3).all()
    assert (pdf["n_truncated"] <= pdf["n_docs"]).all()


def test_source_overlap_symmetric_key_order(spark, sf_dir):
    pdf = quality.q105_source_overlap_matrix(spark, sf_dir).toPandas()
    # canonical ordering: every pair reported once with source_a < source_b
    assert (pdf["source_a"] < pdf["source_b"]).all()
    assert (pdf["n_shared"] >= 1).all()


def test_centroid_outliers_shape(spark, sf_dir):
    pdf = quality.q99_centroid_outliers(spark, sf_dir).toPandas()
    per_label = pdf.groupby("label").size()
    assert (per_label == quality.OUTLIER_K).all()
    # rank 1 is the farthest outlier within each label
    for _, g in pdf.groupby("label"):
        assert g.sort_values("rk")["dist"].is_monotonic_decreasing
    assert (pdf["dist"] >= 0).all()


def test_q220_ks_matches_numpy(spark, sf_dir):
    """The integer-exact windowed KS equals the direct numpy two-sample
    KS on the same values."""
    import numpy as np

    from generative_ai_vector_db_spark.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .toPandas()
    )
    a = np.sort(ev[ev.event_type == quality.KS_TYPE_A]["value"].to_numpy())
    b = np.sort(ev[ev.event_type == quality.KS_TYPE_B]["value"].to_numpy())
    grid = np.union1d(a, b)
    cdf_a = np.searchsorted(a, grid, side="right") / len(a)
    cdf_b = np.searchsorted(b, grid, side="right") / len(b)
    want = float(np.max(np.abs(cdf_a - cdf_b)))
    got = quality.q220_ks_drift(spark, sf_dir).toPandas()
    assert len(got) == 1
    assert got["n_a"][0] == len(a) and got["n_b"][0] == len(b)
    assert abs(got["ks_stat"][0] - round(want, 4)) <= 1e-9


def test_q219_chi2_parts_reconcile(spark, sf_dir):
    """Expected counts sum back to N (within rounding), every
    contribution is non-negative, and cells reconstruct the corpus."""
    pdf = quality.q219_chi2_assoc(spark, sf_dir).toPandas()
    n = pdf["n_obs"].sum()
    assert abs(pdf["n_exp"].sum() - n) < 0.05 * len(pdf)
    assert (pdf["chi2_part"] >= 0).all()
    assert (pdf.groupby("lang")["n_obs"].sum() > 0).all()
