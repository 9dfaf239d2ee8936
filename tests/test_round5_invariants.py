"""Semantic invariants for the round-5 operators (q187-q203) — the
properties a hash-match against the oracle cannot itself show (both
engines could share a wrong constant); each is a law of the operator's
definition."""

from __future__ import annotations

from generative_ai_vector_db_spark.operators import (
    corpus,
    quality,
    retrieval,
    scale,
    sql_surface,
    store,
    temporal,
    text,
)
from generative_ai_vector_db_spark.streaming import jobs
from generative_ai_vector_db_spark.tables import load


def test_q187_buckets_partition_the_corpus(spark, sf_dir):
    got = scale.q187_bucket_layout(spark, sf_dir).toPandas()
    n_docs = load(spark, sf_dir, "documents").count()
    assert got["n_docs"].sum() == n_docs
    # one consistent recommendation, consistent with the totals
    assert got["rec_n_buckets"].nunique() == 1
    tot = got["n_bytes"].sum()
    t = scale.TARGET_BUCKET_BYTES
    assert got["rec_n_buckets"].iloc[0] == (tot + t - 1) // t


def test_q188_salt_factors_cover_counts(spark, sf_dir):
    got = scale.q188_salt_plan(spark, sf_dir).toPandas()
    assert (got["salt_factor"] >= 1).all()
    # salt_factor replicas at ~4x-mean target always cover the key's rows
    assert (got["salt_factor"] * 4 * got["n"].mean() * 2 >= got["n"]).all()


def test_q190_redundancy_bounds(spark, sf_dir):
    got = text.q190_compression_proxy(spark, sf_dir).toPandas()
    assert ((got["gram_redundancy"] >= 0) & (got["gram_redundancy"] <= 1)).all()
    assert ((got["type_token_ratio"] > 0) & (got["type_token_ratio"] <= 1)).all()
    assert (got["n_grams_distinct"] <= got["n_grams"]).all()


def test_q191_debounce_kept_bounds(spark, sf_dir):
    got = jobs.q191_debounce(spark, sf_dir).toPandas()
    assert (got["n_kept"] <= got["n_total"]).all()
    assert (got["n_kept"] >= 1).all()


def test_q192_coverage_monotone_and_bounded(spark, sf_dir):
    got = retrieval.q192_citation_coverage(spark, sf_dir).toPandas()
    cov = got.sort_values("rank")["n_covered"].tolist()
    assert cov == sorted(cov)  # coverage can only grow with rank
    assert got["n_new"].sum() == got["n_covered"].max()
    assert got["coverage"].max() <= 1.0


def test_q194_partitions_contiguous_and_complete(spark, sf_dir):
    got = scale.q194_range_partition_plan(spark, sf_dir).toPandas()
    assert sorted(got["part"]) == list(range(scale.RANGE_PARTS))
    n_orders = load(spark, sf_dir, "orders").count()
    assert got["n_rows"].sum() == n_orders
    # shares are round(_, 4): worst-case drift is P half-ulps
    assert abs(got["share"].sum() - 1.0) <= scale.RANGE_PARTS * 5e-5


def test_q196_quartiles_ordered(spark, sf_dir):
    got = corpus.q196_weighted_length_quartiles(spark, sf_dir).toPandas()
    assert (got["wp25"] <= got["wmedian"]).all()
    assert (got["wmedian"] <= got["wp75"]).all()


def test_q198_purge_cascade_consistent(spark, sf_dir):
    got = scale.q198_purge_audit(spark, sf_dir).toPandas().set_index("table")
    assert (got["n_purge"] <= got["n_total"]).all()
    # fixture FKs are dense: purged orders must drag lineitem rows
    if got.loc["orders", "n_purge"] > 0:
        assert got.loc["lineitem", "n_purge"] > 0


def test_q199_rate_bouned_by_events(spark, sf_dir):
    got = temporal.q199_rate_limit(spark, sf_dir).toPandas()
    assert (got["max_rate_1h"] >= 1).all()
    assert (got["max_rate_1h"] <= got["n_events"]).all()
    assert (got["n_breaches"] <= got["n_events"]).all()


def test_q200_tree_covers_documents(spark, sf_dir):
    got = sql_surface.q200_recursive_hierarchy(spark, sf_dir).toPandas()
    n_docs = load(spark, sf_dir, "documents").count()
    # every doc except doc 0 (outside the rooted tree) appears once
    assert got["n_docs"].sum() == n_docs - 1
    # binary tree: each level at most doubles
    per_depth = got.sort_values("depth")["n_docs"].tolist()
    for a, b in zip(per_depth, per_depth[1:]):
        assert b <= 2 * a


def test_q201_budget_never_exceeded(spark, sf_dir):
    got = retrieval.q201_context_budget(spark, sf_dir).toPandas()
    assert got["fit_chars"].sum() <= retrieval.CONTEXT_BUDGET_CHARS
    assert (got["fit_chars"] <= got["n_chars"]).all()
    # greedy prefix: once a doc is partially cut, nothing later fits
    cut = got.sort_values("rn")["fully_included"].tolist()
    seen_partial = False
    for flag, fit in zip(cut, got.sort_values("rn")["fit_chars"]):
        if seen_partial:
            assert fit == 0
        if not flag:
            seen_partial = True


def test_q202_compaction_reduces_files(spark, sf_dir):
    got = store.q202_compaction_plan(spark, sf_dir).toPandas()
    assert (got["n_files_after"] <= got["n_files_before"]).all()
    assert (got["n_files_after"] >= 1).all()


def test_q203_lift_aggregates_to_population(spark, sf_dir):
    got = quality.q203_decile_lift(spark, sf_dir).toPandas()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert got["n_users"].sum() == n_users
    # weighted average of buy_rate over deciles = overall rate => the
    # user-weighted average lift is 1
    wavg_lift = (got["lift"] * got["n_users"]).sum() / got["n_users"].sum()
    assert abs(wavg_lift - 1.0) < 0.01


def test_q208_held_out_covers_all_sources(spark, sf_dir):
    """The block split must score every source (the fixtures assign
    source by doc_id residue, so a residue split would silently halve
    the source coverage — this pins the block choice)."""
    from generative_ai_vector_db_spark.operators import corpus as cp

    got = cp.q208_ppl_filter(spark, sf_dir).toPandas()
    n_sources = (
        load(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(got) == n_sources
    assert (got["avg_nll"] > 0).all()
    assert (got["n_filtered"] <= got["n_docs"]).all()


def test_q196_matches_bruteforce_definition(spark, sf_dir):
    """Weighted quartiles recomputed from the raw definition in pandas:
    smallest length whose cumulative char mass reaches k/4 of the
    source total, over (n_chars, doc_id) order."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars")
        .toPandas()
    )
    got = (
        corpus.q196_weighted_length_quartiles(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    for source, grp in docs.groupby("source"):
        g = grp.sort_values(["n_chars", "doc_id"])
        cum = g["n_chars"].cumsum()
        total = int(g["n_chars"].sum())
        def pick(k_num, k_den):
            return int(g["n_chars"][cum * k_den >= total * k_num].iloc[0])
        assert got.loc[source, "wp25"] == pick(1, 4)
        assert got.loc[source, "wmedian"] == pick(1, 2)
        assert got.loc[source, "wp75"] == pick(3, 4)
        assert got.loc[source, "total_chars"] == total


def test_q191_matches_bruteforce_definition(spark, sf_dir):
    """Debounce counts recomputed in pandas: kept = distinct
    (user, 10-minute floor bucket) per type."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    ).toPandas()
    ev["bucket"] = ev["ts"].astype("int64") // (600 * 1_000_000_000)
    want = (
        ev.groupby("event_type")
        .apply(
            lambda g: (len(g), g[["user_id", "bucket"]].drop_duplicates().shape[0]),
            include_groups=False,
        )
        .to_dict()
    )
    got = jobs.q191_debounce(spark, sf_dir).toPandas().set_index("event_type")
    for et, (n_total, n_kept) in want.items():
        assert got.loc[et, "n_total"] == n_total
        assert got.loc[et, "n_kept"] == n_kept


def test_q212_ivm_identity_holds(spark, sf_dir):
    got = temporal.q212_join_ivm(spark, sf_dir).toPandas()
    assert got["matches_recompute"].all()
    assert (got["n_base"] + got["n_delta"] == got["n_final"]).all()


def test_q213_pairs_cross_label_and_sorted(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector as v

    got = v.q213_cross_label_audit(spark, sf_dir).toPandas()
    assert (got["label_a"] != got["label_b"]).all()
    assert (got["id_a"] < got["id_b"]).all()
    d = got["dist"].tolist()
    assert d == sorted(d)
