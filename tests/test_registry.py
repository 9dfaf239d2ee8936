"""Registry gates: the driver contract must keep covering SURVEY §2.B
Q1-Q36 (plus the north-star surface) and every oracle SQL must at least
plan on DuckDB. Guards future rounds against silent regressions."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

QUERIES = _entry.queries()
ORACLE = _entry.oracle_sql()

SURVEY_CORE = [  # SURVEY §2.B Q1-Q36 -> registry keys
    "q01_scan_project", "q02_filter_pushdown", "q03_tpch_q1",
    "q04_count_distinct", "q05_approx_count_distinct", "q06_join_inner",
    "q07_join_broadcast", "q08_join_multiway", "q09_join_left",
    "q10_join_semi", "q11_join_anti", "q12_dedup_exact",
    "q13_window_topk", "q14_window_running", "q15_window_lag",
    "q16_global_topk", "q17_set_ops", "q18_rollup", "q19_string_fns",
    "q20_date_fns", "q21_math_fns", "q22_array_fns", "q23_json_fns",
    "q24_chunk_stride", "q25_knn_l2", "q26_knn_cosine",
    "q27_similarity_join", "q28_context_assembly", "q29_ingest_routing",
    "q30_store_counts", "q31_tumbling_window", "q32_sliding_window",
    "q33_session_window", "q34_latest_per_key", "q35_pandas_udf_zscore",
    "q36_weighted_avg",
]


def test_survey_core_fully_covered():
    missing = [k for k in SURVEY_CORE if k not in QUERIES]
    assert not missing, f"SURVEY §2.B keys missing from queries(): {missing}"


def test_oracle_keys_subset_of_queries():
    orphans = set(ORACLE) - set(QUERIES)
    assert not orphans


def test_registry_size_floor():
    assert len(QUERIES) >= 146
    assert len(ORACLE) >= 135


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_sql_plans_on_duckdb(name, sf_dir):
    con = duckdb.connect()
    try:
        for t in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        con.sql("EXPLAIN " + ORACLE[name])  # parse + bind, no execution
    finally:
        con.close()


def test_driver_window_spends_slots_on_oracles():
    """The driver's correctness pass covers the first 50 registry
    entries; a rows-only query inside that window is a guaranteed
    `err: no_oracle` row — a wasted slot (r4 proved it with q50). No
    carve-outs: every windowed entry must have an oracle."""
    first50 = list(QUERIES)[:50]
    rows_only = [k for k in first50 if k not in ORACLE]
    assert not rows_only, f"rows-only queries inside the 50-slot window: {rows_only}"


def test_priority_list_exactly_covers_registry():
    """_ordered() silently drops _PRIORITY names that don't resolve and
    front-loads unlisted queries — either one quietly reshuffles the
    driver's 50-slot evidence window. Pin exact two-way coverage so a
    typo or a forgotten registration fails loudly here instead."""
    import __spark_entry__ as entry_mod

    queries = set(entry_mod.queries())
    prio = entry_mod._PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in _PRIORITY"
    missing = [k for k in prio if k not in queries]
    unlisted = [k for k in queries if k not in set(prio)]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert not unlisted, f"registry names not in _PRIORITY: {unlisted}"


def test_canon_is_strict_about_zero_sign():
    """The driver's value hash distinguishes -0.0 from 0.0 (the q71
    three-round red row). The local canon must be at least as strict —
    a normalization here would hide exactly that class of mismatch."""
    from .oracle_utils import _canon_cell

    assert _canon_cell(-0.0) != _canon_cell(0.0)
    # and the engine-side guard is the documented fix: x + 0.0
    assert _canon_cell(-0.0 + 0.0) == _canon_cell(0.0)
