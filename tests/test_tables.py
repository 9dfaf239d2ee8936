"""Dtype-drift regression guard for the fixture catalog.

The driver regenerates /root/testdata between rounds and the physical
parquet type of ``events.ts`` has already drifted twice (TIMESTAMP(NANOS)
-> TIMESTAMP(MICROS, isAdjustedToUTC=false)). Every epoch expression in
the engine (unix_micros, cast-to-long, interval joins, session windows)
requires a session-TZ TIMESTAMP, so ``tables.load`` normalizes whatever
the file contains. These tests pin that contract at every scale factor
present on disk so the next regeneration cannot silently break five
operators again (round-3 postmortem).
"""

from __future__ import annotations

import os

import pytest

from generative_ai_vector_db_spark.tables import load

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


TS_COLS = {
    "events": "ts",
    "lineitem": "l_shipdate",
    "orders": "o_orderdate",
}


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("table", sorted(TS_COLS))
def test_ts_columns_load_as_session_timestamp(spark, sf, table):
    # Emulate the DRIVER's session: inferTimestampNTZ defaults to true
    # there (session.py's override does not apply). load() must still
    # deliver TIMESTAMP.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        dtypes = dict(load(spark, sf, table).dtypes)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    col = TS_COLS[table]
    assert dtypes[col] == "timestamp", (
        f"{table}.{col} loaded as {dtypes[col]!r} from {sf}; tables.load "
        "must normalize to TIMESTAMP or epoch math breaks engine-wide"
    )


def test_events_epoch_math_analyzes(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    # unix_micros rejects TIMESTAMP_NTZ at analysis time — this is the
    # exact expression family that failed in round 3.
    row = ev.select(
        F.unix_micros("ts").alias("us"),
        F.col("ts").cast("long").alias("s"),
    ).first()
    assert row.us is not None and row.s is not None


def test_events_ts_values_match_duckdb_naive(spark, sf_dir):
    """UTC session TZ => Spark's TIMESTAMP shows the same wall-clock as
    DuckDB's naive timestamp; the oracle hash contract depends on it."""
    import duckdb

    from .oracle_utils import duck_connection

    got = (
        load(spark, sf_dir, "events")
        .selectExpr("date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS lo")
        .first()
        .lo
    )
    con = duck_connection(sf_dir)
    try:
        want = con.sql(
            "SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') FROM events"
        ).fetchone()[0]
    finally:
        con.close()
    assert got == want
