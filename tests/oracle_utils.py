"""Local mirror of the driver's DuckDB-oracle comparison.

Canonicalization: columns sorted by name, every cell rendered to a
canonical string (floats rounded to 4, NaN/None -> sentinel, timestamps
ISO), rows sorted — then compared as multisets. This is intentionally
stricter-or-equal to the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import numpy as np

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "␀"
        # Deliberately NOT normalizing -0.0: the driver's value hash
        # distinguishes it (q71 was red for three rounds because DuckDB
        # rounded a tiny negative covariance to -0.0 while Spark gave
        # +0.0, and the old `r == 0.0` normalization here hid exactly
        # that). Engines must emit the same zero sign; queries guard
        # with `round(x, n) + 0.0` on BOTH sides where a statistic can
        # legitimately round to zero from below.
        return f"{round(f, 4):.4f}"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare_query(spark, sf_dir: str, query_fn, oracle_sql: str, name: str = "?"):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.sql(oracle_sql).df()
    finally:
        con.close()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    s_rows = canonicalize(spark_pdf)
    d_rows = canonicalize(duck_pdf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
    return len(s_rows)
