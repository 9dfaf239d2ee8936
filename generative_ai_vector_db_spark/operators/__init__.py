"""Operator modules. Each module exposes

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  named query implementations over the fixture tables, and
* ``ORACLE: dict[str, str]`` — the DuckDB ANSI-SQL twin for every
  SQL-expressible query (omitted keys get the driver's weaker
  rows-only check).

Column names/aliases are identical on both sides (the driver sorts
columns by name before value-hashing); floats are rounded to 4 places,
timestamps emitted as formatted strings, and integer outputs cast to
BIGINT on both sides, per FIXTURES.md canonicalization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merge_registries(*modules) -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for m in modules:
        for k in m.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query key {k!r}")
        queries.update(m.QUERIES)
        oracle.update(getattr(m, "ORACLE", {}))
    return queries, oracle
