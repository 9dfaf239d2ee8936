"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle twin (keys without an oracle entry get the driver's
rows-only check — used only for genuinely non-SQL-expressible ops like
sketch-based estimates and seeded LSH).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from generative_ai_vector_db_spark.operators import (  # noqa: E402
    chunker,
    dedup,
    ingest,
    merge_registries,
    multimodal,
    mllib_index,
    pandas_udfs,
    rag,
    relational,
    scale,
    sql_surface,
    store,
    temporal,
    text,
    vector,
)
from generative_ai_vector_db_spark.streaming import jobs as streaming_jobs  # noqa: E402

_MODULES = [
    relational,
    vector,
    chunker,
    ingest,
    text,
    dedup,
    multimodal,
    pandas_udfs,
    mllib_index,
    store,
    rag,
    scale,
    temporal,
    sql_surface,
    streaming_jobs,
]

_QUERIES, _ORACLE = merge_registries(*_MODULES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core capability end to end — top-k
    vector retrieval -> context assembly -> prompt -> grounded answer
    (POST /chat, SURVEY §3.2) at sf0.001."""
    return _QUERIES["q53_rag_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
