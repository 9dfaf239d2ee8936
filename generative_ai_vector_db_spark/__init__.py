"""PySpark-native analytics engine with the query and data-processing
capabilities of ``mohammed4564/generative_ai_vector_db`` (see SURVEY.md).

Built from scratch, Spark-first: the reference is a Flask RAG application
(loaders -> chunking -> embeddings -> Chroma top-k -> LLM); this package
re-expresses that surface — plus the relational / streaming / LLM-pipeline
operators declared in SURVEY.md §2 — as DataFrame/SQL logical plans that
Catalyst optimizes and Tungsten executes, designed for a 1000-executor
cluster at ~100 TB even though tests run on ``local[*]``.

Layout:
    session.py            SparkSession factory (AQE, Arrow, UTC)
    tables.py             fixture-table catalog (TESTDATA.md parquet)
    functions/            vector & text expression builders (no JVM code)
    operators/            query/operator implementations, each with a
                          DuckDB oracle twin where SQL-expressible
    sources/              file-format source framework (reference R1-R8)
    streaming/            Structured Streaming jobs + batch twins
    plans/                explain()-audit helpers
"""

__version__ = "0.1.0"

TABLE_NAMES = [
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
