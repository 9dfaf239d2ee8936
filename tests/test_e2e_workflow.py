"""End-to-end reference workflow: a user of the reference switching to
this repo runs the same lifecycle — upload files, ingest (route/chunk/
hash/dedup/stamp/embed), search top-k, assemble context, answer, log,
delete by filename — entirely through this package's public surface.
Mirrors SURVEY §3.1-§3.3 in one test."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from generative_ai_vector_db_spark.operators import rag, store
from generative_ai_vector_db_spark.operators.chunker import chunk_udf
from generative_ai_vector_db_spark.operators.vector import K
from generative_ai_vector_db_spark.sources import embedding_stage, loaders


@pytest.fixture()
def workspace():
    d = tempfile.mkdtemp(prefix="e2e_")
    uploads = os.path.join(d, "uploads")
    os.makedirs(uploads)
    corpus = {
        "spark.txt": "spark is a distributed engine for large scale data processing "
        * 12,
        "pandas.md": "pandas is a single machine dataframe library for analysis "
        * 12,
        "duck.txt": "duckdb is an embedded analytical database with fast sql " * 12,
        "dupe.txt": "spark is a distributed engine for large scale data processing "
        * 12,  # exact duplicate content of spark.txt
        "weird.zip": "not ingestible",
    }
    for name, content in corpus.items():
        with open(os.path.join(uploads, name), "w") as f:
            f.write(content)
    yield d, uploads
    shutil.rmtree(d, ignore_errors=True)


def test_full_reference_lifecycle(spark, workspace):
    work, uploads = workspace

    # §3.1 ingest: load -> route -> chunk -> hash -> dedup -> stamp -> embed
    docs, rejected = loaders.load_documents(spark, uploads)
    assert dict(rejected.toPandas().itertuples(index=False))["weird.zip"] == (
        "Unsupported file type"
    )

    chunks = docs.select(
        "doc_id",
        "source",
        F.sha2("text", 256).alias("file_hash"),
        F.posexplode(chunk_udf(200, 40)("text")).alias("chunk_index", "chunk_text"),
    )
    # R11 exact dedup: one doc per content hash survives
    keep = chunks.groupBy("file_hash").agg(F.min("doc_id").alias("doc_id"))
    chunks = chunks.join(keep, ["file_hash", "doc_id"], "inner")
    surviving_sources = {
        r["source"]
        for r in chunks.select("source").distinct().collect()
    }
    assert len(surviving_sources) == 3  # dupe.txt collapsed into spark.txt twin

    embedded = embedding_stage.embed_text(chunks, text_col="chunk_text")
    vectors = embedded.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.col("doc_id"),
        "source",
        "chunk_text",
        "file_hash",
        "embedding",
    )

    # R14 append + R15 open
    store_path = os.path.join(work, "store")
    store.append_vectors(vectors, store_path)
    opened = store.open_store(spark, store_path)
    n_vectors = opened.count()
    assert n_vectors == chunks.count()

    # §3.2 search: embed the question with the SAME embedder, score cosine
    q = spark.createDataFrame(
        [("q0", "distributed spark engine for data processing",)],
        "q_id string, question string",
    )
    q_emb = embedding_stage.embed_text(q, text_col="question").select(
        "q_id", "question", F.col("embedding").alias("q_emb")
    )
    from generative_ai_vector_db_spark.functions import vectors as V

    scored = opened.crossJoin(F.broadcast(q_emb)).select(
        "q_id",
        "question",
        "vec_id",
        "source",
        "chunk_text",
        V.cosine(F.col("q_emb"), F.col("embedding")).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= K)
    hits = topk.toPandas()
    assert len(hits) <= K
    # the spark content must rank first for a spark question (dedup keeps
    # ONE of the two identical files — whichever has the smaller path hash)
    assert hits.iloc[0]["source"] in ("spark.txt", "dupe.txt")
    top_source = hits.iloc[0]["source"]

    # context -> prompt -> stub answer -> chat-log record (R18/R19/R21)
    ctx = topk.groupBy("q_id", "question").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("chunk_text")))),
                lambda s: s["chunk_text"],
            ),
            "\n\n",
        ).alias("context")
    )
    answered = rag.stub_answer(rag.build_prompt(ctx))
    log_dir = os.path.join(work, "chat_logs")
    rag.write_chatlog_text(
        answered.select(
            rag.format_chatlog_record(
                F.lit("2026-01-09T00:00:00+00:00"),
                F.lit("user@example.com"),
                F.col("question"),
                F.col("answer"),
            ).alias("log_record")
        ),
        log_dir,
    )
    logged = spark.read.text(log_dir).toPandas()
    text_all = "\n".join(logged["value"].tolist())
    assert "User Email:user@example.com" in text_all
    assert "_" * 50 in text_all

    # §3.3 delete by filename: all vectors of the top source removed
    docs_for_delete = opened.select(
        F.col("vec_id").alias("doc_id"), F.col("source")
    )
    survivors = store.delete_by_source(opened, docs_for_delete, top_source)
    assert survivors.where(F.col("source") == top_source).count() == 0
    assert survivors.count() < n_vectors
