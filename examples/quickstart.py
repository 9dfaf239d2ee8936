"""Quickstart: the reference's full workflow on this engine.

    python examples/quickstart.py

Creates a tiny uploads directory, then runs the lifecycle a user of
``mohammed4564/generative_ai_vector_db`` runs today (SURVEY §3):
ingest (route -> parse -> chunk -> hash-dedup -> embed -> store),
top-k search, context assembly, prompt + grounded answer, chat-log
append, and delete-by-filename — all as Spark jobs.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from generative_ai_vector_db_spark.functions import vectors as V
from generative_ai_vector_db_spark.operators import rag, store
from generative_ai_vector_db_spark.operators.chunker import chunk_udf
from generative_ai_vector_db_spark.session import get_session
from generative_ai_vector_db_spark.sources import embedding_stage, loaders


def main() -> None:
    work = tempfile.mkdtemp(prefix="quickstart_")
    uploads = os.path.join(work, "uploads")
    os.makedirs(uploads)
    for name, text in {
        "spark_notes.txt": "spark distributes dataframe computation across executors " * 20,
        "cooking.md": "simmer the onions until translucent then add garlic " * 20,
        "astronomy.txt": "the telescope resolves distant galaxies and nebulae " * 20,
    }.items():
        with open(os.path.join(uploads, name), "w") as f:
            f.write(text)

    spark = get_session(app_name="quickstart")

    # ---- ingest (reference POST /upload-pdf, §3.1) ----
    docs, rejected = loaders.load_documents(spark, uploads)
    chunks = docs.select(
        "doc_id", "source",
        F.sha2("text", 256).alias("file_hash"),
        F.posexplode(chunk_udf(500, 100)("text")).alias("chunk_index", "chunk_text"),
    )
    vectors = embedding_stage.embed_text(chunks, text_col="chunk_text").select(
        F.monotonically_increasing_id().alias("vec_id"),
        "source", "chunk_text", "file_hash", "embedding",
    )
    store_path = os.path.join(work, "store")
    store.append_vectors(vectors, store_path)
    opened = store.open_store(spark, store_path)
    print(f"ingested {opened.count()} vectors from {docs.count()} documents; "
          f"rejected: {rejected.count()}")

    # ---- search + answer (reference POST /chat, §3.2) ----
    question = "how does spark run dataframes on many machines"
    q = spark.createDataFrame([(question,)], "question string")
    q_emb = embedding_stage.embed_text(q, text_col="question").select(
        "question", F.col("embedding").alias("q_emb")
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
    topk = (
        opened.crossJoin(F.broadcast(q_emb))
        .select("question", "vec_id", "source", "chunk_text",
                V.cosine(F.col("q_emb"), F.col("embedding")).alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 13)
    )
    ctx = topk.groupBy("question").agg(
        F.array_join(F.collect_list("chunk_text"), "\n\n").alias("context")
    )
    answered = rag.stub_answer(rag.build_prompt(ctx))
    row = answered.select("question", "answer").first()
    top = topk.select("source").first()["source"]
    print(f"Q: {row['question']}\ntop source: {top}\nA: {row['answer'][:70]}...")

    # ---- chat log (R21) + delete (POST /delete-file, §3.3) ----
    rag.write_chatlog_text(
        answered.select(
            rag.format_chatlog_record(
                F.lit("2026-01-09T00:00:00+00:00"), F.lit("user@example.com"),
                F.col("question"), F.col("answer"),
            ).alias("log_record")
        ),
        os.path.join(work, "chat_logs"),
    )
    survivors = store.delete_by_source(
        opened, opened.select(F.col("vec_id").alias("doc_id"), "source"), top
    )
    print(f"deleted '{top}': {opened.count()} -> {survivors.count()} vectors")

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
