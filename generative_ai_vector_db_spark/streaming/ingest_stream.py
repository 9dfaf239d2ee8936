"""Continuous ingest — reference §3.1 (``POST /upload-pdf``) as a
Structured Streaming job instead of a per-request endpoint: a file
stream watches the uploads directory; each micro-batch runs the same
parse → chunk → hash → dedup → stamp → embed pipeline and appends to
the vector store via ``foreachBatch``.

Dedup semantics match the reference exactly (R11,
``helper/multiple_document_upload.py:140-149``): a file whose content
hash already exists in the STORE is skipped; within a batch the first
occurrence wins.

Scale: the file source checkpoints processed-file state; each batch is
the batch ingest plan (all-narrow except the dedup anti-join); the
store append is an atomic-per-batch parquet write (table-format commit
on Delta/Iceberg). Embedding batches are Arrow-bounded. Backpressure =
maxFilesPerTrigger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import path_exists as _path_exists
from ..operators.chunker import chunk_udf
from ..sources.embedding_stage import embed_text
from ..sources.loaders import parse_files


def _ingest_batch(
    batch: DataFrame,
    store_path: str,
    user_email: str,
    size: int,
    overlap: int,
) -> None:
    spark = batch.sparkSession
    parsed = parse_files(batch)
    ok = parsed.where(F.col("error").isNull() & (F.trim("text") != ""))

    chunks = ok.select(
        F.lower("filename").alias("source"),  # R12 stamp, ref :153
        F.col("ext").alias("type"),
        F.sha2("text", 256).alias("file_hash"),  # R10
        F.posexplode(chunk_udf(size, overlap)("text")).alias(
            "chunk_index", "chunk_text"
        ),
    ).where(F.trim("chunk_text") != "")

    # in-batch dedup: first source per hash wins. Window min, not a
    # self-join — a join of a frame against its own derived aggregate
    # resolves both hash columns to the same lineage and Spark degrades
    # the predicate to trivially-true (wrong plan the moment two hash
    # groups share a source).
    from pyspark.sql import Window

    keep_source = F.min("source").over(Window.partitionBy("file_hash"))
    chunks = (
        chunks.withColumn("_keep_source", keep_source)
        .where(F.col("source") == F.col("_keep_source"))
        .drop("_keep_source")
    )

    # R11 store-level dedup: skip files whose hash is already persisted.
    # Only the store-not-created-yet case is ignorable (R14
    # create-or-append); any other read failure (corruption, permissions,
    # schema drift) must fail the batch, not silently disable dedup.
    if _path_exists(spark, store_path):
        existing = spark.read.parquet(store_path).select("file_hash").distinct()
        chunks = chunks.join(existing, "file_hash", "left_anti")

    out = embed_text(
        chunks.withColumn("user", F.lit(user_email)), text_col="chunk_text"
    )
    out.write.mode("append").parquet(store_path)


def run_ingest_stream(
    spark: SparkSession,
    uploads_dir: str,
    store_path: str,
    checkpoint_dir: str,
    user_email: str = "user@example.com",
    size: int = 1000,
    overlap: int = 200,
) -> None:
    from pyspark.sql import types as T

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .load(uploads_dir)
        .select("path", "content")
    )
    (
        files.writeStream.foreachBatch(
            lambda batch, _id: _ingest_batch(
                batch, store_path, user_email, size, overlap
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def open_store(spark: SparkSession, store_path: str) -> DataFrame:
    return spark.read.parquet(store_path)


# ---------------------------------------------------------------------------
# Streaming upsert sink: MERGE-per-micro-batch. The append-only sink
# above matches the reference's ingest; this one maintains a
# KEEP-LATEST store (CDC apply / device shadow / feature-store online
# view). Per batch: dedup within the batch (newest event wins by
# (ts, event_id)), union with the store, keep-newest window, atomic
# swap via write-to-temp + rename — a crash mid-batch never leaves a
# half store (the checkpoint re-runs the batch). The merge compares
# TIMESTAMPS, not batch priority, so replayed or reordered batches
# converge to the same store — the idempotence the foreachBatch
# at-least-once contract requires. On Delta/Iceberg the body is
# MERGE INTO and the swap is a table commit.
# ---------------------------------------------------------------------------
def _upsert_batch(batch: DataFrame, store_path: str, key: str, ts_col: str) -> None:
    from pyspark.sql import Window
    from ..fsutil import rename_dir

    spark = batch.sparkSession
    # last-writer-wins within the batch; event_id breaks ts ties so the
    # result is deterministic under replay
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.col("event_id").desc()
    )
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if _path_exists(spark, store_path):
        # ts-based merge (not batch-priority): the stored row survives
        # unless the incoming one is NEWER, so replayed or reordered
        # micro-batches converge to the same store (the at-least-once
        # foreachBatch contract needs exactly this idempotence)
        merged = (
            spark.read.parquet(store_path)
            .unionByName(latest)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        merged = latest
    tmp = store_path + "._staging"
    merged.write.mode("overwrite").parquet(tmp)
    rename_dir(spark, tmp, store_path)


def run_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
) -> None:
    """Maintain a keep-latest keyed store from an event stream — the
    'current state per key' materialization (CDC apply / device
    shadow / feature-store online view)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    ev = spark.readStream.schema(schema).parquet(src_dir)
    (
        ev.writeStream.foreachBatch(
            lambda batch, _id: _upsert_batch(batch, store_path, key, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
