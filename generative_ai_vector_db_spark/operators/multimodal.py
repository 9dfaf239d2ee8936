"""Multimodal column plumbing — opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``
(north-star operator; no binary fixture exists, so the payload is the
UTF-8 encoding of ``documents.text`` — the plumbing, schema, batch
shape and partitioning are the real thing).

The decode stage is STUBBED (this container has no image/audio libs):
``decode_stub`` computes deterministic metadata (byte length, SHA-256,
derived fake dimensions) so the whole path is oracle-checkable end to
end; a real decoder (PIL/ffmpeg) drops into ``_process_batches``
unchanged. ``decode_real`` shows the gated import and raises
NotImplementedError.

Scale: mapInPandas streams Arrow record batches through the Python
worker — memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch,
not partition size; binary payloads never materialize on the driver.
Repartition upstream by payload-size buckets if batches are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_sha string, "
    "fake_width bigint, fake_height bigint, n_frames bigint"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "content_sha": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                "fake_width": n_bytes % 640,
                "fake_height": (n_bytes * 7) % 480,
                "n_frames": n_bytes % 16,
            }
        )


def decode_real(payload: bytes, media_type: str):
    """Real decoder slot — image/audio libs are not in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires pillow/ffmpeg; wire the decoder into "
            "_decode_batches — the Spark-side plumbing is unchanged"
        ) from e
    raise NotImplementedError("unreachable in this environment")


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, media_type, n_bytes)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def q43_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = binary_table(spark, sf_dir).mapInPandas(_decode_batches, DECODED_SCHEMA)
    return out.orderBy("doc_id")


# DuckDB twin: the stub's metadata is pure functions of the payload bytes.
Q43_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
       CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height,
       CAST(octet_length(encode(text)) % 16 AS BIGINT) AS n_frames
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "q43_multimodal_decode": q43_multimodal_decode,
}

ORACLE = {
    "q43_multimodal_decode": Q43_SQL,
}
