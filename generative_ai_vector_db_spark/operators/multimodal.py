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


# ---------------------------------------------------------------------------
# Frame sampling — the video-shaped batch pattern: decode emits ONE ROW
# PER SAMPLED FRAME (1:N mapInPandas), each with frame index + a
# deterministic per-frame feature. The stub derives n_frames from the
# payload; a real decoder (ffmpeg) yields actual frames through the
# identical schema/batch shape.
# ---------------------------------------------------------------------------
FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_feature bigint"


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, idxs, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            n_frames = n_bytes % 16
            for i in range(n_frames):
                doc_ids.append(doc_id)
                idxs.append(i)
                # deterministic stand-in for a frame feature: byte at the
                # frame's stride offset
                feats.append(payload[(i * 997) % n_bytes])
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_feature": feats}
        )


def q66_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = binary_table(spark, sf_dir).mapInPandas(
        _frame_sample_batches, FRAMES_SCHEMA
    )
    return out.orderBy("doc_id", "frame_idx")


# Oracle: payloads here are ASCII text, so byte-at-offset equals
# ord(char-at-offset) after casting the BLOB back to VARCHAR.
Q66_SQL = """
WITH sized AS (
  SELECT doc_id, encode(text) AS payload, octet_length(encode(text)) AS n_bytes
  FROM documents
),
frames AS (
  SELECT doc_id, payload, n_bytes,
         unnest(generate_series(0, CAST(n_bytes % 16 AS BIGINT) - 1)) AS frame_idx
  FROM sized
  WHERE n_bytes % 16 > 0
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(ord(substring(CAST(payload AS VARCHAR),
            CAST((frame_idx * 997) % n_bytes AS INTEGER) + 1, 1)) AS BIGINT)
           AS frame_feature
FROM frames
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# q152 — resize planning: the third leg of the multimodal pipeline
# (decode -> RESIZE -> feature-extract). Computes each asset's
# aspect-preserving fit into a 224x224 model input box (the standard
# vision-model preprocessing step) inside the same Arrow-batched
# mapInPandas stage a real resampler would occupy; a real PIL
# Image.resize drops into `_resize_batches` with the schema, batch
# shape and partitioning unchanged. All dims use INTEGER arithmetic
# ((d * 224) // max(w, h, 1)) so the stub is exactly reproducible in
# SQL — the oracle checks the planning math end to end.
# ---------------------------------------------------------------------------
RESIZE_BOX = 224
RESIZED_SCHEMA = (
    "doc_id bigint, in_w bigint, in_h bigint, out_w bigint, out_h bigint, "
    "scale_bp bigint"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        in_w = n_bytes % 640
        in_h = (n_bytes * 7) % 480
        m = pd.concat([in_w, in_h], axis=1).max(axis=1).clip(lower=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "in_w": in_w,
                "in_h": in_h,
                "out_w": (in_w * RESIZE_BOX) // m,
                "out_h": (in_h * RESIZE_BOX) // m,
                # scale in basis points — integer, no float rounding drift
                "scale_bp": (RESIZE_BOX * 10000) // m,
            }
        )


def q152_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = binary_table(spark, sf_dir).mapInPandas(_resize_batches, RESIZED_SCHEMA)
    return out.orderBy("doc_id")


Q152_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 AS in_w,
         octet_length(encode(text)) * 7 % 480 AS in_h
  FROM documents
), m AS (
  SELECT doc_id, in_w, in_h,
         greatest(in_w, in_h, 1) AS mx
  FROM dims
)
SELECT doc_id,
       CAST(in_w AS BIGINT) AS in_w,
       CAST(in_h AS BIGINT) AS in_h,
       CAST(in_w * {RESIZE_BOX} // mx AS BIGINT) AS out_w,
       CAST(in_h * {RESIZE_BOX} // mx AS BIGINT) AS out_h,
       CAST({RESIZE_BOX} * 10000 // mx AS BIGINT) AS scale_bp
FROM m
ORDER BY doc_id
"""


QUERIES = {
    "q43_multimodal_decode": q43_multimodal_decode,
    "q66_multimodal_framesample": q66_multimodal_framesample,
    "q152_multimodal_resize": q152_multimodal_resize,
}

ORACLE = {
    "q43_multimodal_decode": Q43_SQL,
    "q66_multimodal_framesample": Q66_SQL,
    "q152_multimodal_resize": Q152_SQL,
}
