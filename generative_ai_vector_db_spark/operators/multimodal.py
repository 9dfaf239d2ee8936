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


# ---------------------------------------------------------------------------
# q173 — ViT-style patch grid planning: each image asset explodes into
# its (patch_row, patch_col) grid for a PATCH x PATCH patchify — the
# 1:N_2D batch shape of vision-transformer preprocessing (q66 is the
# 1:N_1D video analog). The stub derives dims from the decode metadata
# and a per-patch feature from a deterministic byte probe; a real
# tokenizer (PIL crop + projection) yields actual patch tensors through
# the identical schema. Integer arithmetic throughout => exact SQL
# twin. Scale: rows out = assets x patches — the explode happens in
# the Arrow worker, never on the driver, and downstream shuffles key on
# doc_id so patch locality is preserved.
# ---------------------------------------------------------------------------
PATCH = 32
PATCHES_SCHEMA = (
    "doc_id bigint, patch_row bigint, patch_col bigint, patch_feature bigint"
)


def _patch_grid_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, rows, cols, feats = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            w, h = n_bytes % 640, (n_bytes * 7) % 480
            pw, ph = (w + PATCH - 1) // PATCH, (h + PATCH - 1) // PATCH
            for r in range(ph):
                for c in range(pw):
                    doc_ids.append(doc_id)
                    rows.append(r)
                    cols.append(c)
                    feats.append(payload[((r * pw + c) * 31) % n_bytes])
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "patch_row": rows,
                "patch_col": cols,
                "patch_feature": feats,
            }
        )


def q173_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = binary_table(spark, sf_dir).mapInPandas(
        _patch_grid_batches, PATCHES_SCHEMA
    )
    return out.orderBy("doc_id", "patch_row", "patch_col")


Q173_SQL = f"""
WITH sized AS (
  SELECT doc_id, encode(text) AS payload,
         octet_length(encode(text)) AS n_bytes,
         octet_length(encode(text)) % 640 AS w,
         octet_length(encode(text)) * 7 % 480 AS h
  FROM documents
),
grids AS (
  SELECT doc_id, payload, n_bytes,
         (w + {PATCH} - 1) // {PATCH} AS pw,
         (h + {PATCH} - 1) // {PATCH} AS ph
  FROM sized
),
cells AS (
  SELECT doc_id, payload, n_bytes, pw,
         unnest(generate_series(0, ph * pw - 1)) AS cell
  FROM grids
  WHERE ph * pw > 0
)
SELECT doc_id,
       CAST(cell // pw AS BIGINT) AS patch_row,
       CAST(cell % pw AS BIGINT) AS patch_col,
       CAST(ord(substring(CAST(payload AS VARCHAR),
            CAST((cell * 31) % n_bytes AS INTEGER) + 1, 1)) AS BIGINT)
           AS patch_feature
FROM cells
ORDER BY doc_id, patch_row, patch_col
"""


# ---------------------------------------------------------------------------
# q174 — audio window framing: overlapping fixed-length sample windows
# (size AUDIO_WIN, hop AUDIO_HOP — the STFT/wav2vec front-end shape)
# over each asset's sample stream (stub: 1 byte = 1 sample). Emits one
# row per window with start/end sample and two deterministic probe
# features; a real front end replaces the probes with the frame tensor
# through the same 1:N schema. Windows that would run past the stream
# are not emitted (no padding — the downstream collator pads), matching
# the torchaudio frame convention.
# ---------------------------------------------------------------------------
AUDIO_WIN = 256
AUDIO_HOP = 128
AUDIO_SCHEMA = (
    "doc_id bigint, win_idx bigint, start_sample bigint, end_sample bigint, "
    "first_sample bigint, mid_sample bigint"
)


def _audio_window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, idxs, starts, ends, firsts, mids = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            n_win = 0 if n < AUDIO_WIN else (n - AUDIO_WIN) // AUDIO_HOP + 1
            for i in range(n_win):
                s = i * AUDIO_HOP
                doc_ids.append(doc_id)
                idxs.append(i)
                starts.append(s)
                ends.append(s + AUDIO_WIN - 1)
                firsts.append(payload[s])
                mids.append(payload[s + AUDIO_WIN // 2])
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "win_idx": idxs,
                "start_sample": starts,
                "end_sample": ends,
                "first_sample": firsts,
                "mid_sample": mids,
            }
        )


def q174_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = binary_table(spark, sf_dir).mapInPandas(
        _audio_window_batches, AUDIO_SCHEMA
    )
    return out.orderBy("doc_id", "win_idx")


Q174_SQL = f"""
WITH sized AS (
  SELECT doc_id, encode(text) AS payload,
         octet_length(encode(text)) AS n
  FROM documents
),
wins AS (
  SELECT doc_id, payload, n,
         unnest(generate_series(
           0, CASE WHEN n < {AUDIO_WIN} THEN -1
                   ELSE (n - {AUDIO_WIN}) // {AUDIO_HOP} END)) AS win_idx
  FROM sized
  WHERE n >= {AUDIO_WIN}
)
SELECT doc_id,
       CAST(win_idx AS BIGINT) AS win_idx,
       CAST(win_idx * {AUDIO_HOP} AS BIGINT) AS start_sample,
       CAST(win_idx * {AUDIO_HOP} + {AUDIO_WIN} - 1 AS BIGINT) AS end_sample,
       CAST(ord(substring(CAST(payload AS VARCHAR),
            CAST(win_idx * {AUDIO_HOP} AS INTEGER) + 1, 1)) AS BIGINT)
           AS first_sample,
       CAST(ord(substring(CAST(payload AS VARCHAR),
            CAST(win_idx * {AUDIO_HOP} + {AUDIO_WIN} // 2 AS INTEGER) + 1, 1))
           AS BIGINT) AS mid_sample
FROM wins
ORDER BY doc_id, win_idx
"""


QUERIES = {
    "q43_multimodal_decode": q43_multimodal_decode,
    "q66_multimodal_framesample": q66_multimodal_framesample,
    "q152_multimodal_resize": q152_multimodal_resize,
    "q173_patch_grid": q173_patch_grid,
    "q174_audio_windows": q174_audio_windows,
}

ORACLE = {
    "q43_multimodal_decode": Q43_SQL,
    "q66_multimodal_framesample": Q66_SQL,
    "q152_multimodal_resize": Q152_SQL,
    "q173_patch_grid": Q173_SQL,
    "q174_audio_windows": Q174_SQL,
}
