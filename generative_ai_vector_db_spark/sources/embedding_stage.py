"""Embedding stage — reference R13: HuggingFace all-MiniLM-L6-v2
(384-d float32) invoked batch-wise inside Chroma's add_documents
(``app.py:46-48``, ``helper/multiple_document_upload.py:161-168``).

Re-expressed as an Arrow-batched ``mapInPandas`` stage with a pluggable
model:

* ``method="hash"`` (default, always available): deterministic feature
  hashing — token -> crc32 bucket with a sign bit, L2-normalized.
  crc32 is stable across processes (unlike Python's ``hash``), so
  results are reproducible cluster-wide. This is the test/oracle path.
* ``method="sentence-transformers"``: the real model, import-gated —
  the package is not in this container; on a cluster the model loads
  ONCE PER WORKER (lazy global), not per batch.

Scale: Arrow batches bound memory; model state is per-executor; the
stage is a narrow map (no shuffle). For GPU inference, repartition to
match GPU count and raise maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

DEFAULT_DIM = 64

_MODEL_CACHE: dict[str, object] = {}


def _hash_embed(texts: pd.Series, dim: int) -> list[list[float]]:
    import zlib

    out = []
    for t in texts:
        vec = np.zeros(dim, dtype=np.float64)
        for tok in (t or "").lower().split():
            h = zlib.crc32(tok.encode("utf-8"))
            idx = h % dim
            sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
            vec[idx] += sign
        n = np.linalg.norm(vec)
        if n > 0:
            vec /= n
        out.append([float(x) for x in vec])
    return out


def _st_embed(texts: pd.Series, model_name: str) -> list[list[float]]:
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:
        raise NotImplementedError(
            "sentence-transformers is not installed in this container; "
            "use method='hash' or install the package on the cluster"
        ) from e
    model = _MODEL_CACHE.get(model_name)
    if model is None:
        model = SentenceTransformer(model_name)
        _MODEL_CACHE[model_name] = model
    return [list(map(float, v)) for v in model.encode(list(texts))]


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    method: str = "hash",
    dim: int = DEFAULT_DIM,
    model_name: str = "all-MiniLM-L6-v2",
) -> DataFrame:
    """Append an ``array<float>`` embedding column via mapInPandas."""
    from .._bootstrap import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{in_fields}, {out_col} array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if method == "hash":
                vecs = _hash_embed(pdf[text_col], dim)
            elif method == "sentence-transformers":
                vecs = _st_embed(pdf[text_col], model_name)
            else:
                raise ValueError(f"unknown embedding method {method!r}")
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(gen, schema)
