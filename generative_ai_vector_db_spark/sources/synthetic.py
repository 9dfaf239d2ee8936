"""Synthetic planted-cluster embedding corpus (ANN validation source).

The fixture embeddings are ISOTROPIC unit vectors (see QUALITY.md):
true neighbors sit barely above the similarity background, which is
the information-theoretic worst case for every sublinear ANN family —
recall cannot beat scan fraction there, no matter the index. That
makes the fixture a fine CORRECTNESS corpus but a degenerate QUALITY
corpus: a broken LSH and a perfect LSH measure almost the same.

This module generates the complementary corpus: unit vectors planted
in well-separated clusters (each member = normalize(center + noise)),
the regime real embedding models produce (near-duplicates, paraphrase
families, modality clusters). The ANN quality floors in QUALITY.md are
measured on BOTH corpora: the fixture shows the honest isotropic
bound; the planted corpus shows the same code delivering high recall
at low scan fraction once the data has structure — proving the index
implementations (q46 LSH / q49 IVF / q214 graph) are correct and that
their weak fixture floors are a property of the data, not the code.

Deterministic: seeded numpy, written once per (dir, params); the file
matches the fixture's embeddings.parquet schema exactly (vec_id int64,
embedding list<float>, label int32) so every operator that loads the
``embeddings`` table runs unchanged against the planted directory.
"""

from __future__ import annotations

import os


def planted_cluster_frame(
    n_clusters: int = 40,
    per_cluster: int = 15,
    dim: int = 64,
    # per-dim noise sigma: the noise VECTOR norm is ~sigma*sqrt(dim),
    # so 0.1 gives |noise| ~ 0.8 vs the unit center — tight clusters
    # (top-13 of a member is 100% in-cluster) but far from degenerate
    noise: float = 0.1,
    seed: int = 7,
):
    """pandas frame (vec_id, embedding, label) of planted clusters."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vec_id = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vec_id, v.astype("float32").tolist(), c))
            vec_id += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


def write_planted_embeddings(out_dir: str, **kwargs) -> str:
    """Write embeddings.parquet with the fixture schema; returns
    out_dir (usable as the sf_dir of any embeddings-only operator)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = planted_cluster_frame(**kwargs)
    schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir
