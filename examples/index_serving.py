"""Index serving: the persisted-ANN-index lifecycle end-to-end.

    python examples/index_serving.py [sf_dir]

The reference keeps ONE in-process Chroma/hnswlib index that every
``add_documents`` mutates and every ``/chat`` probes (app.py:73-76,
375, 409). At 100 TB that becomes a PERSISTED index maintained by a
stream and probed without rescanning the corpus. This example runs
that lifecycle through the unified catalog (``operators/indexes.py``,
round 14) for all four maintained families — each stage is a graded
or equivalence-tested face; this file only composes them:

  1. create   — seed each index kind from a 90% backfill
  2. list     — catalog listing under one store root
  3. append   — absorb the remaining 10% as one incremental batch
  4. describe — per-component row counts after absorb
  5. query    — top-13 probe of each vector index against its
                PERSISTED structure (q362/q320 faces equal their
                driver-graded batch ops exactly; the graph face is
                recall-floor tested — QUALITY.md round-14 section)
  6. neardup  — the document index classifies + absorbs; results land
                in the index's own results component
  7. compact  — offline rewrite of the append-only stores to their
                read-side-canonical view (answers unchanged, tested)

Every stage prints a one-line summary; nothing is collected except
the tiny summaries.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from generative_ai_vector_db_spark.operators import indexes as ix  # noqa: E402
from generative_ai_vector_db_spark.operators import vector  # noqa: E402
from generative_ai_vector_db_spark.session import get_session  # noqa: E402
from generative_ai_vector_db_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="gavd-index-serving", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="gavd_indexroot_")

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    is_late = F.col("vec_id") % 10 == 3
    seed, late = emb.where(~is_late), emb.where(is_late)

    # 1. create: one named index per family under one root
    ix.create_index(spark, root, "ann_ivfpq", "ivfpq", seed)
    ix.create_index(spark, root, "ann_planes", "hyperplane", seed)
    ix.create_index(spark, root, "ann_graph", "graph", seed)
    ix.create_index(spark, root, "dedup_bands", "neardup", docs)

    # 2. list
    listed = [
        f"{r['name']}({r['kind']})"
        for r in ix.list_indexes(spark, root).collect()
    ]
    print(f"[1-2] created + listed: {', '.join(listed)}")

    # 3. append the held-out 10% (the streaming trigger's code path)
    for name in ("ann_ivfpq", "ann_planes", "ann_graph"):
        ix.append_index(spark, root, name, late)
    print(f"[3]   absorbed {late.count()} late vectors into 3 indexes")

    # 4. describe
    for name in ("ann_ivfpq", "ann_planes", "ann_graph", "dedup_bands"):
        comps = {
            r["component"]: r["n_rows"]
            for r in ix.describe_index(spark, root, name).collect()
        }
        print(f"[4]   {name}: " + ", ".join(
            f"{c}={n}" for c, n in sorted(comps.items())
        ))

    # 5. query each vector index against its persisted structure
    q_emb = emb.where(F.col("vec_id") == vector.BINARY_Q_ID)
    for name in ("ann_ivfpq", "ann_planes", "ann_graph"):
        top = ix.query_index(
            spark, root, name, q_emb, vector.BINARY_Q_ID
        ).collect()
        ids = [r["vec_id"] for r in top[:5]]
        print(f"[5]   {name} top-13 head: {ids} (k={len(top)})")

    # 6. the document index: classify-and-absorb one batch
    late_docs = docs.where(F.col("doc_id") % 10 == 7)
    ix.append_index(spark, root, "dedup_bands", late_docs)
    res = ix.open_index(spark, root, "dedup_bands").get("results")
    if res is not None:
        by = {
            r["status"]: r["n"]
            for r in res.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        print(f"[6]   neardup batch classified: {by}")

    # 7. compact the graph store: superseded reverse edges drop out
    comp = {
        r["component"]: (r["rows_before"], r["rows_after"])
        for r in ix.compact_index(spark, root, "ann_graph").collect()
    }
    print(f"[7]   ann_graph compacted: " + ", ".join(
        f"{c} {b}->{a}" for c, (b, a) in sorted(comp.items())
    ))

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
