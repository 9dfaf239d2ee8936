"""Round-14 operator tests: streaming maintenance for the remaining
ANN families (hyperplane buckets, NN-descent graph — VERDICT r13 item
3), the unified persisted-index catalog (item 5), the de-weaked
SemDeDup default path (item 1), and regression locks for the r14
ADVICE fixes (duplicate vec_ids within a micro-batch; q368 zero-range
reference guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from generative_ai_vector_db_spark.operators import vector
from generative_ai_vector_db_spark.tables import load


def test_vector_index_batch_dedupes_within_microbatch(
    spark, sf_dir_t2, tmp_path
):
    """A vec_id duplicated WITHIN one micro-batch must land exactly one
    code row (r14 advice): before the fix, both copies survived the
    anti-join against the code store and the duplicate code occupied
    two shortlist slots at query time, breaking stream==batch."""
    from generative_ai_vector_db_spark.streaming import ingest_stream as ist

    emb = load(spark, sf_dir_t2, "embeddings").select("vec_id", "embedding")
    is_late = F.col("vec_id") % 10 == 3
    seed, late = emb.where(~is_late), emb.where(is_late)

    index = str(tmp_path / "vindex")
    src = str(tmp_path / "vsrc")
    ist.seed_vector_index(spark, seed, index)
    # duplicate every late row inside the single source file: one
    # availableNow trigger sees both copies in the same micro-batch
    late.unionAll(late).coalesce(1).write.parquet(src)
    ist.run_vector_index_stream(spark, src, index, str(tmp_path / "ck"))

    codes = spark.read.parquet(index + "/codes")
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()

    q_emb = emb.where(F.col("vec_id") == vector.BINARY_Q_ID)
    got = [
        (r["vec_id"], r["cos_sim"], r["rn"])
        for r in ist.query_vector_index(
            spark, index, q_emb, vector.BINARY_Q_ID
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"], r["rn"])
        for r in vector.q362_portable_ivfpq_ann(spark, sf_dir_t2).collect()
    ]
    assert got == want


def test_q368_zero_range_reference_is_defined(spark, tmp_path):
    """With a zero-range reference window (all reference-week values
    identical) the clamped denominator must yield finite log_e and a
    0/1 rejected on BOTH engines — not NULL (r14 advice)."""
    import duckdb

    from generative_ai_vector_db_spark.operators import stats

    rows = [
        # 7 reference days, constant value -> r_ref would be 0
        *[(f"2024-01-{d:02d}T00:00:00", 1.0) for d in range(1, 8)],
        # monitored days drift upward
        ("2024-01-08T00:00:00", 5.0),
        ("2024-01-09T00:00:00", 9.0),
    ]
    df = spark.createDataFrame(
        [(i, "view", v, t) for i, (t, v) in enumerate(rows)],
        "event_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    got = stats.q368_drift_edetector(spark, str(tmp_path)).collect()
    assert len(got) == 2
    assert all(r["log_e"] is not None for r in got)
    assert all(r["rejected"] in (0, 1) for r in got)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    want = con.sql(stats.Q368_SQL).fetchall()
    assert [(r["day"], r["n_t"], r["log_e"], r["rejected"]) for r in got] == [
        tuple(w) for w in want
    ]
