from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from generative_ai_vector_db_spark.streaming import jobs
from generative_ai_vector_db_spark.tables import load

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(jobs.ORACLE))
def test_streaming_batch_twins_match_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, jobs.QUERIES[name], jobs.ORACLE[name], name)


@pytest.fixture()
def events_src(spark, sf_dir):
    """Re-materialize events (normalized micros timestamps) as a stream
    source dir."""
    d = tempfile.mkdtemp(prefix="events_src_")
    load(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_stream_equals_batch(spark, sf_dir, events_src):
    jobs.run_tumbling_stream(spark, events_src, sink_table="t_tumb")
    got = spark.table("t_tumb").toPandas()
    want = jobs.q31_tumbling_window(spark, sf_dir).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))


def test_session_stream_equals_batch_twin(spark, sf_dir, events_src):
    jobs.run_session_stream(spark, events_src, sink_table="t_sess")
    got = (
        spark.table("t_sess")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        jobs.q33_session_window(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ["user_id", "session_start", "n_events", "sum_value"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_watermark_drops_late_rows(spark):
    """Three single-row-group files replayed one per micro-batch
    (maxFilesPerTrigger=1 on the READ side — on the writer it is
    ignored): file 1 advances the watermark to 00:58, file 2 is an
    on-time buffer batch (Spark filters late events against the
    PREVIOUS batch's watermark — SPARK-41524's two-watermark model),
    file 3's 00:00:40 row is then behind the late-events watermark and
    MUST be dropped, leaving the finalized 00:00 window at exactly its
    one on-time row.

    The part files are placed in the SOURCE ROOT: the parquet file
    source does not recurse into non-partition subdirectories, and a
    subdir layout silently yields an empty stream."""
    import glob
    import time

    d = tempfile.mkdtemp(prefix="late_src_")
    stage = tempfile.mkdtemp(prefix="late_stage_")
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"

    def write_file(i: int, rows, age_sec: int) -> None:
        df = spark.createDataFrame(rows, schema).withColumn("ts", F.to_timestamp("ts"))
        sub = os.path.join(stage, f"b{i}")
        df.coalesce(1).write.parquet(sub)
        part = glob.glob(os.path.join(sub, "part-*.parquet"))[0]
        dst = os.path.join(d, f"file{i}.parquet")
        shutil.copy(part, dst)
        t = time.time() - age_sec
        os.utime(dst, (t, t))

    try:
        write_file(1, [(1, "2024-01-01 00:00:30", 1, "a", 1.0, "{}"),
                       (2, "2024-01-01 00:01:10", 1, "a", 1.0, "{}"),
                       (3, "2024-01-01 01:00:00", 1, "a", 1.0, "{}")], 3600 * 3)
        write_file(2, [(4, "2024-01-01 02:00:00", 1, "a", 1.0, "{}")], 3600 * 2)
        write_file(3, [(5, "2024-01-01 00:00:40", 1, "a", 1.0, "{}")], 3600)

        jobs.run_tumbling_stream_append(spark, d, sink_table="t_late")
        got = spark.table("t_late").toPandas()
        finalized = dict(zip(got["window_start"], got["n_events"]))
        # the 00:00 window finalized with only its on-time row
        assert finalized["2024-01-01 00:00:00"] == 1
        assert finalized["2024-01-01 00:01:00"] == 1
        # each finalized window is emitted exactly once (append mode)
        assert got["window_start"].is_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)


def test_chatlog_append_sink(spark, sf_dir, events_src):
    out = tempfile.mkdtemp(prefix="chatlog_out_")
    ckpt = tempfile.mkdtemp(prefix="chatlog_ckpt_")
    try:
        jobs.run_chatlog_append_stream(spark, events_src, out, ckpt)
        logged = spark.read.parquet(out)
        n_events = load(spark, sf_dir, "events").count()
        assert logged.count() == n_events
        assert set(logged.columns) == {"ts", "user_email", "question", "answer"}
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_enrich_stream_equals_batch_twin(spark, sf_dir, events_src):
    """Stream-static join: the streamed aggregate matches the batch twin
    exactly on the supported aggregates (distinct counts are approximate
    in streaming mode, so n_users is compared with HLL tolerance)."""
    jobs.run_enrich_stream(spark, events_src, sf_dir, sink_table="t_enrich")
    got = (
        spark.table("t_enrich")
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    want = (
        jobs.q111_stream_static_enrich(spark, sf_dir)
        .toPandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert got["c_mktsegment"].tolist() == want["c_mktsegment"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["sum_value"].tolist() == want["sum_value"].tolist()
    # HLL++ default relative error ~2.3%; fixture cardinalities are tiny
    for approx, exact in zip(got["n_users_approx"], want["n_users"]):
        assert abs(approx - exact) <= max(2, 0.1 * exact)
