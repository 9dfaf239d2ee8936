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
    """File 1 advances the watermark far past file 2's late rows; append
    mode must finalize early windows and drop the late data."""
    d = tempfile.mkdtemp(prefix="late_src_")
    try:
        early = spark.createDataFrame(
            [(1, "2024-01-01 00:00:30", 1, "a", 1.0, "{}"),
             (2, "2024-01-01 00:01:10", 1, "a", 1.0, "{}"),
             (3, "2024-01-01 01:00:00", 1, "a", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        late = spark.createDataFrame(
            [(4, "2024-01-01 00:00:40", 1, "a", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        import glob
        import time

        early.coalesce(1).write.parquet(os.path.join(d, "batch1"))
        late.coalesce(1).write.parquet(os.path.join(d, "batch2"))
        # the file source orders by modification time: force batch1 (early
        # data) strictly older so it forms micro-batch 1 and advances the
        # watermark before the late row arrives in micro-batch 2
        now = time.time()
        for f in glob.glob(os.path.join(d, "batch1", "*.parquet")):
            os.utime(f, (now - 3600, now - 3600))
        for f in glob.glob(os.path.join(d, "batch2", "*.parquet")):
            os.utime(f, (now, now))
        jobs.run_tumbling_stream_append(spark, d, sink_table="t_late")
        got = spark.table("t_late").toPandas()
        finalized = dict(zip(got["window_start"], got["n_events"]))
        # the 00:00 window was finalized by file 1's watermark advance
        # (1:00:00 - 2min) BEFORE the late row arrived -> count stays 1
        if "2024-01-01 00:00:00" in finalized:
            assert finalized["2024-01-01 00:00:00"] == 1
        # the late row must never appear as its own emitted increment
        assert finalized.get("2024-01-01 00:00:00", 1) == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


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
