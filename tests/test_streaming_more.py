from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from generative_ai_vector_db_spark.streaming import jobs
from generative_ai_vector_db_spark.tables import load

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture()
def events_src(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="events_src2_")
    load(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sliding_stream_equals_batch(spark, sf_dir, events_src):
    agg = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(events_src)
        .withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", jobs.TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName("t_slide")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    key = ["window_start", "event_type"]
    got = spark.table("t_slide").toPandas().sort_values(key).reset_index(drop=True)
    want = jobs.q32_sliding_window(spark, sf_dir).toPandas()
    got = got[want.columns].sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))


def test_streaming_dropduplicates(spark):
    """Q34's streaming face: dropDuplicates within watermark removes the
    re-delivered event."""
    d = tempfile.mkdtemp(prefix="dupe_src_")
    try:
        rows = [
            (1, "2024-01-01 00:00:01", 1, "a", 1.0, "{}"),
            (1, "2024-01-01 00:00:01", 1, "a", 1.0, "{}"),  # duplicate delivery
            (2, "2024-01-01 00:00:02", 1, "a", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(d)
        dedup = (
            spark.readStream.schema(EVENT_SCHEMA)
            .parquet(d)
            .withWatermark("ts", "10 minutes")
            .dropDuplicates(["event_id"])
        )
        (
            dedup.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = spark.table("t_dedup").toPandas()
        assert sorted(got["event_id"].tolist()) == [1, 2]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_q70_q71_match_oracle(spark, sf_dir):
    from .oracle_utils import compare_query

    for name in ["q70_interval_join", "q71_stats_agg"]:
        compare_query(spark, sf_dir, jobs.QUERIES[name], jobs.ORACLE[name], name)


def test_stream_stream_join_equals_batch(spark, sf_dir, events_src):
    jobs.run_attribution_stream(spark, events_src, sink_table="t_attrib")
    got = (
        spark.table("t_attrib")
        .toPandas()
        .sort_values(["purchase_id", "signup_id"])
        .reset_index(drop=True)
    )
    want = (
        jobs.q70_interval_join(spark, sf_dir)
        .toPandas()[["purchase_id", "signup_id", "user_id"]]
        .sort_values(["purchase_id", "signup_id"])
        .reset_index(drop=True)
    )
    assert got.equals(want), (len(got), len(want))


def test_q124_outer_attribution_matches_oracle(spark, sf_dir):
    from .oracle_utils import compare_query

    compare_query(
        spark,
        sf_dir,
        jobs.QUERIES["q124_outer_attribution"],
        jobs.ORACLE["q124_outer_attribution"],
        "q124_outer_attribution",
    )


def test_stream_outer_join_equals_batch(spark, sf_dir):
    """Left-outer stream-stream join vs the batch twin. Outer (null)
    rows are only emitted once the watermark passes their join window,
    so the replay appends a far-future sentinel file and runs
    file-per-batch: batch 1 = all real events, batch 2 = the sentinel,
    whose watermark flushes every unmatched purchase from batch 1."""
    d = tempfile.mkdtemp(prefix="events_outer_")
    try:
        ev = load(spark, sf_dir, "events")
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        # Two sentinel batches: the first advances the watermark past
        # all real data, the second is the buffer batch in which that
        # advanced watermark actually evicts (and thus emits) the last
        # unmatched purchases — Spark's two-watermark model. Sentinels
        # MUST survive the event_type filters (purchase + signup, on
        # BOTH sides: the global watermark is the min across watermark
        # operators), so they are typed rows with negative ids that the
        # assertion excludes.
        for i, days in enumerate((1, 2)):
            sentinel = spark.createDataFrame(
                [
                    (-1 - 2 * i, max_ts, -1, "purchase", 0.0, "{}"),
                    (-2 - 2 * i, max_ts, -2, "signup", 0.0, "{}"),
                ],
                EVENT_SCHEMA,
            ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAY"))
            sentinel.coalesce(1).write.mode("append").parquet(d)

        jobs.run_attribution_stream_outer(
            spark, d, sink_table="t_attrib_outer", max_files_per_trigger=1
        )
        got = spark.table("t_attrib_outer").toPandas()
        got = (
            got[got["purchase_id"] >= 0]
            .fillna({"signup_id": -1})
            .sort_values(["purchase_id", "signup_id"])
            .reset_index(drop=True)
        )
        want = (
            jobs.q124_outer_attribution(spark, sf_dir)
            .toPandas()[["purchase_id", "signup_id", "user_id"]]
            .fillna({"signup_id": -1})
            .sort_values(["purchase_id", "signup_id"])
            .reset_index(drop=True)
        )
        got = got.astype({"signup_id": "int64"})
        want = want.astype({"signup_id": "int64"})
        assert got.equals(want), (len(got), len(want))
        # the outer rows are actually present (not vacuously equal)
        assert (got["signup_id"] == -1).any()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partition_pruning_on_partitioned_layout(spark, sf_dir):
    """The 100 TB layout story: events partitioned by day; a day filter
    must prune partitions at planning time."""
    d = tempfile.mkdtemp(prefix="events_part_")
    try:
        ev = load(spark, sf_dir, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(d)
        back = spark.read.parquet(d).where(F.col("day") == "2024-01-05")
        from generative_ai_vector_db_spark.plans.audit import plan_of

        plan = plan_of(back)
        assert "PartitionFilters" in plan
        assert "2024-01-05" in plan
        n = back.count()
        want = ev.where(F.col("day") == "2024-01-05").count()
        assert n == want > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_stream_bounded_state(spark, sf_dir):
    """run_dedup_stream (dropDuplicatesWithinWatermark): re-delivered
    events within the watermark horizon are emitted exactly once, and
    the full events table passes through unduplicated."""
    d = tempfile.mkdtemp(prefix="dupes_src_")
    try:
        ev = load(spark, sf_dir, "events")
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        # second file replays the first 20 events (at-least-once retry)
        replay = ev.orderBy("event_id").limit(20)
        replay.coalesce(1).write.mode("append").parquet(d)

        jobs.run_dedup_stream(spark, d, sink_table="t_dedup_wm")
        got = spark.table("t_dedup_wm").toPandas()
        n_distinct = ev.select("event_id").distinct().count()
        assert len(got) == n_distinct
        assert got["event_id"].is_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_debounce_stream_equals_batch_twin(spark, sf_dir, events_src):
    """run_debounce_stream (dropDuplicatesWithinWatermark on
    (user, type, 10-min window)): the streamed per-type survivor counts
    equal q191's batch ``n_kept`` — the contract is count-equivalence,
    not survivor identity (see the q191 batch-twin comment)."""
    jobs.run_debounce_stream(spark, events_src, sink_table="t_debounce")
    got = (
        spark.table("t_debounce")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        jobs.q191_debounce(spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_kept"].tolist() == want["n_kept"].tolist()


def test_q216_rolling_distinct_stream_face(spark, sf_dir, events_src):
    """q216's streaming face: the stateful core of rolling 7-day
    distinct users is the DISTINCT over (window-end day, user) — run it
    as a streamed dropDuplicates (bounded per-key state, the thing that
    must scale), then the stateless count-per-day on the sink output
    must reproduce the batch operator exactly."""
    from generative_ai_vector_db_spark.operators import temporal

    contrib = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(events_src)
        .withWatermark("ts", "10 minutes")
        .select(F.to_date("ts").alias("day"), "user_id", "ts")
        .select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add("day", temporal.ROLLING_DISTINCT_DAYS - 1),
                )
            ).alias("day"),
            "user_id",
        )
        .dropDuplicates(["day", "user_id"])
    )
    (
        contrib.writeStream.format("memory")
        .queryName("t_rolling_distinct")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    observed = (
        load(spark, sf_dir, "events").select(F.to_date("ts").alias("day")).distinct()
    )
    got = (
        spark.table("t_rolling_distinct")
        .join(observed, "day", "left_semi")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("users_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "users_7d")
        .orderBy("day")
        .toPandas()
    )
    want = temporal.q216_rolling_distinct(spark, sf_dir).toPandas()
    assert got.equals(want), (len(got), len(want))
