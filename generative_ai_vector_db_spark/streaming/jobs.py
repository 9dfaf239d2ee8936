"""Structured Streaming surface — SURVEY §2.B Q31-Q33 + the reference's
continuous-ingest/chat-log-append shapes (R14/R21) as streaming sinks.

The t2-checked queries here are the deterministic BATCH twins (the
driver hash-matches them against DuckDB); the ``run_*_stream`` functions
execute the same logical windows through ``readStream`` with an
``availableNow`` trigger, and tests/test_streaming.py asserts
batch/stream equivalence and watermark late-data drop.

Scale notes:
* Tumbling/sliding windows are hash-partitioned by (window, key) —
  state per group is O(1) aggregates; watermark bounds total state.
* Session windows (Q33) in batch are the lag/cumsum assignment — a
  single shuffle on user_id then a per-partition scan; in streaming,
  ``session_window`` keeps per-key open-session state and the
  watermark closes/evicts it.
* ``dropDuplicates`` within watermark is the streaming face of Q34.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
SESSION_GAP_US = 30_000_000  # 30 seconds


def _windowed(df: DataFrame, duration: str, slide: str | None = None) -> DataFrame:
    win = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Q31 tumbling window (1 minute) — batch twin.
# ---------------------------------------------------------------------------
def q31_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed(load(spark, sf_dir, "events"), "1 minute").orderBy(
        "window_start", "event_type"
    )


Q31_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '1 minute', ts), '{TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# Q32 sliding window (5 minutes, 1-minute slide) — batch twin. Each event
# belongs to exactly 5 windows; the oracle expands via generate_series.
# ---------------------------------------------------------------------------
def q32_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed(load(spark, sf_dir, "events"), "5 minutes", "1 minute").orderBy(
        "window_start", "event_type"
    )


Q32_SQL = f"""
WITH expanded AS (
  SELECT time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute' AS wstart,
         event_type, value
  FROM events, unnest(generate_series(0, 4)) AS t(k)
)
SELECT strftime(wstart, '{TS_FMT_DUCK}') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM expanded
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# Q33 session windows (30 s gap) per user — batch twin via lag/cumsum
# session assignment (deterministic; microsecond integer math so Spark
# and DuckDB agree exactly). A new session starts when the gap from the
# previous event is >= 30 s — the same boundary rule as Spark's
# session_window (window end = last_ts + gap, exclusive).
# ---------------------------------------------------------------------------
def q33_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_session = (
        (us - F.lag(us).over(w) >= SESSION_GAP_US) | F.lag(us).over(w).isNull()
    ).cast("long")
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("session_id", F.sum(new_session).over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select("user_id", "session_id", "session_start", "n_events", "sum_value")
        .orderBy("user_id", "session_id")
    )


Q33_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) >= {SESSION_GAP_US}
              OR lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# Native streaming executions (availableNow file-source replay). Used by
# tests for batch-equivalence; not part of the oracle contract.
# ---------------------------------------------------------------------------
def _events_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # READ option: bounds each micro-batch to N files (backpressure /
        # deterministic multi-batch replay). On the writer it is ignored.
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def run_tumbling_stream(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "tumbling_out",
    watermark: str = "2 minutes",
) -> None:
    """Replay events through a file stream into an in-memory sink
    (complete mode — every window, comparable to the batch twin)."""
    agg = (
        _events_stream(spark, src_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_tumbling_stream_append(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "tumbling_append_out",
    watermark: str = "2 minutes",
) -> None:
    """Append mode: only watermark-finalized windows are emitted, and
    late rows (beyond watermark) are dropped — used by the late-data
    test."""
    agg = (
        _events_stream(spark, src_dir, max_files_per_trigger=1)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"), "n_events"
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_session_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "session_out"
) -> None:
    """Native session_window streaming (complete mode) — equivalence
    with the lag/cumsum batch twin is asserted in tests."""
    agg = (
        _events_stream(spark, src_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 seconds").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_chatlog_append_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """R21 chat-log append sink as a streaming foreachBatch parquet
    append (the reference appends Q/A lines to chat_log.txt,
    app.py:436-443)."""
    ev = _events_stream(spark, src_dir)
    log = ev.select(
        F.col("ts"),
        F.col("user_id").cast("string").alias("user_email"),
        F.col("event_type").alias("question"),
        F.col("props").alias("answer"),
    )
    (
        log.writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Q70 stream-stream join (attribution shape): each purchase joined to
# the same user's signups within the preceding 10 minutes. Batch twin is
# hash-matched; run_attribution_stream executes it as a watermarked
# stream-stream inner join (state on both sides bounded by the
# watermark + range condition — the canonical interval join).
# ---------------------------------------------------------------------------
ATTRIB_WINDOW_US = 600_000_000  # 10 minutes


def q70_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    j = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.unix_micros("p_ts") - F.unix_micros("s_ts") >= 0)
        & (F.unix_micros("p_ts") - F.unix_micros("s_ts") <= ATTRIB_WINDOW_US),
    )
    return j.select(
        "purchase_id",
        "signup_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
        F.round("value", 4).alias("value"),
    ).orderBy("purchase_id", "signup_id")


Q70_SQL = f"""
SELECT p.event_id AS purchase_id,
       s.event_id AS signup_id,
       p.user_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
       epoch_us(p.ts) - epoch_us(s.ts) AS lag_us,
       round(p.value, 4) AS value
FROM events p JOIN events s
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase' AND s.event_type = 'signup'
 AND epoch_us(p.ts) - epoch_us(s.ts) BETWEEN 0 AND {ATTRIB_WINDOW_US}
ORDER BY purchase_id, signup_id
"""


def run_attribution_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "attrib_out"
) -> None:
    """Watermarked stream-stream inner join twin of q70."""
    ev = _events_stream(spark, src_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "20 minutes")
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "20 minutes")
    )
    j = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("purchase_id", "signup_id", "user_id")
    (
        j.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q124 — OUTER attribution (stream-stream LEFT OUTER interval join):
# q70 keeps only attributed purchases; the outer variant also emits
# unattributed ones with null signup columns — the shape marketing
# pipelines actually run ("which conversions have no touchpoint?").
# Batch twin below is the deterministic oracle; the streaming runner
# uses the watermarked left-outer join, whose unmatched rows are
# emitted only once the watermark passes the join window (state stays
# bounded: each side holds at most watermark+interval of rows).
# ---------------------------------------------------------------------------
def q124_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    j = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.unix_micros("p_ts") - F.unix_micros("s_ts") >= 0)
        & (F.unix_micros("p_ts") - F.unix_micros("s_ts") <= ATTRIB_WINDOW_US),
        "left",
    )
    return j.select(
        "purchase_id",
        "signup_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
        F.round("value", 4).alias("value"),
    ).orderBy("purchase_id", "signup_id")


Q124_SQL = f"""
SELECT p.event_id AS purchase_id,
       s.event_id AS signup_id,
       p.user_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
       epoch_us(p.ts) - epoch_us(s.ts) AS lag_us,
       round(p.value, 4) AS value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id
 AND epoch_us(p.ts) - epoch_us(s.ts) BETWEEN 0 AND {ATTRIB_WINDOW_US}
ORDER BY purchase_id, signup_id
"""


def run_attribution_stream_outer(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "attrib_outer_out",
    max_files_per_trigger: int | None = None,
) -> None:
    """Watermarked stream-stream LEFT OUTER join twin of q124.

    Unmatched purchases surface only after the watermark passes their
    join window, so a replay that should flush ALL rows must advance
    the watermark past the data (tests append a far-future sentinel
    file and replay file-per-batch)."""
    ev = _events_stream(spark, src_dir, max_files_per_trigger)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "20 minutes")
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "20 minutes")
    )
    j = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    ).select("purchase_id", "signup_id", "user_id")
    (
        j.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "dedup_out",
    watermark: str = "30 minutes",
) -> None:
    """Native streaming dedup on ``event_id`` via
    ``dropDuplicatesWithinWatermark`` — the R11 semantics (first
    occurrence wins) executed with BOUNDED state: a key's dedup record
    is dropped once the watermark passes it, unlike ``dropDuplicates``
    on a stream whose state grows forever. The cross-batch/store-level
    variant (anti-join vs the persisted store) is
    ingest_stream.run_ingest_stream; this one covers replays and
    at-least-once upstream retries within the event-time horizon."""
    ev = _events_stream(spark, src_dir).withWatermark("ts", watermark)
    deduped = ev.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    (
        deduped.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Q71 statistical aggregates — stddev/variance (sample), correlation,
# covariance. Native stddev_samp/corr aggregate doubles in partition
# order, which differs between Spark (parallel partial-agg) and DuckDB
# (sequential) — the r2/r3 hash mismatches were last-digit float drift.
# Fix: accumulate the raw moments (Σx, Σx², Σxy, n) as DECIMAL, which is
# EXACT and order-independent in both engines, then derive the statistics
# with one identical double-arithmetic expression per side. Identical
# inputs + identical IEEE op sequence = identical bits = hash match.
# At 100 TB this is also the better plan: decimal partial sums combine
# map-side exactly, one shuffle per group key, no numeric drift across
# 1000 executors.
# ---------------------------------------------------------------------------
def q71_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # casts are exact-deterministic: a double is never an exact half-ulp
    # tie at these scales, so Spark and DuckDB round identically
    xd = F.col("l_extendedprice").cast("decimal(18,4)")
    qd = F.col("l_quantity").cast("decimal(18,4)")
    dd = F.col("l_discount").cast("decimal(18,6)")
    td = F.col("l_tax").cast("decimal(18,6)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("nf"),
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(qd).cast("double").alias("sq"),
        F.sum(qd * qd).cast("double").alias("sqq"),
        F.sum(qd * xd).cast("double").alias("sqx"),
        F.sum(dd).cast("double").alias("sd"),
        F.sum(td).cast("double").alias("st"),
        F.sum(dd * td).cast("double").alias("sdt"),
    )
    mx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("nf")
    mq = F.col("sqq") - F.col("sq") * F.col("sq") / F.col("nf")
    mqx = F.col("sqx") - F.col("sq") * F.col("sx") / F.col("nf")
    mdt = F.col("sdt") - F.col("sd") * F.col("st") / F.col("nf")
    # + 0.0 after the round: a statistic whose true value is a tiny
    # negative (e.g. the near-zero disc/tax covariance) rounds to -0.0,
    # and IEEE sign-of-zero can differ between engines while the rounded
    # magnitude is identical. -0.0 + 0.0 == +0.0 exactly, and x + 0.0 is
    # exact for every other double, so this normalizes the hash without
    # touching any real value. (r2-r4 red rows were exactly this: DuckDB
    # emitted -0.0 for disc_tax_covar, Spark +0.0.)
    return (
        g.select(
            "l_returnflag",
            (F.round(F.sqrt(mx / (F.col("nf") - 1)), 4) + F.lit(0.0)).alias(
                "price_stddev"
            ),
            (F.round(mq / (F.col("nf") - 1), 4) + F.lit(0.0)).alias("qty_var"),
            (F.round(mqx / F.sqrt(mq * mx), 4) + F.lit(0.0)).alias(
                "qty_price_corr"
            ),
            (F.round(mdt / (F.col("nf") - 1), 4) + F.lit(0.0)).alias(
                "disc_tax_covar"
            ),
            "n",
        )
        .orderBy("l_returnflag")
    )


Q71_SQL = """
WITH m AS (
  -- one product operand is DECIMAL(19,·): DuckDB then computes the
  -- product in int128 (DECIMAL(18)x(18) overflows its int64 fast path).
  -- Values are identical to Spark's BigDecimal products — width is
  -- storage, not value.
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS nf,
         count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                  * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                  * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sqq,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                  * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sqx,
         CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd,
         CAST(sum(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS st,
         CAST(sum(CAST(l_discount AS DECIMAL(19,6))
                  * CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sdt
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       -- + 0.0 normalizes IEEE -0.0 to +0.0 (exact no-op for all other
       -- doubles); see the Spark-side comment in q71_stats_agg.
       round(sqrt((sxx - sx * sx / nf) / (nf - 1)), 4) + 0.0 AS price_stddev,
       round((sqq - sq * sq / nf) / (nf - 1), 4) + 0.0 AS qty_var,
       round((sqx - sq * sx / nf)
             / sqrt((sqq - sq * sq / nf) * (sxx - sx * sx / nf)), 4) + 0.0
           AS qty_price_corr,
       round((sdt - sd * st / nf) / (nf - 1), 4) + 0.0 AS disc_tax_covar,
       n
FROM m
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q111 — stream-static enrichment: the event stream joined to a static
# dimension (customer profile on user_id = c_custkey), aggregated per
# market segment. In the streaming execution the static side is
# broadcast into every micro-batch — no state store, no watermark
# needed for the join itself — which is exactly how a 100 TB/day event
# firehose picks up slowly-changing dimensions. Batch twin below is
# the oracle-checked semantics; ``run_enrich_stream`` executes it as a
# real stream and the equivalence test asserts identical output.
# ---------------------------------------------------------------------------
def q111_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


Q111_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def run_enrich_stream(
    spark: SparkSession,
    src_dir: str,
    sf_dir: str,
    sink_table: str = "enrich_out",
) -> None:
    """Stream-static join execution of q111: static customer dim joined
    into each micro-batch, complete-mode aggregate into a memory sink."""
    cust = load(spark, sf_dir, "customer")
    agg = (
        _events_stream(spark, src_dir)
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
    )
    (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q191 — event debounce profile: collapse retriggered events to one per
# (user, type, 10-minute tumbling window) and report how much each
# event type shrinks — the sessionless cousin of dedup for telemetry
# firehoses (double-clicks, retry storms, at-least-once replays that
# share no event_id). The batch twin is pure counting: kept =
# distinct (user, window) per type, so the result is independent of
# WHICH row survives — exactly why the streaming execution
# (run_debounce_stream, dropDuplicatesWithinWatermark on the same key)
# is equivalence-testable without fixing intra-batch arrival order.
# One shuffle on (type, user, window); distinct partials map-side.
# ---------------------------------------------------------------------------
DEBOUNCE_WINDOW = "10 minutes"


def q191_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        "user_id",
        F.window("ts", DEBOUNCE_WINDOW)["start"].alias("w"),
    )
    return (
        keyed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.countDistinct("user_id", "w").cast("bigint").alias("n_kept"),
        )
        .select(
            "event_type",
            "n_total",
            "n_kept",
            F.round(1 - F.col("n_kept") / F.col("n_total"), 4).alias(
                "debounce_share"
            ),
        )
        .orderBy("event_type")
    )


Q191_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(DISTINCT (user_id, time_bucket(INTERVAL '10 minutes', ts)))
            AS BIGINT) AS n_kept,
       round(1 - count(DISTINCT (user_id,
                                 time_bucket(INTERVAL '10 minutes', ts)))
                 / CAST(count(*) AS DOUBLE), 4) AS debounce_share
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def run_debounce_stream(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "debounce_out",
    watermark: str = "30 minutes",
) -> None:
    """Streaming execution of q191's kept-side: one survivor per
    (user_id, event_type, 10-minute window) via
    ``dropDuplicatesWithinWatermark`` — state for a window's keys is
    released once the watermark passes, so state size is bounded by the
    active horizon, not the stream's lifetime. Complete-mode per-type
    counts land in a memory sink; the equivalence test checks them
    against q191's ``n_kept`` (survivor identity is intentionally not
    part of the contract — see the batch-twin comment)."""
    ev = _events_stream(spark, src_dir).withWatermark("ts", watermark)
    kept = ev.withColumn(
        "w", F.window("ts", DEBOUNCE_WINDOW)["start"]
    ).dropDuplicatesWithinWatermark(["user_id", "event_type", "w"])
    counts = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    (
        counts.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q270 — stream-dedup profile (batch twin of the bucketed
# ``dropDuplicatesWithinWatermark`` job below): collapse events to one
# per (user_id, event_type, minute) semantic key and report, per
# event type, how much the stream dedup would drop — the sizing
# readout you run before turning the dedup on (state volume ≈ #keys
# inside the watermark horizon; dropped volume = dup_rate).
# run_bucket_dedup_stream executes the same key with bounded state;
# counts are arrival-order-independent (only WHICH duplicate survives
# varies), so the twin's aggregate is exact for any replay order —
# tests/test_streaming_more.py asserts the equivalence.
# Scale shape: ONE events scan, one (type, key)-combining aggregate —
# the composite key partial-aggregates map-side; nothing but the
# 5-type rollup crosses the final exchange.
# ---------------------------------------------------------------------------
def q270_stream_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("minute", "ts").alias("mb")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.count_distinct("user_id", "mb").cast("bigint").alias("n_keys"),
        )
        .select(
            "event_type",
            "n_raw",
            "n_keys",
            (F.col("n_raw") - F.col("n_keys")).alias("n_dupes"),
            (
                (F.col("n_raw") - F.col("n_keys"))
                / F.col("n_raw").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("event_type")
    )


Q270_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT (user_id, date_trunc('minute', ts)))
            AS BIGINT) AS n_keys,
       CAST(count(*) AS BIGINT)
         - CAST(count(DISTINCT (user_id, date_trunc('minute', ts)))
                AS BIGINT) AS n_dupes,
       (count(*) - count(DISTINCT (user_id, date_trunc('minute', ts))))
         / CAST(count(*) AS DOUBLE) AS dup_rate
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def run_bucket_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    sink_table: str = "bucket_dedup_out",
    watermark: str = "30 minutes",
) -> None:
    """Streaming face of q270: one event per (user_id, event_type,
    minute) semantic key via ``dropDuplicatesWithinWatermark`` on the
    materialized bucket column — bounded state (keys expire with the
    watermark), arrival-order "first wins" within the horizon. The
    q270 batch twin's per-type counts are invariant to which duplicate
    survives, so twin equivalence holds for any replay order."""
    ev = _events_stream(spark, src_dir).withWatermark("ts", watermark)
    keyed = ev.withColumn("mb", F.date_trunc("minute", "ts"))
    deduped = keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "mb"]
    ).select("event_id", "user_id", "event_type", "mb", "value")
    (
        deduped.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


QUERIES = {
    "q31_tumbling_window": q31_tumbling_window,
    "q32_sliding_window": q32_sliding_window,
    "q33_session_window": q33_session_window,
    "q70_interval_join": q70_interval_join,
    "q71_stats_agg": q71_stats_agg,
    "q111_stream_static_enrich": q111_stream_static_enrich,
    "q124_outer_attribution": q124_outer_attribution,
    "q191_debounce": q191_debounce,
    "q270_stream_dedup_profile": q270_stream_dedup_profile,
}

ORACLE = {
    "q31_tumbling_window": Q31_SQL,
    "q32_sliding_window": Q32_SQL,
    "q33_session_window": Q33_SQL,
    "q70_interval_join": Q70_SQL,
    "q71_stats_agg": Q71_SQL,
    "q111_stream_static_enrich": Q111_SQL,
    "q124_outer_attribution": Q124_SQL,
    "q191_debounce": Q191_SQL,
    "q270_stream_dedup_profile": Q270_SQL,
}
