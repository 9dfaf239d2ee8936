"""Temporal join operators Spark lacks as built-ins: AS-OF join and
range join — composed from existing DataFrame ops (SURVEY's "custom
operators" rule (a): composition before UDFs).

AS-OF join (q58): for each event, the most recent 'signup' event of the
same user at-or-before it. Implemented with the union trick:

    union(left tagged 0, right tagged 1)
    -> window per user ordered by (ts, right-first at ties)
    -> last(right_value, ignoreNulls) over unbounded-preceding
    -> keep left rows

One shuffle on the key, one ordered scan per partition — O(n log n)
per key group and NO range fan-out, versus the naive
join-then-filter-then-argmax which is quadratic per key. This is the
standard scalable formulation for point-in-time correctness joins
(feature stores, trade/quote matching). Oracle: DuckDB's native
ASOF LEFT JOIN — two independent implementations, one hash.

Range join (q59): equi key + date-range predicate. Spark evaluates the
range residual on the equi-join output; at 100 TB add a coarse bucket
key (e.g. month) to both sides to bound the fan-in when the equi key
alone is not selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join: attach the latest right row at-or-before each
    left row's timestamp, per key. Returns left columns + right value
    columns (null when no prior right row exists)."""
    value_cols = value_cols or []
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(lt.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    # right rows sort BEFORE left rows at equal ts => ts >= right_ts is
    # inclusive, matching ASOF semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        "_is_right",
        "_left",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("_is_right") == 0).select(
        "_left.*", *[F.col(f"_rv_{c}").alias(f"right_{c}") for c in value_cols]
    )
    return out


def q58_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    others = ev.where(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(others, signups, key="user_id", value_cols=["signup_ts"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        F.date_format("right_signup_ts", TS_FMT_SPARK).alias("signup_ts_str"),
        # exact integer micros (a rounded double would hit engine-specific
        # .5-boundary rounding on ~1/10^4 of rows)
        (F.unix_micros("ts") - F.unix_micros("right_signup_ts"))
        .cast("bigint")
        .alias("usecs_since_signup"),
    ).orderBy("event_id")


Q58_SQL = f"""
WITH signups AS (
  SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
),
others AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type != 'signup'
)
SELECT o.event_id,
       o.user_id,
       strftime(o.ts, '{TS_FMT_DUCK}') AS ts_str,
       strftime(s.signup_ts, '{TS_FMT_DUCK}') AS signup_ts_str,
       CAST(epoch_us(o.ts) - epoch_us(s.signup_ts) AS BIGINT)
           AS usecs_since_signup
FROM others o ASOF LEFT JOIN signups s
  ON o.user_id = s.user_id AND o.ts >= s.signup_ts
ORDER BY event_id
"""


def q59_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems shipped within 90 days of their order's
    date — equi join on the key plus a range residual."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    j = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate.cast("date") <= F.date_add(orders.o_orderdate.cast("date"), 90)),
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
        .orderBy("order_year")
    )


Q59_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
GROUP BY 1
ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# q106 — batch sessionization with session IDs (gaps-and-islands): a
# new session starts when a user's inter-event gap exceeds SESSION_GAP
# seconds; the running sum of new-session markers IS the session id.
# Two keyed window passes over one shuffle on user_id — the batch twin
# of the streaming session window (q33), but emitting stable per-user
# session sequence numbers that downstream joins can key on. Second
# timestamps via truncation (cast long / date_diff) — identical in
# both engines.
# ---------------------------------------------------------------------------
SESSION_GAP = 1800  # seconds


def with_session_seq(ev: DataFrame, gap_sec: int = SESSION_GAP) -> DataFrame:
    """Row-level gaps-and-islands session assignment: every input row
    plus a ``session_seq`` column. The single home of the session
    boundary rule ((ts, event_id) order, gap > gap_sec starts a new
    session) — q106's rollup and q195's path mining both consume THIS,
    so the boundary semantics cannot silently diverge between them."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    prev = F.lag(secs).over(w)
    is_new = F.when(
        prev.isNull() | ((secs - prev) > gap_sec), F.lit(1)
    ).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.withColumn(
        "session_seq", F.sum(is_new).over(cum).cast("bigint")
    )


def sessionize_events(ev: DataFrame, gap_sec: int = SESSION_GAP) -> DataFrame:
    """Generic gaps-and-islands sessionizer over (user_id, event_id, ts)
    columns; see q106 docstring for semantics."""
    sess = with_session_seq(
        ev.select("user_id", "event_id", "ts"), gap_sec
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
            .cast("bigint")
            .alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


def q106_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_events(load(spark, sf_dir, "events"))


Q106_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# q107 — retention cohort matrix: users grouped by first-activity week
# (the cohort), counted in each subsequent activity week as an offset.
# Two aggregations + one broadcast-size join (cohort table is one row
# per user); weeks via date_trunc (Monday start in both engines).
# ---------------------------------------------------------------------------
def q107_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    joined = activity.join(cohort, "user_id").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("week", "cohort_week") / 7).cast("bigint").alias("week_offset"),
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


Q107_SQL = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT)
         AS week_offset,
       count(*) AS n_active_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# q122 — SCD2 dimension build (slowly-changing-dimension type 2): the
# per-user event-type timeline collapses into validity intervals —
# a row per STATE CHANGE with [valid_from, valid_to) and a current
# flag. Two stacked windows on the same (user_id, ts, event_id)
# ordering, so Spark plans ONE shuffle + one sort for both (the lag
# that marks changes and the lead that closes intervals). This is the
# standard warehouse pattern for turning an event stream into a
# point-in-time joinable dimension (pairs with q58's AS-OF join).
# ---------------------------------------------------------------------------
def scd2_intervals(
    df: DataFrame, key: str, state: str, ts: str, tiebreak: str
) -> DataFrame:
    """Generic SCD2 collapse: rows where ``state`` changes per ``key``,
    each with its [valid_from, valid_to) interval (valid_to null on the
    open current row)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    marked = df.withColumn("_prev", F.lag(state).over(w)).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(state))
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        marked.withColumn("valid_to_ts", F.lead(ts).over(w2))
        .withColumn("valid_from_ts", F.col(ts))
        .drop("_prev")
    )


def q122_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    iv = scd2_intervals(ev, key="user_id", state="event_type", ts="ts",
                        tiebreak="event_id")
    return iv.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("valid_from_ts", TS_FMT_SPARK).alias("valid_from"),
        F.date_format("valid_to_ts", TS_FMT_SPARK).alias("valid_to"),
        F.col("valid_to_ts").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from", "state")


Q122_SQL = f"""
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       event_type AS state,
       strftime(ts, '{TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id), '{TS_FMT_DUCK}')
         AS valid_to,
       lead(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
ORDER BY user_id, valid_from, state
"""


# ---------------------------------------------------------------------------
# q125 — multi-grain time rollup (the hypertable "continuous aggregate"
# shape): hour, day and week buckets of the event stream computed in
# ONE pass via GROUPING SETS (single Expand + one shuffle — not three
# queries over the fact table). Uses the Spark 4 DataFrame
# ``groupingSets`` API; grain disambiguation via grouping() flags.
# At scale this materializes incrementally per closed window; the
# batch form here is the backfill/bootstrap pass.
# ---------------------------------------------------------------------------
def q125_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "value",
    )
    gs = ev.groupingSets(
        [[F.col("day"), F.col("hour")], [F.col("day")], [F.col("week")]],
        F.col("day"), F.col("hour"), F.col("week"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        # grouping() is only resolvable inside the aggregate list
        F.grouping("hour").alias("g_hour"),
        F.grouping("day").alias("g_day"),
    )
    grain = (
        F.when(F.col("g_hour") == 0, F.lit("hour"))
        .when(F.col("g_day") == 0, F.lit("day"))
        .otherwise(F.lit("week"))
    )
    bucket = F.coalesce("hour", "day", "week")
    return (
        gs.select(
            grain.alias("grain"),
            F.date_format(bucket, TS_FMT_SPARK).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("grain", "bucket_start")
    )


Q125_SQL = f"""
WITH base AS (
  SELECT date_trunc('hour', ts) AS hour,
         date_trunc('day', ts) AS day,
         date_trunc('week', ts) AS week,
         value
  FROM events
)
SELECT CASE WHEN grouping(hour) = 0 THEN 'hour'
            WHEN grouping(day) = 0 THEN 'day'
            ELSE 'week' END AS grain,
       strftime(coalesce(hour, day, week), '{TS_FMT_DUCK}') AS bucket_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM base
GROUP BY GROUPING SETS ((day, hour), (day), (week))
ORDER BY grain, bucket_start
"""


# ---------------------------------------------------------------------------
# q140 — per-key OLS trend: the least-squares slope/intercept of daily
# event volume per event type, via the built-in regression aggregates
# (regr_slope/regr_intercept/regr_r2 — Spark >= 3.4, JVM-side partial
# aggregation). Two stacked aggregations, no window, no Python: the
# daily rollup reduces map-side, the per-type regression state is four
# running moments. This is the "is this source growing/decaying"
# monitor a 100 TB ingest runs per partition-day.
# ---------------------------------------------------------------------------
TREND_X0 = "2024-01-01"


def q140_pergroup_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    x = F.datediff("day", F.lit(TREND_X0)).cast("double")
    y = F.col("n").cast("double")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 4).alias("r2"),
        )
        .orderBy("event_type")
    )


Q140_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, count(*) AS n_days,
       round(regr_slope(CAST(n AS DOUBLE),
                        CAST(day - DATE '{TREND_X0}' AS DOUBLE)), 4) AS slope,
       round(regr_intercept(CAST(n AS DOUBLE),
                        CAST(day - DATE '{TREND_X0}' AS DOUBLE)), 4) AS intercept,
       round(regr_r2(CAST(n AS DOUBLE),
                        CAST(day - DATE '{TREND_X0}' AS DOUBLE)), 4) AS r2
FROM daily
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q141 — incremental aggregate maintenance: a published per-type daily
# aggregate (events before the cutoff) is brought current by merging
# ONLY the delta (events at/after the cutoff) — union of two partial
# aggregates, re-aggregated — instead of rescanning history. At 100 TB
# this is the difference between touching one partition-day and
# touching the table; the merge is correct because count/sum are
# decomposable (the same property partial map-side aggregation relies
# on). Output = the merged aggregate restricted to days the delta
# touched, with base/delta provenance counts.
# ---------------------------------------------------------------------------
INCR_CUTOFF = "2024-01-25"


def q141_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    cut = F.lit(INCR_CUTOFF).cast("date")

    def partial(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.lit(tag).alias("part"),
        )

    base = partial(ev.where(F.col("day") < cut), "base")
    delta = partial(ev.where(F.col("day") >= cut), "delta")
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
            F.max(F.when(F.col("part") == "base", F.col("n"))).alias("n_base"),
            F.max(F.when(F.col("part") == "delta", F.col("n"))).alias("n_delta"),
        )
    )
    return (
        merged.where(F.col("n_delta").isNotNull())
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "sum_value",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            "n_delta",
        )
        .orderBy("event_type", "day")
    )


Q141_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
),
base AS (
  SELECT event_type, day, count(*) AS n, sum(value) AS sum_value
  FROM ev WHERE day < DATE '{INCR_CUTOFF}' GROUP BY 1, 2
),
delta AS (
  SELECT event_type, day, count(*) AS n, sum(value) AS sum_value
  FROM ev WHERE day >= DATE '{INCR_CUTOFF}' GROUP BY 1, 2
),
unioned AS (
  SELECT *, 'base' AS part FROM base
  UNION ALL
  SELECT *, 'delta' AS part FROM delta
),
merged AS (
  SELECT event_type, day,
         CAST(sum(n) AS BIGINT) AS n_events,
         round(sum(sum_value), 4) AS sum_value,
         max(CASE WHEN part = 'base' THEN n END) AS n_base,
         max(CASE WHEN part = 'delta' THEN n END) AS n_delta
  FROM unioned GROUP BY 1, 2
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events, sum_value,
       CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
       CAST(n_delta AS BIGINT) AS n_delta
FROM merged
WHERE n_delta IS NOT NULL
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# q142 — event-type presence bitmask per (user, day): one BIT_OR
# aggregation folds each user-day's event types into an int bitmask
# (signup=1, view=2, click=4, purchase=8), then the mask distribution —
# the O(1)-state funnel/segment encoding (a 100 TB event log reduces to
# one int per user-day map-side; every segment predicate is then a
# bitwise AND, no re-scan per segment).
# ---------------------------------------------------------------------------
_MASK_BITS = [("signup", 1), ("view", 2), ("click", 4), ("purchase", 8)]


def q142_event_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bit = F.lit(0)
    for name, b in _MASK_BITS:
        bit = F.when(F.col("event_type") == name, F.lit(b)).otherwise(bit)
    masks = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.bit_or(bit).cast("bigint").alias("mask")
    )
    full = sum(b for _, b in _MASK_BITS)
    return (
        masks.groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("n_user_days"),
            F.max((F.col("mask") == full).cast("int")).alias("is_full_funnel"),
        )
        .orderBy("mask")
    )


_MASK_CASE = "CASE event_type " + " ".join(
    f"WHEN '{n}' THEN {b}" for n, b in _MASK_BITS
) + " ELSE 0 END"

Q142_SQL = f"""
WITH masks AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(bit_or({_MASK_CASE}) AS BIGINT) AS mask
  FROM events GROUP BY 1, 2
)
SELECT mask, count(*) AS n_user_days,
       CAST(max(CASE WHEN mask = {sum(b for _, b in _MASK_BITS)} THEN 1 ELSE 0 END)
            AS INTEGER) AS is_full_funnel
FROM masks
GROUP BY mask
ORDER BY mask
"""


# ---------------------------------------------------------------------------
# q147 — late-arrival profile (the watermark advisor): for every event,
# its lateness = (max event-time seen so far in arrival order) - its
# own event-time, then per-type max/p95/late-share. This is the
# measurement that justifies a `withWatermark` bound (q32 uses 2 min);
# run it before deploying a streaming job, not after it drops data.
# Arrival order = event_id (the generator's append order).
#
# Scale shape: a running prefix-max over petabytes of events cannot be
# one global window per type (that single partition would sort the
# whole type). It decomposes exactly: (1) events bucket into arrival
# blocks of LATE_BLOCK ids; (2) a tiny per-(type, block) max aggregate
# (rows = events/LATE_BLOCK) gets an exclusive prefix-max window —
# bounded input, satisfying the unpartitioned-window policy; (3) the
# prefix joins back (broadcast) and combines with the within-block
# running max (partitions bounded by LATE_BLOCK rows). greatest(prior
# blocks, in-block prefix) == the global running max, verified against
# the DuckDB twin's single global window.
# ---------------------------------------------------------------------------
LATE_BLOCK = 8192
LATE_P = 0.95


def _event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, late_ms): per-event lateness vs the running
    per-type max event time in event_id arrival order — q147's blocked
    prefix-max decomposition, factored so q343's watermark sweep reads
    the same definition."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
        F.floor(F.col("event_id") / LATE_BLOCK).cast("bigint").alias("blk"),
    )
    block_max = ev.groupBy("event_type", "blk").agg(F.max("ms").alias("bmax"))
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = block_max.select(
        "event_type", "blk", F.max("bmax").over(w_prev).alias("prev_max")
    )
    w_in = (
        Window.partitionBy("event_type", "blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = F.greatest(
        F.coalesce(F.col("prev_max"), F.lit(-(1 << 62))),
        F.max("ms").over(w_in),
    )
    return ev.join(F.broadcast(prev), ["event_type", "blk"]).select(
        "event_type", (runmax - F.col("ms")).alias("late_ms")
    )


def q147_late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    late = _event_lateness(spark, sf_dir)
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("late_ms") > 0).cast("bigint")).alias("n_late"),
            F.max("late_ms").cast("bigint").alias("max_late_ms"),
            F.round(F.percentile("late_ms", F.lit(LATE_P)), 4).alias("p95_late_ms"),
        )
        .orderBy("event_type")
    )


Q147_SQL = f"""
WITH e AS (
  SELECT event_id, event_type, epoch_ms(ts) AS ms FROM events
),
r AS (
  SELECT event_type,
         max(ms) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ms AS late_ms
  FROM e
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(late_ms) AS BIGINT) AS max_late_ms,
       round(quantile_cont(late_ms, {LATE_P}), 4) AS p95_late_ms
FROM r
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q343 — watermark-delay sweep: q147 PROFILES lateness; this op prices
# the watermark DECISION — for each candidate delay (1 / 5 / 15 min),
# how many events per type a Structured Streaming job with that
# watermark would drop (late_ms > delay under q147's running-max
# arrival model) and the drop fraction. The q31/q33 streaming jobs
# pick their withWatermark values from exactly this readout: the
# smallest delay whose drop_frac is acceptable bounds their state.
# Scale: rides q147's blocked prefix-max decomposition (no global
# single-partition window); the sweep is a 3-row broadcast cross join
# folded into ONE conditional-sum aggregate per (type, delay).
# ---------------------------------------------------------------------------
WM_DELAYS_MS = [60_000, 300_000, 900_000]


def q343_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    late = _event_lateness(spark, sf_dir)
    delays = spark.createDataFrame(
        [(d,) for d in WM_DELAYS_MS], "delay_ms bigint"
    )
    return (
        late.crossJoin(F.broadcast(delays))
        .groupBy("delay_ms", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("late_ms") > F.col("delay_ms")).cast("bigint"))
            .cast("bigint")
            .alias("dropped"),
            F.round(
                F.sum((F.col("late_ms") > F.col("delay_ms")).cast("bigint"))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("drop_frac"),
        )
        .orderBy("delay_ms", "event_type")
    )


Q343_SQL = f"""
WITH e AS (
  SELECT event_id, event_type, epoch_ms(ts) AS ms FROM events
),
r AS (
  SELECT event_type,
         max(ms) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ms AS late_ms
  FROM e
),
delays AS (SELECT unnest([{", ".join(str(d) for d in WM_DELAYS_MS)}])
             AS delay_ms)
SELECT CAST(delay_ms AS BIGINT) AS delay_ms, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_ms > delay_ms THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped,
       round(sum(CASE WHEN late_ms > delay_ms THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS drop_frac
FROM r, delays
GROUP BY delay_ms, event_type
ORDER BY delay_ms, event_type
"""


# ---------------------------------------------------------------------------
# q149 — time-series gap fill + LOCF (last observation carried forward),
# the Timescale/kdb "locf(gapfill(...))" operator the reference family
# has no analog for. Spark-first decomposition, no UDF:
#   (1) bucket observations to the hour (map-side partial agg),
#   (2) generate each key's dense hourly spine DISTRIBUTEDLY with
#       sequence()+explode — the spine is built per-key on executors,
#       never enumerated on the driver,
#   (3) left-join observations onto the spine (equi join on (key, hr)),
#   (4) forward-fill with last(ignorenulls) over an unbounded-preceding
#       row frame — one shuffle on the key, one ordered pass.
# Scale: spine size is keys x span-hours, independent of event count; a
# 100 TB firehose first collapses to hourly partials map-side. For
# multi-year spans, partition the window by (key, month) and carry the
# boundary value with the q147 block-decomposition trick.
# Oracle: DuckDB generate_series + last_value IGNORE NULLS.
# ---------------------------------------------------------------------------
GAPFILL_USERS = 50


def gap_fill(
    observed: DataFrame,
    key: str,
    bucket: str,
    value: str,
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Reusable gapfill+locf: densify ``observed`` (one row per
    (key, bucket), bucket already truncated to the grid) to every grid
    point between each key's min and max bucket, carrying ``value``
    forward into the generated gaps. Returns (key, bucket, <value>
    observed-or-null, locf). The spine is generated per-key on the
    executors via sequence()+explode; the fill is one partitioned
    window — no driver enumeration, no global sort."""
    span = observed.groupBy(key).agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    spine = span.select(
        key,
        F.explode(F.sequence("_lo", "_hi", F.expr(step))).alias(bucket),
    )
    joined = spine.join(observed, [key, bucket], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        bucket,
        value,
        F.last(value, ignorenulls=True).over(w).alias("locf"),
    )


def q149_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        (F.col("user_id") < GAPFILL_USERS) & (F.col("event_type") == "purchase")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.max("value").alias("v"))
    filled = gap_fill(hourly, key="user_id", bucket="hr", value="v")
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum(F.col("v").isNull().cast("bigint")).alias("n_gap_hours"),
            # q160's drift guard: round each carried term to 8dp and
            # accumulate as DECIMAL (exact, order-independent on both
            # engines) — summing raw doubles is partition-order-
            # dependent and latent under different partitioning/scale.
            F.round(
                F.sum(F.round("locf", 8).cast("decimal(27,8)")).cast("double"),
                4,
            ).alias("locf_sum"),
        )
        .orderBy("user_id")
    )


Q149_SQL = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr, max(value) AS v
  FROM events
  WHERE user_id < {GAPFILL_USERS} AND event_type = 'purchase'
  GROUP BY 1, 2
), span AS (
  SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM span
), filled AS (
  SELECT s.user_id, s.hr, h.v,
         last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
  FROM spine s
  LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gap_hours,
       round(CAST(sum(CAST(round(locf, 8) AS DECIMAL(27,8))) AS DOUBLE), 4)
           AS locf_sum
FROM filled
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q156 — event transition matrix (first-order Markov counts): for each
# user's event stream in (ts, event_id) order, count consecutive
# (from_type -> to_type) transitions and each pair's share of all
# transitions. The path-analysis primitive behind funnel discovery and
# next-action models. One lag window per user (single shuffle on
# user_id, bounded partitions), then a 25-row aggregate; the share
# denominator is a broadcast 1-row total. At 100 TB the lag window
# decomposes per (user, day) with boundary rows exchanged once —
# partitions never exceed a user-day.
# ---------------------------------------------------------------------------
def q156_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = counts.agg(F.sum("n_transitions").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_total"), 4).alias("share"),
        )
        .orderBy("from_type", "to_type")
    )


Q156_SQL = """
WITH pairs AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM pairs
  WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / (SELECT sum(n_transitions) FROM counts), 4) AS share
FROM counts
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# q160 — time-decayed engagement score (the feature-store staple): each
# user's purchase value weighted by exp(-age/tau) relative to the
# corpus's latest event, top-20 by score. The anchor is a broadcast
# 1-row max; ages are integer microseconds so both engines feed exp()
# bit-identical inputs; each decayed term is rounded to DECIMAL(27,8)
# BEFORE summation (libm vs java.lang.Math exp can differ in the last
# ulp — rounding at 8dp absorbs it, decimal summation removes order
# sensitivity). One scan, one agg shuffle, TakeOrdered for the top-k.
# ---------------------------------------------------------------------------
DECAY_TAU_S = 7 * 24 * 3600.0
ENGAGE_K = 20


def q160_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("_anchor_us"))
    age_s = (F.col("_anchor_us") - F.unix_micros("ts")) / F.lit(1e6)
    term = F.round(
        F.col("value") * F.exp(-age_s / F.lit(DECAY_TAU_S)), 8
    ).cast("decimal(27,8)")
    scored = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(term).cast("double"), 4).alias("decayed_score"),
        )
    )
    # top-k FIRST via orderBy+limit (compiles to TakeOrderedAndProject —
    # distributed partial top-k, per the unpartitioned-window policy);
    # the rank window then runs over <= K rows, not all users.
    top = scored.orderBy(F.desc("decayed_score"), "user_id").limit(ENGAGE_K)
    w = Window.orderBy(F.desc("decayed_score"), "user_id")
    return (
        top.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .select("rk", "user_id", "n_purchases", "decayed_score")
        .orderBy("rk")
    )


Q160_SQL = f"""
WITH anchor AS (
  SELECT max(epoch_us(ts)) AS a_us FROM events WHERE event_type = 'purchase'
),
scored AS (
  SELECT user_id,
         count(*) AS n_purchases,
         round(CAST(sum(CAST(round(value * exp(-((SELECT a_us FROM anchor)
                                                 - epoch_us(ts)) / 1e6
                                               / {DECAY_TAU_S}), 8)
                             AS DECIMAL(27,8))) AS DOUBLE), 4) AS decayed_score
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT CAST(row_number() OVER (ORDER BY decayed_score DESC, user_id) AS BIGINT)
           AS rk,
       user_id, n_purchases, decayed_score
FROM scored
QUALIFY rk <= {ENGAGE_K}
ORDER BY rk
"""


# ---------------------------------------------------------------------------
# q180 — last-touch purchase attribution: each purchase is credited to
# the user's immediately preceding non-purchase event IF it happened
# within the attribution window, else to '(none)' — the adjacency form
# of last-touch attribution marketing analytics runs on event streams
# (q124 is the stream-stream interval-join face; this is the windowed
# batch rollup). One lag window per user over the whole stream (prev
# event type + its timestamp), then a filter to purchases and a tiny
# aggregate: per credited type, conversions, distinct purchasers, and
# share. Integer-second deltas via the q106 cast-long device.
# ---------------------------------------------------------------------------
ATTRIB_WINDOW_S = 3600


def q180_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    prev_type = F.lag("event_type").over(w)
    prev_secs = F.lag(secs).over(w)
    marked = ev.select(
        "user_id",
        "event_type",
        secs.alias("s"),
        prev_type.alias("prev_type"),
        prev_secs.alias("prev_s"),
    ).where(F.col("event_type") == "purchase")
    credit = F.when(
        F.col("prev_type").isNotNull()
        & (F.col("prev_type") != "purchase")
        & ((F.col("s") - F.col("prev_s")) <= ATTRIB_WINDOW_S),
        F.col("prev_type"),
    ).otherwise(F.lit("(none)"))
    attributed = marked.select("user_id", credit.alias("credited_type"))
    counts = attributed.groupBy("credited_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.countDistinct("user_id").cast("bigint").alias("n_purchasers"),
    )
    total = counts.agg(F.sum("n_purchases").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "credited_type",
            "n_purchases",
            "n_purchasers",
            F.round(
                F.col("n_purchases").cast("double") / F.col("_t").cast("double"),
                4,
            ).alias("share"),
        )
        .orderBy("credited_type")
    )


Q180_SQL = f"""
WITH marked AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         date_diff('second', lag(ts) OVER w, ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
attributed AS (
  SELECT user_id,
         CASE WHEN prev_type IS NOT NULL AND prev_type != 'purchase'
                   AND gap <= {ATTRIB_WINDOW_S}
              THEN prev_type ELSE '(none)' END AS credited_type
  FROM marked
  WHERE event_type = 'purchase'
),
counts AS (
  SELECT credited_type,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_purchasers
  FROM attributed GROUP BY credited_type
)
SELECT credited_type, n_purchases, n_purchasers,
       round(CAST(n_purchases AS DOUBLE)
             / CAST((SELECT sum(n_purchases) FROM counts) AS DOUBLE), 4)
           AS share
FROM counts
ORDER BY credited_type
"""


# ---------------------------------------------------------------------------
# q171 — inter-event burstiness per user: B = (σ - μ) / (σ + μ) over a
# user's inter-event gaps (Goh & Barabási) — B→-1 periodic, B≈0
# Poisson, B→1 bursty. Separates organic users from schedulers/bots in
# event-stream QA. Gaps are INTEGER seconds (cast-long difference, the
# proven q106 device), so Σg and Σg² accumulate exactly as DECIMAL —
# order-independent across 1000 executors — and the σ/μ derivation is
# one fixed double expression per engine. `+ 0.0` guards the rounded
# outputs against IEEE -0.0 (B straddles zero by construction). One
# shuffle on user_id; the lag window and the agg share it.
# ---------------------------------------------------------------------------
BURST_MIN_EVENTS = 20  # gaps per user required for a stable estimate


def q171_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    gap = (secs - F.lag(secs).over(w)).alias("gap")
    gaps = ev.select("user_id", gap).where(F.col("gap").isNotNull())
    g = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gap").cast("decimal(27,0)")).cast("double").alias("sg"),
        F.sum((F.col("gap") * F.col("gap")).cast("decimal(27,0)"))
        .cast("double")
        .alias("sgg"),
    )
    nf = F.col("n").cast("double")
    mu = F.col("sg") / nf
    var = F.col("sgg") / nf - (F.col("sg") / nf) * (F.col("sg") / nf)
    sd = F.sqrt(var)
    return (
        g.where(F.col("n") >= BURST_MIN_EVENTS)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            (F.round(mu, 4) + F.lit(0.0)).alias("mean_gap_sec"),
            (F.round(sd, 4) + F.lit(0.0)).alias("std_gap_sec"),
            (F.round((sd - mu) / (sd + mu), 4) + F.lit(0.0)).alias(
                "burstiness"
            ),
        )
        .orderBy("user_id")
    )


Q171_SQL = f"""
WITH gaps AS (
  -- date_diff('second'), not epoch(): ts carries sub-second precision
  -- and epoch() keeps it, while the Spark side truncates via cast-long
  -- (the q106 device — date_diff matches that truncation semantics)
  SELECT user_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
g AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(gap AS DECIMAL(27,0))) AS DOUBLE) AS sg,
         CAST(sum(CAST(gap * gap AS DECIMAL(27,0))) AS DOUBLE) AS sgg
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_gaps,
       round(sg / CAST(n AS DOUBLE), 4) + 0.0 AS mean_gap_sec,
       round(sqrt(sgg / CAST(n AS DOUBLE)
                  - (sg / CAST(n AS DOUBLE)) * (sg / CAST(n AS DOUBLE))), 4)
           + 0.0 AS std_gap_sec,
       round((sqrt(sgg / CAST(n AS DOUBLE)
                   - (sg / CAST(n AS DOUBLE)) * (sg / CAST(n AS DOUBLE)))
              - sg / CAST(n AS DOUBLE))
             / (sqrt(sgg / CAST(n AS DOUBLE)
                     - (sg / CAST(n AS DOUBLE)) * (sg / CAST(n AS DOUBLE)))
                + sg / CAST(n AS DOUBLE)), 4) + 0.0 AS burstiness
FROM g
WHERE n >= {BURST_MIN_EVENTS}
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q167 — week-over-week trend: weekly value per event type with the
# previous observed week's value and the WoW percent change — the
# dashboard/alerting primitive over any metric stream. date_trunc
#('week') is ISO-Monday on both engines; weekly sums use the q71
# DECIMAL guard; the pct change is one fixed-order double expression
# over the two (already-rounded) weekly values, so it is bit-identical
# cross-engine. lag() is over OBSERVED weeks per type (a missing week
# compares against the last one that existed — compose with q149's
# gap_fill when calendar-strict deltas are needed). One shuffle on
# event_type x week, then a per-type window over ~52 rows/year.
# ---------------------------------------------------------------------------
def q167_wow_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.round("value", 8).cast("decimal(27,8)")).cast("double"), 4
        ).alias("week_value"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("week_value").over(w)
    return (
        weekly.select(
            "event_type",
            "week",
            "n_events",
            "week_value",
            prev.alias("prev_value"),
            F.when(
                prev.isNotNull() & (prev != 0.0),
                F.round((F.col("week_value") - prev) / prev, 4),
            ).alias("wow_change"),
        )
        .orderBy("event_type", "week")
    )


Q167_SQL = """
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS week,
         CAST(count(*) AS BIGINT) AS n_events,
         round(CAST(sum(CAST(round(value, 8) AS DECIMAL(27,8))) AS DOUBLE), 4)
             AS week_value
  FROM events
  GROUP BY event_type, date_trunc('week', ts)
)
SELECT event_type, week, n_events, week_value,
       lag(week_value) OVER w AS prev_value,
       CASE WHEN lag(week_value) OVER w IS NOT NULL
             AND lag(week_value) OVER w != 0.0
            THEN round((week_value - lag(week_value) OVER w)
                       / lag(week_value) OVER w, 4)
       END AS wow_change
FROM weekly
WINDOW w AS (PARTITION BY event_type ORDER BY week)
ORDER BY event_type, week
"""


# ---------------------------------------------------------------------------
# q195 — top session journeys: the most common event-type paths taken
# within a session (q106's gaps-and-islands boundaries), truncated to
# the first JOURNEY_STEPS steps — the sequence-mining primitive behind
# "how do users actually reach purchase" product analytics and behavior
# -cloning trajectory curation. Path assembly is deterministic on both
# engines: steps are numbered by (ts, event_id) and the path string is
# built from the SORTED (step, type) structs, never from unordered
# collect_list. The step cap bounds path-string size (state per
# session is O(JOURNEY_STEPS), not O(session length)); the path
# aggregation shuffles one short string per session; top-N plans as
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------
JOURNEY_STEPS = 5
JOURNEY_TOP = 15


def q195_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sess = with_session_seq(
        ev.select("user_id", "event_id", "ts", "event_type")
    )
    sw = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    steps = sess.withColumn("step", F.row_number().over(sw)).where(
        F.col("step") <= JOURNEY_STEPS
    )
    paths = steps.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(JOURNEY_TOP)
    )


Q195_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM marked
),
steps AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS step
  FROM sess
),
paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY step) AS path
  FROM steps
  WHERE step <= {JOURNEY_STEPS}
  GROUP BY user_id, session_seq
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {JOURNEY_TOP}
"""


# ---------------------------------------------------------------------------
# q199 — rate-limit audit: per-user rolling 1-hour event rate via a
# RANGE window over event-time seconds, with quota breaches counted —
# the batch twin of a streaming rate limiter (and the abuse-triage
# view an ingest firehose needs before q56-style salting decisions:
# the top offenders here ARE the hot keys). RANGE frames include
# same-timestamp peers identically in Spark and DuckDB, and the frame
# is integer seconds — no float, no interpolation. Work is partitioned
# by user (parallel across users, state bounded by one user's 1-hour
# horizon); top-N plans as TakeOrderedAndProject.
# ---------------------------------------------------------------------------
RATE_WINDOW_SEC = 3600
RATE_QUOTA = 3  # max events per rolling hour before a breach
RATE_TOP = 50


def q199_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    secs = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-(RATE_WINDOW_SEC - 1), 0)
    )
    rolled = ev.select(
        "user_id", F.count(F.lit(1)).over(w).cast("bigint").alias("rate_1h")
    )
    return (
        rolled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("rate_1h").cast("bigint").alias("max_rate_1h"),
            F.sum((F.col("rate_1h") > RATE_QUOTA).cast("bigint"))
            .cast("bigint")
            .alias("n_breaches"),
        )
        .orderBy(F.desc("max_rate_1h"), F.desc("n_breaches"), "user_id")
        .limit(RATE_TOP)
    )


Q199_SQL = f"""
WITH rolled AS (
  -- floor(epoch) = whole seconds, matching Spark's CAST(ts AS LONG)
  -- truncation (events carry sub-second precision; a fractional RANGE
  -- key would shift frame membership between engines)
  SELECT user_id,
         CAST(count(*) OVER (PARTITION BY user_id
                             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                             RANGE BETWEEN {RATE_WINDOW_SEC - 1} PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS rate_1h
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(rate_1h) AS BIGINT) AS max_rate_1h,
       CAST(sum(CASE WHEN rate_1h > {RATE_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_breaches
FROM rolled
GROUP BY user_id
ORDER BY max_rate_1h DESC, n_breaches DESC, user_id
LIMIT {RATE_TOP}
"""


# ---------------------------------------------------------------------------
# q205 — clock-position seasonality profile: events per (type, hour of
# day) with each cell's share of its type and deviation vs a uniform
# clock — the periodic-load view behind capacity planning and anomaly
# baselines (q100/q151 look at absolute windows; this folds time onto
# its 24-hour cycle). One scan, one (type, hour) aggregation, per-type
# totals via a window over 24-row groups; shares are single divisions
# of exact integers.
# ---------------------------------------------------------------------------
def q205_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    tw = Window.partitionBy("event_type")
    return (
        cells.withColumn(
            "_tot", F.sum("n_events").over(tw).cast("bigint")
        )
        .select(
            "event_type",
            "hour_of_day",
            "n_events",
            F.round(F.col("n_events") / F.col("_tot").cast("double"), 4).alias(
                "share"
            ),
            F.round(
                F.col("n_events") * 24 / F.col("_tot").cast("double"), 4
            ).alias("load_ratio"),
        )
        .orderBy("event_type", "hour_of_day")
    )


Q205_SQL = """
WITH cells AS (
  SELECT event_type,
         CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, hour_of_day, n_events,
       round(n_events / CAST(sum(n_events) OVER (PARTITION BY event_type)
                             AS DOUBLE), 4) AS share,
       round(n_events * 24 / CAST(sum(n_events) OVER (PARTITION BY event_type)
                                  AS DOUBLE), 4) AS load_ratio
FROM cells
ORDER BY event_type, hour_of_day
"""


# ---------------------------------------------------------------------------
# q207 — as-of join with tolerance (pandas merge_asof / kdb wj
# semantics): a backward as-of match COUNTS only if the matched signup
# is within TOL of the event — beyond it the row reports stale. The
# per-type report shows how much of the event stream runs on fresh
# profile state — the freshness SLO for the q111-style enrichment
# path. Same single-shuffle union+window shape as q58 (the match) plus
# one conditional aggregation; staleness sums are exact integer micros.
# ---------------------------------------------------------------------------
ASOF_TOL_USECS = 48 * 3600 * 1_000_000  # 48 h freshness horizon


def q207_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    others = ev.where(F.col("event_type") != "signup").select(
        "event_id", "user_id", "event_type", "ts"
    )
    joined = asof_join(others, signups, key="user_id", value_cols=["signup_ts"])
    stale_us = F.unix_micros("ts") - F.unix_micros("right_signup_ts")
    in_tol = F.col("right_signup_ts").isNotNull() & (
        stale_us <= ASOF_TOL_USECS
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(in_tol.cast("bigint")).cast("bigint").alias("n_fresh"),
            F.sum(
                (
                    F.col("right_signup_ts").isNotNull()
                    & (stale_us > ASOF_TOL_USECS)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_stale"),
            F.sum(F.col("right_signup_ts").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_unmatched"),
            F.round(
                F.sum(F.when(in_tol, stale_us))
                / F.sum(in_tol.cast("bigint")).cast("double"),
                4,
            ).alias("avg_fresh_usecs"),
        )
        .orderBy("event_type")
    )


Q207_SQL = f"""
WITH signups AS (
  SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
),
others AS (
  SELECT event_id, user_id, event_type, ts
  FROM events WHERE event_type != 'signup'
),
m AS (
  SELECT o.event_type,
         s.signup_ts,
         epoch_us(o.ts) - epoch_us(s.signup_ts) AS stale_us
  FROM others o ASOF LEFT JOIN signups s
    ON o.user_id = s.user_id AND o.ts >= s.signup_ts
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN signup_ts IS NOT NULL
                      AND stale_us <= {ASOF_TOL_USECS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh,
       CAST(sum(CASE WHEN signup_ts IS NOT NULL
                      AND stale_us > {ASOF_TOL_USECS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
       CAST(sum(CASE WHEN signup_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unmatched,
       round(sum(CASE WHEN signup_ts IS NOT NULL
                       AND stale_us <= {ASOF_TOL_USECS}
                 THEN stale_us END)
             / CAST(sum(CASE WHEN signup_ts IS NOT NULL
                              AND stale_us <= {ASOF_TOL_USECS}
                        THEN 1 ELSE 0 END) AS DOUBLE), 4)
           AS avg_fresh_usecs
FROM m
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q212 — incremental JOIN-view maintenance: q141 maintains an
# aggregate; this maintains a JOIN view (orders x customer rolled up
# per market segment) under an insert batch using the delta-join
# identity — new_view = old_view + (delta_orders x customer) — the
# materialized-view refresh every warehouse runs instead of a full
# recompute. The delta (a deterministic o_orderkey residue standing in
# for "today's inserts") joins the dimension ALONE: at 100 TB the
# incremental cost is O(|delta|), not O(|fact|), and the dimension
# side broadcasts exactly as in the full join. The report shows
# base/delta/final per segment plus `matches_recompute` — the
# correctness proof (final == full recompute) computed IN the
# operator, cheap at audit time and priceless in production.
# ---------------------------------------------------------------------------
IVM_DELTA_MOD = 10  # o_orderkey % 10 == 0 is "today's insert batch"


def q212_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dec = "decimal(18,2)"

    def rollup(df: DataFrame, n_alias: str, rev_alias: str) -> DataFrame:
        return (
            df.join(F.broadcast(cust), df.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(n_alias),
                F.sum(F.col("o_totalprice").cast(dec)).alias(rev_alias),
            )
        )

    is_delta = (F.col("o_orderkey") % IVM_DELTA_MOD) == 0
    base = rollup(orders.where(~is_delta), "n_base", "_rev_base")
    delta = rollup(orders.where(is_delta), "n_delta", "_rev_delta")
    full = rollup(orders, "n_full", "_rev_full")
    merged = (
        base.join(delta, "c_mktsegment", "full")
        .join(full, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
            (F.coalesce("n_base", F.lit(0)) + F.coalesce("n_delta", F.lit(0)))
            .cast("bigint")
            .alias("n_final"),
            F.round(
                (
                    F.coalesce("_rev_base", F.lit(0).cast(dec))
                    + F.coalesce("_rev_delta", F.lit(0).cast(dec))
                ).cast("double"),
                2,
            ).alias("rev_final"),
            (
                (
                    F.coalesce("n_base", F.lit(0))
                    + F.coalesce("n_delta", F.lit(0))
                    == F.coalesce("n_full", F.lit(0))
                )
                & (
                    F.coalesce("_rev_base", F.lit(0).cast(dec))
                    + F.coalesce("_rev_delta", F.lit(0).cast(dec))
                    == F.coalesce("_rev_full", F.lit(0).cast(dec))
                )
            ).alias("matches_recompute"),
        )
    )
    return merged.orderBy("c_mktsegment")


Q212_SQL = f"""
WITH joined AS (
  SELECT o.o_orderkey, c.c_mktsegment,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
base AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_base,
         sum(price) AS _rev_base
  FROM joined WHERE o_orderkey % {IVM_DELTA_MOD} != 0 GROUP BY 1
),
delta AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_delta,
         sum(price) AS _rev_delta
  FROM joined WHERE o_orderkey % {IVM_DELTA_MOD} = 0 GROUP BY 1
),
wholeview AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_full,
         sum(price) AS _rev_full
  FROM joined GROUP BY 1
)
SELECT w.c_mktsegment,
       coalesce(n_base, 0) AS n_base,
       coalesce(n_delta, 0) AS n_delta,
       CAST(coalesce(n_base, 0) + coalesce(n_delta, 0) AS BIGINT) AS n_final,
       round(CAST(coalesce(_rev_base, 0) + coalesce(_rev_delta, 0) AS DOUBLE),
             2) AS rev_final,
       (coalesce(n_base, 0) + coalesce(n_delta, 0) = coalesce(n_full, 0))
       AND (coalesce(_rev_base, 0) + coalesce(_rev_delta, 0)
            = coalesce(_rev_full, 0)) AS matches_recompute
FROM wholeview w
LEFT JOIN base b ON w.c_mktsegment = b.c_mktsegment
LEFT JOIN delta d ON w.c_mktsegment = d.c_mktsegment
ORDER BY w.c_mktsegment
"""


# ---------------------------------------------------------------------------
# q216 rolling 7-day distinct users per day ("rolling MAU" shape) —
# the sliding-window DISTINCT aggregate, which neither Spark nor most
# engines support as a native window function (COUNT(DISTINCT) OVER
# RANGE is unsupported); the declarative re-expression is:
#   1. collapse events to DISTINCT (day, user) — the only shuffle that
#      sees raw data, and a map-side-partial distinct;
#   2. EXPLODE each (day, user) into the <=7 window-end days it
#      contributes to (sequence(day, day+6)) — a narrow 7x expansion
#      of the already-tiny distinct set, NOT a range self-join: at
#      100 TB a day-range join of events x days shuffles the raw fact
#      table, while this shape shuffles |distinct (day,user)| * 7;
#   3. semi-join to days actually observed (no phantom trailing days),
#      then countDistinct(user) per window-end day.
# The reference has no temporal surface at all (events are this
# engine's pipeline-telemetry extension); the op completes the window
# family q13/q14/q31/q32 with the distinct-under-slide case.
# ---------------------------------------------------------------------------
ROLLING_DISTINCT_DAYS = 7


def q216_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add("day", ROLLING_DISTINCT_DAYS - 1),
            )
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("users_7d"))
        # day as a string: pandas widens DATE to datetime on the
        # oracle side, so the comparable form is the formatted string
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "users_7d"
        )
        .orderBy("day")
    )


Q216_SQL = f"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
FROM days
JOIN du ON du.day BETWEEN days.day - {ROLLING_DISTINCT_DAYS - 1}
                      AND days.day
GROUP BY days.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# q222 interval union (gaps-and-islands merge): total covered time per
# user when every event opens a fixed 5-minute activity interval —
# overlapping intervals merge, and the answer is the union length plus
# the island count. The classic formulation (session billing, uptime
# from heartbeats, GPU-occupancy from job spans) and the third member
# of the islands family next to q106 (gap sessionize) and q149 (gap
# fill). Plan: ONE shuffle on user_id, then pure window algebra —
# island boundary = start > max(end) over all PRECEDING intervals
# (the running-max prefix frame handles containment: an interval
# swallowed by an earlier longer one does not reopen an island),
# cumsum of boundaries numbers the islands, and two bounded
# aggregations finish. All math in integer microseconds — bit-equal
# across engines, no date rounding.
# ---------------------------------------------------------------------------
IVL_DUR_US = 300_000_000  # each event covers [ts, ts + 5 min)


def q222_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + IVL_DUR_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "_ni",
        (prev_max.isNull() | (F.col("s") > prev_max)).cast("bigint"),
    ).withColumn(
        "_isl",
        F.sum("_ni").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("user_id", "_isl").agg(
        (F.max("e") - F.min("s")).alias("_cov")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("_cov").cast("bigint").alias("covered_us"),
        )
        .orderBy("user_id")
    )


Q222_SQL = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {IVL_DUR_US} AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM iv
),
fl AS (
  SELECT user_id, s, e,
         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
  FROM m
),
isl AS (
  SELECT user_id, s, e,
         sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS g
  FROM fl
),
agg AS (
  SELECT user_id, g, max(e) - min(s) AS cov FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(cov) AS BIGINT) AS covered_us
FROM agg
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q73 stratified TEMPORAL train/val/test split — the one curation
# split shape q101/q102 do not cover: within each stratum (event_type)
# rows are ordered by TIME and cut at the 80%/90% boundaries, so the
# validation and test sets are strictly LATER than training data — the
# leakage-safe split for forecasting / next-event training corpora
# (hash and stratified-random splits shuffle future into train).
# Plan: ONE shuffle on the stratum key; row_number + count computed in
# the same window pass; the output is the per-(stratum, split) audit
# card (counts + time ranges — the thing a pipeline asserts before
# training). At 100 TB replace the exact row_number with
# approx-percentile boundary timestamps per stratum (sketch pass +
# broadcast cut points) — same contract, no per-stratum total order.
# ---------------------------------------------------------------------------
SPLIT_TRAIN_FRAC = 0.8
SPLIT_VAL_FRAC = 0.9  # cumulative: val is (0.8, 0.9]


def q73_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "ts",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_strat"),
    )
    split = (
        F.when(
            F.col("rn") <= F.floor(F.lit(SPLIT_TRAIN_FRAC) * F.col("n_strat")),
            F.lit("train"),
        )
        .when(
            F.col("rn") <= F.floor(F.lit(SPLIT_VAL_FRAC) * F.col("n_strat")),
            F.lit("val"),
        )
        .otherwise(F.lit("test"))
    )
    return (
        ranked.withColumn("split", split)
        .groupBy("event_type", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("ts_first"),
            F.date_format(F.max("ts"), TS_FMT_SPARK).alias("ts_last"),
        )
        .orderBy("event_type", "split")
    )


Q73_SQL = f"""
WITH ranked AS (
  SELECT event_type, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_strat
  FROM events
),
tagged AS (
  SELECT event_type, ts,
         CASE WHEN rn <= floor({SPLIT_TRAIN_FRAC} * n_strat) THEN 'train'
              WHEN rn <= floor({SPLIT_VAL_FRAC} * n_strat) THEN 'val'
              ELSE 'test' END AS split
  FROM ranked
)
SELECT event_type, split,
       CAST(count(*) AS BIGINT) AS n_rows,
       strftime(min(ts), '{TS_FMT_DUCK}') AS ts_first,
       strftime(max(ts), '{TS_FMT_DUCK}') AS ts_last
FROM tagged
GROUP BY event_type, split
ORDER BY event_type, split
"""


# ---------------------------------------------------------------------------
# q231 OHLC bars — the hypertable/time-series rollup: per (event_type,
# hour bucket) the open (first value by (ts, event_id)), high, low,
# close (last value), event count and volume. Open/close are resolved
# with two row_number windows on the SAME (type, bucket) ordering and
# folded into the groupBy as conditional aggregates — the window and
# the aggregation share one shuffle on the bucket key (Spark plans a
# single Exchange). At 100 TB this is the canonical pre-aggregation
# cascade: hour bars roll up to day/week bars without re-reading raw
# events (q125's rollup applies downstream of this operator).
# ---------------------------------------------------------------------------
def q231_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(w_asc))
        .withColumn("rn_d", F.row_number().over(w_desc))
        .groupBy("event_type", "bucket")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("bucket", TS_FMT_SPARK).alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
        .orderBy("event_type", "bucket")
    )


Q231_SQL = f"""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type,
       strftime(bucket, '{TS_FMT_DUCK}') AS bucket,
       round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS volume
FROM e
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# q233 time-RANGE-frame moving aggregate — the window family member
# q14/q216 do NOT cover: the frame is defined by an INTERVAL on event
# TIME (all events of the same type in the trailing 10 minutes), not
# by a row count — the correct moving average for irregular event
# streams (a ROWS frame mixes dense and sparse periods). The order key
# is integer epoch MICROseconds (fixture timestamps are sub-second),
# so the frame bound arithmetic is exact integer comparison on both
# engines and frame membership is bit-identical. Spark evaluates the
# running frame in one pass per partition after ONE shuffle on
# event_type; at 100 TB pre-bucket coarse windows (q125) or stream it
# with a watermark (streaming/jobs.py q31/q32) — this shape is the
# batch oracle for those.
# ma_10m is emitted UNROUNDED (the q89 lesson): event values are
# 2-decimal, so frame means land exactly on 4-dp midpoints where
# Spark's shortest-repr HALF_UP round and DuckDB's binary-value round
# disagree (2 rows in 100k at sf0.1) — the driver's single
# canonicalization rounds both engines' bit-compatible raw doubles.
# ---------------------------------------------------------------------------
RANGE_MA_US = 600_000_000  # 10 minutes in microseconds


def q233_range_frame_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us")
        .rangeBetween(-RANGE_MA_US, 0)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            F.date_format("ts", TS_FMT_SPARK).alias("ts"),
            F.round("value", 4).alias("value"),
            F.avg("value").over(w).alias("ma_10m"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_in_frame"),
        )
        .orderBy("event_type", "ts", "event_id")
    )


Q233_SQL = f"""
SELECT event_id, event_type,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       round(value, 4) AS value,
       avg(value) OVER w AS ma_10m,
       CAST(count(*) OVER w AS BIGINT) AS n_in_frame
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN {RANGE_MA_US} PRECEDING AND CURRENT ROW)
ORDER BY event_type, strftime(ts, '{TS_FMT_DUCK}'), event_id
"""


# ---------------------------------------------------------------------------
# q238 gaps-and-islands — consecutive-day activity runs per user: the
# classic SQL shape (row_number difference collapses each maximal run
# of consecutive days to one group key) driving the streak/retention
# metrics q107's cohort view cannot express (longest streak, number of
# distinct streaks). Day arithmetic runs on INTEGER day numbers
# (datediff from epoch) so group keys are exact on both engines.
# Plan: distinct (user, day) first — the only pass over raw events —
# then two cheap stages over |user-days| rows sharing the user_id
# shuffle. At 100 TB |user-days| << |events| (it is capped by
# users x 365/yr), so the heavy input is touched exactly once.
# ---------------------------------------------------------------------------
def q238_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias(
                "day_num"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    runs = (
        days.withColumn("grp", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("run_len").cast("bigint").alias("longest_run"),
        )
        .orderBy("user_id")
    )


Q238_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
),
runs AS (
  SELECT user_id,
         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num) AS grp
  FROM days
),
agg AS (
  SELECT user_id, grp, count(*) AS run_len FROM runs GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(run_len) AS BIGINT) AS longest_run
FROM agg
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q241 interpolation join — time-series alignment: for every 'error'
# event, linearly interpolate the same user's 'click' metric value at
# the error's timestamp from the nearest click before and after (edge
# rows forward-/backward-fill; users with no clicks stay null). The
# two-sided generalization of the as-of join (q58): sensor-stream
# alignment, feature backfill at label timestamps, trade/quote
# mid-price reconstruction all run exactly this.
# Plan shape: q58's union trick, run in BOTH directions over ONE
# shuffle on user_id — last(value IGNORE NULLS) over a trailing RANGE
# frame and first(value IGNORE NULLS) over a leading RANGE frame on
# the merged stream. RANGE frames on integer epoch-microseconds make a
# source at the exact target timestamp visible to both directions
# (frame peers), and all gap arithmetic is exact integer math — only
# the final lerp is floating point. No range fan-out, no self-join:
# O(n log n) per user vs the quadratic join-then-filter-then-argmin.
# ---------------------------------------------------------------------------
INTERP_SRC_TYPE = "click"
INTERP_TGT_TYPE = "error"


def q241_interpolation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    src = ev.where(F.col("event_type") == INTERP_SRC_TYPE).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("tgt_ts"),
        F.col("value").alias("sv"),
    )
    tgt = ev.where(F.col("event_type") == INTERP_TGT_TYPE).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.col("ts").alias("tgt_ts"),
        F.lit(None).cast("double").alias("sv"),
    )
    u = src.unionByName(tgt)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(0, Window.unboundedFollowing)
    )
    sv_ts = F.when(F.col("sv").isNotNull(), F.col("ts_us"))
    ann = u.select(
        "user_id",
        "event_id",
        "tgt_ts",
        "ts_us",
        F.last("sv", ignorenulls=True).over(w_back).alias("pv"),
        F.last(sv_ts, ignorenulls=True).over(w_back).alias("pt"),
        F.first("sv", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(sv_ts, ignorenulls=True).over(w_fwd).alias("nt"),
    ).where(F.col("event_id").isNotNull())
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("ts_us") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    interp = (
        F.when(F.col("pv").isNull() & F.col("nv").isNull(), F.lit(None).cast("double"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(lerp)
    )
    mode = (
        F.when(F.col("pv").isNull() & F.col("nv").isNull(), F.lit("none"))
        .when(F.col("pv").isNull(), F.lit("bfill"))
        .when(F.col("nv").isNull(), F.lit("ffill"))
        .otherwise(F.lit("interp"))
    )
    return ann.select(
        "event_id",
        "user_id",
        F.date_format("tgt_ts", TS_FMT_SPARK).alias("ts"),
        F.round(interp, 4).alias("interp_value"),
        mode.alias("mode"),
    ).orderBy("event_id")


Q241_SQL = f"""
WITH u AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS TIMESTAMP) AS tgt_ts,
         value AS sv
  FROM events WHERE event_type = '{INTERP_SRC_TYPE}'
  UNION ALL
  SELECT user_id, epoch_us(ts), event_id, ts, CAST(NULL AS DOUBLE)
  FROM events WHERE event_type = '{INTERP_TGT_TYPE}'
),
ann AS (
  SELECT user_id, event_id, tgt_ts, ts_us,
         last_value(sv IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN sv IS NOT NULL THEN ts_us END IGNORE NULLS)
             OVER wb AS pt,
         first_value(sv IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN sv IS NOT NULL THEN ts_us END IGNORE NULLS)
             OVER wf AS nt
  FROM u
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts_us
                RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       strftime(tgt_ts, '{TS_FMT_DUCK}') AS ts,
       round(CASE
         WHEN pv IS NULL AND nv IS NULL THEN NULL
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         WHEN nt = pt THEN pv
         ELSE pv + (nv - pv) * (CAST(ts_us - pt AS DOUBLE)
                                / CAST(nt - pt AS DOUBLE))
       END, 4) AS interp_value,
       CASE
         WHEN pv IS NULL AND nv IS NULL THEN 'none'
         WHEN pv IS NULL THEN 'bfill'
         WHEN nv IS NULL THEN 'ffill'
         ELSE 'interp'
       END AS mode
FROM ann
WHERE event_id IS NOT NULL
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q244 run-length compaction — collapse each user's event stream into
# maximal runs of consecutive same-type events and profile the runs
# per type (count, mean/max length, and how much the stream compresses
# — n_runs/n_events is the stream's repetition factor). The adjacency
# twin of q191's time-based debounce: "the user clicked 9 times in a
# row" is one behavioral action, and run statistics are the cheap
# screen for scripted repetition (a bot's max_run dwarfs a human's).
# Plan: the two-row_number difference trick — rn_overall minus
# rn_within_type is constant exactly within a maximal run — needs TWO
# window passes over the SAME (user_id) clustering: one shuffle, two
# in-partition sorts, then an aggregation keyed by the derived run id
# whose first element re-uses the clustering. Integer group keys, no
# floats anywhere until the final averages.
# ---------------------------------------------------------------------------
def q244_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.withColumn(
            "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.sum("run_len").cast("bigint").alias("n_events"),
            F.round(F.avg("run_len"), 4).alias("avg_run_len"),
            F.max("run_len").cast("bigint").alias("max_run_len"),
        )
        .orderBy("event_type")
    )


Q244_SQL = """
WITH runs AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM events
),
agg AS (
  SELECT user_id, event_type, grp, count(*) AS run_len
  FROM runs GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_events,
       round(avg(run_len), 4) AS avg_run_len,
       CAST(max(run_len) AS BIGINT) AS max_run_len
FROM agg
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q247 records-and-drawdown — per event_type over the DAILY value
# series: how many days set a new running maximum (record days), the
# peak daily value, and the maximum drawdown (worst peak-to-day drop,
# max over days of running_max - daily). The running-extreme window
# family member q14 (running sum) and q100 (rolling frame) do not
# cover: an UNBOUNDED PRECEDING max frame plus derived record flags —
# capacity planning ("when was the high-water mark"), KPI monitoring
# ("how far below peak are we"), and bot screens (a record-day burst)
# all read exactly this. Plan: events collapse to |type x day| rows
# first (the only pass over raw data), then one window pass per type
# over the tiny daily series; integer record counts, drawdown in raw
# doubles per the midpoint rule (daily sums can be all-2-decimal and
# the drawdown is a difference of two such — midpoint-class).
# ---------------------------------------------------------------------------
def q247_records_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("daily_value"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.select(
        "event_type",
        "daily_value",
        F.max("daily_value").over(w).alias("run_max"),
        F.max("daily_value").over(w_prev).alias("prev_max"),
    )
    is_record = F.col("prev_max").isNull() | (
        F.col("daily_value") > F.col("prev_max")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.when(is_record, 1).otherwise(0)).cast("bigint").alias(
                "n_record_days"
            ),
            F.max("daily_value").alias("peak_daily"),
            F.max(F.col("run_max") - F.col("daily_value")).alias("max_drawdown"),
        )
        .orderBy("event_type")
    )


Q247_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS daily_value
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, daily_value,
         max(daily_value) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run_max,
         max(daily_value) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN prev_max IS NULL OR daily_value > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_record_days,
       max(daily_value) AS peak_daily,
       max(run_max - daily_value) AS max_drawdown
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q254 — Kaplan-Meier survival over user lifetimes: S(t) for t in
# 0..T-1 days where "death" = the user's LAST observed event day
# (lifetime = last day − first day), right-censored at T. The
# retention curve behind cohort charts (q107 counts returns per
# month; this is the canonical at-risk/deaths product estimator).
# Scale shape: ONE per-user aggregate over events (map-side reduce),
# then a lifetime HISTOGRAM (≤ a few hundred distinct day values) —
# all survival arithmetic happens on the bounded histogram, broadcast
# everywhere; the heavy table is touched once. Float parity: S(t) is
# a strict left-to-right product of the (1 − d/n) factors in t order
# on BOTH engines (Spark aggregate() fold over the sorted factor
# array / DuckDB list_reduce over list(... ORDER BY t)) — IEEE
# multiplication is order-sensitive, fold order is pinned, so the
# doubles are bit-identical (the functions/vectors.py policy).
# ---------------------------------------------------------------------------
KM_HORIZON_DAYS = 14


def q254_survival_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("lt")
    )
    hist = life.groupBy("lt").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ts = spark.range(KM_HORIZON_DAYS).select(F.col("id").cast("int").alias("t"))
    # at-risk n_t = users with lifetime >= t; deaths d_t at exactly t
    joined = ts.crossJoin(F.broadcast(hist)).groupBy("t").agg(
        F.sum(F.when(F.col("lt") >= F.col("t"), F.col("d")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_at_risk"),
        F.sum(F.when(F.col("lt") == F.col("t"), F.col("d")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_deaths"),
    )
    factor = F.when(
        F.col("n_at_risk") > 0,
        1.0 - F.col("n_deaths").cast("double") / F.col("n_at_risk"),
    ).otherwise(F.lit(1.0))
    facs = joined.select("t", "n_at_risk", "n_deaths", factor.alias("f"))
    all_f = facs.agg(
        F.array_sort(F.collect_list(F.struct("t", "f"))).alias("fs")
    )
    return (
        facs.crossJoin(F.broadcast(all_f))
        .select(
            "t",
            "n_at_risk",
            "n_deaths",
            F.aggregate(
                F.transform(
                    F.slice(F.col("fs"), 1, F.col("t") + 1), lambda x: x["f"]
                ),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ).alias("survival"),
        )
        .orderBy("t")
    )


Q254_SQL = f"""
WITH life AS (
  SELECT user_id,
         date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS lt
  FROM events GROUP BY user_id
),
hist AS (SELECT lt, CAST(count(*) AS BIGINT) AS d FROM life GROUP BY lt),
ts AS (SELECT unnest(generate_series(0, {KM_HORIZON_DAYS - 1})) AS t),
per_t AS (
  SELECT t,
         CAST(coalesce(sum(CASE WHEN lt >= t THEN d END), 0) AS BIGINT) AS n_at_risk,
         CAST(coalesce(sum(CASE WHEN lt = t THEN d END), 0) AS BIGINT) AS n_deaths
  FROM ts LEFT JOIN hist ON TRUE
  GROUP BY t
),
facs AS (
  SELECT t, n_at_risk, n_deaths,
         CASE WHEN n_at_risk > 0
              THEN 1.0 - CAST(n_deaths AS DOUBLE) / n_at_risk
              ELSE CAST(1.0 AS DOUBLE) END AS f
  FROM per_t
),
fl AS (SELECT list(CAST(f AS DOUBLE) ORDER BY t) AS fs FROM facs)
SELECT t, n_at_risk, n_deaths,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs[1:t + 1]),
                   (a, b) -> a * b) AS survival
FROM facs, fl
ORDER BY t
"""


# ---------------------------------------------------------------------------
# q256 — autocorrelation function of the daily value series, lags
# 1..7: the seasonality DETECTOR (q205 assumes day-of-week structure
# and measures it; the ACF finds whatever periodicity is actually
# there — the screen you run before fitting any seasonal model).
# Sample ACF: r_k = Σ (x_t − x̄)(x_{t−k} − x̄) / Σ (x_t − x̄)², mean
# and denominator over the FULL series (the standard estimator).
# Scale shape: ONE groupBy(day) reduce over events; everything after
# operates on the ~|days| daily frame — the lag alignment is an
# explode(1..7) + equi-join on (day − lag) between two broadcast-size
# sides, and the mean/denominator ride along via a broadcast
# single-row crossJoin. Raw doubles out; the driver canonicalizes.
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 7


def q256_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint: one events scan feeds every downstream branch
    # (mean, denominator, 7 lag joins) — see the q271 note
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("x"))
        .localCheckpoint()
    )
    stats = daily.agg(F.avg("x").alias("mu"))
    base = daily.crossJoin(F.broadcast(stats))
    denom = base.agg(
        F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))).alias("ss")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = base.select("d", "x", "mu")
    b = base.select(F.col("d").alias("d2"), F.col("x").alias("x2"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.date_add(F.col("d2"), F.col("lag")) == F.col("d"))
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum((F.col("x") - F.col("mu")) * (F.col("x2") - F.col("mu"))).alias(
                "num"
            ),
        )
        .crossJoin(F.broadcast(denom))
        .select("lag", "n_pairs", (F.col("num") / F.col("ss")).alias("acf"))
        .orderBy("lag")
    )


Q256_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(value) AS x FROM events GROUP BY 1
),
mu AS (SELECT avg(x) AS mu FROM daily),
ss AS (SELECT sum((x - mu) * (x - mu)) AS ss FROM daily, mu),
lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, a.x AS x, b.x AS x2, m.mu
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.d + CAST(l.lag AS INT) = a.d
  CROSS JOIN mu m
)
SELECT CAST(lag AS INT) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       sum((x - mu) * (x2 - mu)) / (SELECT ss FROM ss) AS acf
FROM pairs
GROUP BY lag
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# q257 — change-point detection on the daily event-count/value series:
# the split day t* maximizing |mean(≤t) − mean(>t)| (binary
# segmentation's scoring step / the mean-shift CUSUM screen) — the
# drift alarm for ingest pipelines ("traffic changed regime on day
# X"). Scale shape: the heavy table reduces to the bounded daily
# frame in ONE groupBy; split scoring is prefix sums over that
# ~|days|-row frame via a day-ordered running window (documented
# bounded-domain unpartitioned window, same class as q15/q247) and
# the argmax is a 1-row TakeOrdered. Ties break to the EARLIEST day
# on both engines. Raw doubles out.
# ---------------------------------------------------------------------------
def q257_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("x"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pref = (
        daily.withColumn("cum", F.sum("x").over(w))
        .withColumn("k", F.row_number().over(Window.orderBy("d")).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("k") < F.col("n"))  # both segments non-empty
    )
    mean_l = F.col("cum") / F.col("k")
    mean_r = (F.col("sx") - F.col("cum")) / (F.col("n") - F.col("k"))
    scored = pref.select(
        F.date_format("d", "yyyy-MM-dd").alias("split_day"),
        F.col("k").alias("n_before"),
        (F.col("n") - F.col("k")).alias("n_after"),
        mean_l.alias("mean_before"),
        mean_r.alias("mean_after"),
        F.abs(mean_r - mean_l).alias("abs_shift"),
    )
    return scored.orderBy(F.col("abs_shift").desc(), "split_day").limit(1)


Q257_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(value) AS x FROM events GROUP BY 1
),
tot AS (SELECT sum(x) AS sx, CAST(count(*) AS BIGINT) AS n FROM daily),
pref AS (
  SELECT d,
         sum(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k
  FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS split_day,
       k AS n_before,
       n - k AS n_after,
       cum / k AS mean_before,
       (sx - cum) / (n - k) AS mean_after,
       abs((sx - cum) / (n - k) - cum / k) AS abs_shift
FROM pref, tot
WHERE k < n
ORDER BY abs_shift DESC, split_day
LIMIT 1
"""


# ---------------------------------------------------------------------------
# q260 — EWMA smoothing + residual anomaly per event type: the
# exponentially weighted moving average over the daily value series
# (alpha = 0.3, seeded at the first day), the final smoothed level,
# and the day with the largest one-step-ahead surprise
# |x_t − ewma_{t−1}| — the classic streaming anomaly score (q100 is
# the windowed-zscore variant; EWMA is the constant-memory one you
# actually deploy in a stream).
# Scale shape: ONE groupBy(type, day) reduce over events; all EWMA
# arithmetic happens on the per-type sorted daily ARRAY (≤ |days|
# elements, bounded) inside higher-order functions — the heavy table
# is touched once and nothing unbounded crosses an exchange.
# Float parity: every EWMA value is a pinned LEFT-TO-RIGHT fold
# (Spark ``aggregate`` with init = first element / DuckDB
# ``list_reduce``, which seeds from the head) — bit-identical doubles
# on both engines, so the argmax day needs no rounding and ties
# (exact double equality only) break to the earliest day on both
# sides.
# ---------------------------------------------------------------------------
EWMA_ALPHA = 0.3


def q260_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("x"))
    )
    arrs = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("s")
    )
    xs = F.transform("s", lambda e: e["x"])
    a, b = F.lit(EWMA_ALPHA), F.lit(1.0 - EWMA_ALPHA)

    def prefix_ewma(m):
        # EWMA of xs[1..m] (1-based): init = xs[1], fold xs[2..m]
        return F.aggregate(
            F.slice(xs, 2, m - 1),
            F.element_at(xs, 1),
            lambda acc, x: a * x + b * acc,
        )

    n = F.size("s")
    devs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda t: F.struct(
                F.abs(F.element_at(xs, t) - prefix_ewma(t - 1)).alias("dev"),
                F.element_at(F.col("s"), t)["d"].alias("d"),
            ),
        ),
    ).otherwise(F.array())
    worst = F.aggregate(
        devs,
        F.struct(
            F.lit(-1.0).alias("dev"), F.lit(None).cast("date").alias("d")
        ),
        lambda acc, x: F.when(x["dev"] > acc["dev"], x).otherwise(acc),
    )
    return (
        arrs.select(
            "event_type",
            n.cast("bigint").alias("n_days"),
            prefix_ewma(n).alias("last_ewma"),
            worst["dev"].alias("max_abs_dev"),
            F.date_format(worst["d"], "yyyy-MM-dd").alias("max_dev_day"),
        )
        .orderBy("event_type")
    )


Q260_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, sum(value) AS x
  FROM events GROUP BY 1, 2
),
arrs AS (
  SELECT event_type,
         list(x ORDER BY d) AS xs,
         list(d ORDER BY d) AS ds
  FROM daily GROUP BY 1
),
devs AS (
  SELECT event_type, xs, ds, t,
         abs(xs[t] - list_reduce(xs[1:t - 1],
                                 (acc, x) -> {EWMA_ALPHA} * x
                                             + {1.0 - EWMA_ALPHA} * acc)) AS dev
  FROM arrs, unnest(generate_series(2, len(xs))) AS g(t)
),
worst AS (
  SELECT event_type, dev, ds[t] AS d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dev DESC, ds[t]) AS rn
  FROM devs
)
SELECT a.event_type,
       CAST(len(a.xs) AS BIGINT) AS n_days,
       list_reduce(a.xs, (acc, x) -> {EWMA_ALPHA} * x
                                     + {1.0 - EWMA_ALPHA} * acc) AS last_ewma,
       coalesce(w.dev, -1.0) AS max_abs_dev,
       strftime(w.d, '%Y-%m-%d') AS max_dev_day
FROM arrs a LEFT JOIN worst w ON w.event_type = a.event_type AND w.rn = 1
ORDER BY a.event_type
"""


# ---------------------------------------------------------------------------
# q261 — cohort LTV curves: users grouped by first-seen week; for each
# (cohort, age-in-weeks) the cohort's cumulative value per member —
# the "how does lifetime value accrue" readout behind q107's retention
# counts and q254's survival probabilities. Ages with zero cohort
# activity don't emit a row (the cumulative then jumps — documented;
# q149 gap_fill is the densify primitive if a dense grid is wanted).
# Scale shape: first-seen reduce per user, one user_id-keyed join back
# (both sides shuffle-partitioned on user_id — co-located), one
# (cohort, age) aggregate; the cumulative runs in a window PARTITIONED
# by cohort over the ≤|weeks| age frame. Raw doubles out (cum/LTV are
# sums and sum/count of 2-dp values — the driver canonicalizes once).
# ---------------------------------------------------------------------------
def q261_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rows = ev.join(first, "user_id").select(
        "cohort_week",
        "user_id",
        "value",
        (
            F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))),
                       F.col("cohort_week"))
            / 7
        ).cast("int").alias("age_weeks"),
    )
    weekly = rows.groupBy("cohort_week", "age_weeks").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_active"),
        F.sum("value").alias("week_value"),
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        weekly.withColumn("cum_value", F.sum("week_value").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "age_weeks",
            "n_users",
            "n_active",
            "week_value",
            "cum_value",
            (F.col("cum_value") / F.col("n_users")).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


Q261_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
  FROM first GROUP BY cohort_week
),
rows_ AS (
  SELECT f.cohort_week, e.user_id, e.value,
         CAST(date_diff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
           AS age_weeks
  FROM events e JOIN first f USING (user_id)
),
weekly AS (
  SELECT cohort_week, age_weeks,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
         sum(value) AS week_value
  FROM rows_ GROUP BY 1, 2
)
SELECT strftime(w.cohort_week, '%Y-%m-%d') AS cohort_week,
       w.age_weeks,
       s.n_users,
       w.n_active,
       w.week_value,
       sum(w.week_value) OVER (PARTITION BY w.cohort_week
                               ORDER BY w.age_weeks
                               ROWS UNBOUNDED PRECEDING) AS cum_value,
       sum(w.week_value) OVER (PARTITION BY w.cohort_week
                               ORDER BY w.age_weeks
                               ROWS UNBOUNDED PRECEDING) / s.n_users
         AS ltv_per_user
FROM weekly w JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, age_weeks
"""


# ---------------------------------------------------------------------------
# q262 — sessionization threshold advisor: for each candidate
# inactivity gap (5/15/30/60 min), how many sessions the event log
# splits into and how large they are — the measurement you run BEFORE
# committing q106's threshold (q106 assumes 30 min; this is where 30
# comes from). A new session starts when the gap from the previous
# event is >= the threshold (the q33/q106 boundary convention), so
# n_sessions = n_users + n_splitting_gaps with no per-threshold
# re-sessionization pass.
# Scale shape: ONE user_id-partitioned lag pass computes every gap
# once (microsecond integer math — exact on both engines); the
# 4-row threshold frame is broadcast-crossed against the gap rows and
# the conditional counts partial-combine map-side to 4 groups.
# ---------------------------------------------------------------------------
SESSION_THRESHOLDS_MIN = [5, 15, 30, 60]


def q262_session_threshold_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    )
    totals = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )
    th = spark.createDataFrame(
        [(m,) for m in SESSION_THRESHOLDS_MIN], "threshold_min int"
    )
    return (
        gaps.crossJoin(F.broadcast(th))
        .groupBy("threshold_min")
        .agg(
            F.sum(F.col("gap_us").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_gaps"),
            F.sum(
                (
                    F.col("gap_us")
                    >= F.col("threshold_min").cast("bigint") * 60_000_000
                )
                .cast("bigint")
            )
            .cast("bigint")
            .alias("n_splits"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "threshold_min",
            "n_gaps",
            "n_splits",
            (F.col("n_users") + F.col("n_splits")).alias("n_sessions"),
            (
                F.col("n_events")
                / (F.col("n_users") + F.col("n_splits")).cast("double")
            ).alias("events_per_session"),
        )
        .orderBy("threshold_min")
    )


_TH_SQL = ", ".join(f"({m})" for m in SESSION_THRESHOLDS_MIN)
Q262_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM gaps
),
th(threshold_min) AS (VALUES {_TH_SQL})
SELECT th.threshold_min,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(CASE WHEN gap_us >= CAST(th.threshold_min AS BIGINT) * 60000000
                              THEN 1 END), 0) AS BIGINT) AS n_splits,
       any_value(t.n_users)
         + CAST(coalesce(sum(CASE WHEN gap_us >= CAST(th.threshold_min AS BIGINT) * 60000000
                                  THEN 1 END), 0) AS BIGINT) AS n_sessions,
       any_value(t.n_events)
         / CAST(any_value(t.n_users)
                + coalesce(sum(CASE WHEN gap_us >= CAST(th.threshold_min AS BIGINT) * 60000000
                               THEN 1 END), 0) AS DOUBLE) AS events_per_session
FROM gaps CROSS JOIN th CROSS JOIN totals t
GROUP BY th.threshold_min
ORDER BY th.threshold_min
"""


# ---------------------------------------------------------------------------
# q269 — hour-of-week traffic fingerprint: activity per (ISO weekday,
# hour) cell with a z-score against the all-cell mean — the 168-cell
# heatmap behind load-shaping and anomaly baselines (finer than
# q205's day-of-week seasonality; q100 is the per-day z variant).
# Cells with zero events emit no row (no gap fill) on both engines.
# Scale shape: one scan collapses events to ≤168 cells map-side;
# the mean/stddev ride back via a broadcast 1-row crossJoin. Raw
# doubles out.
# ---------------------------------------------------------------------------
def q269_hourweek_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.weekday("ts") + 1).alias("iso_dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    stats = cells.agg(
        F.avg("n_events").alias("mu"),
        F.stddev_pop("n_events").alias("sd"),
    )
    return (
        cells.crossJoin(F.broadcast(stats))
        .select(
            "iso_dow",
            "hour",
            "n_events",
            "sum_value",
            ((F.col("n_events") - F.col("mu")) / F.col("sd")).alias("z_events"),
        )
        .orderBy("iso_dow", "hour")
    )


Q269_SQL = """
WITH cells AS (
  SELECT CAST(isodow(ts) AS INT) AS iso_dow,
         CAST(hour(ts) AS INT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(value) AS sum_value
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT avg(n_events) AS mu, stddev_pop(n_events) AS sd FROM cells
)
SELECT iso_dow, hour, n_events, sum_value,
       (n_events - mu) / sd AS z_events
FROM cells, stats
ORDER BY iso_dow, hour
"""


# ---------------------------------------------------------------------------
# q271 — lead/lag cross-correlation between two event types' daily
# value series ('click' leading 'purchase'): r_k for k in −7..7 with
# the ACF-style normalization Σ(a_t−ā)(b_{t+k}−b̄)/√(ssa·ssb) — the
# detector for "does activity in A precede activity in B, and by how
# many days" (q256 is the single-series ACF; this is the two-series
# generalization that finds conversion lag). Positive k means A leads
# B by k days. Pairs exist only where both days are observed.
# Scale shape: ONE groupBy(day) reduce per type (a single events scan
# with conditional aggregates); everything downstream — lag frame
# (15 rows, broadcast), day alignment join, moment sums — runs on the
# two ≤|days| daily frames. Raw doubles out.
# ---------------------------------------------------------------------------
XCORR_A, XCORR_B = "click", "purchase"
XCORR_MAX_LAG = 7


def q271_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(XCORR_A, XCORR_B)
    )
    # localCheckpoint the bounded daily frame so the moment/alignment
    # branches below (means, ssa/ssb, 15 lag joins) all read the ≤|days|
    # materialization instead of re-deriving it — exactly ONE events
    # scan regardless of branch count (the header's claim, made true
    # in the physical plan; asserted in tests/test_plans.py)
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == XCORR_A, F.col("value"))).alias(
                "xa"
            ),
            F.sum(F.when(F.col("event_type") == XCORR_B, F.col("value"))).alias(
                "xb"
            ),
        )
        .localCheckpoint()
    )
    a = daily.where(F.col("xa").isNotNull()).select("d", "xa")
    b = daily.where(F.col("xb").isNotNull()).select(
        F.col("d").alias("db"), "xb"
    )
    stats = (
        a.agg(F.avg("xa").alias("ma"))
        .crossJoin(b.agg(F.avg("xb").alias("mb")))
    )
    base_a = a.crossJoin(F.broadcast(stats))
    ssa = base_a.agg(
        F.sum((F.col("xa") - F.col("ma")) * (F.col("xa") - F.col("ma"))).alias("ssa")
    )
    ssb = (
        b.crossJoin(F.broadcast(stats))
        .agg(
            F.sum((F.col("xb") - F.col("mb")) * (F.col("xb") - F.col("mb"))).alias(
                "ssb"
            )
        )
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = base_a.crossJoin(F.broadcast(lags)).join(
        b, F.date_add(F.col("d"), F.col("lag")) == F.col("db")
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("xa") - F.col("ma")) * (F.col("xb") - F.col("mb"))
            ).alias("num"),
        )
        .crossJoin(F.broadcast(ssa))
        .crossJoin(F.broadcast(ssb))
        .select(
            "lag",
            "n_pairs",
            (F.col("num") / F.sqrt(F.col("ssa") * F.col("ssb"))).alias("xcorr"),
        )
        .orderBy("lag")
    )


Q271_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CASE WHEN event_type = '{XCORR_A}' THEN value END) AS xa,
         sum(CASE WHEN event_type = '{XCORR_B}' THEN value END) AS xb
  FROM events
  WHERE event_type IN ('{XCORR_A}', '{XCORR_B}')
  GROUP BY 1
),
a AS (SELECT d, xa FROM daily WHERE xa IS NOT NULL),
b AS (SELECT d AS db, xb FROM daily WHERE xb IS NOT NULL),
stats AS (
  SELECT (SELECT avg(xa) FROM a) AS ma, (SELECT avg(xb) FROM b) AS mb
),
ssa AS (SELECT sum((xa - ma) * (xa - ma)) AS ssa FROM a, stats),
ssb AS (SELECT sum((xb - mb) * (xb - mb)) AS ssb FROM b, stats),
lags AS (SELECT unnest(generate_series(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, a.xa, b.xb, s.ma, s.mb
  FROM a CROSS JOIN lags l
  JOIN b ON a.d + CAST(l.lag AS INT) = b.db
  CROSS JOIN stats s
)
SELECT lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       sum((xa - ma) * (xb - mb)) / sqrt(ssa.ssa * ssb.ssb) AS xcorr
FROM pairs, ssa, ssb
GROUP BY lag, ssa.ssa, ssb.ssb
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# q273 — classical seasonal decomposition of the daily value series
# (the moving-average STL-lite): trend = centered 7-day MA (full
# windows only), detrended = x − trend, seasonal = per-ISO-weekday
# mean of the detrended series, residual = detrended − seasonal;
# reported per weekday with the residual spread — the decomposition
# behind "is Monday really +20%, or is that trend/noise" (q205
# measures raw day-of-week factors; q233 is the MA primitive; this
# combines them into the additive model with a residual diagnostic).
# Scale shape: ONE day reduce over events; every window (centered MA,
# per-dow seasonal mean) runs on the bounded ≤|days| daily frame — a
# documented bounded-domain window site, same class as q15/q247.
# Averages of raw doubles out; the driver canonicalizes once.
# ---------------------------------------------------------------------------
def q273_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("x"))
    )
    w_ma = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "x",
        (F.weekday("d") + 1).alias("iso_dow"),
        F.avg("x").over(w_ma).alias("trend"),
        F.count(F.lit(1)).over(w_ma).alias("n_win"),
    ).where(F.col("n_win") == 7)
    det = trended.withColumn("det", F.col("x") - F.col("trend"))
    w_dow = Window.partitionBy("iso_dow")
    decomposed = det.withColumn("seasonal", F.avg("det").over(w_dow))
    return (
        decomposed.groupBy("iso_dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.avg("x").alias("mean_value"),
            F.max("seasonal").alias("seasonal"),
            F.stddev_pop(F.col("det") - F.col("seasonal")).alias("resid_std"),
        )
        .orderBy("iso_dow")
    )


Q273_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(value) AS x FROM events GROUP BY 1
),
trended AS (
  SELECT d, x, CAST(isodow(d) AS INT) AS iso_dow,
         avg(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend,
         count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS n_win
  FROM daily
),
det AS (
  SELECT d, x, iso_dow, x - trend AS det
  FROM trended WHERE n_win = 7
),
decomposed AS (
  SELECT *, avg(det) OVER (PARTITION BY iso_dow) AS seasonal FROM det
)
SELECT iso_dow,
       CAST(count(*) AS BIGINT) AS n_days,
       avg(x) AS mean_value,
       max(seasonal) AS seasonal,
       stddev_pop(det - seasonal) AS resid_std
FROM decomposed
GROUP BY iso_dow
ORDER BY iso_dow
"""


# ---------------------------------------------------------------------------
# q279 — Theil–Sen robust trend of the daily value series: the exact
# median of all pairwise slopes (y_j − y_i)/(x_j − x_i), with the
# median-residual intercept and the OLS slope alongside — the
# outlier-robust twin of q140's least-squares trend (one anomalous
# day can move OLS arbitrarily; Theil–Sen has a 29% breakdown point).
# Scale shape: ONE day reduce over events; the O(|days|²) pair frame
# is built from the checkpointed bounded daily frame (a documented
# bounded-domain site — |days| ≤ 31 here; at a longer horizon the
# pair blow-up is bounded by pre-bucketing days to weeks first).
# Float parity: each slope is one identical double expression of the
# exact-by-ulps daily sums; medians are the same R-7 interpolation on
# both engines; outputs are raw doubles (driver canonicalizes).
# ---------------------------------------------------------------------------
def q279_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("y"))
        .localCheckpoint()
    )
    base = daily.crossJoin(
        F.broadcast(daily.agg(F.min("d").alias("d0")))
    ).select(F.datediff("d", "d0").cast("double").alias("x"), "y")
    a = base.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    slopes = (
        a.join(b, F.col("xi") < F.col("xj"))
        .select(
            ((F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))).alias(
                "s"
            )
        )
    )
    ts = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.percentile("s", F.lit(0.5)).alias("ts_slope"),
    )
    resid = base.crossJoin(F.broadcast(ts)).select(
        (F.col("y") - F.col("ts_slope") * F.col("x")).alias("r")
    )
    icept = resid.agg(F.percentile("r", F.lit(0.5)).alias("ts_intercept"))
    ols = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (
            (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y"))
            / (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"))
        ).alias("ols_slope"),
    )
    return (
        ols.crossJoin(F.broadcast(ts))
        .crossJoin(F.broadcast(icept))
        .select("n_days", "n_pairs", "ts_slope", "ts_intercept", "ols_slope")
    )


Q279_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(value) AS y FROM events GROUP BY 1
),
base AS (
  SELECT CAST(date_diff('day', (SELECT min(d) FROM daily), d) AS DOUBLE) AS x,
         y
  FROM daily
),
slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS s
  FROM base a JOIN base b ON a.x < b.x
),
ts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         quantile_cont(s, 0.5) AS ts_slope
  FROM slopes
),
icept AS (
  SELECT quantile_cont(y - ts.ts_slope * x, 0.5) AS ts_intercept
  FROM base, ts
),
ols AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         (avg(x * y) - avg(x) * avg(y))
           / (avg(x * x) - avg(x) * avg(x)) AS ols_slope
  FROM base
)
SELECT n_days, n_pairs, ts_slope, ts_intercept, ols_slope
FROM ols, ts, icept
"""


# ---------------------------------------------------------------------------
# q280 — Holt linear-trend forecast per event type (double exponential
# smoothing, α = 0.5, β = 0.3): level/trend recursion over the daily
# value series seeded with l₀ = y₀, b₀ = y₁ − y₀, plus 1-day and
# 7-day-ahead forecasts ŷ_{T+h} = l_T + h·b_T — the forecasting
# companion to q260's EWMA (level only) and q279's trend estimators
# (global slope; Holt adapts to recent slope changes).
# Scale shape: ONE (type, day) reduce; the recursion is a pinned
# LEFT-TO-RIGHT fold over the per-type sorted daily array (Spark
# ``aggregate`` with an [level, trend] array accumulator / DuckDB
# ``list_reduce`` with a 2-double list accumulator over singleton-list
# elements) — both engines execute the identical IEEE op sequence, so
# level/trend/forecasts are bit-identical by construction (the
# q254/q260 fold policy). Series of length 1 emit NULL trend/forecasts.
# ---------------------------------------------------------------------------
HOLT_ALPHA, HOLT_BETA = 0.5, 0.3
HOLT_H1, HOLT_H7 = 1, 7


def q280_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum("value").alias("y"))
    )
    arrs = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("ys")
    )
    n = F.size("ys")
    al, be = F.lit(HOLT_ALPHA), F.lit(HOLT_BETA)
    init = F.array(
        F.element_at("ys", 1),
        F.element_at("ys", 2) - F.element_at("ys", 1),
    )

    def lnew(acc, y):
        return al * y + (F.lit(1.0) - al) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )

    acc = F.aggregate(
        F.slice("ys", 3, F.greatest(n - 2, F.lit(0))),
        init,
        lambda acc, y: F.array(
            lnew(acc, y),
            be * (lnew(acc, y) - F.element_at(acc, 1))
            + (F.lit(1.0) - be) * F.element_at(acc, 2),
        ),
    )
    guarded = F.when(n >= 2, acc)
    return arrs.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.element_at(guarded, 1).alias("level"),
        F.element_at(guarded, 2).alias("trend"),
        (
            F.element_at(guarded, 1) + F.lit(float(HOLT_H1)) * F.element_at(guarded, 2)
        ).alias("fc_1d"),
        (
            F.element_at(guarded, 1) + F.lit(float(HOLT_H7)) * F.element_at(guarded, 2)
        ).alias("fc_7d"),
    ).orderBy("event_type")


Q280_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, sum(value) AS y
  FROM events GROUP BY 1, 2
),
arrs AS (
  SELECT event_type, list(y ORDER BY d) AS ys FROM daily GROUP BY 1
),
folded AS (
  SELECT event_type, len(ys) AS n,
         CASE WHEN len(ys) >= 2 THEN
           list_reduce(
             list_prepend([ys[1], ys[2] - ys[1]],
                          list_transform(ys[3:], x -> [x])),
             (acc, e) -> [
               {HOLT_ALPHA} * e[1] + {1.0 - HOLT_ALPHA} * (acc[1] + acc[2]),
               {HOLT_BETA} * (({HOLT_ALPHA} * e[1]
                               + {1.0 - HOLT_ALPHA} * (acc[1] + acc[2]))
                              - acc[1])
                 + {1.0 - HOLT_BETA} * acc[2]
             ])
         END AS acc
  FROM arrs
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       acc[1] AS level,
       acc[2] AS trend,
       acc[1] + {float(HOLT_H1)} * acc[2] AS fc_1d,
       acc[1] + {float(HOLT_H7)} * acc[2] AS fc_7d
FROM folded
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q303 — sequential pattern mining (window co-occurrence): for every
# ordered event-type pair (a -> b), how often does a user perform b
# within SEQ_WINDOW of a (NOT necessarily adjacent — q156's Markov
# counts see only consecutive pairs; funnels with interleaved noise
# need the windowed count). Support = share of all users exhibiting
# the pattern. Plan (r15 rewrite, VERDICT r14 item 6): the r10 shape
# joined on user_id alone with the time predicate applied POST-join —
# per-user quadratic, and the events decade (user domain fixed, so
# events/user grows 10x) measured it at tail alpha 2.06 / 152 s. Now
# the join is RANGE-LOCAL per (user, hour-bucket): with the window
# equal to one bucket width, a true pair's buckets differ by at most
# one, so the `a` side probes exactly two keys (its bucket and the
# next — explode of a 2-element array) and the equi-join key becomes
# (user_id, bucket). The bucket pairing is a strict SUPERSET of the
# window pairs and the original predicate still applies — output
# identical (oracle unchanged) — but pair work drops from
# O(events_per_user^2) to O(events_per_adjacent-bucket-span^2):
# linear in rows for any bounded event rate per user-hour. Decade
# re-measured after the rewrite: 151.8 s -> see SCALING.md.
# Strict ordering ties: (ts, event_id) lexicographic, so self-pairs
# and simultaneous events resolve identically on both engines.
# In-plan scale guard (q221/q288 discipline): the quadratic term is
# now the largest (user, bucket) block, so the broadcast assert_true
# caps THAT — a whale user-hour fails LOUDLY instead of silently
# going quadratic; the remedy is a finer bucket (minutes) with the
# same 2-key probe.
# ---------------------------------------------------------------------------
SEQ_WINDOW_MIN = 60  # minutes
SEQ_BUCKET_SEC = SEQ_WINDOW_MIN * 60  # bucket == window: 2-key probe
SEQ_BUCKET_CAP = 100_000  # max events per (user, bucket) block


def q303_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn(
        "bkt", F.floor(F.col("ts").cast("long") / SEQ_BUCKET_SEC)
    )
    guard = ev.groupBy("user_id", "bkt").agg(
        F.count(F.lit(1)).alias("_g")
    ).agg(F.max("_g").alias("_gmax"))
    ev = ev.crossJoin(F.broadcast(guard)).where(
        F.assert_true(
            F.col("_gmax") <= SEQ_BUCKET_CAP,
            F.lit(
                "q303: (user, hour-bucket) block exceeds pair-join cap"
                " — shrink SEQ_BUCKET_SEC (same 2-key probe)"
            ),
        ).isNull()
    ).drop("_gmax")
    total_users = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("_u")
    )
    # the `a` side probes its own bucket and the next: a true pair
    # (t1 < t2 <= t1 + window) has bucket(t2) in {bucket(t1),
    # bucket(t1)+1} because window == bucket width
    a = ev.select(
        "user_id",
        F.col("ts").alias("t1"),
        F.col("event_id").alias("e1"),
        F.col("event_type").alias("from_type"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("bp"),
    )
    b = ev.select(
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("t2"),
        F.col("event_id").alias("e2"),
        F.col("event_type").alias("to_type"),
        F.col("bkt").alias("b2"),
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("user_b"))
        & (F.col("bp") == F.col("b2")),
    ).where(
        (
            (F.col("t2") > F.col("t1"))
            | ((F.col("t2") == F.col("t1")) & (F.col("e2") > F.col("e1")))
        )
        & (
            F.col("t2")
            <= F.col("t1") + F.expr(f"INTERVAL {SEQ_WINDOW_MIN} MINUTES")
        )
    )
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .crossJoin(F.broadcast(total_users))
        .select(
            "from_type",
            "to_type",
            "n_occurrences",
            "n_users",
            (F.col("n_users").cast("double") / F.col("_u").cast("double")).alias(
                "support"
            ),
        )
        .orderBy("from_type", "to_type")
    )


Q303_SQL = f"""
WITH tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS _u FROM events),
pairs AS (
  SELECT a.user_id, a.event_type AS from_type, b.event_type AS to_type
  FROM events a JOIN events b ON a.user_id = b.user_id
  WHERE (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
    AND b.ts <= a.ts + INTERVAL {SEQ_WINDOW_MIN} MINUTE
)
SELECT from_type, to_type,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT user_id) AS DOUBLE) / CAST(_u AS DOUBLE)
         AS support
FROM pairs, tot
GROUP BY from_type, to_type, _u
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# q309 — position-based (U-shaped) multi-touch attribution: for each
# purchase, the user's non-purchase events in the preceding 7 days
# form the journey; credit 40% to the first touch, 40% to the last,
# 20% split across the middles (100% / 50-50 for 1- and 2-touch
# journeys). The multi-touch companion to q180's last-touch and
# q124's stream-join attribution. All credits are exact rationals
# from integer positions — no model state.
# Plan: purchases range-join their trailing window on user_id (one
# shuffle; span-bounded per user-week), ONE window pass per journey
# for position + size, then a 4-row channel rollup.
# ---------------------------------------------------------------------------
ATTRIB_WINDOW_DAYS = 7


def q309_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    j = pur.join(touch, "user_id").where(
        (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
        )
    )
    w = Window.partitionBy("user_id", "p_id").orderBy("t_ts", "t_id")
    wall = Window.partitionBy("user_id", "p_id")
    pos = j.select(
        "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rn") == 1, F.lit(0.4))
        .when(F.col("rn") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2).cast("double"))
    )
    tot = pos.agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
    return (
        pos.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(credit).alias("credit"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_touches",
            F.round("credit", 4).alias("credit"),
            (F.col("n_touches").cast("double") / F.col("_t").cast("double")).alias(
                "touch_share"
            ),
        )
        .orderBy("channel")
    )


Q309_SQL = f"""
WITH pur AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
  WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel
  FROM events WHERE event_type != 'purchase'
),
j AS (
  SELECT p.user_id, p.p_id, t.channel, t.t_ts, t.t_id
  FROM pur p JOIN touch t ON p.user_id = t.user_id
  WHERE t.t_ts < p.p_ts
    AND t.t_ts >= p.p_ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
),
pos AS (
  SELECT channel,
         row_number() OVER (PARTITION BY user_id, p_id
                            ORDER BY t_ts, t_id) AS rn,
         count(*) OVER (PARTITION BY user_id, p_id) AS n
  FROM j
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS _t FROM pos)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       round(sum(CASE WHEN n = 1 THEN 1.0
                      WHEN n = 2 THEN 0.5
                      WHEN rn = 1 THEN 0.4
                      WHEN rn = n THEN 0.4
                      ELSE 0.2 / CAST(n - 2 AS DOUBLE) END), 4) AS credit,
       CAST(count(*) AS DOUBLE) / CAST(_t AS DOUBLE) AS touch_share
FROM pos, tot
GROUP BY channel, _t
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# q313 — forecast holdout evaluation: hold out each event type's LAST
# day of daily value sums and score three baseline forecasters on it —
# naive (last training day), seasonal-naive (same weekday last week),
# drift (last + (last-first)/(n-1)). The eval harness q280's Holt
# forecasts plug into; a Holt model that cannot beat these baselines
# is not a model. Errors are |pred - actual| exact-ish doubles (daily
# sums of 2-dp values; one subtraction/division per forecaster).
# Scale: ONE (type, day) row-scale reduce, checkpointed (q256
# discipline); all train/test logic on the bounded daily frame.
# ---------------------------------------------------------------------------
def q313_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date("ts").alias("d")
        )
        .agg(F.round(F.sum("value"), 4).alias("v"))
        .localCheckpoint()
    )
    w = Window.partitionBy("event_type").orderBy("d")
    wall = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "d",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    test = seq.where(F.col("rn") == F.col("n")).select(
        "event_type",
        F.col("d").alias("test_day"),
        F.col("v").alias("actual"),
        (F.col("n") - 1).alias("n_train"),
    )
    train = seq.where(F.col("rn") < F.col("n"))
    feats = train.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.col("n") - 1, F.col("v"))).alias(
            "last_v"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("v"))).alias("first_v"),
        F.max(F.when(F.col("rn") == F.col("n") - 7, F.col("v"))).alias(
            "snaive_v"
        ),
        F.max(F.col("n") - 1).alias("m"),
    )
    j = test.join(feats, "event_type")
    drift = F.col("last_v") + (F.col("last_v") - F.col("first_v")) / (
        F.col("m") - 1
    ).cast("double")
    return j.select(
        "event_type",
        F.date_format("test_day", "yyyy-MM-dd").alias("test_day"),
        "actual",
        F.col("last_v").alias("naive_pred"),
        F.col("snaive_v").alias("snaive_pred"),
        F.round(drift, 4).alias("drift_pred"),
        F.round(F.abs(F.col("actual") - F.col("last_v")), 4).alias(
            "naive_abs_err"
        ),
        F.round(F.abs(F.col("actual") - F.col("snaive_v")), 4).alias(
            "snaive_abs_err"
        ),
        F.round(F.abs(F.col("actual") - drift), 4).alias("drift_abs_err"),
    ).orderBy("event_type")


Q313_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
seq AS (
  SELECT event_type, d, v,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
test AS (
  SELECT event_type, d AS test_day, v AS actual, n - 1 AS n_train
  FROM seq WHERE rn = n
),
feats AS (
  SELECT event_type,
         max(CASE WHEN rn = n - 1 THEN v END) AS last_v,
         max(CASE WHEN rn = 1 THEN v END) AS first_v,
         max(CASE WHEN rn = n - 7 THEN v END) AS snaive_v,
         max(n - 1) AS m
  FROM seq WHERE rn < n GROUP BY event_type
)
SELECT t.event_type, strftime(t.test_day, '%Y-%m-%d') AS test_day, t.actual,
       f.last_v AS naive_pred,
       f.snaive_v AS snaive_pred,
       round(f.last_v + (f.last_v - f.first_v) / CAST(f.m - 1 AS DOUBLE), 4)
         AS drift_pred,
       round(abs(t.actual - f.last_v), 4) AS naive_abs_err,
       round(abs(t.actual - f.snaive_v), 4) AS snaive_abs_err,
       round(abs(t.actual - (f.last_v + (f.last_v - f.first_v)
                             / CAST(f.m - 1 AS DOUBLE))), 4)
         AS drift_abs_err
FROM test t JOIN feats f USING (event_type)
ORDER BY t.event_type
"""


# ---------------------------------------------------------------------------
# q318 — top-k popularity drift: the revenue top-20 parts of the first
# half of the observed shipdate range vs the second half — overlap
# count, Jaccard, and each half's churn-in list size. The "is last
# month's hot set still hot" stability readout behind cache sizing
# (q315) and curriculum refresh cadence. Revenue per (half, part) is
# rounded to 4 dp BEFORE ranking: the addends are exactly-4-dp
# decimals (2-dp price x 4-dp discount factor), so fp summation drift
# (~1e-10) can never move a 4-dp rounding — ranks are cross-engine
# exact with the partkey tie-break.
# Scale: one (half, part) row-scale agg; two WindowGroupLimit top-20
# frames; the compare is a 40-row join.
# ---------------------------------------------------------------------------
TOPK_DRIFT_K = 20


def q318_topk_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    rng = li.agg(
        F.min("l_shipdate").alias("d0"), F.max("l_shipdate").alias("d1")
    )
    half = li.crossJoin(F.broadcast(rng)).select(
        "l_partkey",
        "rev",
        F.when(
            F.datediff("l_shipdate", "d0") * 2
            <= F.datediff("d1", "d0"),
            F.lit("h1"),
        )
        .otherwise(F.lit("h2"))
        .alias("half"),
    )
    per = half.groupBy("half", "l_partkey").agg(
        F.round(F.sum("rev"), 4).alias("rev")
    )
    w = Window.partitionBy("half").orderBy(F.col("rev").desc(), "l_partkey")
    topk = per.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= TOPK_DRIFT_K
    )
    h1 = topk.where(F.col("half") == "h1").select(
        F.col("l_partkey").alias("pk")
    )
    h2 = topk.where(F.col("half") == "h2").select(
        F.col("l_partkey").alias("pk")
    )
    common = h1.join(h2, "pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    k = TOPK_DRIFT_K
    return common.select(
        F.lit(k).cast("bigint").alias("k"),
        "n_common",
        (
            F.col("n_common").cast("double")
            / (F.lit(2 * k) - F.col("n_common")).cast("double")
        ).alias("jaccard"),
        (F.lit(k) - F.col("n_common")).cast("bigint").alias("churned"),
    )


Q318_SQL = f"""
WITH li AS (
  SELECT l_partkey, l_shipdate,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
),
rng AS (SELECT min(l_shipdate) AS d0, max(l_shipdate) AS d1 FROM li),
half AS (
  SELECT l_partkey, rev,
         CASE WHEN date_diff('day', d0, l_shipdate) * 2
                   <= date_diff('day', d0, d1)
              THEN 'h1' ELSE 'h2' END AS half
  FROM li, rng
),
per AS (
  SELECT half, l_partkey, round(sum(rev), 4) AS rev
  FROM half GROUP BY half, l_partkey
),
topk AS (
  SELECT half, l_partkey
  FROM (SELECT *, row_number() OVER (PARTITION BY half
                                     ORDER BY rev DESC, l_partkey) AS rk
        FROM per)
  WHERE rk <= {TOPK_DRIFT_K}
),
common AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM topk a JOIN topk b
    ON a.l_partkey = b.l_partkey AND a.half = 'h1' AND b.half = 'h2'
)
SELECT CAST({TOPK_DRIFT_K} AS BIGINT) AS k,
       n_common,
       CAST(n_common AS DOUBLE)
         / CAST({2 * TOPK_DRIFT_K} - n_common AS DOUBLE) AS jaccard,
       CAST({TOPK_DRIFT_K} - n_common AS BIGINT) AS churned
FROM common
"""


QUERIES = {
    "q343_watermark_sweep": q343_watermark_sweep,
    "q303_seq_patterns": q303_seq_patterns,
    "q309_position_attribution": q309_position_attribution,
    "q313_forecast_eval": q313_forecast_eval,
    "q318_topk_drift": q318_topk_drift,
    "q58_asof_join": q58_asof_join,
    "q254_survival_retention": q254_survival_retention,
    "q256_acf": q256_acf,
    "q257_change_point": q257_change_point,
    "q260_ewma_smoothing": q260_ewma_smoothing,
    "q261_cohort_ltv": q261_cohort_ltv,
    "q262_session_threshold_advisor": q262_session_threshold_advisor,
    "q269_hourweek_fingerprint": q269_hourweek_fingerprint,
    "q271_lead_lag_xcorr": q271_lead_lag_xcorr,
    "q273_seasonal_decompose": q273_seasonal_decompose,
    "q279_theil_sen": q279_theil_sen,
    "q280_holt_forecast": q280_holt_forecast,
    "q59_range_join": q59_range_join,
    "q106_sessionize": q106_sessionize,
    "q107_retention_cohorts": q107_retention_cohorts,
    "q122_scd2_dimension": q122_scd2_dimension,
    "q125_time_rollup": q125_time_rollup,
    "q140_pergroup_trend": q140_pergroup_trend,
    "q141_incremental_agg": q141_incremental_agg,
    "q142_event_bitmask": q142_event_bitmask,
    "q147_late_arrival_profile": q147_late_arrival_profile,
    "q149_gap_fill": q149_gap_fill,
    "q156_event_transitions": q156_event_transitions,
    "q160_decayed_engagement": q160_decayed_engagement,
    "q167_wow_trend": q167_wow_trend,
    "q171_burstiness": q171_burstiness,
    "q180_last_touch": q180_last_touch,
    "q195_session_paths": q195_session_paths,
    "q199_rate_limit": q199_rate_limit,
    "q205_seasonality": q205_seasonality,
    "q207_asof_tolerance": q207_asof_tolerance,
    "q212_join_ivm": q212_join_ivm,
    "q216_rolling_distinct": q216_rolling_distinct,
    "q222_interval_union": q222_interval_union,
    "q73_temporal_split": q73_temporal_split,
    "q231_ohlc_bars": q231_ohlc_bars,
    "q233_range_frame_ma": q233_range_frame_ma,
    "q238_gaps_islands": q238_gaps_islands,
    "q241_interpolation_join": q241_interpolation_join,
    "q244_run_length": q244_run_length,
    "q247_records_drawdown": q247_records_drawdown,
}

ORACLE = {
    "q303_seq_patterns": Q303_SQL,
    "q309_position_attribution": Q309_SQL,
    "q313_forecast_eval": Q313_SQL,
    "q318_topk_drift": Q318_SQL,
    "q216_rolling_distinct": Q216_SQL,
    "q222_interval_union": Q222_SQL,
    "q73_temporal_split": Q73_SQL,
    "q231_ohlc_bars": Q231_SQL,
    "q233_range_frame_ma": Q233_SQL,
    "q238_gaps_islands": Q238_SQL,
    "q241_interpolation_join": Q241_SQL,
    "q244_run_length": Q244_SQL,
    "q247_records_drawdown": Q247_SQL,
    "q58_asof_join": Q58_SQL,
    "q254_survival_retention": Q254_SQL,
    "q256_acf": Q256_SQL,
    "q257_change_point": Q257_SQL,
    "q260_ewma_smoothing": Q260_SQL,
    "q261_cohort_ltv": Q261_SQL,
    "q262_session_threshold_advisor": Q262_SQL,
    "q269_hourweek_fingerprint": Q269_SQL,
    "q271_lead_lag_xcorr": Q271_SQL,
    "q273_seasonal_decompose": Q273_SQL,
    "q279_theil_sen": Q279_SQL,
    "q280_holt_forecast": Q280_SQL,
    "q59_range_join": Q59_SQL,
    "q106_sessionize": Q106_SQL,
    "q107_retention_cohorts": Q107_SQL,
    "q122_scd2_dimension": Q122_SQL,
    "q125_time_rollup": Q125_SQL,
    "q140_pergroup_trend": Q140_SQL,
    "q141_incremental_agg": Q141_SQL,
    "q142_event_bitmask": Q142_SQL,
    "q147_late_arrival_profile": Q147_SQL,
    "q343_watermark_sweep": Q343_SQL,
    "q149_gap_fill": Q149_SQL,
    "q156_event_transitions": Q156_SQL,
    "q160_decayed_engagement": Q160_SQL,
    "q167_wow_trend": Q167_SQL,
    "q171_burstiness": Q171_SQL,
    "q180_last_touch": Q180_SQL,
    "q195_session_paths": Q195_SQL,
    "q199_rate_limit": Q199_SQL,
    "q205_seasonality": Q205_SQL,
    "q207_asof_tolerance": Q207_SQL,
    "q212_join_ivm": Q212_SQL,
}
