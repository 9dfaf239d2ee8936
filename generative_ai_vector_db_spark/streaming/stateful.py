"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for operators Structured Streaming lacks natively
(SURVEY §4.2 row "custom Catalyst rules: none needed" — custom STATE,
not custom plans).

Implemented operator: per-user running profile — event count, running
value sum, and a high-water mark, emitted once per micro-batch per
active user. This is the streaming face of the reference's per-user
metadata accounting (R12/R30 shapes) and the shape a 100 TB pipeline
uses for per-key online aggregates that don't fit a windowed agg
(monotonic counters, last-seen state, dedup caches).

Scale: state lives in the state store keyed by user_id — O(active keys)
per partition, incremental checkpoints; timeouts (GroupStateTimeout)
bound state growth. The batch twin (``profile_batch_twin``) is the
deterministic equivalent used for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..tables import load


def _ts_ns(s: pd.Series) -> pd.Series:
    """Epoch nanoseconds, with the unit ENFORCED: under Arrow/pandas
    configs that surface datetime64[us] a raw ``astype('int64')`` view
    would already be microseconds and downstream ``// 1_000`` divisions
    would silently yield the wrong unit — normalize to ns first."""
    return s.astype("datetime64[ns]").astype("int64")

PROFILE_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [round(mx, 4)],
        }
    )


def run_profile_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "profile_out"
) -> None:
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
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def profile_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch equivalent: final per-user profile."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Spark 4 successor API: transformWithStateInPandas. Same per-user
# profile through a StatefulProcessor with an explicit ValueState —
# the forward path for custom state (typed state vars, timers, TTL,
# initial-state bootstrap) replacing applyInPandasWithState.
#
# Environment gate: the TWS Python runner requires google.protobuf in
# the worker environment and the RocksDB state-store provider; where protobuf is
# absent the stream fails at runner init — callers (and the test) treat
# that as "API unavailable here" and fall back to
# run_profile_stream/applyInPandasWithState, which carries the
# correctness contract.
# ---------------------------------------------------------------------------
def _profile_processor():
    from pyspark.sql.streaming import StatefulProcessor

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mx = self._state.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [round(mx, 4)],
                }
            )

        def close(self) -> None:
            pass

    return ProfileProcessor()


def run_profile_stream_tws(
    spark: SparkSession, src_dir: str, sink_table: str = "profile_tws_out"
) -> None:
    """transformWithStateInPandas execution of the per-user profile.
    Requires the RocksDB state store (TWS rejects the HDFS-backed
    provider) — set per-session before the query starts."""
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
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_profile_processor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q163 — keyed state with TTL: the per-user profile again, but state
# EXPIRES after STATE_TTL_S of event-time inactivity — the cache/
# feature-store semantic ("a user idle for 2h starts fresh") that
# bounds state size on an unbounded key space. The streaming face
# (`run_profile_stream_ttl`) applies the TTL inside the state update
# by event time, so the result is deterministic under any micro-batch
# partitioning whose triggers cover contiguous time ranges (replay-
# stable — wall-clock timeouts are not). The batch twin below is the
# oracle-checked semantics: gaps > TTL split a user's history into
# state generations; the emitted profile is the LIVE (last) generation
# plus how many expiries preceded it.
#
# Scale: one shuffle on user_id, both window passes share the
# partitioning; the streaming path holds O(active users) state and the
# TTL is exactly what keeps "active" bounded at 100 TB/day.
# ---------------------------------------------------------------------------
STATE_TTL_S = 7200  # 2h event-time TTL (2x SESSION_GAP — coarser than q106)


def q163_state_ttl_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    prev = F.lag(secs).over(w)
    reset = F.when((secs - prev) > STATE_TTL_S, F.lit(1)).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gens = ev.select(
        "user_id", "event_id", "ts", "value", reset.alias("reset")
    ).withColumn("gen", F.sum("reset").over(cum).cast("bigint"))
    per_gen = gens.groupBy("user_id", "gen").agg(
        F.count(F.lit(1)).cast("bigint").alias("live_n_events"),
        # decimal accumulation: order-independent and exact (q71 pattern)
        F.round(
            F.sum(F.round("value", 8).cast("decimal(27,8)")).cast("double"), 4
        ).alias("live_total"),
        F.max("ts").alias("last_seen"),
    )
    live = per_gen.withColumn(
        "_mg", F.max("gen").over(Window.partitionBy("user_id"))
    ).where(F.col("gen") == F.col("_mg"))
    return live.select(
        "user_id",
        F.col("gen").alias("n_expiries"),
        "live_n_events",
        "live_total",
        "last_seen",
    ).orderBy("user_id")


Q163_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN date_diff('second', lag(ts) OVER w, ts) > {STATE_TTL_S}
              THEN 1 ELSE 0 END AS reset
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
gens AS (
  SELECT user_id, ts, value,
         CAST(sum(reset) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gen
  FROM marked
),
per_gen AS (
  SELECT user_id, gen,
         CAST(count(*) AS BIGINT) AS live_n_events,
         round(CAST(sum(CAST(round(value, 8) AS DECIMAL(27,8))) AS DOUBLE), 4)
             AS live_total,
         max(ts) AS last_seen
  FROM gens GROUP BY user_id, gen
)
SELECT user_id, gen AS n_expiries, live_n_events, live_total, last_seen
FROM (SELECT *, max(gen) OVER (PARTITION BY user_id) AS mg FROM per_gen)
WHERE gen = mg
ORDER BY user_id
"""


TTL_SCHEMA = (
    "user_id bigint, n_expiries bigint, live_n_events bigint, "
    "live_total double, last_seen timestamp"
)
TTL_STATE_SCHEMA = "expiries bigint, n bigint, total double, last_us bigint"


def _update_profile_ttl(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        expiries, n, total, last_us = state.get
    else:
        expiries, n, total, last_us = 0, 0, 0.0, None
    rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    for ts, value in zip(rows["ts"], rows["value"]):
        us = int(ts.value // 1_000)  # pandas ns -> us
        if last_us is not None and (us - last_us) > STATE_TTL_S * 1_000_000:
            expiries, n, total = expiries + 1, 0, 0.0
        n += 1
        total += round(float(value), 8)
        last_us = us
    state.update((expiries, n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_expiries": [expiries],
            "live_n_events": [n],
            "live_total": [round(total, 4)],
            "last_seen": [pd.Timestamp(last_us * 1_000)],
        }
    )


def run_profile_stream_ttl(
    spark: SparkSession, src_dir: str, sink_table: str = "profile_ttl_out"
) -> None:
    """Streaming face of q163: TTL applied by EVENT time inside the
    state update (replay-deterministic), state keyed per user."""
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
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile_ttl,
        outputStructType=TTL_SCHEMA,
        stateStructType=TTL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Streaming face of q199's rate limiter: per-user rolling 1-hour event
# counts maintained in keyed state via applyInPandasWithState. The
# state is the timestamp buffer TRIMMED to the trailing horizon (the
# only part future events can still range over), so state size per key
# is bounded by one user's 1-hour burst, not the stream's lifetime —
# the same bounded-state discipline as the q163 TTL profile and
# run_debounce_stream. Events are processed in event-time order within
# the handler (sorted seconds, tie groups applied atomically — a
# RANGE frame includes same-second peers), so with in-order delivery
# per batch the emitted breach/max-rate totals equal q199's batch
# RANGE-window semantics exactly — asserted by the equivalence test.
# Across micro-batches order is NOT assumed: late seconds are merged
# by sorted insert; ones older than the trimmed horizon are counted
# but excluded from rate scoring, and in-horizon late seconds are
# scored against the RETAINED buffer only — context already trimmed
# by a later max is gone, so their rate can undercount vs the q199
# batch twin (pinned by test_update_rate_out_of_order_batches).
# ---------------------------------------------------------------------------
RATE_SCHEMA = (
    "user_id bigint, n_events bigint, max_rate_1h bigint, n_breaches bigint"
)
RATE_STATE_SCHEMA = "secs array<bigint>, n bigint, mx bigint, br bigint"
_RATE_WINDOW = 3600
_RATE_QUOTA = 3


def _update_rate(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import bisect

    (user_id,) = key
    if state.exists:
        secs, n, mx, br = state.get
        secs = list(secs)
    else:
        secs, n, mx, br = [], 0, 0, 0
    rows = []
    for pdf in batches:
        sec = (_ts_ns(pdf["ts"]) // 1_000_000_000).tolist()
        rows.extend(sec)
    rows.sort()
    # process per distinct second: a RANGE frame includes same-second
    # PEERS (rows after this one at the same truncated second), so
    # every tied event must see the rate AFTER all ties are appended —
    # a per-event prefix count would undercount breaches whenever a
    # tie group straddles the quota
    #
    # Cross-batch ordering is NOT assumed (round-5 advice): a later
    # micro-batch may deliver an earlier timestamp. Seconds are merged
    # into the state buffer with a sorted INSERT (never a blind
    # append, which silently unsorted the buffer and made every later
    # bisect trim the wrong prefix), and a late second older than the
    # retained horizon — whose window context was already trimmed — is
    # counted in n_events but EXPLICITLY excluded from rate/breach
    # math rather than scored against a half-empty buffer. An
    # in-horizon late second IS scored, but only against the retained
    # buffer: entries trimmed by an already-seen later max are lost,
    # so its rate is a lower bound on the batch-twin value.
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j] == rows[i]:
            j += 1
        sec, ties = rows[i], j - i
        n += ties
        if secs and sec < secs[-1] - (_RATE_WINDOW - 1):
            i = j
            continue  # late beyond the trimmed horizon — drop from rate
        idx = bisect.bisect_right(secs, sec)
        secs[idx:idx] = [sec] * ties
        if sec >= secs[-1]:  # new (or tied) max — advance the horizon
            lo = bisect.bisect_left(secs, sec - (_RATE_WINDOW - 1))
            if lo:
                secs = secs[lo:]  # trim — bounded state per key
        rate = bisect.bisect_right(secs, sec) - bisect.bisect_left(
            secs, sec - (_RATE_WINDOW - 1)
        )
        mx = max(mx, rate)
        br += ties if rate > _RATE_QUOTA else 0
        i = j
    # Sortedness is a test-time invariant (test_update_rate_out_of_
    # order_batches); in the hot path we self-heal rather than assert —
    # an executor-side assert vanishes under `python -O` and would
    # kill the whole streaming query if it ever fired.
    if any(secs[k] > secs[k + 1] for k in range(len(secs) - 1)):
        secs.sort()
    state.update((secs, n, mx, br))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "max_rate_1h": [mx],
            "n_breaches": [br],
        }
    )


def run_rate_limit_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "rate_out"
) -> None:
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
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_rate,
        outputStructType=RATE_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q222 streaming face — stateful interval-union "uptime tracker": each
# event opens a fixed activity interval; the state is ONLY the open
# island (cur_start, cur_end) plus two running totals — O(1) per key,
# the streaming shape of q222's batch gaps-and-islands merge (uptime
# from heartbeats without retaining the heartbeats).
# Semantics match the batch twin exactly under in-order per-user
# delivery (same strict `s > cur_end` island boundary; a within-batch
# sort handles intra-batch disorder). Across micro-batches a late
# event BEFORE the open island's start cannot reopen already-closed
# islands — its coverage contribution is dropped (counted in neither
# covered_us nor islands), so the streamed totals are a LOWER bound
# vs the batch twin, the same retained-horizon policy as _update_rate
# above; pinned by test_update_uptime_out_of_order_batches.
# ---------------------------------------------------------------------------
UPTIME_SCHEMA = "user_id bigint, n_islands bigint, covered_us bigint"
UPTIME_STATE_SCHEMA = (
    "cur_s bigint, cur_e bigint, covered bigint, islands bigint"
)
UPTIME_DUR_US = 300_000_000  # keep in lockstep with temporal.IVL_DUR_US


def _update_uptime(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cur_s, cur_e, covered, islands = state.get
    else:
        cur_s, cur_e, covered, islands = -1, -1, 0, 0
    starts: list[int] = []
    for pdf in batches:
        starts.extend((_ts_ns(pdf["ts"]) // 1_000).tolist())
    starts.sort()
    for s in starts:
        e = s + UPTIME_DUR_US
        if cur_s < 0:
            cur_s, cur_e, islands = s, e, islands + 1
        elif s > cur_e:  # strict: s == cur_e joins the island (batch twin)
            covered += cur_e - cur_s
            cur_s, cur_e, islands = s, e, islands + 1
        elif s >= cur_s:
            cur_e = max(cur_e, e)
        # else: late before the open island — closed islands are gone;
        # dropped from coverage (lower bound, see header comment)
    state.update((cur_s, cur_e, covered, islands))
    total = covered + (cur_e - cur_s if cur_s >= 0 else 0)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_islands": [islands],
            "covered_us": [total],
        }
    )


def run_uptime_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "uptime_out"
) -> None:
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
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_uptime,
        outputStructType=UPTIME_SCHEMA,
        stateStructType=UPTIME_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# q244's streaming face — run-length compaction as per-user state.
# State = the OPEN run (type + length) plus per-type accumulators for
# closed runs (parallel arrays — applyInPandasWithState state structs
# are fixed-schema, so the per-type "map" is (types[], n_runs[],
# n_events[], max_run[])). Each batch: sort the user's new events by
# (ts, event_id), extend or close the open run, emit the CURRENT
# per-type totals WITH the open run folded in — so after the final
# batch the emission equals the batch operator's per-(user, type) run
# profile exactly (asserted in tests/test_scale_stateful.py by
# aggregating the last emission per user to q244's output). In-order
# per-user delivery assumed, same contract as _update_uptime above.
# ---------------------------------------------------------------------------
RUNLEN_SCHEMA = (
    "user_id bigint, event_type string, n_runs bigint, "
    "n_events bigint, max_run bigint"
)
RUNLEN_STATE_SCHEMA = (
    "cur_type string, cur_len bigint, types array<string>, "
    "n_runs array<bigint>, n_events array<bigint>, max_run array<bigint>"
)


def _update_runlen(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cur_type, cur_len, types, n_runs, n_events, max_run = state.get
        types, n_runs = list(types), list(n_runs)
        n_events, max_run = list(n_events), list(max_run)
    else:
        cur_type, cur_len = None, 0
        types, n_runs, n_events, max_run = [], [], [], []

    def _close(t: str, ln: int) -> None:
        if t not in types:
            types.append(t)
            n_runs.append(0)
            n_events.append(0)
            max_run.append(0)
        i = types.index(t)
        n_runs[i] += 1
        n_events[i] += ln
        max_run[i] = max(max_run[i], ln)

    # collect ALL Arrow chunks first, then ONE global (ts, event_id)
    # sort — same pattern as _update_profile. Sorting each chunk
    # independently and concatenating in arrival order (r8 version)
    # breaks run boundaries when a user's events split out-of-order
    # across chunk boundaries (ADVICE r8).
    chunks = list(batches)
    if chunks:
        allpdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        rows = allpdf["event_type"].tolist()
    else:
        rows = []
    for et in rows:
        if et == cur_type:
            cur_len += 1
        else:
            if cur_type is not None:
                _close(cur_type, cur_len)
            cur_type, cur_len = et, 1
    state.update((cur_type, cur_len, types, n_runs, n_events, max_run))
    # emission folds the open run in WITHOUT closing it in state
    out_t, out_r, out_e, out_m = (
        list(types),
        list(n_runs),
        list(n_events),
        list(max_run),
    )
    if cur_type is not None:
        if cur_type not in out_t:
            out_t.append(cur_type)
            out_r.append(0)
            out_e.append(0)
            out_m.append(0)
        i = out_t.index(cur_type)
        out_r[i] += 1
        out_e[i] += cur_len
        out_m[i] = max(out_m[i], cur_len)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_t),
            "event_type": out_t,
            "n_runs": out_r,
            "n_events": out_e,
            "max_run": out_m,
        }
    )


def run_runlen_stream(
    spark: SparkSession, src_dir: str, sink_table: str = "runlen_out"
) -> None:
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
    ev = spark.readStream.schema(schema).parquet(src_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_runlen,
        outputStructType=RUNLEN_SCHEMA,
        stateStructType=RUNLEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


QUERIES = {"q163_state_ttl_profile": q163_state_ttl_profile}
ORACLE = {"q163_state_ttl_profile": Q163_SQL}
