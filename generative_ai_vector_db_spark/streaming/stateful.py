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
