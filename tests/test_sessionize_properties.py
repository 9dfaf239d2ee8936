"""Hypothesis property tests for the gaps-and-islands sessionizer
(temporal.sessionize_events) against a brute-force Python reference on
random event streams — duplicate timestamps, single events, dense and
sparse gaps all included."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from generative_ai_vector_db_spark.operators.temporal import sessionize_events

GAP = 60  # seconds, small so random streams actually split


def _python_sessions(per_user: dict[int, list[int]], gap: int):
    """Brute-force reference: (user, seq) -> (n_events, duration)."""
    out = {}
    for user, ts_list in per_user.items():
        ordered = sorted(enumerate(ts_list), key=lambda p: (p[1], p[0]))
        seq, start, prev, n = 0, None, None, 0
        for _, t in ordered:
            if prev is None or (t - prev) > gap:
                if seq:
                    out[(user, seq)] = (n, prev - start)
                seq, start, n = seq + 1, t, 0
            n += 1
            prev = t
        out[(user, seq)] = (n, prev - start)
    return out


@settings(max_examples=20, deadline=None)
@given(
    data=st.dictionaries(
        keys=st.integers(0, 4),
        values=st.lists(st.integers(0, 10_000), min_size=1, max_size=25),
        min_size=1,
        max_size=5,
    )
)
def test_sessionize_matches_python_reference(spark, data):
    rows = []
    eid = 0
    for user, ts_list in data.items():
        for t in ts_list:
            rows.append(
                (eid, datetime.fromtimestamp(t, tz=timezone.utc), int(user))
            )
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = sessionize_events(ev, gap_sec=GAP).toPandas()
    want = _python_sessions(data, GAP)
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        n, dur = want[(r.user_id, r.session_seq)]
        assert r.n_events == n, (r, n)
        assert r.duration_sec == dur, (r, dur)
