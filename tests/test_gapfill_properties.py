"""Hypothesis property tests for the reusable gapfill+locf operator
(temporal.gap_fill) against a brute-force Python reference on random
sparse per-key series — single observations, duplicate-free dense runs
and long gaps all included."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from generative_ai_vector_db_spark.operators.temporal import gap_fill

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _python_locf(series: dict[int, dict[int, float]]):
    """Reference: for each key, densify hour offsets min..max and carry
    the last seen value forward. Returns {(key, offset): (v, locf)}."""
    out = {}
    for key, obs in series.items():
        lo, hi = min(obs), max(obs)
        carried = None
        for h in range(lo, hi + 1):
            v = obs.get(h)
            if v is not None:
                carried = v
            out[(key, h)] = (v, carried)
    return out


series_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=4),
    values=st.dictionaries(
        keys=st.integers(min_value=0, max_value=72),  # hour offsets
        values=st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(series=series_strategy)
def test_gap_fill_matches_python_reference(spark, series):
    rows = [
        (k, EPOCH.replace(tzinfo=None) + timedelta(hours=h), float(v))
        for k, obs in series.items()
        for h, v in obs.items()
    ]
    df = spark.createDataFrame(rows, "k bigint, hr timestamp, v double")
    got = {
        (r.k, int((r.hr - EPOCH.replace(tzinfo=None)).total_seconds() // 3600)): (
            r.v,
            r.locf,
        )
        for r in gap_fill(df, key="k", bucket="hr", value="v").collect()
    }
    want = _python_locf(series)
    assert set(got) == set(want), "spine mismatch"
    for kk in want:
        gv, gl = got[kk]
        wv, wl = want[kk]
        assert (gv is None) == (wv is None) and (
            gv is None or abs(gv - wv) < 1e-6
        ), f"observed value mismatch at {kk}"
        assert (gl is None) == (wl is None) and (
            gl is None or abs(gl - wl) < 1e-6
        ), f"locf mismatch at {kk}"
