"""Properties of the shared two-lane portable hash
(functions/hashing.py) — pins the two round-5 advice defects closed:
the power-of-two bucket no-op and the id/id+M aliasing."""

from __future__ import annotations

import duckdb

from generative_ai_vector_db_spark.functions.hashing import (
    HASH_MOD,
    KNUTH1,
    PORTABLE_ID_MOD as M,
    mix_core_duck,
    mix_core_spark,
    mix_duck,
)


def _mix_py(i: int) -> int:
    from generative_ai_vector_db_spark.functions.hashing import KNUTH2

    return ((i % M) * KNUTH1 + ((i // M) % M) * KNUTH2) % HASH_MOD


def test_mix_breaks_million_apart_aliasing():
    """id and id + M must no longer collide (the old single-lane form
    had collision period M, correlating every ~1M-apart doc pair)."""
    ids = [0, 1, 7, 999_999, 12_345_678, 3_500_000_000, 2**62]
    for i in ids:
        assert _mix_py(i) != _mix_py(i + M)
        assert _mix_py(i) != _mix_py(i + 2 * M)


def test_mix_low_bits_not_residue_roundrobin():
    """bucket = mix(id) % 16 must NOT equal id % 16 systematically
    (KNUTH1 is ≡ 1 mod 16 — the old direct form was a no-op hash)."""
    assert KNUTH1 % 16 == 1  # the trap this module exists to dodge
    hits = sum(1 for i in range(4096) if _mix_py(i) % 16 == i % 16)
    # a real hash agrees ~1/16 of the time; the no-op agreed always
    assert hits < 4096 * 0.2


def test_mix_fits_int64_for_any_id():
    big = 2**63 - 1
    core = (big % M) * KNUTH1 + ((big // M) % M) * 2246822519
    assert core + 10_000_000 < 2**63  # salt headroom at call sites


def test_spark_and_duck_fragments_agree():
    """The two SQL dialect fragments compute the identical function —
    checked in DuckDB by rewriting the Spark `div` to `//`."""
    con = duckdb.connect()
    spark_as_duck = mix_core_spark("i").replace(" div ", " // ")
    rows = con.execute(
        f"SELECT i, ({spark_as_duck}) % {HASH_MOD} AS a, "
        f"{mix_duck('i')} AS b "
        "FROM (SELECT unnest([0, 1, 999999, 1000003, 123456789012, "
        "3500000000, 4611686018427387904]) AS i)"
    ).fetchall()
    for i, a, b in rows:
        assert a == b == _mix_py(i)


def test_mix_spread_over_power_of_two_buckets():
    """Sequential ids must spread across 16 buckets roughly uniformly
    (the planner's entire purpose: measure a hashed layout)."""
    from collections import Counter

    c = Counter(_mix_py(i) % 16 for i in range(16_000))
    assert len(c) == 16
    assert max(c.values()) < 1.25 * 1000
    assert min(c.values()) > 0.75 * 1000
