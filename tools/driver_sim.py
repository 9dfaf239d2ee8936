"""Simulate the driver's correctness pass locally.

Runs every registry query at the driver's scale factor (sf0.01 by
default), executes its DuckDB oracle twin where one exists, and applies
the same canonicalization the local test mirror uses (columns sorted by
name, floats rounded to 4, rows sorted).  Reports one line per query so
a full pass can be eyeballed before the driver runs the real thing.

Usage:  python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--only q31,...]
        python tools/driver_sim.py --first 50     # driver's slot window
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import __spark_entry__ as entry  # noqa: E402
from oracle_utils import canonicalize, duck_connection  # noqa: E402

from generative_ai_vector_db_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--first", type=int, default=0)
    args = ap.parse_args()

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)
    if args.first:
        names = names[: args.first]
    if args.only:
        keys = [k.strip() for k in args.only.split(",") if k.strip()]
        names = [n for n in names if any(n.startswith(k) for k in keys)]

    spark = get_session(
        app_name="driver-sim",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        shuffle_partitions=8,
    )
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            spdf = queries[name](spark, args.sf).toPandas()
            if name in oracles:
                con = duck_connection(args.sf)
                try:
                    dpdf = con.sql(oracles[name]).df()
                finally:
                    con.close()
                if sorted(spdf.columns) != sorted(dpdf.columns):
                    raise AssertionError(
                        f"schema: spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
                    )
                s_rows, d_rows = canonicalize(spdf), canonicalize(dpdf)
                if len(s_rows) != len(d_rows):
                    raise AssertionError(f"rows: spark={len(s_rows)} duck={len(d_rows)}")
                bad = [(s, d) for s, d in zip(s_rows, d_rows) if s != d]
                if bad:
                    raise AssertionError(f"{len(bad)} value mismatches; first: {bad[0]}")
                status = f"PASS  ({len(s_rows)} rows)"
            else:
                # driver's rows-only check: runs + hashable cells
                canonicalize(spdf)
                status = f"rows-only ({len(spdf)} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL  {type(e).__name__}: {e}"
            failures.append((name, traceback.format_exc()))
        print(f"[{i + 1:3d}/{len(names)}] {name:32s} {status}  {time.time() - t0:.1f}s", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    for name, tb in failures:
        print(f"\n=== {name} ===\n{tb}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
