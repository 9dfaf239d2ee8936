"""Full-surface oracle verify at an arbitrary scale factor.

The driver grades at sf0.01; this tool runs the SAME Spark-vs-DuckDB
comparison for every oracle-backed registry query at any sf_dir —
the sweep that caught q233's latent 4-dp midpoint divergence (visible
only at sf0.1, 2 rows in 100k). Run it after adding operators whose
outputs are rounded aggregates of low-decimal columns, and after any
testdata regeneration.

Usage:  python tools/verify_sf.py [--sf /root/testdata/sf0.1] [--only q233,...]
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import os
import sys
from datetime import date, datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "N"
    if isinstance(v, float):
        return "N" if math.isnan(v) else f"{round(v, 4):.4f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return str(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # partial dirs are legitimate (the synthetic decade writes only
        # documents/embeddings/events/lineitem); queries over missing
        # tables fail individually below instead of blocking the sweep
        if os.path.exists(os.path.join(args.sf, f"{t}.parquet")):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
            )

    names = sorted(mod.queries())
    if args.only:
        keys = [k.strip() for k in args.only.split(",") if k.strip()]
        names = [n for n in names if any(n.startswith(k) for k in keys)]

    fails = []
    for name in names:
        sql = mod.oracle_sql().get(name)
        if sql is None:
            continue
        try:
            spdf = mod.queries()[name](spark, args.sf).toPandas()
            dpdf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, "ERR", str(e)[:200]))
            print(f"{name}: ERR", flush=True)
            continue
        cols = sorted(spdf.columns)
        if cols != sorted(dpdf.columns):
            fails.append((name, "cols", cols, sorted(dpdf.columns)))
            print(f"{name}: COLS", flush=True)
            continue
        s = sorted(
            tuple(_canon(v) for v in r)
            for r in spdf[cols].itertuples(index=False)
        )
        d = sorted(
            tuple(_canon(v) for v in r)
            for r in dpdf[cols].itertuples(index=False)
        )
        if s != d:
            diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
            fails.append((name, len(s), len(d), diff))
            print(f"{name}: DIFF {diff[:1]}", flush=True)
    print("FAILS:", fails or "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
