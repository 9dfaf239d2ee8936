"""Refresh / append per-query sections of PLANS.md (explain formatted).

PLANS.md is the committed plan-shape evidence (one ``## qNNN`` section
per registered query, `df.explain("formatted")` at sf0.001). When a
query's plan changes on purpose (e.g. the r15 q27/q303 de-quadratic
rewrites) or new queries land (q369/q370), re-running the whole file
is wasteful and churns every auto-generated plan id; this tool
replaces or appends ONLY the named sections.

Usage:  python tools/refresh_plans.py q27_similarity_join q369_trained_ivf_ann ...
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: refresh_plans.py <query> [<query> ...]")
        return 2

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    from generative_ai_vector_db_spark.plans.audit import plan_of
    from generative_ai_vector_db_spark.session import get_session

    spark = get_session(
        app_name="refresh-plans", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(REPO, "PLANS.md")
    text = open(path).read()
    for name in names:
        section = f"## {name}\n\n```\n{plan_of(queries[name](spark, SF_DIR))}\n```\n"
        pat = re.compile(
            rf"^## {re.escape(name)}\n.*?(?=^## |\Z)", re.M | re.S
        )
        if pat.search(text):
            # callable replacement: plan text contains backslash
            # sequences (e.g. regex literals like \s+ inside split())
            # that a string replacement would interpret as escapes
            text = pat.sub(lambda m: section + "\n", text, count=1)
            print(f"refreshed {name}")
        else:
            text = text.rstrip("\n") + "\n\n" + section
            print(f"appended {name}")
    open(path, "w").write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
