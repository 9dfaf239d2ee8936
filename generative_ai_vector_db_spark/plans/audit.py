"""Physical-plan auditing (SURVEY §4.2: "verify in explain()").

``plan_of`` captures ``explain('formatted')`` output; ``audit`` checks a
query's plan for the physical features we designed for — the point is
that scale properties (pushdown, broadcast, partial agg, top-k
pushdown) are ASSERTED, not assumed. tests/test_plans.py runs these on
every headline query; ``dump_plans`` writes PLANS.md for review.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = plan_of(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"
    return plan


def dump_plans(queries: dict, spark, sf_dir: str, out_path: str) -> None:
    with open(out_path, "w") as f:
        f.write("# Physical plans (explain formatted)\n\n")
        for name in sorted(queries):
            f.write(f"## {name}\n\n```\n")
            f.write(plan_of(queries[name](spark, sf_dir)))
            f.write("```\n\n")
