#!/usr/bin/env python
"""Dump .explain("formatted") for every headline query to
plans/r14/<name>_<suffix>.txt (suffix = before|after, argv[1]).

Usage: python scripts/dump_r14_plans.py before [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from dbt_tpcdi_spark.queries import all_queries
    from dbt_tpcdi_spark.session import get_spark

    spark = get_spark("dump-r14-plans")
    only = os.environ.get("R14_PLANS_ONLY")
    queries = {n: q for n, q in all_queries().items() if q.headline}
    if only:
        queries = {n: q for n, q in queries.items() if n in only.split(",")}
    for name in sorted(queries):
        df = queries[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
