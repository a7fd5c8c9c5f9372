#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full evaluation with the noop sink (count()
alone can let Catalyst prune work a real consumer would do).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from dbt_tpcdi_spark.queries import all_queries
    from dbt_tpcdi_spark.session import get_spark

    spark = get_spark("bench")
    queries = {n: q for n, q in all_queries().items() if q.headline}

    # Warm up the JVM / parquet footers so per-query numbers measure the
    # plans, not first-touch costs.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
