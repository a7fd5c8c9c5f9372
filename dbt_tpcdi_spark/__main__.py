"""CLI — the engine's analog of the reference's two entry points
(``python tpcdi.py process-files`` + ``dbt build``; SURVEY.md §3):

    python -m dbt_tpcdi_spark build    --raw-dir B1 --warehouse WH [--parallelism 8] [--targets ...]
    python -m dbt_tpcdi_spark refresh  --raw-dir B1 --warehouse WH
    python -m dbt_tpcdi_spark validate --warehouse WH
    python -m dbt_tpcdi_spark show     --warehouse WH --model fact_trade [-n 10]

``build`` ingests the Batch1-style raw files (delimited, FINWIRE,
CustomerMgmt.xml) and materializes all 45 warehouse models in
dependency order; ``refresh`` is the incremental (dynamic-table-analog)
path that rebuilds only stale subtrees; ``validate`` runs the data
tests; ``show`` is the reference's ``--show`` sampling flag.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dbt_tpcdi_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full warehouse build from raw files")
    b.add_argument("--raw-dir", required=True)
    b.add_argument("--warehouse", required=True)
    b.add_argument("--parallelism", type=int, default=8)
    b.add_argument("--targets", nargs="*", default=None)

    r = sub.add_parser("refresh", help="incremental refresh (stale subtrees)")
    r.add_argument("--raw-dir", required=True)
    r.add_argument("--warehouse", required=True)

    v = sub.add_parser("validate", help="run data tests on a warehouse")
    v.add_argument("--warehouse", required=True)

    s = sub.add_parser("show", help="sample a materialized model")
    s.add_argument("--warehouse", required=True)
    s.add_argument("--model", required=True)
    s.add_argument("-n", type=int, default=10)

    args = p.parse_args(argv)

    from dbt_tpcdi_spark.session import get_spark

    spark = get_spark("dbt_tpcdi_spark-cli")

    if args.cmd == "build":
        from dbt_tpcdi_spark.plans.runner import Runner
        from dbt_tpcdi_spark.plans.sources import load_dag_sources

        t0 = time.perf_counter()
        sources = load_dag_sources(spark, args.raw_dir)
        built = Runner(spark, sources, warehouse_dir=args.warehouse).run(
            targets=args.targets, parallelism=args.parallelism
        )
        if not args.targets:
            # full build ⇒ warehouse is fresh: record fingerprints so
            # the next `refresh` is a no-op, not a cold rebuild
            from dbt_tpcdi_spark.streaming.incremental import IncrementalRunner

            IncrementalRunner(spark, args.raw_dir, args.warehouse).record_state()
        print(f"built {len(built)} models in "
              f"{time.perf_counter() - t0:.1f}s -> {args.warehouse}")
        return 0

    if args.cmd == "refresh":
        from dbt_tpcdi_spark.streaming.incremental import IncrementalRunner

        t0 = time.perf_counter()
        status = IncrementalRunner(
            spark, args.raw_dir, args.warehouse
        ).refresh()
        refreshed = sorted(k for k, v in status.items() if v == "refreshed")
        print(f"refreshed {len(refreshed)}/{len(status)} models in "
              f"{time.perf_counter() - t0:.1f}s"
              + (f": {', '.join(refreshed)}" if refreshed else ""))
        return 0

    if args.cmd == "validate":
        from dbt_tpcdi_spark.plans.runner import duplicate_keys

        # the reference's singular test (tests/fact_trade__unique_trade.sql)
        df = spark.read.parquet(f"{args.warehouse}/fact_trade")
        dups = duplicate_keys(df, ["sk_trade_id"])
        n = dups.count()
        if n:
            print(f"FAIL fact_trade__unique_trade: {n} duplicated keys")
            dups.show(10, truncate=False)
            return 1
        print("PASS fact_trade__unique_trade")
        return 0

    if args.cmd == "show":
        spark.read.parquet(f"{args.warehouse}/{args.model}").show(args.n)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
