#!/usr/bin/env python
"""Full driver simulation: run every __spark_entry__ query with a
vanilla SparkSession and compare against its DuckDB oracle — the same
check the grading driver performs. Run before ending a round:

    python scripts/driver_sim.py [sf0.01|sf0.1] [--include-heavy]
        [--only name1,name2]

Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
#: output-quadratic dedup pipelines: their DuckDB oracles are heavy at
#: sf0.1; verified at sf0.001 (pytest) and sf0.01
HEAVY = {"minhash_lsh_pairs", "ngram_jaccard_pairs", "dedup_clusters",
         "dedup_corpus"}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "sf0.01"
    include_heavy = "--include-heavy" in sys.argv or sf != "sf0.1"
    sf_dir = f"/root/testdata/{sf}"

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").appName(
        "driver-sim").getOrCreate()
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    for i, a in enumerate(sys.argv):
        if a == "--only":
            if i + 1 >= len(sys.argv):
                print("--only needs a comma-separated query list")
                return 2
            only = set(sys.argv[i + 1].split(","))
            unknown = only - qs.keys()
            if unknown:
                print(f"--only: no such queries: {sorted(unknown)}")
            qs = {k: v for k, v in qs.items() if k in only}
            if not qs:
                print("--only matched zero registered queries")
                return 2
    json_out = None
    for i, a in enumerate(sys.argv):
        if a == "--json":
            if i + 1 >= len(sys.argv):
                print("--json needs an output path")
                return 2
            json_out = sys.argv[i + 1]
    fails: list[str] = []
    results: dict[str, dict] = {}
    t0 = time.perf_counter()
    for name in sorted(qs):
        if name in HEAVY and not include_heavy:
            print(f"{name}: skipped (heavy oracle at {sf})")
            results[name] = {"skipped": f"heavy oracle at {sf}"}
            continue
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                # no oracle: record that it RAN, not that it "matched" —
                # an always-true match field would read as verification
                print(f"{name}: rows-only, {len(got)} rows")
                results[name] = {"rows_only": True, "spark_rows": len(got),
                                 "ran": True}
                continue
            want = con.execute(oracles[name]).df()
            g = got[sorted(got.columns)].sort_values(
                by=sorted(got.columns), kind="mergesort").reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(
                by=sorted(want.columns), kind="mergesort").reset_index(drop=True)
            ok = g.shape == w.shape and bool(
                (g.astype(str).values == w.astype(str).values).all())
            print(f"{name}: {g.shape} match={ok}")
            results[name] = {"spark_rows": int(g.shape[0]),
                             "oracle_rows": int(w.shape[0]),
                             "n_cols": int(g.shape[1]), "match": ok}
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:150]}")
            results[name] = {"match": False,
                             "err": f"{type(ex).__name__}: {str(ex)[:150]}"}
            fails.append(name)
        finally:
            # queries that persist shared intermediates (tracked via
            # _lsh_caches) would otherwise accumulate storage across a
            # 220-query sweep
            spark.catalog.clearCache()
    wall = round(time.perf_counter() - t0, 1)
    print(f"\nTOTAL: {len(qs)} queries, {len(fails)} failures in "
          f"{wall:.0f}s: {fails}")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {"sf": sf, "n_queries": len(qs), "n_failures": len(fails),
                 "wall_sec": wall, "failures": fails, "results": results},
                fh, indent=1)
        print(f"wrote {json_out}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
