"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame builder; ``oracle_sql()`` gives the
DuckDB-equivalent SQL the driver hash-compares against at sf0.01.

All real logic lives in the ``dbt_tpcdi_spark`` package; this module is
just the registry adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_tpcdi_spark.queries import all_queries
from dbt_tpcdi_spark.session import configure_for_oracle

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_for_oracle(spark)
    return all_queries()[_FLAGSHIP].build(spark, _SMOKE_SF_DIR)


def _rotation_order(names: list[str]) -> list[str]:
    """Round-keyed ordering so the driver's rotating sample eventually
    covers every query: names never seen in a committed
    CORRECTNESS_r*.json come FIRST (within each group, a deterministic
    md5 order keyed by the round number so successive rounds rotate
    rather than re-sampling the same prefix)."""
    import glob
    import hashlib
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    arts = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    for path in arts:
        try:
            with open(path) as f:
                doc = json.load(f)
            if isinstance(doc, dict):
                seen.update(doc.keys())
        except (OSError, json.JSONDecodeError):
            continue
    round_key = len(arts) + 1

    def h(name: str) -> str:
        return hashlib.md5(f"{round_key}:{name}".encode()).hexdigest()

    return sorted(names, key=lambda n: (n in seen, h(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (ordered so
    never-yet-sampled queries lead — see _rotation_order)."""

    def wrap(build):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)
            return build(spark, sf_dir)

        return run

    reg = all_queries()
    return {name: wrap(reg[name].build) for name in _rotation_order(list(reg))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
