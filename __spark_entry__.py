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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(build):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)
            return build(spark, sf_dir)

        return run

    return {name: wrap(q.build) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
