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
    covers every query: names not yet recorded in the COMMITTED
    rotation state come FIRST (within each group, a deterministic md5
    order keyed by the round number so successive rounds rotate rather
    than re-sampling the same prefix).

    State lives in the committed ``ROTATION_STATE.json``
    (``{"round": N, "seen": [...]}``, regenerated per round by
    ``scripts/update_rotation_state.py``) so a fresh clone, a CI
    checkout, and this working dir all produce the SAME order —
    entry-point behavior is a function of repository contents alone.
    ``SPARK_GRAFT_ROUND`` overrides the round key explicitly."""
    import hashlib
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    round_key = 1
    try:
        with open(os.path.join(here, "ROTATION_STATE.json")) as f:
            state = json.load(f)
        seen = set(state.get("seen", []))
        round_key = int(state.get("round", 1))
    except (OSError, json.JSONDecodeError, TypeError, ValueError):
        pass
    env_round = os.environ.get("SPARK_GRAFT_ROUND")
    if env_round and env_round.isdigit():
        round_key = int(env_round)

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
