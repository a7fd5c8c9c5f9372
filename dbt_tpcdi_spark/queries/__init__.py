"""Query registry: every operator from SURVEY.md §2 (and the LLM-data
additions) exercised as a (Spark builder, DuckDB oracle SQL) pair over
the driver testdata tables.

Cross-engine determinism rules (every query follows these — violating
any of them turns the driver's value-hash comparison into a coin flip):

1. **Money/double sums go through DECIMAL.** Double summation order is
   nondeterministic across engines/partitions; ``cast(x as
   decimal(18,4))`` before SUM makes the arithmetic exact and
   order-independent. Final outputs cast back to double AFTER rounding.
2. **Timestamps are emitted as formatted strings** (``yyyy-MM-dd
   HH:mm:ss.SSS``). events.ts is ns-precision parquet: Spark truncates
   to µs, DuckDB keeps ns — raw values would never hash-match.
3. **Every window/order has a total order** (unique tiebreak column).
4. **Aggregate/computed columns are aliased identically** in the Spark
   plan and the oracle SQL (the driver sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: list[str] = field(default_factory=list)  # SURVEY §2 operator ids
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, Query] = {}


def fixture_root(sf_dir: str, prefix: str) -> str:
    """Per-PROCESS temp directory for queries that materialize a
    fixture (JSONL/ORC shards, persisted vocab tables) before reading
    it back. Keyed by (prefix, sf_dir, pid): two concurrent harness
    processes at the same SF must not overwrite each other's fixture
    while the other's lazy DataFrame still reads it, and persisted
    VersionedTable fixtures must not accrue commits at a shared root
    across runs. Within ONE process the path is stable, so repeated
    builds of the same query (bench trials) still reuse/overwrite
    their own fixture rather than leaking a new dir per call."""
    import hashlib
    import os
    import tempfile

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), f"{prefix}_{suffix}_p{os.getpid()}")


def query(name: str, oracle: str | None, tags: list[str], headline: bool = False):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, tags=tags,
                               headline=headline)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    # import for side effects: each module registers its queries
    from dbt_tpcdi_spark.queries import (  # noqa: F401
        corpus,
        extended,
        llm,
        relational,
        streaming_queries,
        tpcdi_gate,
    )

    return dict(REGISTRY)
