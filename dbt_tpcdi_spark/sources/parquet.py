"""Parquet table loaders for the driver-generated testdata.

The testdata layout (TESTDATA.md): one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``. Columnar parquet gives us the
storage properties the reference gets from Snowflake micro-partitions
for free: column pruning, min/max + dictionary row-group pruning and
predicate pushdown (SURVEY.md §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read
    those natively (PARQUET_TYPE_ILLEGAL), so the session sets
    ``spark.sql.legacy.parquet.nanosAsLong`` and we restore
    TimestampType here (truncating ns → µs, which is what DuckDB's
    strftime-to-millisecond comparisons see too)."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain ``spark.read.parquet`` so Catalyst keeps
    full pushdown/pruning freedom — no eager caching here."""
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for c in _nanos_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
