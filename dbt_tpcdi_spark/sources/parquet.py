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
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):  # Spark-written table (part files in a dir,
        # possibly nested under partition key=value subdirectories)
        parts = glob.glob(os.path.join(path, "**", "*.parquet"),
                          recursive=True)
        if not parts:
            return []
        path = parts[0]
    # inspect the parquet-level types, not the arrow view: INT96
    # timestamps (Spark's default write format) surface in arrow as
    # timestamp[ns] too, but Spark reads those natively — only
    # int64-annotated nanosecond columns need the nanosAsLong restore
    schema = pq.ParquetFile(path).schema
    return [
        schema.column(i).name
        for i in range(len(schema))
        if schema.column(i).physical_type == "INT64"
        and "timeUnit=nanoseconds" in str(schema.column(i).logical_type)
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


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a small-file scan across all cores —
    ONLY when the scan is actually under-parallel.

    Below ``maxPartitionBytes`` a single-file table scans as ONE
    partition, so any CPU-heavy projection or explode over it runs on
    one core regardless of session size; locally the repartition is
    the difference between 1× and N× parallelism on the compute
    stage. At real scale the table is many files and already spans
    ≥ defaultParallelism partitions — there the gate below makes this
    a no-op, so production plans never pay a pointless full exchange
    of the widest column just to fix local scan parallelism.
    Downstream results are unaffected either way — every consumer
    re-shuffles on its own keys."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
