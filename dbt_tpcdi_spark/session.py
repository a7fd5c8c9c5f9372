"""SparkSession factory.

The reference delegates session setup to Snowpark (``get_session``,
reference ``tpcdi.py:10-20``). Here we own the session and pin the
settings that matter for (a) correctness against a DuckDB oracle and
(b) sane behavior from local[32] up to a 1000-executor cluster:

- ``spark.sql.session.timeZone=UTC``: Spark timestamps are session-TZ;
  DuckDB's are UTC-naive. Without this, every timestamp comparison is
  haunted.
- AQE on (default in Spark 3.2+, pinned explicitly): runtime shuffle
  coalescing, skew-join splitting, and dynamic join-strategy switching
  are the main levers that keep the same declarative plan working at
  100 TB.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs;
  on a real cluster AQE coalescing makes the static value mostly a cap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbt_tpcdi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so tests, bench.py and the driver all agree.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local-mode driver == the only executor: on the 128 GiB bench
        # host an 8g heap OOMs the x100 ANN probes (shuffle buffers +
        # accumulated localCheckpoint blocks across a long bench run);
        # 32g is still a cap, not a reservation
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        # Long-running driver hygiene (r14, VERDICT r13 item 3): the
        # ContextCleaner frees shuffle files, broadcast blocks and
        # cached-RDD state only when a JVM GC collects the driver-side
        # reference — and with a 32g heap G1 never runs a full GC on
        # its own (jstat across a 20-min bench: FGC=0, old gen drifting
        # to ~88% — a mixed cycle that finally fired reclaimed 17 GB of
        # DEAD block references, measured 88%→36%). Until then every
        # young collection evacuates survivors into a nearly-full old
        # gen: 1–2.5 s pauses that stall all task threads at once (the
        # "mid-bench transient" — a 102 s wall on a 33 s build trial,
        # attributed in OPTIMIZATION_r14.md). Spark's own knob for
        # exactly this is periodic GC; the 30min default outlives the
        # whole session, so pull it under the accumulation horizon.
        # Scale note: this is driver-heap hygiene, identical on a real
        # cluster's long-running driver; it does not touch executors'
        # data path.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # testdata events.parquet stores TIMESTAMP(NANOS), which Spark
        # refuses by default; read as long and convert at load
        # (sources/parquet.py restores TimestampType at µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata timestamps are timezone-naive parquet µs; read them as
        # session-TZ TIMESTAMP (UTC above) rather than TIMESTAMP_NTZ so
        # unix_micros()/interval arithmetic and the DuckDB oracle agree.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Pin the session settings that a driver-provided session may lack.

    The correctness driver hands us an arbitrary SparkSession; make sure
    timezone and ANSI behavior match what the DuckDB oracle will see.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark


def local_df(spark: SparkSession, rows: list, schema: str):
    """Single-partition DataFrame from DRIVER-LOCAL rows — the cheap
    construction for metadata-sized tables (manifest rows, literal
    thresholds, centroid/codebook tables).

    ``spark.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` slices, so EVERY job over the result runs
    one (mostly empty) Python/Arrow deserialization task per core —
    measured ~1.4 s per job on local[32], and ~3.6 s with a
    ``coalesce(1)`` on top, for a 45-row table. One explicit
    ``parallelize(rows, 1)`` slice makes the same job ~0.2 s. At
    cluster scale the rule is the same: a driver-literal table should
    be one partition, not one per core."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
