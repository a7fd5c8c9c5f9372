"""Streaming-runtime queries: the driver gate exercises the actual
Structured Streaming engine (readStream → AvailableNow → memory sink),
not just batch twins. Results are deterministic, so the batch oracle
applies unchanged — batch/stream parity is checked by the driver
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_tpcdi_spark.queries import query
from dbt_tpcdi_spark.queries.relational import MONEY, TS_FMT, TS_FMT_DUCK
from dbt_tpcdi_spark.streaming.ops import run_to_memory, stream_events


@query(
    "streaming_tumbling",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           cast(round(sum(cast(value AS {MONEY})), 2) AS double) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=["§2.9-streaming", "A1"],
)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation executed BY the streaming engine
    (same oracle as the batch tumbling_window query — parity is the
    assertion)."""
    events = stream_events(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast(MONEY)), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    run_to_memory(agg, "q_streaming_tumbling")
    return spark.table("q_streaming_tumbling")
