"""Time-series regularization: calendar-spine resampling with gap
fill — turning an irregular event stream into a dense per-key daily
series (the shape window functions, as-of joins, and trailing
aggregates want; the reference's ``daily_market`` data arrives dense,
real feeds don't).

Scale shape: the spine is generated per key from its own [min, max]
date bounds (one map-side-combined agg + an explode — no driver-side
calendar, no cross join against a global date dimension), the join
back is an equi-join on (key, day), and the fill reuses the SCD2-style
single window sort per key. Total: two shuffles on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_spine(df: DataFrame, key: str, date_col: str) -> DataFrame:
    """One row per (key, day) covering each key's [min, max] date
    span — generated distributively from per-key bounds."""
    bounds = df.groupBy(key).agg(
        F.min(date_col).alias("__mn"), F.max(date_col).alias("__mx")
    )
    return bounds.select(
        key,
        F.explode(
            F.expr("sequence(__mn, __mx, interval 1 day)")
        ).alias(date_col),
    )


def resample_daily_fill(
    df: DataFrame,
    key: str,
    date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Dense daily series per key: missing days appear with the last
    observed value (forward fill) and ``is_filled = true``. Leading
    gaps can't exist (the spine starts at each key's first
    observation).

    ``is_filled`` comes from a join-side presence marker, NOT value
    nullness — a genuinely observed NULL value stays NULL and is
    reported as an observation (fills only cover missing DAYS)."""
    spine = daily_spine(df, key, date_col)
    joined = spine.join(
        df.withColumn("__obs", F.lit(True)), [key, date_col], "left"
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(date_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn("is_filled", F.col("__obs").isNull())
    for c in value_cols:
        # struct-wrap observed values so an observed NULL is remembered
        # (struct(NULL) is non-NULL) and never overwritten by the fill
        last_obs = F.last(
            F.when(F.col("__obs"), F.struct(F.col(c).alias("v"))),
            ignorenulls=True,
        ).over(w)
        out = out.withColumn(
            c, F.when(F.col("is_filled"), last_obs["v"]).otherwise(F.col(c))
        )
    return out.drop("__obs")
