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


def interpolate_daily_linear(
    df: DataFrame,
    key: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily series with LINEAR interpolation across interior
    gaps (forward fill's numeric sibling — the resampling rung for
    quantities that trend between observations): each missing day
    gets ``v0 + (v1−v0)·(t−t0)/(t1−t0)`` from its bracketing
    observations; days outside the observed range clamp to the
    nearest observation. One spine join + two frame-bounded windows
    per key (the forward pass reuses the backward pass's exchange —
    same partition keys), no self-join against the observation table.

    The fraction is computed in DOUBLE with a fixed expression shape,
    so any IEEE engine reproduces it bit-for-bit; callers wanting
    hash-stable output round the result (``round4``) as usual."""
    spine = daily_spine(df, key, date_col)
    joined = spine.join(
        df.withColumn("__obs", F.lit(True)), [key, date_col], "left"
    )
    days = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    obs = F.when(
        F.col("__obs"),
        F.struct(F.col(value_col).alias("v"), days.alias("t")),
    )
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col(date_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col(date_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(wb)
    nxt = F.first(obs, ignorenulls=True).over(wf)
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (
        (days - prev["t"]).cast("double")
        / (nxt["t"] - prev["t"]).cast("double")
    )
    filled = F.when(
        prev.isNotNull() & nxt.isNotNull(),
        F.when(nxt["t"] == prev["t"], prev["v"]).otherwise(interp),
    ).otherwise(F.coalesce(prev["v"], nxt["v"]))
    return joined.select(
        key,
        date_col,
        F.when(F.col("__obs"), F.col(value_col))
        .otherwise(filled)
        .alias(value_col),
        F.col("__obs").isNull().alias("is_filled"),
    )


def interpolate_daily_linear_sql(
    inner_sql: str, key: str, date_col: str, value_col: str
) -> str:
    """DuckDB twin of ``interpolate_daily_linear`` over ``inner_sql``
    (identical window frames, identical double expression shape)."""
    return f"""
    WITH __obs AS ({inner_sql}),
    __bounds AS (
        SELECT {key}, min({date_col}) AS mn, max({date_col}) AS mx
        FROM __obs GROUP BY 1
    ),
    __spine AS (
        SELECT {key}, cast(unnest(generate_series(mn, mx,
               INTERVAL 1 DAY)) AS date) AS {date_col}
        FROM __bounds
    ),
    __j AS (
        SELECT s.{key}, s.{date_col}, o.{value_col},
               o.{key} IS NOT NULL AS __seen
        FROM __spine s LEFT JOIN __obs o USING ({key}, {date_col})
    ),
    __w AS (
        SELECT *,
               datediff('day', DATE '1970-01-01', {date_col}) AS t,
               last_value(CASE WHEN __seen THEN
                   {{'v': {value_col},
                     't': datediff('day', DATE '1970-01-01',
                                   {date_col})}} END IGNORE NULLS)
                   OVER (PARTITION BY {key} ORDER BY {date_col}
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS p,
               first_value(CASE WHEN __seen THEN
                   {{'v': {value_col},
                     't': datediff('day', DATE '1970-01-01',
                                   {date_col})}} END IGNORE NULLS)
                   OVER (PARTITION BY {key} ORDER BY {date_col}
                         ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS n
        FROM __j
    )
    SELECT {key}, {date_col},
           CASE WHEN __seen THEN {value_col}
                WHEN p IS NOT NULL AND n IS NOT NULL THEN
                    CASE WHEN n.t = p.t THEN p.v
                         ELSE p.v + (n.v - p.v) *
                              (cast(t - p.t AS double)
                               / cast(n.t - p.t AS double)) END
                ELSE coalesce(p.v, n.v) END AS {value_col},
           NOT __seen AS is_filled
    FROM __w
    """
