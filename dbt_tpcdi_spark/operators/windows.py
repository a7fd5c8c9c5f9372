"""Window-function idioms from SURVEY.md §2.5.

Each helper is a direct, Catalyst-codegen'd composition of built-in
window functions — no UDFs. The interesting ones:

- ``forward_fill``: Snowflake ``last_value(x IGNORE NULLS)`` with the
  default ``unboundedPreceding→currentRow`` frame (reference
  ``gold/dim_customer.sql:14-80``, 21 occurrences). Spark's
  ``F.last(..., ignorenulls=True)`` over the same explicit frame is
  byte-equal (hazard 4, SURVEY.md §7.5).
- ``rolling_extreme_with_date``: the reference computes 52-week
  high/low with a rows-based window (W4), then *re-joins the table to
  itself* to recover the date on which the extreme occurred (J8,
  ``silver/daily_market.sql:18-32``) — O(rows × 365). The Spark-native
  plan here is struct-ordered min/max over the same frame: one window
  pass, no self-join, exact earliest-date tie semantics. The
  reference-shaped self-join variant lives where it must stay faithful
  — in the daily_market model (plans/models/silver.py).
- ``qualify_rn``: Snowflake QUALIFY row_number()=1 dedup (W3) — OSS
  Spark has no QUALIFY, so withColumn+filter+drop.
- ``trailing_agg_excluding_current``: W6's trailing-4-quarter EPS sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    cols: list[str],
    key: str | list[str],
    order: str,
) -> DataFrame:
    """Per-key forward fill (last non-NULL so far, ordered by ``order``)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def qualify_rn(
    df: DataFrame,
    key: str | list[str],
    order: list[Column],
    keep: int = 1,
) -> DataFrame:
    """QUALIFY row_number() <= keep — dedup keeping the first row(s) per
    key by ``order``. Reference W3 (``silver/daily_market.sql:36-40``).

    Determinism: the reference orders only by two date columns, which
    leaves ties nondeterministic (hazard 7); callers should pass a
    total order.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )


def rolling_window(
    key: str | list[str], order: str, preceding: int, following: int = 0
) -> WindowSpec:
    """Rows-based trailing frame, e.g. (-364, 0) for the 52-week window
    the reference uses as a proxy for 365 calendar days (W4)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        Window.partitionBy(*keys)
        .orderBy(F.col(order).asc())
        .rowsBetween(-preceding, following)
    )


def rolling_extreme_with_date(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    preceding: int = 364,
) -> DataFrame:
    """52-week-style rolling min/max of ``value`` *plus the date each
    extreme occurred* — the Spark-native replacement for the reference's
    window + self-join (J8 → ``min_by``/``max_by`` over one frame).

    Adds: {value}_low, {value}_low_{order}, {value}_high,
    {value}_high_{order}.

    Tie semantics: ``max_by`` returns an arbitrary row among ties;
    the reference's self-join + QUALIFY keeps the earliest date. We pin
    the same semantics with a struct-ordering trick: min/max over
    struct(value, order) where order is negated... simpler and exact:
    min_by/max_by on (value, order) pairs via struct comparison —
    max(struct(value, -epoch)) picks highest value, earliest date.
    """
    w = rolling_window(key, order, preceding)
    # struct comparison is lexicographic: (value, -days) so the max
    # struct is (max value, earliest date); (−value, −days) for min.
    order_days = F.datediff(F.col(order), F.lit("1970-01-01"))
    hi = F.max(F.struct(F.col(value).alias("v"), (-order_days).alias("negd"))).over(w)
    lo = F.min(F.struct(F.col(value).alias("v"), (order_days).alias("d"))).over(w)
    return (
        df.withColumn(f"{value}_high", hi["v"])
        .withColumn(f"{value}_high_{order}", F.date_add(F.lit("1970-01-01"), -hi["negd"]))
        .withColumn(f"{value}_low", lo["v"])
        .withColumn(f"{value}_low_{order}", F.date_add(F.lit("1970-01-01"), lo["d"]))
    )


def trailing_agg_excluding_current(
    df: DataFrame,
    key: str | list[str],
    order: str,
    value: str,
    preceding: int,
    out: str,
) -> DataFrame:
    """``sum(value) over (rows between N preceding and current) - value``
    — the reference's trailing-4-quarter EPS (W6,
    ``models/work/wrk_company_financials.sql:5-9``)."""
    w = rolling_window(key, order, preceding)
    return df.withColumn(out, F.sum(value).over(w) - F.col(value))
