"""Temporal joins: equi-key + validity-window (BETWEEN) predicates.

The reference's most common join shape (SURVEY.md §2.3 J6, 12+ sites,
e.g. ``silver/securities.sql:41-46``: ``s.cik = c.company_id AND pts
BETWEEN c.effective_timestamp AND c.end_timestamp``).

Spark-first execution notes:
- Catalyst plans the equi key as the hash/sort-merge join key and
  applies the BETWEEN as a join residual — correct and efficient out of
  the box *when each key has few versions* (TPC-DI: a handful per
  entity).
- For small dimensions we expose an explicit ``broadcast`` knob — the
  validity-window dim is usually orders of magnitude smaller than the
  fact.
- An as-of variant (``join_asof``) picks the *latest version at or
  before ts* without needing precomputed end_timestamps; implemented as
  window-rank over the union rather than a range join, which avoids the
  O(facts × versions) blow-up when version counts are large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def temporal_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[tuple[str, str]] | list[str],
    ts: str,
    eff: str = "effective_timestamp",
    end: str = "end_timestamp",
    how: str = "inner",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Join ``fact`` to the dim version valid at ``fact[ts]``.

    ``keys``: either ["k"] (same name both sides) or [("fk", "pk")].
    Mirrors reference J6: equi key + ``ts BETWEEN eff AND end``.
    """
    conds: list[Column] = []
    for k in keys:
        fk, pk = (k, k) if isinstance(k, str) else k
        conds.append(fact[fk] == dim[pk])
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    cond = cond & fact[ts].between(dim[eff], dim[end])
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, cond, how)


def join_asof(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    dim_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach the latest dim row with ``dim_ts <= fact_ts``
    (direction='backward') per key; 'forward' picks the earliest
    ``dim_ts >= fact_ts``.

    Implementation: union-tag + window ``last(..., ignorenulls)`` — one
    shuffle on (key, ts), no range-join blow-up. This is the scale path
    Spark lacks natively (a pd.merge_asof applyInPandas would park all
    of a key's rows in one pandas buffer; the window form streams).

    Columns: fact columns + dim columns (dim's prefixed ``asof_``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    dim_cols = [c for c in dim.columns if c != key]
    f_tagged = fact.withColumn("__t", F.col(fact_ts).cast("timestamp")).withColumn(
        "__is_fact", F.lit(1)
    )
    for c in dim_cols:
        f_tagged = f_tagged.withColumn(f"asof_{c}", F.lit(None).cast(dim.schema[c].dataType))
    d_tagged = dim.select(
        F.col(key),
        F.col(dim_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_fact"),
        *[F.col(c).alias(f"asof_{c}") for c in dim_cols],
    )
    fact_cols = [c for c in fact.columns]
    unioned = f_tagged.select(
        key, "__t", "__is_fact",
        *[c for c in fact_cols if c != key],
        *[f"asof_{c}" for c in dim_cols],
    ).unionByName(
        d_tagged, allowMissingColumns=True
    )

    if direction == "backward":
        # dim rows sort before fact rows at equal ts so a fact at exactly
        # dim_ts sees that version (BETWEEN is inclusive in J6 too).
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__t").asc(), F.col("__is_fact").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__t").desc(), F.col("__is_fact").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    filled = unioned
    for c in dim_cols:
        filled = filled.withColumn(f"asof_{c}", F.last(f"asof_{c}", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("__is_fact") == 1)
        .drop("__is_fact", "__t")
    )


def range_join_binned(
    fact: DataFrame,
    dim: DataFrame,
    val: str,
    lo: str,
    hi: str,
    bin_width: int,
    keys: list[tuple[str, str]] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval join without broadcast: the scale path for ``fact.val
    BETWEEN dim.lo AND dim.hi`` when the dim outgrows the broadcast
    threshold (where plain Catalyst planning degenerates — no equi key
    means BroadcastNestedLoop/cartesian; a low-cardinality equi key
    means one SMJ partition scanning every version).

    The binning technique (as in Databricks' range-join optimization,
    re-expressed with public DataFrame ops): facts hash into
    ``floor(val / bin_width)``; each dim interval explodes to the bins
    it covers; the join becomes an equi-join on (``keys`` +, bin) with
    the exact BETWEEN as residual. Each fact lands in exactly ONE bin,
    so no post-join dedup is needed. Cost: dim rows multiply by
    ``span/bin_width`` (choose bin_width ≈ median interval span;
    callers must CLAMP open-ended sentinels — e.g. SCD2's 9999-12-31 —
    to the observed max fact value or the explode blows up), and the
    shuffle is a plain hash exchange both sides — AQE handles skewed
    bins like any other key.

    ``val``/``lo``/``hi`` are integer-valued columns (cast timestamps
    with ``F.unix_micros`` first).
    """
    if how != "inner":
        raise ValueError("range_join_binned supports how='inner'")
    f = fact.alias("__f")
    d = dim.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bin_width).cast("long"),
                F.floor(F.col(hi) / bin_width).cast("long"),
            )
        ),
    ).alias("__d")
    fbin = F.floor(F.col(f"__f.{val}") / bin_width).cast("long")
    cond = fbin == F.col("__d.__bin")
    for k in keys or []:
        fk, pk = (k, k) if isinstance(k, str) else k
        cond = cond & (F.col(f"__f.{fk}") == F.col(f"__d.{pk}"))
    cond = cond & F.col(f"__f.{val}").between(
        F.col(f"__d.{lo}"), F.col(f"__d.{hi}")
    )
    return f.join(d, cond, "inner").drop("__bin")
