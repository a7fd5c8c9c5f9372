"""Frequent-items (heavy-hitter) detection with bounded memory.

The naive plan — ``groupBy(token).count()`` over the full stream —
shuffles one row per DISTINCT token. At web-corpus scale the token
vocabulary (URLs, hostnames, n-grams) can exceed executor memory and
the shuffle becomes vocabulary-sized. The classic fix is the
Misra–Gries summary (Misra & Gries 1982; mergeable-batch form per
Agarwal et al., "Mergeable Summaries", PODS 2012): each partition
keeps at most ``k`` counters, and any item whose true partition count
exceeds n_p/(k+1) is guaranteed to survive as a candidate.

Two-pass exact heavy hitters built on it:

1. **Candidates** (this module): one ``mapInPandas`` pass emitting at
   most k tokens per partition — O(k) memory, no shuffle of the
   vocabulary. mapInPandas is the right tool here: the summary is
   per-partition imperative state (counter eviction) that no built-in
   aggregate expresses with bounded memory.
2. **Exact recount** (caller): semi-join the token stream against the
   (tiny, broadcast) candidate set and count ONLY candidates, then
   filter ``count · s > n``. Because candidates are a guaranteed
   superset of every token with count > n/s (for k ≥ s), the final
   answer is EXACT and independent of summary internals — which is
   what lets a DuckDB oracle verify it with a plain GROUP BY.

Guarantee chain: a token with global count > n/s has, in at least one
partition (pigeonhole over the partition sums), count_p > n_p/s ≥
n_p/(k+1) when k ≥ s — so it survives that partition's summary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["mg_candidates", "mg_reduce", "mg_summary",
           "qs_estimates", "qs_estimates_grouped",
           "qs_estimates_grouped_sql", "qs_estimates_sql",
           "qs_sketch", "qs_sketch_grouped", "qs_sketch_grouped_sql",
           "qs_sketch_sql"]


def mg_reduce(counts: dict[str, int], k: int) -> dict[str, int]:
    """One Misra–Gries eviction: subtract the (k+1)-th largest counter
    value from every counter and drop the non-positive, leaving at most
    k survivors. Each eviction removes ≥ (k+1)·d total weight while
    undercounting any single item by ≤ d, which telescopes to the
    n_p/(k+1) error bound."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values(), reverse=True)
    d = vals[k]  # (k+1)-th largest
    return {t: c - d for t, c in counts.items() if c > d}


def mg_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summary in ONE pass over the token
    stream: ≤ k candidate rows per partition PLUS one sentinel row
    (``col`` NULL) carrying the partition's row count — so the caller
    gets candidates AND the corpus total from a single corpus scan
    instead of two (at 100 TB, one fewer full scan is the whole win).

    Input: a DataFrame with a string column ``col`` (one row per token
    OCCURRENCE). Candidates are a superset of every token whose
    partition count exceeds n_p/(k+1).

    Arrow batches are pre-reduced with ``value_counts`` (vectorized)
    before touching the Python dict, so per-row Python cost is
    amortized over batch-level dedup."""
    in_field = df.select(col).schema.fields[0]
    schema = StructType(
        [in_field, StructField("__part_n", LongType(), True)]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for tok, c in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            counts = mg_reduce(counts, k)
        yield pd.DataFrame(
            {col: list(counts) + [None], "__part_n": [None] * len(counts) + [n_p]}
        )

    return df.select(col).mapInPandas(summarize, schema)


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Candidate values only (see ``mg_summary``): ≤ k rows per
    partition, a superset of every token with partition count >
    n_p/(k+1)."""
    return (
        mg_summary(df, col, k)
        .filter(F.col(col).isNotNull())
        .select(col)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)

#: default sketch geometry: 4 rows x 1024 columns = 4096 bounded,
#: MERGEABLE counters (sketches of shards add cell-wise), error
#: bound est - true <= e/1024 * N per row with prob 1 - e^-4 overall
CM_DEPTH = 4
CM_WIDTH = 1024


def cm_cells(df: DataFrame, col: str, depth: int = CM_DEPTH,
             width: int = CM_WIDTH) -> DataFrame:
    """Count-Min sketch cells ``(row, pos, c)`` over ``df[col]``: each
    item lands in one md5-derived position per row, counts fold with
    ONE map-side-combined shuffle of depth·n rows into ≤ depth·width
    cells — bounded state whatever the stream length, and cell-wise
    ADDITIVE across shards (the mergeability that makes CM the
    frequency summary for shard-at-a-time corpus passes, next to
    Misra–Gries' candidate bound and KMV's distinct bound). Salts are
    positional (``cm{row}:``), shared verbatim with the SQL twin."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod

    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    md5_mod(F.col(col), width, salt=f"cm{i}:")
                    .alias("pos"),
                )
                for i in range(depth)
            ])
        ).alias("__c")
    ).select("__c.row", "__c.pos")
    return rows.groupBy("row", "pos").agg(
        F.count("*").cast("long").alias("c")
    )


def cm_estimate(cells: DataFrame, probes: DataFrame, col: str,
                depth: int = CM_DEPTH,
                width: int = CM_WIDTH) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` from a CM cell
    table: min over the item's depth cells (missing cell = 0).
    Work is probes·depth rows against a broadcast-sized cell table —
    metadata, never data."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod

    pr = probes.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    md5_mod(F.col(col), width, salt=f"cm{i}:")
                    .alias("pos"),
                )
                for i in range(depth)
            ])
        ).alias("__c"),
    ).select(col, "__c.row", "__c.pos")
    return (
        pr.join(F.broadcast(cells), ["row", "pos"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long").alias("cm_est")
        )
    )


def cm_cells_sql(inner_sql: str, col: str, depth: int = CM_DEPTH,
                 width: int = CM_WIDTH) -> str:
    """DuckDB twin of ``cm_cells`` over ``inner_sql`` rows."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod_sql

    arms = " UNION ALL ".join(
        f"SELECT {i} AS row, "
        f"{md5_mod_sql(col, width, salt=f'cm{i}:')} AS pos "
        f"FROM __cmsrc"
        for i in range(depth)
    )
    return (
        f"__cmsrc AS MATERIALIZED ({inner_sql}), "
        f"__cmcells AS MATERIALIZED ("
        f"SELECT row, pos, cast(count(*) AS bigint) AS c "
        f"FROM ({arms}) GROUP BY 1, 2)"
    )


def cm_estimate_sql(probes_sql: str, col: str, depth: int = CM_DEPTH,
                    width: int = CM_WIDTH) -> str:
    """DuckDB twin of ``cm_estimate``: SELECT ``col, cm_est`` given
    the ``__cmcells`` CTE from ``cm_cells_sql`` in scope."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod_sql

    arms = " UNION ALL ".join(
        f"SELECT {col}, {i} AS row, "
        f"{md5_mod_sql(col, width, salt=f'cm{i}:')} AS pos "
        f"FROM __cmprobes"
        for i in range(depth)
    )
    return (
        f"__cmprobes AS MATERIALIZED ({probes_sql}), "
        f"__cmpr AS MATERIALIZED ({arms}), "
        f"__cmest AS MATERIALIZED ("
        f"SELECT p.{col}, cast(min(coalesce(c.c, 0)) AS bigint) "
        f"AS cm_est "
        f"FROM __cmpr p LEFT JOIN __cmcells c USING (row, pos) "
        f"GROUP BY 1)"
    )


# ---------------------------------------------------------------------------
# bottom-k-by-hash quantile sketch (random-subset order statistics)

#: sketch size / hash salt. k = 256 gives a DKW sup-norm bound of
#: ~0.10 at 99% confidence — coarse but honest, and the sketch is 256
#: rows whatever the table size.
QS_K = 256
QS_SALT = "qs-v1|"

#: default probe quantiles (permille)
QS_Q_PM = (100, 250, 500, 750, 900, 990)


def qs_sketch(df: DataFrame, key_col: str, value_col: str,
              k: int = QS_K, salt: str = QS_SALT) -> DataFrame:
    """Bounded-size MERGEABLE quantile sketch: the k rows whose salted
    60-bit key hashes are smallest, carried as ``(h, v)``. Because the
    hash is uniform and key-determined, bottom-k-by-hash is a uniform
    random k-subset of rows — order statistics over it estimate any
    quantile with the DKW sup-norm guarantee — and it is mergeable
    exactly like KMV: bottom-k of a union = bottom-k of concatenated
    per-shard sketches, so shard sketches combine without revisiting
    data (Spark's own approx_percentile summary cannot cross engines;
    this one is integer-deterministic, so a SQL twin reproduces it bit
    for bit).

    Physical shape: ``orderBy(h, v).limit(k)`` planizes as
    TakeOrderedAndProject — per-partition partial bottom-k, then one
    k-row merge. No window, no full sort, one scan; ``v`` is the
    tiebreak so the cut stays total-ordered even under
    (astronomically unlikely) 60-bit hash collisions."""
    from dbt_tpcdi_spark.operators.text import md5_60bit

    th = df.select(
        md5_60bit(
            F.concat(F.lit(salt), F.col(key_col).cast("string"))
        ).alias("h"),
        F.col(value_col).alias("v"),
    )
    return th.orderBy("h", "v").limit(k)


def qs_sketch_sql(source_sql: str, h_sql: str, v_sql: str,
                  k: int = QS_K) -> str:
    """DuckDB twin of ``qs_sketch``: CTE chain ending in ``__qssk``
    with columns (h, v)."""
    return f"""__qsth AS MATERIALIZED (
        SELECT {h_sql} AS h, {v_sql} AS v FROM {source_sql}
    ),
    __qssk AS (
        SELECT h, v FROM __qsth ORDER BY h, v LIMIT {k}
    )"""


def qs_estimates(sk: DataFrame, q_pms=QS_Q_PM) -> DataFrame:
    """Quantile estimates from a ``qs_sketch`` result: for each target
    q (permille) the sample order statistic at rank
    ``max(1, ceil(q·m/1000))``, ordered by (v, h) for a total order
    under value ties. Output ``(q_pm, est_v, n_sample)`` — all
    integer, so the SQL twin is exact.

    Shape: the ≤ k sketch rows collapse to ONE sorted array (the
    bounded sorted-array idiom — no window, no join), and each probe
    quantile indexes into it. An EMPTY sketch yields zero rows (the
    grand aggregate's n_sample = 0 row is filtered), matching the SQL
    twin's empty join."""
    one = sk.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("v"), F.col("h")))
        ).alias("__a"),
        F.count("*").cast("long").alias("n_sample"),
    ).filter(F.col("n_sample") > 0)
    return one.select(
        F.explode(
            F.array(*[F.lit(int(q)) for q in q_pms])
        ).alias("q_pm"),
        "n_sample",
        "__a",
    ).select(
        "q_pm",
        F.expr(
            "__a[cast(greatest(1, (q_pm * n_sample + 999) div 1000)"
            " AS int) - 1].v"
        ).alias("est_v"),
        "n_sample",
    )


def qs_estimates_sql(q_pms=QS_Q_PM, k: int = QS_K) -> str:
    """DuckDB twin of ``qs_estimates``: CTEs ending in ``__qsest``
    (q_pm, est_v, n_sample); expects ``__qssk`` in scope."""
    qlist = ", ".join(str(int(q)) for q in q_pms)
    return f"""__qsm AS (SELECT count(*) AS m FROM __qssk),
    __qsranked AS (
        SELECT v, row_number() OVER (ORDER BY v, h) AS vr FROM __qssk
    ),
    __qstgt AS (
        SELECT q.q_pm, m.m,
               greatest(1, (q.q_pm * m.m + 999) // 1000) AS vr
        FROM (SELECT unnest([{qlist}]) AS q_pm) q, __qsm m
    ),
    __qsest AS (
        SELECT t.q_pm, r.v AS est_v, cast(t.m AS bigint) AS n_sample
        FROM __qstgt t JOIN __qsranked r USING (vr)
    )"""


def qs_sketch_grouped(df: DataFrame, group_col: str, key_col: str,
                      value_col: str, k: int = QS_K,
                      salt: str = QS_SALT) -> DataFrame:
    """Per-group bottom-k quantile sketch ``(group, h, v)``: the
    grouped form of ``qs_sketch`` — one k-row uniform sample per
    group, kept with a PARTITIONED window (group-parallel; never a
    single-task global sort), mergeable per group exactly like the
    global sketch. This is the shape per-source corpus statistics
    (length/quality distributions on a dataset card) actually need at
    100 TB: N groups × k rows of state, one shuffle on the group
    key.

    The per-group window never sorts a whole group: rows first pass a
    20-bit hash-PREFIX filter sized to admit ~4·k rows per group
    (per-group counts are a metadata aggregate, broadcast back). The
    prefix bucket is monotone in ``h``, so the survivor set is
    PREFIX-CLOSED under the (h, v) window order and survivor ranks
    equal whole-group ranks — exact, with the window input O(k) per
    group at ANY group size (the same two-pass bound as
    ``token_budget_sample``). Undercoverage (admitting < k rows of a
    larger group) would shrink the sketch and fail the oracle gate —
    never silently approximate."""
    from dbt_tpcdi_spark.operators.text import md5_60bit

    th = df.select(
        F.col(group_col).alias("g"),
        md5_60bit(
            F.concat(F.lit(salt), F.col(key_col).cast("string"))
        ).alias("h"),
        F.col(value_col).alias("v"),
    )
    counts = th.groupBy("g").agg(F.count("*").alias("__n"))
    bits = 1 << 20
    survivors = (
        th.join(F.broadcast(counts), "g")
        .filter(
            F.shiftright(F.col("h"), 40)
            < F.least(
                F.lit(bits).cast("long"),
                F.expr(f"({4 * k * bits} + __n - 1) div __n"),
            )
        )
        .drop("__n")
    )
    return (
        survivors.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("g").orderBy("h", "v")
            ),
        )
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def qs_sketch_grouped_sql(source_sql: str, g_sql: str, h_sql: str,
                          v_sql: str, k: int = QS_K) -> str:
    """DuckDB twin of ``qs_sketch_grouped``: CTEs ending in
    ``__qsgsk`` (g, h, v)."""
    return f"""__qsgth AS MATERIALIZED (
        SELECT {g_sql} AS g, {h_sql} AS h, {v_sql} AS v
        FROM {source_sql}
    ),
    __qsgsk AS (
        SELECT g, h, v FROM (
            SELECT g, h, v, row_number() OVER (
                PARTITION BY g ORDER BY h, v) AS rn
            FROM __qsgth
        ) WHERE rn <= {k}
    )"""


def qs_estimates_grouped(sk: DataFrame, q_pms=QS_Q_PM) -> DataFrame:
    """Per-group quantile estimates from a grouped sketch: the
    bounded sorted-array idiom per group — one aggregate, then each
    probe quantile indexes the group's ≤ k-element array. Output
    ``(g, q_pm, est_v, n_sample)``."""
    one = sk.groupBy("g").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("v"), F.col("h")))
        ).alias("__a"),
        F.count("*").cast("long").alias("n_sample"),
    )
    return one.select(
        "g",
        F.explode(
            F.array(*[F.lit(int(q)) for q in q_pms])
        ).alias("q_pm"),
        "n_sample",
        "__a",
    ).select(
        "g",
        "q_pm",
        F.expr(
            "__a[cast(greatest(1, (q_pm * n_sample + 999) div 1000)"
            " AS int) - 1].v"
        ).alias("est_v"),
        "n_sample",
    )


def qs_estimates_grouped_sql(q_pms=QS_Q_PM) -> str:
    """DuckDB twin of ``qs_estimates_grouped``: CTEs ending in
    ``__qsgest`` (g, q_pm, est_v, n_sample); expects ``__qsgsk``."""
    qlist = ", ".join(str(int(q)) for q in q_pms)
    return f"""__qsgm AS (
        SELECT g, count(*) AS m FROM __qsgsk GROUP BY 1
    ),
    __qsgranked AS (
        SELECT g, v, row_number() OVER (
            PARTITION BY g ORDER BY v, h) AS vr
        FROM __qsgsk
    ),
    __qsgtgt AS (
        SELECT m.g, q.q_pm, m.m,
               greatest(1, (q.q_pm * m.m + 999) // 1000) AS vr
        FROM __qsgm m, (SELECT unnest([{qlist}]) AS q_pm) q
    ),
    __qsgest AS (
        SELECT t.g, t.q_pm, r.v AS est_v,
               cast(t.m AS bigint) AS n_sample
        FROM __qsgtgt t JOIN __qsgranked r USING (g, vr)
    )"""
