"""Relational operator queries (SURVEY.md §2.1-2.8) over the testdata.

Each query re-expresses a TPC-DI operator family from the reference on
the driver's TPC-H-ish tables, paired with a DuckDB oracle. Tags cite
the SURVEY §2 operator ids each query covers.

The SCD2 / temporal-join / forward-fill / 52-week queries mirror the
reference's silver-layer semantics exactly (reference
``models/silver/accounts.sql:35-57``, ``silver/securities.sql:41-46``,
``gold/dim_customer.sql:14-80``, ``silver/daily_market.sql:5-40``) —
the entity tables differ (testdata has no TPC-DI sources) but the
operator semantics and plans are the ones the engine ships.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_tpcdi_spark.functions.keys import surrogate_key, surrogate_key_sql
from dbt_tpcdi_spark.functions.scalar import decode, round4
from dbt_tpcdi_spark.operators.scd2 import with_scd2
from dbt_tpcdi_spark.operators.temporal import join_asof, temporal_join
from dbt_tpcdi_spark.operators.windows import (
    qualify_rn,
    rolling_extreme_with_date,
    trailing_agg_excluding_current,
)
from dbt_tpcdi_spark.queries import query
from dbt_tpcdi_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# cross-engine determinism helpers (see queries/__init__.py rules)

MONEY = "decimal(18,4)"  # exact, order-independent summation
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSS"  # Spark
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%g"  # DuckDB strftime (%g = milliseconds)

#: eff_ts: a *unique* per-order timestamp derived from (o_orderdate,
#: o_orderkey) — the SCD2/temporal queries need a total version order
#: (hazard 7 in SURVEY.md §7.5). Unique while o_orderkey < 86.4M.
_EFF_TS_SPARK = (
    "timestampadd(MILLISECOND, cast((o_orderkey div 86400) % 1000 as int), "
    "timestampadd(SECOND, cast(o_orderkey % 86400 as int), o_orderdate))"
)
_EFF_TS_DUCK = (
    "o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND "
    "+ ((o_orderkey // 86400) % 1000) * INTERVAL 1 MILLISECOND"
)


def money(c: Column) -> Column:
    return c.cast(MONEY)


def money_sum(c: Column, alias: str, scale: int = 2) -> Column:
    return F.round(F.sum(money(c)), scale).cast("double").alias(alias)


def money_sum_units(c: Column, alias: str) -> Column:
    """Exact money sum for COMPUTED doubles (products/divisions).

    ``cast(double AS decimal)`` has the same shortest-decimal-vs-binary
    divergence as round() (Spark goes through BigDecimal) — a computed
    value sitting on a .00005 boundary rounds differently per engine.
    floor(x·10⁴+0.5) quantizes identically everywhere; the bigint sum
    is exact; the final /100-floor-/100 emits 2-decimal doubles.
    Source columns with ≤2 real decimals don't need this (their
    decimal cast is boundary-free); pair with MONEY_SUM_UNITS_SQL.
    """
    units = F.floor(c * 10000 + F.lit(0.5)).cast("long")
    return (
        (F.floor(F.sum(units) / 100 + F.lit(0.5)) / 100).alias(alias)
    )


def money_sum_units_sql(expr: str) -> str:
    return (
        f"floor(sum(cast(floor(({expr}) * 10000 + 0.5) AS bigint)) / 100"
        f" + 0.5) / 100"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _order_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders as an SCD2-versioned 'customer state' dimension."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.expr(_EFF_TS_SPARK).alias("eff_ts")
    )
    return with_scd2(o, key="o_custkey", ts="eff_ts")


_ORDER_VERSIONS_DUCK = f"""
    SELECT o_custkey, o_orderkey, {_EFF_TS_DUCK} AS eff_ts,
           coalesce(lead({_EFF_TS_DUCK}) OVER (PARTITION BY o_custkey ORDER BY {_EFF_TS_DUCK})
                    - INTERVAL 1 MILLISECOND,
                    TIMESTAMP '9999-12-31 23:59:59.999') AS end_timestamp,
           (row_number() OVER (PARTITION BY o_custkey ORDER BY {_EFF_TS_DUCK} DESC) = 1) AS is_current
    FROM orders
"""

# ---------------------------------------------------------------------------
# A1 — flagship: TPC-H Q1-shaped pricing summary (groupBy + 6 aggs)

_DISC_SQL = money_sum_units_sql("l_extendedprice * (1 - l_discount)")
_CHARGE_SQL = money_sum_units_sql(
    "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
)


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           cast(round(sum(cast(l_quantity AS {MONEY})), 2) AS double) AS sum_qty,
           cast(round(sum(cast(l_extendedprice AS {MONEY})), 2) AS double) AS sum_base_price,
           {_DISC_SQL} AS sum_disc_price,
           {_CHARGE_SQL} AS sum_charge,
           floor(cast(sum(cast(l_quantity AS {MONEY})) AS double) / count(*)
                 * 10000 + 0.5) / 10000 AS avg_qty,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=["A1", "P1", "P3", "S8"],
    headline=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), "sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            # computed products go through integer units, not a decimal
            # cast — see money_sum_units
            money_sum_units(disc_price, "sum_disc_price"),
            money_sum_units(charge, "sum_charge"),
            # round4, not F.round: engine round() diverges at .00005
            # boundaries on doubles (hit at sf0.01, not sf0.001)
            round4(
                F.sum(money(F.col("l_quantity"))).cast("double") / F.count("*")
            ).alias("avg_qty"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# W1/W2 — SCD2 versioning (reference silver/accounts.sql:35-57)


@query(
    "scd2_versions",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           strftime(eff_ts, '{TS_FMT_DUCK}') AS effective_ts,
           strftime(end_timestamp, '{TS_FMT_DUCK}') AS end_ts,
           is_current
    FROM ({_ORDER_VERSIONS_DUCK})
    """,
    tags=["W1", "W2"],
    headline=True,
)
def scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _order_versions(spark, sf_dir)
    return v.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("eff_ts", TS_FMT).alias("effective_ts"),
        F.date_format("end_timestamp", TS_FMT).alias("end_ts"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# J6 — temporal join (equi key + BETWEEN validity window)


_TEMPORAL_AGG_ORACLE = f"""
    WITH dim AS ({_ORDER_VERSIONS_DUCK}),
         fact AS (
           SELECT o.o_custkey AS f_cust, l.l_shipdate AS f_ts, l.l_quantity
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         )
    SELECT d.o_orderkey AS version_orderkey,
           count(*) AS n_items,
           cast(round(sum(cast(f.l_quantity AS {MONEY})), 2) AS double) AS sum_qty
    FROM fact f
    JOIN dim d ON f.f_cust = d.o_custkey AND f.f_ts BETWEEN d.eff_ts AND d.end_timestamp
    GROUP BY d.o_orderkey
"""


@query(
    "temporal_join_agg",
    oracle=_TEMPORAL_AGG_ORACLE,
    tags=["J6", "J1", "A1"],
    headline=True,
)
def temporal_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = _order_versions(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fact = li.join(o, li["l_orderkey"] == o["o_orderkey"], "inner").select(
        o["o_custkey"].alias("f_cust"),
        li["l_shipdate"].alias("f_ts"),
        li["l_quantity"],
    )
    tj = temporal_join(fact, dim, [("f_cust", "o_custkey")], ts="f_ts", eff="eff_ts")
    return tj.groupBy(dim["o_orderkey"].alias("version_orderkey")).agg(
        F.count("*").alias("n_items"),
        money_sum(F.col("l_quantity"), "sum_qty"),
    )


@query(
    "temporal_join_binned",
    oracle=_TEMPORAL_AGG_ORACLE,
    tags=["J6", "range-join"],
)
def temporal_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same J6 semantics computed through the NON-broadcast scale
    path: ``range_join_binned`` (interval binning → plain equi-join on
    (key, bin) + exact BETWEEN residual). This is what replaces the
    broadcast temporal join when the versioned dim outgrows the
    broadcast threshold; same oracle as temporal_join_agg proves the
    plans are interchangeable. SCD2's open-ended sentinel is clamped to
    the max fact timestamp (an O(1)-row driver action) so the bin
    explode stays proportional to real validity spans."""
    from dbt_tpcdi_spark.operators.temporal import range_join_binned

    dim = _order_versions(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fact = li.join(o, li["l_orderkey"] == o["o_orderkey"], "inner").select(
        o["o_custkey"].alias("f_cust"),
        F.unix_micros(li["l_shipdate"].cast("timestamp")).alias("f_us"),
        li["l_quantity"],
    )
    max_f = fact.agg(F.max("f_us")).first()[0]
    dim_b = dim.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(F.col("eff_ts").cast("timestamp")).alias("lo_us"),
        F.least(
            F.unix_micros(F.col("end_timestamp").cast("timestamp")),
            F.lit(max_f),
        ).alias("hi_us"),
    ).filter(F.col("lo_us") <= F.col("hi_us"))
    month_us = 30 * 24 * 3600 * 1_000_000
    tj = range_join_binned(
        fact, dim_b, val="f_us", lo="lo_us", hi="hi_us",
        bin_width=month_us, keys=[("f_cust", "o_custkey")],
    )
    return tj.groupBy(F.col("o_orderkey").alias("version_orderkey")).agg(
        F.count("*").alias("n_items"),
        money_sum(F.col("l_quantity"), "sum_qty"),
    )


# ---------------------------------------------------------------------------
# W7 — IGNORE-NULLS forward fill (reference gold/dim_customer.sql:14-80)


@query(
    "forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    tags=["W7"],
    headline=True,
)
def forward_fill_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn(
        "__ts_ms", (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__ts_ms").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# W4 + J8 — rolling extremes with argmin/argmax date recovery.
# Spark plan: single window pass with struct-ordered min/max (the
# max_by rewrite of the reference's self-join, SURVEY §4). Oracle:
# the reference-shaped row-frame self-join. Both must agree exactly.


@query(
    "rolling_extremes",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, cast(ts AS date) AS day,
             cast(round(sum(cast(value AS {MONEY})), 4) AS double) AS dv
      FROM events GROUP BY 1, 2
    ),
    numbered AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM daily
    ),
    w AS (
      SELECT user_id, day, dv, rn,
             max(dv) OVER win AS dv_high,
             min(dv) OVER win AS dv_low
      FROM numbered
      WINDOW win AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    hi AS (
      SELECT w.user_id, w.day, min(b.day) AS high_day
      FROM w JOIN numbered b
        ON b.user_id = w.user_id AND b.rn BETWEEN w.rn - 6 AND w.rn AND b.dv = w.dv_high
      GROUP BY 1, 2
    ),
    lo AS (
      SELECT w.user_id, w.day, min(b.day) AS low_day
      FROM w JOIN numbered b
        ON b.user_id = w.user_id AND b.rn BETWEEN w.rn - 6 AND w.rn AND b.dv = w.dv_low
      GROUP BY 1, 2
    )
    SELECT w.user_id, strftime(w.day, '%Y-%m-%d') AS day, w.dv, w.dv_high,
           strftime(hi.high_day, '%Y-%m-%d') AS high_day, w.dv_low,
           strftime(lo.low_day, '%Y-%m-%d') AS low_day
    FROM w
    JOIN hi ON hi.user_id = w.user_id AND hi.day = w.day
    JOIN lo ON lo.user_id = w.user_id AND lo.day = w.day
    """,
    tags=["W4", "J8", "W3"],
    headline=True,
)
def rolling_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum(money(F.col("value"))), 4).cast("double").alias("dv")
    )
    ext = rolling_extreme_with_date(daily, key="user_id", order="day", value="dv",
                                    preceding=6)
    return ext.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dv",
        "dv_high",
        F.date_format("dv_high_day", "yyyy-MM-dd").alias("high_day"),
        "dv_low",
        F.date_format("dv_low_day", "yyyy-MM-dd").alias("low_day"),
    )


# ---------------------------------------------------------------------------
# W6 — trailing aggregate excluding current row (wrk_company_financials)


@query(
    "trailing_sum",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderkey, {_EFF_TS_DUCK} AS eff_ts,
             cast(o_totalprice AS {MONEY}) AS price_dec
      FROM orders
    )
    SELECT o_orderkey,
           cast(round(sum(price_dec) OVER (PARTITION BY o_custkey ORDER BY eff_ts
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) - price_dec, 2)
                AS double) AS trailing4_total
    FROM o
    """,
    tags=["W6"],
)
def trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(_EFF_TS_SPARK).alias("eff_ts"),
        money(F.col("o_totalprice")).alias("price_dec"),
    )
    t = trailing_agg_excluding_current(
        o, key="o_custkey", order="eff_ts", value="price_dec", preceding=4,
        out="trailing4_total",
    )
    return t.select(
        "o_orderkey", F.round("trailing4_total", 2).cast("double").alias("trailing4_total")
    )


# ---------------------------------------------------------------------------
# W3 — QUALIFY row_number() = 1 dedup


@query(
    "qualify_dedup",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '{TS_FMT_DUCK}') AS ship_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_shipdate, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    tags=["W3"],
)
def qualify_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    first = qualify_rn(
        li, "l_orderkey", [F.col("l_shipdate").asc(), F.col("l_linenumber").asc()]
    )
    return first.select(
        "l_orderkey", "l_linenumber", F.date_format("l_shipdate", TS_FMT).alias("ship_ts")
    )


# ---------------------------------------------------------------------------
# §2.8 hash/key — dbt_utils-compatible surrogate keys


@query(
    "surrogate_keys",
    oracle=f"""
    SELECT c_custkey,
           {surrogate_key_sql('c_custkey', 'c_name', 'c_nationkey')} AS sk_customer,
           {surrogate_key_sql('c_mktsegment')} AS sk_segment
    FROM customer
    """,
    tags=["§2.8-keys"],
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        surrogate_key("c_custkey", "c_name", "c_nationkey").alias("sk_customer"),
        surrogate_key("c_mktsegment").alias("sk_segment"),
    )


# ---------------------------------------------------------------------------
# §2.8 conditional — DECODE + IN-list / NULL predicates (P4, P5)


@query(
    "decode_status",
    oracle=f"""
    SELECT CASE o_orderstatus WHEN 'F' THEN 'Completed' WHEN 'O' THEN 'Open'
                              WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_desc,
           count(*) AS n_orders,
           cast(round(sum(cast(o_totalprice AS {MONEY})), 2) AS double) AS total_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
    GROUP BY 1
    """,
    tags=["§2.8-decode", "P3", "P4", "P5", "A1"],
)
def decode_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    status = decode(
        F.col("o_orderstatus"),
        {"F": "Completed", "O": "Open", "P": "Pending"},
        default="Unknown",
    )
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_custkey").isNotNull()
        )
        .groupBy(status.alias("status_desc"))
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice"), "total_price"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — uniqueness test shape (count(*) having > 1)


@query(
    "dup_key_check",
    oracle="""
    SELECT l_orderkey, count(*) AS cnt FROM lineitem
    GROUP BY l_orderkey HAVING count(*) > 1
    """,
    tags=["A3"],
)
def dup_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


# ---------------------------------------------------------------------------
# J1/J2 — multi-way equi joins with broadcast dims (TPC-H Q5 shape)


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {money_sum_units_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    tags=["J1", "J2", "A1"],
    headline=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            money_sum_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J9/J4 — same dimension joined twice under different roles


@query(
    "nation_roles",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_items,
           {money_sum_units_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    """,
    tags=["J9", "J4", "J2"],
)
def nation_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.alias("cn")
    sn = n.alias("sn")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn.n_nationkey"), "left")
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn.n_nationkey"), "left")
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
        .agg(
            F.count("*").alias("n_items"),
            money_sum_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J7 — fallback lookup: two left joins + coalesce (silver/securities.sql:15-16)


@query(
    "fallback_lookup",
    oracle="""
    SELECT c.c_custkey,
           coalesce(n1.n_name, n2.n_name) AS resolved_nation,
           (n1.n_nationkey IS NOT NULL) AS matched_primary
    FROM customer c
    LEFT JOIN nation n1 ON c.c_nationkey = n1.n_nationkey AND n1.n_name LIKE 'A%'
    LEFT JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    """,
    tags=["J7", "J4"],
)
def fallback_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    return (
        c.join(
            F.broadcast(n1),
            (c["c_nationkey"] == F.col("n1.n_nationkey"))
            & F.col("n1.n_name").like("A%"),
            "left",
        )
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2.n_nationkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n1.n_name"), F.col("n2.n_name")).alias("resolved_nation"),
            F.col("n1.n_nationkey").isNotNull().alias("matched_primary"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — GROUP BY ALL shape (fact_cash_balances)


@query(
    "daily_user_balance",
    oracle=f"""
    SELECT user_id, strftime(cast(ts AS date), '%Y-%m-%d') AS day, event_type,
           cast(round(sum(cast(value AS {MONEY})), 2) AS double) AS total_value,
           count(*) AS n_events
    FROM events
    GROUP BY ALL
    """,
    tags=["A1", "A2"],
)
def daily_user_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            money_sum(F.col("value"), "total_value"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# custom op — as-of join (window-based, no range-join blow-up).
# Oracle: DuckDB's native ASOF JOIN.


@query(
    "asof_join",
    oracle=f"""
    WITH dim AS (
      SELECT o_custkey, o_orderkey, {_EFF_TS_DUCK} AS eff_ts FROM orders
    )
    SELECT e.event_id, e.user_id, d.o_orderkey AS asof_orderkey
    FROM events e
    ASOF LEFT JOIN dim d ON e.user_id = d.o_custkey AND e.ts >= d.eff_ts
    """,
    tags=["custom-asof", "J6"],
)
def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    dim = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_orderkey"), F.expr(_EFF_TS_SPARK).alias("eff_ts")
    ).withColumnRenamed("o_custkey", "user_id")
    joined = join_asof(e, dim, key="user_id", fact_ts="ts", dim_ts="eff_ts")
    return joined.select("event_id", "user_id", F.col("asof_o_orderkey").alias("asof_orderkey"))


# ---------------------------------------------------------------------------
# streaming-shape (batch equivalent) — tumbling window aggregation


@query(
    "tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           cast(round(sum(cast(value AS {MONEY})), 2) AS double) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=["§2.9-window", "A1"],
    headline=True,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window",
    oracle=f"""
    SELECT strftime(ws, '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           cast(round(sum(cast(value AS {MONEY})), 2) AS double) AS total_value
    FROM (
        SELECT e.*,
               time_bucket(INTERVAL 15 MINUTE, ts)
                   - k.k * INTERVAL 15 MINUTE AS ws
        FROM events e, (SELECT unnest(range(0, 4)) AS k) k
    )
    GROUP BY 1, 2
    """,
    tags=["§2.9-window", "A1"],
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 1-hour span every 15 minutes, so
    each event lands in exactly 4 windows. The oracle enumerates the
    4 covering window starts per event explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                  "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# O1/top-k — deterministic top-N (rank on rounded value + key tiebreak)


@query(
    "top_revenue_orders",
    oracle=f"""
    WITH rev AS (
      SELECT l_orderkey,
             {money_sum_units_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey, revenue FROM (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM rev
    ) WHERE rn <= 10
    """,
    tags=["O1", "A1", "W3"],
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k WITHOUT a global window: orderBy+limit plans as
    TakeOrderedAndProject (per-partition partial top-k, driver merges k
    rows) — same deterministic (value desc, key asc) tiebreak, no
    single-partition shuffle (reference gold O1 shape at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        money_sum_units(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        )
    )
    return rev.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(10)


# ---------------------------------------------------------------------------
# §2.8 semi-structured — JSON path extraction (events.props)


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           cast(sum(cast(props->>'$.k' AS bigint)) AS bigint) AS sum_k,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
    tags=["§2.8-json", "A1"],
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"), F.count("*").alias("n_events")
    )


# ---------------------------------------------------------------------------
# §2.7 set ops — UNION ALL + distinct


@query(
    "union_entities",
    oracle=f"""
    SELECT src, count(*) AS n,
           cast(round(sum(cast(acctbal AS {MONEY})), 2) AS double) AS total_balance
    FROM (
      SELECT 'customer' AS src, c_acctbal AS acctbal FROM customer WHERE c_acctbal > 0
      UNION ALL
      SELECT 'supplier' AS src, s_acctbal AS acctbal FROM supplier WHERE s_acctbal > 0
    ) GROUP BY 1
    """,
    tags=["§2.7-union", "A1"],
)
def union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        F.lit("customer").alias("src"), F.col("c_acctbal").alias("acctbal")
    )
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0).select(
        F.lit("supplier").alias("src"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s).groupBy("src").agg(
        F.count("*").alias("n"), money_sum(F.col("acctbal"), "total_balance")
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    tags=["A4"],
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").distinct()
