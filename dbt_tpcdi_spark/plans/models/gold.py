"""Gold layer: 7 dims + 6 facts + the ephemeral work model
(reference ``models/gold/**``, ``models/work/**``).

Surrogate keys replicate dbt_utils.generate_surrogate_key exactly
(functions/keys.py). Temporal joins are J6; ``fact_market_history``
drops the reference's row-multiplying LEFT JOIN to the quarterly work
model by default and reproduces it under ``SPARK_TPCDI_PARITY=strict``
(it selects no columns from it, but the multiplicity is observable
behavior — each mode carries its own oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_tpcdi_spark.functions.keys import surrogate_key
from dbt_tpcdi_spark.operators.windows import forward_fill
from dbt_tpcdi_spark.plans.registry import Layout, model

_LOWGRADE = ["BB", "B", "CCC", "CC", "C", "D", "BB+", "B+", "CCC+", "BB-",
             "B-", "CCC-"]


@model(layer="gold", deps=("employees",))
def dim_broker(ref, src) -> DataFrame:
    """gold/dim_broker.sql"""
    return ref("employees").select(
        surrogate_key("employee_id").alias("sk_broker_id"),
        F.col("employee_id").alias("broker_id"),
        "manager_id",
        "first_name",
        "last_name",
        "middle_initial",
        "job_code",
        "branch",
        "office",
        "phone",
    )


@model(layer="gold", deps=("companies",))
def dim_company(ref, src) -> DataFrame:
    """gold/dim_company.sql — adds the S&P low-grade flag."""
    c = ref("companies")
    return c.select(
        surrogate_key("company_id", "effective_timestamp").alias("sk_company_id"),
        "company_id",
        "status",
        "name",
        "industry",
        "ceo",
        "address_line1",
        "address_line2",
        "postal_code",
        "city",
        "state_province",
        "country",
        "description",
        "founding_date",
        "sp_rating",
        F.col("sp_rating").isin(_LOWGRADE).alias("is_lowgrade"),
        "effective_timestamp",
        "end_timestamp",
        "is_current",
    )


#: the 21 attributes forward-filled across customer versions
#: (gold/dim_customer.sql:14-80; UPDCUST rows carry only changed fields)
_FFILL_COLS = [
    "tax_id", "last_name", "first_name", "middle_name", "gender", "tier",
    "dob", "address_line1", "address_line2", "postal_code", "city",
    "state_province", "country", "phone1", "phone2", "phone3",
    "primary_email", "alternate_email", "local_tax_rate_name",
    "local_tax_rate", "national_tax_rate_name", "national_tax_rate",
]


@model(layer="gold", deps=("customers", "syndicated_prospect"))
def dim_customer(ref, src) -> DataFrame:
    """gold/dim_customer.sql — prospect demographic enrichment (J5,
    5-column natural left join) + IGNORE-NULLS forward fill (W7)."""
    c = ref("customers")
    p = ref("syndicated_prospect").select(
        "first_name", "last_name", "postal_code", "address_line1",
        "address_line2", "agency_id", "credit_rating", "net_worth",
    )
    s1 = c.join(
        F.broadcast(p),
        ["first_name", "last_name", "postal_code", "address_line1",
         "address_line2"],
        "left",
    )
    filled = forward_fill(
        s1, _FFILL_COLS, key="customer_id", order="effective_timestamp"
    )
    return filled.select(
        surrogate_key("customer_id", "effective_timestamp").alias(
            "sk_customer_id"
        ),
        "customer_id",
        "tax_id",
        "status",
        "last_name",
        "first_name",
        F.col("middle_name").alias("middleinitial"),
        "gender",
        "tier",
        "dob",
        "address_line1",
        "address_line2",
        "postal_code",
        "city",
        "state_province",
        "country",
        "phone1",
        "phone2",
        "phone3",
        "primary_email",
        "alternate_email",
        "local_tax_rate_name",
        "local_tax_rate",
        "national_tax_rate_name",
        "national_tax_rate",
        "agency_id",
        "credit_rating",
        "net_worth",
        "effective_timestamp",
        "end_timestamp",
        "is_current",
    )


@model(layer="gold", deps=("accounts", "dim_customer", "dim_broker"))
def dim_account(ref, src) -> DataFrame:
    """gold/dim_account.sql — temporal join to the customer version in
    effect when the account version began + USING(broker_id)."""
    a = ref("accounts")
    c = ref("dim_customer")
    b = ref("dim_broker")
    j = a.join(
        c,
        (a["customer_id"] == c["customer_id"])
        & a["effective_timestamp"].between(
            c["effective_timestamp"], c["end_timestamp"]
        ),
    ).join(F.broadcast(b), a["broker_id"] == b["broker_id"])
    return j.select(
        surrogate_key(a["account_id"], a["effective_timestamp"]).alias(
            "sk_account_id"
        ),
        a["account_id"],
        b["sk_broker_id"],
        c["sk_customer_id"],
        a["status"],
        a["account_desc"],
        a["tax_status"],
        a["effective_timestamp"],
        a["end_timestamp"],
        a["is_current"],
    )


@model(layer="gold", deps=("securities", "dim_company"))
def dim_security(ref, src) -> DataFrame:
    """gold/dim_security.sql — temporal company attach (J6)."""
    s = ref("securities")
    c = ref("dim_company")
    j = s.join(
        c,
        (s["company_id"] == c["company_id"])
        & s["effective_timestamp"].between(
            c["effective_timestamp"], c["end_timestamp"]
        ),
    )
    return j.select(
        surrogate_key(s["symbol"], s["effective_timestamp"]).alias(
            "sk_security_id"
        ),
        s["symbol"],
        s["issue_type"].alias("issue"),
        s["status"],
        s["name"],
        s["exchange_id"],
        c["sk_company_id"],
        s["shares_outstanding"],
        s["first_trade_date"],
        s["first_exchange_date"],
        s["dividend"],
        s["effective_timestamp"],
        s["end_timestamp"],
        s["is_current"],
    )


@model(layer="gold", deps=("trades_history",))
def dim_trade(ref, src) -> DataFrame:
    """gold/dim_trade.sql"""
    t = ref("trades_history")
    return t.select(
        surrogate_key("trade_id", "effective_timestamp").alias("sk_trade_id"),
        "trade_id",
        F.col("trade_status").alias("status"),
        "transaction_type",
        F.col("trade_type").alias("type"),
        F.col("executor_name").alias("executed_by"),
        "effective_timestamp",
        "end_timestamp",
        "is_current",
    )


@model(layer="gold", deps=("date",))
def dim_date(ref, src) -> DataFrame:
    """gold/dim_date.sql — passthrough."""
    return ref("date")


@model(layer="gold", deps=("trades", "dim_trade", "dim_account", "dim_security"),
       layout=Layout(range_by=("sk_create_date",),
                     stats_cols=("sk_create_date", "sk_close_date"),
                     bloom_cols=("sk_account_id", "sk_trade_id")))
def fact_trade(ref, src) -> DataFrame:
    """gold/fact_trade.sql — three temporal joins on create_timestamp."""
    t = ref("trades")
    dt_ = ref("dim_trade")
    a = ref("dim_account")
    s = ref("dim_security")
    j = (
        t.join(
            dt_,
            (t["trade_id"] == dt_["trade_id"])
            & t["create_timestamp"].between(
                dt_["effective_timestamp"], dt_["end_timestamp"]
            ),
        )
        .join(
            a,
            (t["account_id"] == a["account_id"])
            & t["create_timestamp"].between(
                a["effective_timestamp"], a["end_timestamp"]
            ),
        )
        .join(
            s,
            (t["symbol"] == s["symbol"])
            & t["create_timestamp"].between(
                s["effective_timestamp"], s["end_timestamp"]
            ),
        )
    )
    return j.select(
        dt_["sk_trade_id"],
        a["sk_broker_id"],
        a["sk_customer_id"],
        a["sk_account_id"],
        s["sk_security_id"],
        F.to_date(t["create_timestamp"]).alias("sk_create_date"),
        t["create_timestamp"],
        F.to_date(t["close_timestamp"]).alias("sk_close_date"),
        t["close_timestamp"],
        dt_["executed_by"],
        t["quantity"],
        t["bid_price"],
        t["trade_price"],
        t["fee"],
        t["commission"],
        t["tax"],
    )


@model(layer="gold", deps=("cash_transactions", "dim_account"),
       layout=Layout(range_by=("sk_transaction_date",),
                     stats_cols=("sk_transaction_date",),
                     bloom_cols=("sk_account_id",)))
def fact_cash_transactions(ref, src) -> DataFrame:
    """gold/fact_cash_transactions.sql"""
    s1 = ref("cash_transactions").withColumn(
        "sk_transaction_date", F.to_date(F.col("transaction_timestamp"))
    )
    a = ref("dim_account")
    j = s1.join(
        a,
        (s1["account_id"] == a["account_id"])
        & s1["transaction_timestamp"].between(
            a["effective_timestamp"], a["end_timestamp"]
        ),
    )
    return j.select(
        a["sk_customer_id"],
        a["sk_account_id"],
        s1["sk_transaction_date"],
        s1["transaction_timestamp"],
        s1["amount"],
        s1["description"],
    )


@model(layer="gold", deps=("fact_cash_transactions",),
       layout=Layout(range_by=("sk_transaction_date",),
                     stats_cols=("sk_transaction_date",),
                     bloom_cols=("sk_account_id",)))
def fact_cash_balances(ref, src) -> DataFrame:
    """gold/fact_cash_balances.sql — GROUP BY ALL daily balance (A1)."""
    return (
        ref("fact_cash_transactions")
        .groupBy("sk_customer_id", "sk_account_id", "sk_transaction_date",
                 "description")
        .agg(F.sum("amount").alias("amount"))
        .select("sk_customer_id", "sk_account_id", "sk_transaction_date",
                "amount", "description")
    )


@model(layer="gold",
       deps=("holdings_history", "dim_trade", "dim_account", "dim_security"),
       layout=Layout(range_by=("sk_trade_date",),
                     stats_cols=("sk_trade_date",),
                     bloom_cols=("sk_account_id", "sk_current_trade_id")))
def fact_holdings(ref, src) -> DataFrame:
    """gold/fact_holdings.sql — dim_trade twice by role (J9: current vs
    previous trade); security joined on symbol only (faithful: no
    temporal clause → multiplies across security versions)."""
    s1 = ref("holdings_history")
    ct = ref("dim_trade").alias("ct")
    pt = ref("dim_trade").alias("pt")
    a = ref("dim_account")
    s = ref("dim_security")
    j = (
        s1.join(ct, s1["trade_id"] == F.col("ct.trade_id"))
        .join(pt, s1["previous_trade_id"] == F.col("pt.trade_id"))
        .join(
            a,
            (s1["account_id"] == a["account_id"])
            & s1["create_timestamp"].between(
                a["effective_timestamp"], a["end_timestamp"]
            ),
        )
        .join(s, s1["symbol"] == s["symbol"])
    )
    return j.select(
        F.col("ct.sk_trade_id").alias("sk_current_trade_id"),
        F.col("pt.sk_trade_id").alias("sk_trade_id"),
        a["sk_customer_id"],
        a["sk_account_id"],
        s["sk_security_id"],
        F.to_date(s1["create_timestamp"]).alias("sk_trade_date"),
        s1["create_timestamp"].alias("trade_timestamp"),
        s1["trade_price"].alias("current_price"),
        s1["quantity"].alias("current_holding"),
        s1["bid_price"].alias("current_bid_price"),
        s1["fee"].alias("current_fee"),
        s1["commission"].alias("current_commission"),
    )


@model(layer="work", deps=("financials", "dim_company"))
def wrk_company_financials(ref, src) -> DataFrame:
    """work/wrk_company_financials.sql — trailing-4-quarter basic EPS
    excluding the current quarter (W6); ephemeral in the reference."""
    f = ref("financials")
    c = ref("dim_company")
    j = f.join(
        c,
        (f["company_id"] == c["company_id"])
        & f["effective_timestamp"].between(
            c["effective_timestamp"], c["end_timestamp"]
        ),
    ).select(
        c["sk_company_id"],
        f["company_id"],
        f["quarter_start_date"],
        f["eps"],
    )
    w = (
        Window.partitionBy("company_id")
        .orderBy(F.col("quarter_start_date").asc())
        .rowsBetween(-4, 0)
    )
    return j.select(
        "sk_company_id",
        "company_id",
        "quarter_start_date",
        (F.sum("eps").over(w) - F.col("eps")).alias("sum_basic_eps"),
    )


@model(layer="gold",
       deps=("daily_market", "dim_security", "wrk_company_financials"),
       layout=Layout(range_by=("sk_date_id",),
                     stats_cols=("sk_date_id",),
                     bloom_cols=("sk_security_id",)))
def fact_market_history(ref, src) -> DataFrame:
    """gold/fact_market_history.sql — temporal security join where a
    DATE meets TIMESTAMP bounds (hazard 6: date coerces to midnight).

    Two plans, switched by ``SPARK_TPCDI_PARITY`` (same selector as
    ``daily_market``):

    - default (**corrected**): no quarterly join. The reference's
      ``LEFT JOIN USING (sk_company_id)`` to the quarterly work model
      (reference models/gold/fact_market_history.sql:19-20) selects NO
      columns from it, so its only observable effect is multiplying
      each market-history row by the company's quarter count — a fact
      table inflated ~5× for nothing. One row per (security, date).
    - ``strict``: the reference's row-multiplying LEFT JOIN, byte-
      faithful multiplicity included (its own oracle twin:
      ``tpcdi/oracle.FACT_MARKET_HISTORY_STRICT_SQL``)."""
    dmh = ref("daily_market")
    s = ref("dim_security")
    j = dmh.join(
        s,
        (s["symbol"] == dmh["dm_s_symb"])
        & dmh["dm_date"]
        .cast("timestamp")
        .between(s["effective_timestamp"], s["end_timestamp"]),
    )
    if os.environ.get("SPARK_TPCDI_PARITY", "") == "strict":
        f = ref("wrk_company_financials").select("sk_company_id")
        j = j.join(f, "sk_company_id", "left")
    return j.select(
        s["sk_security_id"],
        F.col("sk_company_id"),
        dmh["dm_date"].alias("sk_date_id"),
        ((s["dividend"] / dmh["dm_close"]) / 100).alias("yield"),
        dmh["fifty_two_week_high"],
        dmh["fifty_two_week_high_date"].alias("sk_fifty_two_week_high_date"),
        dmh["fifty_two_week_low"],
        dmh["fifty_two_week_low_date"].alias("sk_fifty_two_week_low_date"),
        dmh["dm_close"].alias("closeprice"),
        dmh["dm_high"].alias("dayhigh"),
        dmh["dm_low"].alias("daylow"),
        dmh["dm_vol"].alias("volume"),
    )


@model(layer="gold", deps=("watches", "dim_customer", "dim_security"),
       layout=Layout(range_by=("sk_date_placed",),
                     stats_cols=("sk_date_placed",),
                     bloom_cols=("sk_customer_id",)))
def fact_watches(ref, src) -> DataFrame:
    """gold/fact_watches.sql — two temporal joins on placed_timestamp."""
    w = ref("watches")
    c = ref("dim_customer")
    s = ref("dim_security")
    j = w.join(
        c,
        (w["customer_id"] == c["customer_id"])
        & w["placed_timestamp"].between(
            c["effective_timestamp"], c["end_timestamp"]
        ),
    ).join(
        s,
        (w["symbol"] == s["symbol"])
        & w["placed_timestamp"].between(
            s["effective_timestamp"], s["end_timestamp"]
        ),
    )
    return j.select(
        c["sk_customer_id"],
        s["sk_security_id"],
        F.to_date(w["placed_timestamp"]).alias("sk_date_placed"),
        F.to_date(w["removed_timestamp"]).alias("sk_date_removed"),
        F.lit(1).alias("watch_cnt"),
    )
