"""Silver layer: 14 entity models (reference ``models/silver/**``).

Six are SCD2-versioned via the shared ``with_scd2`` operator
(SURVEY.md §1.3); the temporal joins follow J6; ``daily_market``
deliberately keeps the reference-shaped self-join date recovery (J8)
because its calendar-range/rows-frame mismatch is observable behavior
— the single-pass ``max_by`` rewrite lives in
``operators/windows.rolling_extreme_with_date`` for the scale path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_tpcdi_spark.functions.scalar import decode
from dbt_tpcdi_spark.operators.scd2 import with_scd2
from dbt_tpcdi_spark.operators.windows import qualify_rn
from dbt_tpcdi_spark.plans.registry import model

_CUSTOMER_COLS = [
    ("c_tax_id", "tax_id"),
    ("c_gndr", "gender"),
    ("c_tier", "tier"),
    ("c_dob", "dob"),
    ("c_l_name", "last_name"),
    ("c_f_name", "first_name"),
    ("c_m_name", "middle_name"),
    ("c_adline1", "address_line1"),
    ("c_adline2", "address_line2"),
    ("c_zipcode", "postal_code"),
    ("c_city", "city"),
    ("c_state_prov", "state_province"),
    ("c_ctry", "country"),
    ("c_prim_email", "primary_email"),
    ("c_alt_email", "alternate_email"),
    ("c_phone_1", "phone1"),
    ("c_phone_2", "phone2"),
    ("c_phone_3", "phone3"),
]


def _with_tax_rates(cm: DataFrame, tax: DataFrame):
    """The two left tax-rate lookups shared by accounts/customers
    (accounts.sql:60-67, J4: same table twice under different roles)."""
    ntx, ltx = tax.alias("ntx"), tax.alias("ltx")
    return (
        cm.join(ntx, cm["c_nat_tx_id"] == F.col("ntx.tx_id"), "left")
        .join(ltx, cm["c_lcl_tx_id"] == F.col("ltx.tx_id"), "left")
    )


@model(layer="silver", deps=("crm_customer_mgmt", "reference_tax_rate"),
       scd2_key="account_id")
def accounts(ref, src) -> DataFrame:
    """silver/accounts.sql — SCD2 by account."""
    cm = ref("crm_customer_mgmt")
    j = _with_tax_rates(cm, ref("reference_tax_rate")).where(
        cm["ca_id"].isNotNull()
    )
    sel = j.select(
        cm["action_type"],
        decode(
            cm["action_type"],
            {"NEW": "Active", "ADDACCT": "Active", "UPDACCT": "Active",
             "CLOSEACCT": "Inactive"},
        ).alias("status"),
        cm["ca_id"].alias("account_id"),
        cm["ca_name"].alias("account_desc"),
        cm["c_id"].alias("customer_id"),
        *[cm[src_c].alias(dst) for src_c, dst in _CUSTOMER_COLS],
        cm["c_lcl_tx_id"].alias("local_tax_rate_name"),
        F.col("ltx.tx_rate").alias("local_tax_rate"),
        cm["c_nat_tx_id"].alias("national_tax_rate_name"),
        F.col("ntx.tx_rate").alias("national_tax_rate"),
        cm["ca_tax_st"].alias("tax_status"),
        cm["ca_b_id"].alias("broker_id"),
        cm["action_ts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="account_id")


@model(layer="silver", deps=("crm_customer_mgmt", "reference_tax_rate"),
       scd2_key="customer_id")
def customers(ref, src) -> DataFrame:
    """silver/customers.sql — SCD2 by customer over NEW/INACT/UPDCUST."""
    cm = ref("crm_customer_mgmt")
    j = _with_tax_rates(cm, ref("reference_tax_rate")).where(
        cm["action_type"].isin("NEW", "INACT", "UPDCUST")
    )
    sel = j.select(
        cm["action_type"],
        decode(
            cm["action_type"],
            {"NEW": "Active", "ADDACCT": "Active", "UPDACCT": "Active",
             "UPDCUST": "Active", "INACT": "Inactive"},
        ).alias("status"),
        cm["c_id"].alias("customer_id"),
        cm["ca_id"].alias("account_id"),
        *[cm[src_c].alias(dst) for src_c, dst in _CUSTOMER_COLS],
        cm["c_lcl_tx_id"].alias("local_tax_rate_name"),
        F.col("ltx.tx_rate").alias("local_tax_rate"),
        cm["c_nat_tx_id"].alias("national_tax_rate_name"),
        F.col("ntx.tx_rate").alias("national_tax_rate"),
        cm["ca_tax_st"].alias("account_tax_status"),
        cm["ca_b_id"].alias("broker_id"),
        cm["action_ts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="customer_id")


@model(layer="silver",
       deps=("finwire_company", "reference_status_type", "reference_industry"),
       scd2_key="company_id")
def companies(ref, src) -> DataFrame:
    """silver/companies.sql — SCD2 by company (CIK); inner code-table
    joins drop rows with unknown status/industry (J1, broadcast-sized)."""
    cmp = ref("finwire_company")
    st = ref("reference_status_type")
    ind = ref("reference_industry")
    j = (
        cmp.join(F.broadcast(st), cmp["status"] == st["st_id"])
        .join(F.broadcast(ind), cmp["industry_id"] == ind["in_id"])
    )
    sel = j.select(
        cmp["cik"].alias("company_id"),
        st["st_name"].alias("status"),
        cmp["company_name"].alias("name"),
        ind["in_name"].alias("industry"),
        cmp["ceo_name"].alias("ceo"),
        cmp["address_line1"],
        cmp["address_line2"],
        cmp["postal_code"],
        cmp["city"],
        cmp["state_province"],
        cmp["country"],
        cmp["description"],
        cmp["founding_date"],
        cmp["sp_rating"],
        cmp["pts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="company_id")


def _join_company_fallback(s: DataFrame, comp: DataFrame):
    """J7: resolve the company by CIK, else by name — two temporal left
    joins + coalesce (securities.sql:15-16,41-46)."""
    c1, c2 = comp.alias("c1"), comp.alias("c2")
    return (
        s.join(
            c1,
            (s["cik"] == F.col("c1.company_id"))
            & s["pts"].between(
                F.col("c1.effective_timestamp"), F.col("c1.end_timestamp")
            ),
            "left",
        ).join(
            c2,
            (s["company_name"] == F.col("c2.name"))
            & s["pts"].between(
                F.col("c2.effective_timestamp"), F.col("c2.end_timestamp")
            ),
            "left",
        )
    )


@model(layer="silver", deps=("finwire_security", "companies"),
       scd2_key="symbol")
def securities(ref, src) -> DataFrame:
    """silver/securities.sql — SCD2 by symbol."""
    s = ref("finwire_security")
    j = _join_company_fallback(s, ref("companies"))
    sel = j.select(
        s["symbol"],
        s["issue_type"],
        F.when(s["status"] == "ACTV", "Active")
        .when(s["status"] == "INAC", "Inactive")
        .alias("status"),
        s["name"],
        s["ex_id"].alias("exchange_id"),
        s["sh_out"].alias("shares_outstanding"),
        s["first_trade_date"],
        s["first_exchange_date"],
        s["dividend"],
        F.coalesce(F.col("c1.name"), F.col("c2.name")).alias("company_name"),
        F.coalesce(F.col("c1.company_id"), F.col("c2.company_id")).alias(
            "company_id"
        ),
        s["pts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="symbol")


@model(layer="silver", deps=("finwire_financial", "companies"),
       scd2_key="company_id")
def financials(ref, src) -> DataFrame:
    """silver/financials.sql — SCD2 by company over quarterly postings."""
    s = ref("finwire_financial")
    j = _join_company_fallback(s, ref("companies"))
    sel = j.select(
        s["year"],
        s["quarter"],
        s["quarter_start_date"],
        s["posting_date"],
        s["revenue"],
        s["earnings"],
        s["eps"],
        s["diluted_eps"],
        s["margin"],
        s["inventory"],
        s["assets"],
        s["liabilities"],
        s["sh_out"],
        s["diluted_sh_out"],
        F.coalesce(F.col("c1.name"), F.col("c2.name")).alias("company_name"),
        F.coalesce(F.col("c1.company_id"), F.col("c2.company_id")).alias(
            "company_id"
        ),
        s["pts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="company_id")


@model(layer="silver",
       deps=("brokerage_trade", "brokerage_trade_history",
             "reference_trade_type", "reference_status_type"),
       scd2_key="trade_id",
       # partition-scoped incremental merge: trade ids are assigned
       # roughly monotonically in time (TPC-DI), so a Batch2/3 delta
       # — late corrections + new trades — clusters in the top id
       # ranges and rewrites only those partitions (~32k keys each).
       # id-derived (not timestamp-derived) because a CDC update may
       # carry a NEW t_dts while the key must stay in its partition.
       merge_partition=("mp_id_block", "CAST(trade_id DIV 32768 AS INT)"))
def trades_history(ref, src) -> DataFrame:
    """silver/trades_history.sql — 4-way join (J2; status_type twice)
    then SCD2 by trade over history timestamps."""
    t = ref("brokerage_trade")
    th = ref("brokerage_trade_history")
    tt = ref("reference_trade_type")
    st = ref("reference_status_type")
    ts_, us = st.alias("ts"), st.alias("us")
    j = (
        t.join(th, t["t_id"] == th["th_t_id"])
        .join(F.broadcast(tt), t["t_tt_id"] == tt["tt_id"])
        .join(F.broadcast(ts_), t["t_st_id"] == F.col("ts.st_id"))
        .join(F.broadcast(us), th["th_st_id"] == F.col("us.st_id"))
    )
    sel = j.select(
        t["t_id"].alias("trade_id"),
        t["t_dts"].alias("trade_timestamp"),
        t["t_ca_id"].alias("account_id"),
        F.col("ts.st_name").alias("trade_status"),
        tt["tt_name"].alias("trade_type"),
        F.when(t["t_is_cash"], "Cash")
        .when(~t["t_is_cash"], "Margin")
        .alias("transaction_type"),
        t["t_s_symb"].alias("symbol"),
        t["t_exec_name"].alias("executor_name"),
        t["t_qty"].alias("quantity"),
        t["t_bid_price"].alias("bid_price"),
        t["t_trade_price"].alias("trade_price"),
        t["t_chrg"].alias("fee"),
        t["t_comm"].alias("commission"),
        t["t_tax"].alias("tax"),
        F.col("us.st_name").alias("update_status"),
        th["th_dts"].alias("effective_timestamp"),
    )
    return with_scd2(sel, key="trade_id")


@model(layer="silver", deps=("trades_history",))
def trades(ref, src) -> DataFrame:
    """silver/trades.sql — collapse history to one row per trade with
    create/close timestamps (W5 unbounded window + DISTINCT)."""
    th = ref("trades_history")
    w = Window.partitionBy("trade_id")
    return th.select(
        "trade_id",
        "account_id",
        "trade_status",
        "trade_type",
        "transaction_type",
        "symbol",
        "executor_name",
        "quantity",
        "bid_price",
        "trade_price",
        "fee",
        "commission",
        "tax",
        F.min("effective_timestamp").over(w).alias("create_timestamp"),
        F.max("effective_timestamp").over(w).alias("close_timestamp"),
    ).distinct()


@model(layer="silver", deps=("brokerage_daily_market",))
def daily_market(ref, src) -> DataFrame:
    """silver/daily_market.sql — 52-week extremes via a 365-row window
    (W4) with the date each extreme occurred.

    Two plans, switched by ``SPARK_TPCDI_PARITY``:

    - default (**fast**): min/max over ``struct(value, epoch_day)``
      picks the extreme AND its earliest tie date (the J8 self-join
      collapses to W4), evaluated through the O(n) two-block
      prefix/suffix decomposition (``sliding_extremes_blocks``, r10)
      instead of the naive O(365·n) frame re-scan — no frame re-scan,
      no QUALIFY, and since r12 the SKEW-SAFE evaluation is the
      default (two-phase range numbering + suffix equi-join on
      ``rn − 364``: no per-key serial pass, a 30%-hot-symbol feed
      degrades ≤1.5× where the per-key plan lost 2.2×). This is the
      plan that survives 100 TB.
    - ``strict``: the reference-shaped calendar self-join + QUALIFY
      (silver/daily_market.sql:8-34). O(rows×365) per symbol, but
      byte-faithful to the reference on the add_months edge: the
      calendar window [add_months(d,-12), d] spans 365-366 *days* while
      the fast frame spans 364 preceding *rows*, so on gapless daily
      data a value tie exactly one year ago can yield an earlier
      extreme date than any in-frame row.
    """
    dm = ref("brokerage_daily_market")
    w = (
        Window.partitionBy("dm_s_symb")
        .orderBy(F.col("dm_date").asc())
        .rowsBetween(-364, 0)
    )
    if os.environ.get("SPARK_TPCDI_PARITY", "") != "strict":
        from dbt_tpcdi_spark.operators.windows import (
            sliding_extremes_blocks,
        )

        days = F.datediff(F.col("dm_date"), F.lit("1970-01-01"))
        out = sliding_extremes_blocks(
            dm, "dm_s_symb", "dm_date",
            [
                ("__lo", F.struct(F.col("dm_low").alias("v"),
                                  days.alias("d")), "min"),
                ("__hi", F.struct(F.col("dm_high").alias("v"),
                                  (-days).alias("negd")), "max"),
            ],
            preceding=364,
        )
        epoch = F.lit("1970-01-01").cast("date")
        return out.select(
            *dm.columns,
            F.col("__lo")["v"].alias("fifty_two_week_low"),
            F.date_add(epoch, F.col("__lo")["d"]).alias(
                "fifty_two_week_low_date"),
            F.col("__hi")["v"].alias("fifty_two_week_high"),
            F.date_add(epoch, -F.col("__hi")["negd"]).alias(
                "fifty_two_week_high_date"),
        )
    s1 = dm.withColumn("fifty_two_week_low", F.min("dm_low").over(w)).withColumn(
        "fifty_two_week_high", F.max("dm_high").over(w)
    )
    a, b, c = s1.alias("a"), s1.alias("b"), s1.alias("c")
    s2 = (
        a.join(
            b,
            (F.col("a.dm_s_symb") == F.col("b.dm_s_symb"))
            & (F.col("a.fifty_two_week_low") == F.col("b.dm_low"))
            & F.col("b.dm_date").between(
                F.add_months(F.col("a.dm_date"), -12), F.col("a.dm_date")
            ),
        )
        .join(
            c,
            (F.col("a.dm_s_symb") == F.col("c.dm_s_symb"))
            & (F.col("a.fifty_two_week_high") == F.col("c.dm_high"))
            & F.col("c.dm_date").between(
                F.add_months(F.col("a.dm_date"), -12), F.col("a.dm_date")
            ),
        )
        .select(
            "a.*",
            F.col("b.dm_date").alias("fifty_two_week_low_date"),
            F.col("c.dm_date").alias("fifty_two_week_high_date"),
        )
    )
    return qualify_rn(
        s2,
        ["dm_s_symb", "dm_date"],
        [F.col("fifty_two_week_low_date").asc(),
         F.col("fifty_two_week_high_date").asc()],
    )


@model(layer="silver", deps=("brokerage_watch_history", "securities"))
def watches_history(ref, src) -> DataFrame:
    """silver/watches_history.sql — action mapping + USING(symbol) join
    (J3; joins every matching security version — no temporal clause,
    faithfully)."""
    wh = ref("brokerage_watch_history")
    s1 = wh.select(
        F.col("w_c_id").alias("customer_id"),
        F.col("w_s_symb").alias("symbol"),
        F.col("w_dts").alias("watch_timestamp"),
        F.when(F.col("w_action") == "ACTV", "Activate")
        .when(F.col("w_action") == "CNCL", "Cancelled")
        .alias("action_type"),
    )
    sec = ref("securities")
    return s1.join(sec, "symbol").select(
        "customer_id",
        "symbol",
        "watch_timestamp",
        "action_type",
        "company_id",
        "company_name",
        "exchange_id",
        sec["status"].alias("security_status"),
    )


@model(layer="silver", deps=("watches_history",))
def watches(ref, src) -> DataFrame:
    """silver/watches.sql — collapse watch events (A2 GROUP BY ALL +
    min/max) and derive watch_status."""
    wh = ref("watches_history")
    s1 = wh.withColumn(
        "placed_timestamp",
        F.when(F.col("action_type") == "Activate", F.col("watch_timestamp")),
    ).withColumn(
        "removed_timestamp",
        F.when(F.col("action_type") == "Cancelled", F.col("watch_timestamp")),
    )
    s2 = s1.groupBy(
        "customer_id", "symbol", "company_id", "company_name", "exchange_id",
        "security_status",
    ).agg(
        F.min("placed_timestamp").alias("placed_timestamp"),
        F.max("removed_timestamp").alias("removed_timestamp"),
    )
    return s2.withColumn(
        "watch_status",
        F.when(F.col("removed_timestamp").isNull(), "Active").otherwise(
            "Inactive"
        ),
    )


@model(layer="silver", deps=("brokerage_holding_history", "trades"))
def holdings_history(ref, src) -> DataFrame:
    """silver/holdings_history.sql — USING(trade_id) enrichment (J3)."""
    hh = ref("brokerage_holding_history").select(
        F.col("hh_t_id").alias("trade_id"),
        F.col("hh_h_t_id").alias("previous_trade_id"),
        F.col("hh_before_qty").alias("previous_quantity"),
        F.col("hh_after_qty").alias("quantity"),
    )
    ct = ref("trades")
    return hh.join(ct, "trade_id").select(
        "trade_id",
        hh["previous_trade_id"],
        hh["previous_quantity"],
        hh["quantity"],
        ct["account_id"],
        ct["symbol"],
        ct["create_timestamp"],
        ct["close_timestamp"],
        ct["trade_price"],
        ct["bid_price"],
        ct["fee"],
        ct["commission"],
    )


@model(layer="silver", deps=("brokerage_cash_transaction", "accounts"))
def cash_transactions(ref, src) -> DataFrame:
    """silver/cash_transactions.sql — temporal join to the account
    version valid at the transaction timestamp (J6); orphans drop."""
    t = ref("brokerage_cash_transaction").select(
        F.col("ct_ca_id").alias("account_id"),
        F.col("ct_dts").alias("transaction_timestamp"),
        F.col("ct_amt").alias("amount"),
        F.col("ct_name").alias("description"),
    )
    a = ref("accounts")
    j = t.join(
        a,
        (t["account_id"] == a["account_id"])
        & t["transaction_timestamp"].between(
            a["effective_timestamp"], a["end_timestamp"]
        ),
    )
    return j.select(
        a["customer_id"],
        t["account_id"],
        t["transaction_timestamp"],
        t["amount"],
        t["description"],
    )


@model(layer="silver", deps=("hr_employee",))
def employees(ref, src) -> DataFrame:
    """silver/employees.sql — rename projection (P1)."""
    return ref("hr_employee").select(
        "employee_id",
        "manager_id",
        F.col("employee_first_name").alias("first_name"),
        F.col("employee_last_name").alias("last_name"),
        F.col("employee_mi").alias("middle_initial"),
        F.col("employee_job_code").alias("job_code"),
        F.col("employee_branch").alias("branch"),
        F.col("employee_office").alias("office"),
        F.col("employee_phone").alias("phone"),
    )


@model(layer="silver", deps=("reference_date",))
def date(ref, src) -> DataFrame:
    """silver/date.sql — passthrough."""
    return ref("reference_date")
