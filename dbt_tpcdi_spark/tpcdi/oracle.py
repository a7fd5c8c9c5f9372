"""DuckDB oracle for the full TPC-DI DAG.

One SQL statement per model (the reference's Snowflake SQL translated
to DuckDB dialect), evaluated over the *logical* source tables the
fixture generator renders independently (views prefixed ``src_``).
The test materializes each as a view in topo order and EXCEPT-ALL
compares against the Spark engine's parquet output.

Dialect translations (SURVEY.md §2.8): decode→CASE,
ifnull→coalesce, timestampadd(ms,-1)→- INTERVAL 1 MILLISECOND,
try_to_number→try_cast(bigint), add_months(d,-12)→d - INTERVAL 12
MONTH, generate_surrogate_key→md5(coalesce(cast(..)..)||'-'||..);
QUALIFY / GROUP BY ALL / last_value IGNORE NULLS exist in both.
"""

from __future__ import annotations


def _scd2(key: str, ts: str) -> str:
    return (
        f"coalesce(lead({ts}) OVER (PARTITION BY {key} ORDER BY {ts}) "
        f"- INTERVAL 1 MILLISECOND, TIMESTAMP '9999-12-31 23:59:59.999') "
        f"AS end_timestamp, "
        f"(row_number() OVER (PARTITION BY {key} ORDER BY {ts} DESC) = 1) "
        f"AS is_current"
    )


def _sk(*cols: str) -> str:
    # dbt_utils 1.x default NULL placeholder (reference does not set
    # surrogate_key_treat_nulls_as_empty_strings)
    inner = " || '-' || ".join(
        f"coalesce(cast({c} as varchar), '_dbt_utils_surrogate_key_null_')"
        for c in cols
    )
    return f"md5({inner})"


_CUSTOMER_RENAMES = """
    c_tax_id AS tax_id, c_gndr AS gender, c_tier AS tier, c_dob AS dob,
    c_l_name AS last_name, c_f_name AS first_name, c_m_name AS middle_name,
    c_adline1 AS address_line1, c_adline2 AS address_line2,
    c_zipcode AS postal_code, c_city AS city, c_state_prov AS state_province,
    c_ctry AS country, c_prim_email AS primary_email,
    c_alt_email AS alternate_email, c_phone_1 AS phone1, c_phone_2 AS phone2,
    c_phone_3 AS phone3
"""

_FFILL = ", ".join(
    f"coalesce({c}, last_value({c} IGNORE NULLS) OVER w) AS {out or c}"
    for c, out in [
        ("tax_id", None), ("last_name", None), ("first_name", None),
        ("middle_name", "middleinitial"), ("gender", None), ("tier", None),
        ("dob", None), ("address_line1", None), ("address_line2", None),
        ("postal_code", None), ("city", None), ("state_province", None),
        ("country", None), ("phone1", None), ("phone2", None),
        ("phone3", None), ("primary_email", None), ("alternate_email", None),
        ("local_tax_rate_name", None), ("local_tax_rate", None),
        ("national_tax_rate_name", None), ("national_tax_rate", None),
    ]
)

# model name -> DuckDB SQL (in registry topo order via deps; dict order
# here is already a valid topological order)
ORACLE_MODELS: dict[str, str] = {
    # ---- bronze ----
    "brokerage_cash_transaction": "SELECT * FROM src_cash_transaction",
    "brokerage_daily_market": "SELECT * FROM src_daily_market",
    "brokerage_holding_history": "SELECT * FROM src_holding_history",
    "brokerage_trade": "SELECT * FROM src_trade",
    "brokerage_trade_history": "SELECT * FROM src_trade_history",
    "brokerage_watch_history": "SELECT * FROM src_watch_history",
    "crm_customer_mgmt": "SELECT * FROM src_customer_mgmt",
    "hr_employee": "SELECT * FROM src_hr",
    "syndicated_prospect": "SELECT * FROM src_prospect",
    "reference_date": """
        SELECT date_value AS sk_date_id, date_value, date_desc,
               calendar_year_id, calendar_year_desc, calendar_qtr_id,
               calendar_qtr_desc, calendar_month_id, calendar_month_desc,
               calendar_week_id, calendar_week_desc, day_of_week_num,
               day_of_week_desc, fiscal_year_id, fiscal_year_desc,
               fiscal_qtr_id, fiscal_qtr_desc, holiday_flag
        FROM src_date
    """,
    "reference_industry": "SELECT * FROM src_industry",
    "reference_status_type": "SELECT * FROM src_status_type",
    "reference_tax_rate": "SELECT * FROM src_tax_rate",
    "reference_trade_type": "SELECT * FROM src_trade_type",
    "finwire_company": "SELECT * FROM src_cmp",
    "finwire_security": """
        SELECT pts, symbol, issue_type, status, name, ex_id,
               cast(sh_out AS bigint) AS sh_out,
               strptime(first_trade_date, '%Y%m%d')::date AS first_trade_date,
               strptime(first_exchange_date, '%Y%m%d')::date AS first_exchange_date,
               cast(dividend AS double) AS dividend,
               try_cast(co_name_or_cik AS bigint) AS cik,
               CASE WHEN try_cast(co_name_or_cik AS bigint) IS NULL
                    THEN co_name_or_cik END AS company_name
        FROM src_sec
    """,
    "finwire_financial": """
        SELECT pts, cast(year AS bigint) AS year,
               cast(quarter AS bigint) AS quarter,
               strptime(quarter_start_date, '%Y%m%d')::date AS quarter_start_date,
               strptime(posting_date, '%Y%m%d')::date AS posting_date,
               cast(revenue AS double) AS revenue,
               cast(earnings AS double) AS earnings,
               cast(eps AS double) AS eps,
               cast(diluted_eps AS double) AS diluted_eps,
               cast(margin AS double) AS margin,
               cast(inventory AS double) AS inventory,
               cast(assets AS double) AS assets,
               cast(liabilities AS double) AS liabilities,
               cast(sh_out AS bigint) AS sh_out,
               cast(diluted_sh_out AS bigint) AS diluted_sh_out,
               try_cast(co_name_or_cik AS bigint) AS cik,
               CASE WHEN try_cast(co_name_or_cik AS bigint) IS NULL
                    THEN co_name_or_cik END AS company_name
        FROM src_fin
    """,
    # ---- silver ----
    "accounts": f"""
        SELECT action_type,
               CASE action_type WHEN 'NEW' THEN 'Active'
                    WHEN 'ADDACCT' THEN 'Active' WHEN 'UPDACCT' THEN 'Active'
                    WHEN 'CLOSEACCT' THEN 'Inactive' END AS status,
               ca_id AS account_id, ca_name AS account_desc,
               c_id AS customer_id, {_CUSTOMER_RENAMES},
               c_lcl_tx_id AS local_tax_rate_name, ltx.tx_rate AS local_tax_rate,
               c_nat_tx_id AS national_tax_rate_name, ntx.tx_rate AS national_tax_rate,
               ca_tax_st AS tax_status, ca_b_id AS broker_id,
               action_ts AS effective_timestamp, {_scd2('ca_id', 'action_ts')}
        FROM crm_customer_mgmt c
        LEFT JOIN reference_tax_rate ntx ON c.c_nat_tx_id = ntx.tx_id
        LEFT JOIN reference_tax_rate ltx ON c.c_lcl_tx_id = ltx.tx_id
        WHERE ca_id IS NOT NULL
    """,
    "customers": f"""
        SELECT action_type,
               CASE action_type WHEN 'NEW' THEN 'Active'
                    WHEN 'ADDACCT' THEN 'Active' WHEN 'UPDACCT' THEN 'Active'
                    WHEN 'UPDCUST' THEN 'Active' WHEN 'INACT' THEN 'Inactive'
               END AS status,
               c_id AS customer_id, ca_id AS account_id, {_CUSTOMER_RENAMES},
               c_lcl_tx_id AS local_tax_rate_name, ltx.tx_rate AS local_tax_rate,
               c_nat_tx_id AS national_tax_rate_name, ntx.tx_rate AS national_tax_rate,
               ca_tax_st AS account_tax_status, ca_b_id AS broker_id,
               action_ts AS effective_timestamp, {_scd2('c_id', 'action_ts')}
        FROM crm_customer_mgmt c
        LEFT JOIN reference_tax_rate ntx ON c.c_nat_tx_id = ntx.tx_id
        LEFT JOIN reference_tax_rate ltx ON c.c_lcl_tx_id = ltx.tx_id
        WHERE action_type IN ('NEW', 'INACT', 'UPDCUST')
    """,
    "companies": f"""
        SELECT cik AS company_id, st.st_name AS status, company_name AS name,
               ind.in_name AS industry, ceo_name AS ceo, address_line1,
               address_line2, postal_code, city, state_province, country,
               description, founding_date, sp_rating,
               pts AS effective_timestamp, {_scd2('cik', 'pts')}
        FROM finwire_company cmp
        JOIN reference_status_type st ON cmp.status = st.st_id
        JOIN reference_industry ind ON cmp.industry_id = ind.in_id
    """,
    "securities": f"""
        SELECT s.symbol, s.issue_type,
               CASE s.status WHEN 'ACTV' THEN 'Active'
                    WHEN 'INAC' THEN 'Inactive' END AS status,
               s.name, s.ex_id AS exchange_id, s.sh_out AS shares_outstanding,
               s.first_trade_date, s.first_exchange_date, s.dividend,
               coalesce(c1.name, c2.name) AS company_name,
               coalesce(c1.company_id, c2.company_id) AS company_id,
               s.pts AS effective_timestamp, {_scd2('s.symbol', 's.pts')}
        FROM finwire_security s
        LEFT JOIN companies c1 ON s.cik = c1.company_id
            AND s.pts BETWEEN c1.effective_timestamp AND c1.end_timestamp
        LEFT JOIN companies c2 ON s.company_name = c2.name
            AND s.pts BETWEEN c2.effective_timestamp AND c2.end_timestamp
    """,
    "financials": f"""
        WITH s1 AS (
            SELECT s.year, s.quarter, s.quarter_start_date, s.posting_date,
                   s.revenue, s.earnings, s.eps, s.diluted_eps, s.margin,
                   s.inventory, s.assets, s.liabilities, s.sh_out,
                   s.diluted_sh_out,
                   coalesce(c1.name, c2.name) AS company_name,
                   coalesce(c1.company_id, c2.company_id) AS company_id,
                   s.pts AS effective_timestamp
            FROM finwire_financial s
            LEFT JOIN companies c1 ON s.cik = c1.company_id
                AND s.pts BETWEEN c1.effective_timestamp AND c1.end_timestamp
            LEFT JOIN companies c2 ON s.company_name = c2.name
                AND s.pts BETWEEN c2.effective_timestamp AND c2.end_timestamp
        )
        SELECT *, {_scd2('company_id', 'effective_timestamp')} FROM s1
    """,
    "trades_history": f"""
        SELECT t_id AS trade_id, t_dts AS trade_timestamp,
               t_ca_id AS account_id, ts.st_name AS trade_status,
               tt_name AS trade_type,
               CASE t_is_cash WHEN true THEN 'Cash'
                    WHEN false THEN 'Margin' END AS transaction_type,
               t_s_symb AS symbol, t_exec_name AS executor_name,
               t_qty AS quantity, t_bid_price AS bid_price,
               t_trade_price AS trade_price, t_chrg AS fee,
               t_comm AS commission, t_tax AS tax,
               us.st_name AS update_status, th_dts AS effective_timestamp,
               {_scd2('t_id', 'th_dts')}
        FROM brokerage_trade
        JOIN brokerage_trade_history ON t_id = th_t_id
        JOIN reference_trade_type ON t_tt_id = tt_id
        JOIN reference_status_type ts ON t_st_id = ts.st_id
        JOIN reference_status_type us ON th_st_id = us.st_id
    """,
    "trades": """
        SELECT DISTINCT trade_id, account_id, trade_status, trade_type,
               transaction_type, symbol, executor_name, quantity, bid_price,
               trade_price, fee, commission, tax,
               min(effective_timestamp) OVER (PARTITION BY trade_id)
                   AS create_timestamp,
               max(effective_timestamp) OVER (PARTITION BY trade_id)
                   AS close_timestamp
        FROM trades_history
    """,
    # fast-mode twin (the Spark DAG default): extreme + earliest tie
    # date from ONE window pass via lexicographic struct min/max —
    # matches plans/models/silver.py daily_market's scale-safe plan.
    "daily_market": """
        SELECT *,
            (min(struct_pack(v := dm_low,
                 d := datediff('day', DATE '1970-01-01', dm_date))) OVER w).v
                AS fifty_two_week_low,
            DATE '1970-01-01' + cast(
                (min(struct_pack(v := dm_low,
                     d := datediff('day', DATE '1970-01-01', dm_date))) OVER w).d
                AS integer) AS fifty_two_week_low_date,
            (max(struct_pack(v := dm_high,
                 negd := -datediff('day', DATE '1970-01-01', dm_date))) OVER w).v
                AS fifty_two_week_high,
            DATE '1970-01-01' + cast(
                -((max(struct_pack(v := dm_high,
                       negd := -datediff('day', DATE '1970-01-01', dm_date)))
                   OVER w).negd) AS integer) AS fifty_two_week_high_date
        FROM brokerage_daily_market
        WINDOW w AS (PARTITION BY dm_s_symb ORDER BY dm_date
                     ROWS BETWEEN 364 PRECEDING AND CURRENT ROW)
    """,
    "watches_history": """
        WITH s1 AS (
            SELECT w_c_id AS customer_id, w_s_symb AS symbol,
                   w_dts AS watch_timestamp,
                   CASE w_action WHEN 'ACTV' THEN 'Activate'
                        WHEN 'CNCL' THEN 'Cancelled' END AS action_type
            FROM brokerage_watch_history
        )
        SELECT s1.*, company_id, company_name, exchange_id,
               status AS security_status
        FROM s1 JOIN securities s USING (symbol)
    """,
    "watches": """
        WITH s1 AS (
            SELECT customer_id, symbol, company_id, company_name, exchange_id,
                   security_status,
                   CASE action_type WHEN 'Activate' THEN watch_timestamp
                        END AS placed_timestamp,
                   CASE action_type WHEN 'Cancelled' THEN watch_timestamp
                        END AS removed_timestamp
            FROM watches_history
        ),
        s2 AS (
            SELECT customer_id, symbol, company_id, company_name, exchange_id,
                   security_status,
                   min(placed_timestamp) AS placed_timestamp,
                   max(removed_timestamp) AS removed_timestamp
            FROM s1 GROUP BY ALL
        )
        SELECT *, CASE WHEN removed_timestamp IS NULL THEN 'Active'
                       ELSE 'Inactive' END AS watch_status
        FROM s2
    """,
    "holdings_history": """
        WITH s1 AS (
            SELECT hh_t_id AS trade_id, hh_h_t_id AS previous_trade_id,
                   hh_before_qty AS previous_quantity, hh_after_qty AS quantity
            FROM brokerage_holding_history
        )
        SELECT s1.*, ct.account_id, ct.symbol, ct.create_timestamp,
               ct.close_timestamp, ct.trade_price, ct.bid_price, ct.fee,
               ct.commission
        FROM s1 JOIN trades ct USING (trade_id)
    """,
    "cash_transactions": """
        WITH t AS (
            SELECT ct_ca_id AS account_id, ct_dts AS transaction_timestamp,
                   ct_amt AS amount, ct_name AS description
            FROM brokerage_cash_transaction
        )
        SELECT a.customer_id, t.*
        FROM t JOIN accounts a ON t.account_id = a.account_id
            AND t.transaction_timestamp
                BETWEEN a.effective_timestamp AND a.end_timestamp
    """,
    "employees": """
        SELECT employee_id, manager_id,
               employee_first_name AS first_name,
               employee_last_name AS last_name,
               employee_mi AS middle_initial,
               employee_job_code AS job_code, employee_branch AS branch,
               employee_office AS office, employee_phone AS phone
        FROM hr_employee
    """,
    "date": "SELECT * FROM reference_date",
    # ---- gold + work ----
    "dim_broker": f"""
        SELECT {_sk('employee_id')} AS sk_broker_id, employee_id AS broker_id,
               manager_id, first_name, last_name, middle_initial, job_code,
               branch, office, phone
        FROM employees
    """,
    "dim_company": f"""
        SELECT {_sk('company_id', 'effective_timestamp')} AS sk_company_id,
               company_id, status, name, industry, ceo, address_line1,
               address_line2, postal_code, city, state_province, country,
               description, founding_date, sp_rating,
               sp_rating IN ('BB','B','CCC','CC','C','D','BB+','B+','CCC+',
                             'BB-','B-','CCC-') AS is_lowgrade,
               effective_timestamp, end_timestamp, is_current
        FROM companies
    """,
    "dim_customer": f"""
        WITH s1 AS (
            SELECT c.*, p.agency_id, p.credit_rating, p.net_worth
            FROM customers c
            LEFT JOIN syndicated_prospect p
                USING (first_name, last_name, postal_code, address_line1,
                       address_line2)
        )
        SELECT {_sk('customer_id', 'effective_timestamp')} AS sk_customer_id,
               customer_id, status, {_FFILL},
               agency_id, credit_rating, net_worth,
               effective_timestamp, end_timestamp, is_current
        FROM s1 WINDOW w AS (PARTITION BY customer_id ORDER BY effective_timestamp)
    """,
    "dim_account": f"""
        SELECT {_sk('a.account_id', 'a.effective_timestamp')} AS sk_account_id,
               a.account_id, b.sk_broker_id, c.sk_customer_id, a.status,
               a.account_desc, a.tax_status, a.effective_timestamp,
               a.end_timestamp, a.is_current
        FROM accounts a
        JOIN dim_customer c ON a.customer_id = c.customer_id
            AND a.effective_timestamp
                BETWEEN c.effective_timestamp AND c.end_timestamp
        JOIN dim_broker b ON a.broker_id = b.broker_id
    """,
    "dim_security": f"""
        WITH s1 AS (
            SELECT s.symbol, s.issue_type AS issue, s.status, s.name,
                   s.exchange_id, c.sk_company_id, s.shares_outstanding,
                   s.first_trade_date, s.first_exchange_date, s.dividend,
                   s.effective_timestamp, s.end_timestamp, s.is_current
            FROM securities s
            JOIN dim_company c ON s.company_id = c.company_id
                AND s.effective_timestamp
                    BETWEEN c.effective_timestamp AND c.end_timestamp
        )
        SELECT {_sk('symbol', 'effective_timestamp')} AS sk_security_id, *
        FROM s1
    """,
    "dim_trade": f"""
        SELECT {_sk('trade_id', 'effective_timestamp')} AS sk_trade_id,
               trade_id, trade_status AS status, transaction_type,
               trade_type AS type, executor_name AS executed_by,
               effective_timestamp, end_timestamp, is_current
        FROM trades_history
    """,
    "dim_date": 'SELECT * FROM "date"',
    "fact_trade": """
        SELECT dt.sk_trade_id, a.sk_broker_id, a.sk_customer_id,
               a.sk_account_id, s.sk_security_id,
               cast(t.create_timestamp AS date) AS sk_create_date,
               t.create_timestamp,
               cast(t.close_timestamp AS date) AS sk_close_date,
               t.close_timestamp, dt.executed_by, t.quantity, t.bid_price,
               t.trade_price, t.fee, t.commission, t.tax
        FROM trades t
        JOIN dim_trade dt ON t.trade_id = dt.trade_id
            AND t.create_timestamp
                BETWEEN dt.effective_timestamp AND dt.end_timestamp
        JOIN dim_account a ON t.account_id = a.account_id
            AND t.create_timestamp
                BETWEEN a.effective_timestamp AND a.end_timestamp
        JOIN dim_security s ON t.symbol = s.symbol
            AND t.create_timestamp
                BETWEEN s.effective_timestamp AND s.end_timestamp
    """,
    "fact_cash_transactions": """
        WITH s1 AS (
            SELECT *, cast(transaction_timestamp AS date) AS sk_transaction_date
            FROM cash_transactions
        )
        SELECT a.sk_customer_id, a.sk_account_id, s1.sk_transaction_date,
               s1.transaction_timestamp, s1.amount, s1.description
        FROM s1
        JOIN dim_account a ON s1.account_id = a.account_id
            AND s1.transaction_timestamp
                BETWEEN a.effective_timestamp AND a.end_timestamp
    """,
    "fact_cash_balances": """
        SELECT sk_customer_id, sk_account_id, sk_transaction_date,
               sum(amount) AS amount, description
        FROM fact_cash_transactions
        GROUP BY ALL
    """,
    "fact_holdings": """
        SELECT ct.sk_trade_id AS sk_current_trade_id, pt.sk_trade_id,
               a.sk_customer_id, a.sk_account_id, s.sk_security_id,
               cast(s1.create_timestamp AS date) AS sk_trade_date,
               s1.create_timestamp AS trade_timestamp,
               s1.trade_price AS current_price,
               s1.quantity AS current_holding,
               s1.bid_price AS current_bid_price, s1.fee AS current_fee,
               s1.commission AS current_commission
        FROM holdings_history s1
        JOIN dim_trade ct ON s1.trade_id = ct.trade_id
        JOIN dim_trade pt ON s1.previous_trade_id = pt.trade_id
        JOIN dim_account a ON s1.account_id = a.account_id
            AND s1.create_timestamp
                BETWEEN a.effective_timestamp AND a.end_timestamp
        JOIN dim_security s ON s1.symbol = s.symbol
    """,
    "wrk_company_financials": """
        SELECT c.sk_company_id, f.company_id, f.quarter_start_date,
               sum(f.eps) OVER (PARTITION BY f.company_id
                                ORDER BY f.quarter_start_date
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   - f.eps AS sum_basic_eps
        FROM financials f
        JOIN dim_company c ON f.company_id = c.company_id
            AND f.effective_timestamp
                BETWEEN c.effective_timestamp AND c.end_timestamp
    """,
    "fact_market_history": """
        SELECT s.sk_security_id, s.sk_company_id, dm_date AS sk_date_id,
               (s.dividend / dmh.dm_close) / 100 AS "yield",
               fifty_two_week_high,
               fifty_two_week_high_date AS sk_fifty_two_week_high_date,
               fifty_two_week_low,
               fifty_two_week_low_date AS sk_fifty_two_week_low_date,
               dm_close AS closeprice, dm_high AS dayhigh, dm_low AS daylow,
               dm_vol AS volume
        FROM daily_market dmh
        JOIN dim_security s ON s.symbol = dmh.dm_s_symb
            AND dmh.dm_date BETWEEN s.effective_timestamp AND s.end_timestamp
    """,
    "fact_watches": """
        SELECT c.sk_customer_id, s.sk_security_id,
               cast(placed_timestamp AS date) AS sk_date_placed,
               cast(removed_timestamp AS date) AS sk_date_removed,
               1 AS watch_cnt
        FROM watches w
        JOIN dim_customer c ON w.customer_id = c.customer_id
            AND placed_timestamp
                BETWEEN c.effective_timestamp AND c.end_timestamp
        JOIN dim_security s ON w.symbol = s.symbol
            AND placed_timestamp
                BETWEEN s.effective_timestamp AND s.end_timestamp
    """,
}

#: strict-parity twin of daily_market: the reference-shaped calendar
#: self-join + QUALIFY (silver/daily_market.sql:8-34), paired with the
#: Spark model under SPARK_TPCDI_PARITY=strict. Differs from the fast
#: default only on the add_months edge (calendar window spans 365-366
#: days vs the frame's 364 preceding rows — a value tie exactly one
#: year back yields an earlier extreme date here).
DAILY_MARKET_STRICT_SQL = """
    WITH s1 AS (
        SELECT *,
               min(dm_low) OVER w AS fifty_two_week_low,
               max(dm_high) OVER w AS fifty_two_week_high
        FROM brokerage_daily_market
        WINDOW w AS (PARTITION BY dm_s_symb ORDER BY dm_date
                     ROWS BETWEEN 364 PRECEDING AND CURRENT ROW)
    ),
    s2 AS (
        SELECT a.*, b.dm_date AS fifty_two_week_low_date,
               c.dm_date AS fifty_two_week_high_date
        FROM s1 a
        JOIN s1 b ON a.dm_s_symb = b.dm_s_symb
            AND a.fifty_two_week_low = b.dm_low
            AND b.dm_date BETWEEN
                cast(a.dm_date - INTERVAL 12 MONTH AS date) AND a.dm_date
        JOIN s1 c ON a.dm_s_symb = c.dm_s_symb
            AND a.fifty_two_week_high = c.dm_high
            AND c.dm_date BETWEEN
                cast(a.dm_date - INTERVAL 12 MONTH AS date) AND a.dm_date
    )
    SELECT * FROM s2
    QUALIFY row_number() OVER (
        PARTITION BY dm_s_symb, dm_date
        ORDER BY fifty_two_week_low_date, fifty_two_week_high_date) = 1
"""

#: strict-parity twin of fact_market_history: the reference's
#: row-multiplying LEFT JOIN to the quarterly work model (reference
#: models/gold/fact_market_history.sql:19-20 — selects no quarterly
#: columns, multiplies each row by the company's quarter count),
#: paired with the Spark model under SPARK_TPCDI_PARITY=strict. The
#: main DAG oracle pins the corrected default (no fan-out).
FACT_MARKET_HISTORY_STRICT_SQL = """
    SELECT s.sk_security_id, s.sk_company_id, dm_date AS sk_date_id,
           (s.dividend / dmh.dm_close) / 100 AS "yield",
           fifty_two_week_high,
           fifty_two_week_high_date AS sk_fifty_two_week_high_date,
           fifty_two_week_low,
           fifty_two_week_low_date AS sk_fifty_two_week_low_date,
           dm_close AS closeprice, dm_high AS dayhigh, dm_low AS daylow,
           dm_vol AS volume
    FROM daily_market dmh
    JOIN dim_security s ON s.symbol = dmh.dm_s_symb
        AND dmh.dm_date BETWEEN s.effective_timestamp AND s.end_timestamp
    LEFT JOIN (SELECT sk_company_id FROM wrk_company_financials) f
        USING (sk_company_id)
"""
