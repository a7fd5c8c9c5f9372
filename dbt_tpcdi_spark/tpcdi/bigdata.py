"""Volume-scale TPC-DI raw-source synthesis (VERDICT r9 item 1).

The hand-authored fixture (``fixtures.py``) is entity-coherent but
tiny (6 trades / 800 daily_market rows), so the 45-model DAG had never
been built at volumes where its joins and windows cost anything. This
module synthesizes the SAME raw Batch1 source-file tree — delimited
text, fixed-width FINWIRE, CustomerMgmt.xml — at fact-table volume
(defaults: 1 M trades, ~2.35 M trade-history rows, 5 M daily_market
rows, 12.5 k securities/companies, 25 k customers), generated
VECTORIZED on the executors (``spark.range`` → expression columns →
``write.text``), never as driver row literals. Only the volume-
invariant reference feeds (code tables, Date.txt, HR, Prospect) and
the ~42 k-action CustomerMgmt.xml reuse driver-side rendering: the
XML document needs a single root element, and at 25 k customers it is
metadata-sized next to the fact feeds.

Coherence contract (so the DAG's inner/temporal joins keep every
generated row — the whole point of the volume probe):

- every FINWIRE SEC/FIN record resolves its company by numeric CIK
  (even k) or by exact company name (odd k) — both fallback arms of
  ``silver.securities``/``financials`` carry half the volume;
- all SCD2 dimension versions (company v2 for k%10==0, security INAC
  v2 for k%10==5, UPDCUST/UPDACCT customer/account versions) become
  effective at timestamps that bracket the fact feeds, so temporal
  BETWEEN joins match exactly one version per fact row:
  ``fact_trade`` lands exactly ``n_trades`` rows and
  ``fact_market_history`` exactly ``n_symbols * dm_days``;
- trade/cash/watch timestamps all fall after every account/customer
  creation (accounts land Jan-Mar 2017, facts start 2017-04-01) and
  inside the Date.txt 2017-2018 calendar.

File-name conventions follow ``plans/sources.py`` (a DIRECTORY named
``Trade.txt`` is fine: ``spark.read.csv`` globs the part files).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from pathlib import Path

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_tpcdi_spark.sources.finwire import CMP_LAYOUT, FIN_LAYOUT, SEC_LAYOUT
from dbt_tpcdi_spark.tpcdi import fixtures as FX
from dbt_tpcdi_spark.session import local_df

_TAX_PAIRS = [("US1", "US2"), ("CA1", "DE1"), ("US2", "US1"), ("DE1", "CA1")]
_BROKERS = (1, 2, 4)  # HR employees with job code 314


def _symbol_mod(n_symbols: int, n_customers: int) -> int:
    """Largest modulus <= n_symbols co-prime with n_customers: the
    symbol stream uses ``(id * stride) % M`` so symbol and customer
    indices stay DECORRELATED (with M = n_symbols and n_customers a
    multiple of it, every customer would trade exactly one symbol and
    watch pairs would collapse to n_customers groups)."""
    m = n_symbols
    while m > 1 and math.gcd(m, n_customers) != 1:
        m -= 1
    return m


def _ts(base: str, sec_expr: str) -> str:
    """SQL: ``base`` timestamp + a second-offset expression."""
    return (
        f"timestampadd(SECOND, CAST(({sec_expr}) AS INT), "
        f"timestamp'{base}')"
    )


def _fmt_ts(expr: str) -> str:
    return f"date_format({expr}, 'yyyy-MM-dd HH:mm:ss')"


def _write_lines(df: DataFrame, line: Column, path: Path,
                 files: int = 16) -> None:
    (
        df.select(line.alias("line"))
        .repartition(files)
        .write.mode("overwrite")
        .text(str(path))
    )


def _fw_line(pts: Column, rec_type: str, layout, values: dict) -> Column:
    """One fixed-width FINWIRE line: 15-byte PTS + 3-byte type + each
    layout field right-padded (and truncated) to its declared width —
    the inverse of ``sources/finwire._extract``. Field windows are
    contiguous in all three layouts, so concat of exact-width chunks
    reproduces the (pos, len) offsets."""
    parts = [F.rpad(pts, 15, " "), F.lit(rec_type)]
    for f in layout:
        v = values.get(f.name)
        v = F.lit("") if v is None else v.cast("string")
        parts.append(F.rpad(F.coalesce(v, F.lit("")), f.length, " "))
    return F.concat(*parts)


# ---------------------------------------------------------------------------
# FINWIRE (CMP/SEC/FIN) — one company + one security per symbol index k


def _finwire_lines(spark: SparkSession, n_symbols: int) -> DataFrame:
    k = spark.range(0, n_symbols).selectExpr(
        "id AS k",
        "format_string('S%06d', id) AS symbol",
        "format_string('Company %06d', id) AS cname",
        "CAST(2000000 + id AS string) AS cik_short",
        "lpad(CAST(2000000 + id AS string), 10, '0') AS cik10",
        # by-CIK for even k, by-name for odd k: both fallback arms of
        # the company resolution carry half the volume
        "CASE WHEN id % 2 = 0 THEN CAST(2000000 + id AS string) "
        "     ELSE format_string('Company %06d', id) END AS by_ref",
    )
    cmp_common = {
        "status": F.lit("ACTV"),
        "industry_id": F.element_at(
            F.array(F.lit("AM"), F.lit("BK"), F.lit("CH")),
            (F.col("k") % 3 + 1).cast("int")),
        "founding_date": F.lit("19800101"),
        "address_line1": F.format_string("%d Synth Way", F.col("k")),
        "address_line2": F.lit("Floor 1"),
        "postal_code": F.lit("10001"),
        "city": F.lit("New York"),
        "state_province": F.lit("NY"),
        "country": F.lit("USA"),
        "description": F.lit("Synthetic volume company"),
    }
    cmp1 = k.select(_fw_line(
        F.lit("20170101-000000"), "CMP", CMP_LAYOUT,
        {**cmp_common, "company_name": F.col("cname"),
         "cik": F.col("cik10"), "sp_rating": F.lit("A+"),
         "ceo_name": F.format_string("CEO %06d", F.col("k"))},
    ).alias("line"))
    cmp2 = k.filter("k % 10 = 0").select(_fw_line(
        F.lit("20180615-000000"), "CMP", CMP_LAYOUT,
        {**cmp_common, "company_name": F.col("cname"),
         "cik": F.col("cik10"), "sp_rating": F.lit("A-"),
         "ceo_name": F.format_string("CEO2 %06d", F.col("k"))},
    ).alias("line"))

    sec_common = {
        "symbol": F.col("symbol"),
        "issue_type": F.lit("COMMON"),
        "name": F.format_string("Company %06d Common", F.col("k")),
        "ex_id": F.element_at(
            F.array(F.lit("NYSE"), F.lit("NASDAQ")),
            (F.col("k") % 2 + 1).cast("int")),
        "sh_out": F.lit("1000000"),
        "first_trade_date": F.lit("20170101"),
        "first_exchange_date": F.lit("20170101"),
        "dividend": F.format_string(
            "%.2f", (F.col("k") % 8) * F.lit(0.25)),
        "co_name_or_cik": F.col("by_ref"),
    }
    sec1 = k.select(_fw_line(
        F.lit("20170101-000001"), "SEC", SEC_LAYOUT,
        {**sec_common, "status": F.lit("ACTV")},
    ).alias("line"))
    sec2 = k.filter("k % 10 = 5").select(_fw_line(
        F.lit("20180110-000000"), "SEC", SEC_LAYOUT,
        {**sec_common, "status": F.lit("INAC")},
    ).alias("line"))

    quarters = [  # (year, q, quarter_start, posting pts)
        (2017, 1, "20170101", "20170405"), (2017, 2, "20170401", "20170705"),
        (2017, 3, "20170701", "20171005"), (2017, 4, "20171001", "20180105"),
        (2018, 1, "20180101", "20180405"), (2018, 2, "20180401", "20180705"),
        (2018, 3, "20180701", "20181005"), (2018, 4, "20181001", "20190105"),
    ]
    q = local_df(spark, 
        [(y, qq, qs, p) for y, qq, qs, p in quarters],
        "year INT, quarter INT, qstart STRING, posting STRING",
    )
    fin = k.crossJoin(F.broadcast(q)).select(_fw_line(
        F.concat(F.col("posting"), F.lit("-000000")), "FIN", FIN_LAYOUT,
        {
            "year": F.col("year"), "quarter": F.col("quarter"),
            "quarter_start_date": F.col("qstart"),
            "posting_date": F.col("posting"),
            "revenue": F.lit("1000000.00"),
            "earnings": F.lit("100000.00"),
            "eps": F.format_string(
                "%.2f", (F.col("quarter") + F.col("k") % 4) * F.lit(0.25)),
            "diluted_eps": F.format_string(
                "%.2f", F.col("quarter") * F.lit(0.25)),
            "margin": F.lit("0.10"), "inventory": F.lit("50000.00"),
            "assets": F.lit("5000000.00"),
            "liabilities": F.lit("2000000.00"),
            "sh_out": F.lit("1000000"), "diluted_sh_out": F.lit("1050000"),
            "co_name_or_cik": F.col("by_ref"),
        },
    ).alias("line"))
    return cmp1.unionAll(cmp2).unionAll(sec1).unionAll(sec2).unionAll(fin)


# ---------------------------------------------------------------------------
# delimited fact feeds


def _daily_market(spark: SparkSession, n_symbols: int,
                  dm_days: int) -> DataFrame:
    """n_symbols × dm_days rows starting 2017-01-02; prices are 0.25
    multiples (exact in binary, like the hand fixture) with per-symbol
    ties so the 52-week extremes have work to do."""
    return (
        spark.range(0, n_symbols * dm_days)
        .selectExpr(
            f"id % {n_symbols} AS k",
            f"CAST(id div {n_symbols} AS INT) AS d",
        )
        .selectExpr(
            "format_string('S%06d', k) AS symb",
            "date_format(date_add(date'2017-01-02', d), 'yyyy-MM-dd')"
            " AS dm_date",
            "5.0D + (k % 20) * 0.25D + ((d * 7 + k) % 40) * 0.25D AS close",
            "(d % 3) * 0.25D AS hup",
            "(d % 5) * 0.25D AS ldown",
            "CAST(1000 + d AS DOUBLE) AS vol",
        )
        .selectExpr(
            "concat_ws('|', dm_date, symb,"
            " format_string('%.2f', close),"
            " format_string('%.2f', close + 0.5D + hup),"
            " format_string('%.2f', close - 0.5D - ldown),"
            " format_string('%.1f', vol)) AS line"
        )
    )


def _trades(spark: SparkSession, n_trades: int, n_symbols: int,
            n_customers: int):
    """Trade.txt + TradeHistory.txt + HoldingHistory.txt +
    CashTransaction.txt from one shared base frame. Status mix:
    80% CMPT / 10% CNCL / 10% SBMT; every trade's SBMT history row is
    at t_dts (the create timestamp ``silver.trades`` recovers)."""
    sym_mod = _symbol_mod(n_symbols, n_customers)
    base = (
        spark.range(1, n_trades + 1)
        .selectExpr(
            "id AS t",
            f"(id - 1) % {n_customers} AS cust",
            f"((id - 1) * 131) % {sym_mod} AS sidx",
            "id % 10 AS m",
        )
        .selectExpr(
            "t", "cust", "sidx", "m",
            # second account (2c+2) exists when cust is even
            "CASE WHEN cust % 2 = 0 AND t % 7 = 0 THEN 2 * cust + 2 "
            "     ELSE 2 * cust + 1 END AS ca",
            "format_string('S%06d', sidx) AS symb",
            "CASE WHEN m < 8 THEN 'CMPT' WHEN m = 8 THEN 'CNCL' "
            "     ELSE 'SBMT' END AS st",
            "element_at(array('TMB','TMS','TLB','TLS'), "
            "           CAST(t % 4 + 1 AS INT)) AS tt",
            "CASE WHEN t % 2 = 0 THEN 'true' ELSE 'false' END AS is_cash",
            "CAST(t % 100 + 1 AS DOUBLE) AS qty",
            "5.0D + (t % 80) * 0.25D AS bid",
            _ts("2017-04-01 08:00:00",
                "(t % 550) * 86400 + (t * 7919) % 43200") + " AS dts",
        )
    )
    trade = base.selectExpr(
        "concat_ws('|', CAST(t AS STRING), " + _fmt_ts("dts") + ", st, tt,"
        " is_cash, symb,"
        " format_string('%.1f', qty), format_string('%.2f', bid),"
        " CAST(ca AS STRING), format_string('Exec %03d', t % 997),"
        " CASE WHEN st = 'CMPT'"
        "      THEN format_string('%.2f', bid + 0.25D) ELSE '' END,"
        " '1.0', '0.5',"
        " CASE WHEN st = 'CMPT' THEN '0.25' ELSE '' END) AS line"
    )
    th_sbmt = base.selectExpr(
        "concat_ws('|', CAST(t AS STRING), " + _fmt_ts("dts")
        + ", 'SBMT') AS line")
    th_actv = base.filter("t % 2 = 0").selectExpr(
        "concat_ws('|', CAST(t AS STRING), "
        + _fmt_ts("dts + INTERVAL 5 SECOND") + ", 'ACTV') AS line")
    th_cmpt = base.filter("st = 'CMPT'").selectExpr(
        "concat_ws('|', CAST(t AS STRING), "
        + _fmt_ts("dts + INTERVAL 6 HOUR") + ", 'CMPT') AS line")
    th_cncl = base.filter("st = 'CNCL'").selectExpr(
        "concat_ws('|', CAST(t AS STRING), "
        + _fmt_ts("dts + INTERVAL 1 DAY") + ", 'CNCL') AS line")
    history = th_sbmt.unionAll(th_actv).unionAll(th_cmpt).unionAll(th_cncl)

    holding = base.filter("st = 'CMPT'").selectExpr(
        # previous trade of the same symbol stream (valid t_id), self
        # for the stream's first trade — mirrors the fixture shape
        f"concat_ws('|', CAST(CASE WHEN t > {sym_mod} "
        f"  THEN t - {sym_mod} ELSE t END AS STRING),"
        " CAST(t AS STRING),"
        " format_string('%.1f', CAST((t % 50) AS DOUBLE)),"
        " format_string('%.1f', CAST((t % 50) AS DOUBLE) + qty)) AS line"
    )

    settle = base.filter("st = 'CMPT' AND is_cash = 'true'").selectExpr(
        "concat_ws('|', CAST(ca AS STRING), "
        + _fmt_ts("dts + INTERVAL 2 DAY")
        + ", format_string('%.2f', -(qty * (bid + 0.25D)) - 1.0D),"
        " 'Trade settlement') AS line"
    )
    deposits = (
        spark.range(0, n_customers)
        .selectExpr("2 * id + 1 AS ca", "id AS i")
        .selectExpr(
            "concat_ws('|', CAST(ca AS STRING), "
            + _fmt_ts(_ts("2017-04-02 09:00:00", "i % 86400"))
            + ", '10000.0', 'Deposit') AS line")
    )
    cash = settle.unionAll(deposits)
    return trade, history, holding, cash


def _watches(spark: SparkSession, n_pairs: int, n_symbols: int,
             n_customers: int) -> DataFrame:
    sym_mod = _symbol_mod(n_symbols, n_customers)
    base = spark.range(0, n_pairs).selectExpr(
        "id AS p",
        f"id % {n_customers} + 1 AS c",
        f"format_string('S%06d', (id * 31) % {sym_mod}) AS symb",
        _ts("2017-06-01 10:00:00", "(id % 200) * 86400 + id % 3600")
        + " AS placed",
    )
    actv = base.selectExpr(
        "concat_ws('|', CAST(c AS STRING), symb, "
        + _fmt_ts("placed") + ", 'ACTV') AS line")
    cncl = base.filter("p % 5 = 0").selectExpr(
        "concat_ws('|', CAST(c AS STRING), symb, "
        + _fmt_ts("placed + INTERVAL 90 DAY") + ", 'CNCL') AS line")
    return actv.unionAll(cncl)


# ---------------------------------------------------------------------------
# CustomerMgmt.xml — driver-rendered (single-root document; ~1.7
# actions per customer, metadata-sized next to the fact feeds)


def _customer_xml(n_customers: int) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<TPCDI:Actions xmlns:TPCDI="http://www.tpc.org/tpc-di">\n'
    ]

    def act(atype: str, ts: str, body: str) -> None:
        out.append(
            f'  <TPCDI:Action ActionType="{atype}" ActionTS="{ts}">\n'
            f"{body}  </TPCDI:Action>\n"
        )

    def acct_xml(ca: int, tax_st: int, b_id: int, name: str) -> str:
        return (
            f'      <Account CA_ID="{ca}" CA_TAX_ST="{tax_st}">\n'
            f"        <CA_B_ID>{b_id}</CA_B_ID>\n"
            f"        <CA_NAME>{name}</CA_NAME>\n      </Account>\n"
        )

    def offset(base: str, i: int) -> str:
        t0 = _dt.datetime.fromisoformat(base)
        return (t0 + _dt.timedelta(seconds=i)).isoformat()

    for i in range(n_customers):
        cid = i + 1
        a1, a2 = 2 * i + 1, 2 * i + 2
        broker = _BROKERS[i % 3]
        ltx, ntx = _TAX_PAIRS[i % 4]
        dob = f"{1960 + i % 40}-{i % 12 + 1:02d}-{i % 28 + 1:02d}"
        full = (
            f'    <Customer C_ID="{cid}" C_TAX_ID="{cid:03d}-00-{cid:04d}"'
            f' C_GNDR="{"MF"[i % 2]}" C_TIER="{i % 3 + 1}" C_DOB="{dob}">\n'
            f"      <Name>\n        <C_L_NAME>Last{i:06d}</C_L_NAME>\n"
            f"        <C_F_NAME>First{i:06d}</C_F_NAME>\n      </Name>\n"
            f"      <Address>\n        <C_ADLINE1>{i} Main St</C_ADLINE1>\n"
            f"        <C_ZIPCODE>{10000 + i % 90000}</C_ZIPCODE>\n"
            f"        <C_CITY>Springfield</C_CITY>\n"
            f"        <C_STATE_PROV>IL</C_STATE_PROV>\n"
            f"        <C_CTRY>USA</C_CTRY>\n      </Address>\n"
            f"      <ContactInfo>\n"
            f"        <C_PRIM_EMAIL>u{i}@example.com</C_PRIM_EMAIL>\n"
            f"        <C_PHONE_1>\n          <C_CTRY_CODE>1</C_CTRY_CODE>\n"
            f"          <C_AREA_CODE>{200 + i % 700}</C_AREA_CODE>\n"
            f"          <C_LOCAL>555{i % 10000:04d}</C_LOCAL>\n"
            f"          <C_EXT>{i % 100}</C_EXT>\n        </C_PHONE_1>\n"
            f"      </ContactInfo>\n"
            f"      <TaxInfo>\n        <C_LCL_TX_ID>{ltx}</C_LCL_TX_ID>\n"
            f"        <C_NAT_TX_ID>{ntx}</C_NAT_TX_ID>\n      </TaxInfo>\n"
        )
        act("NEW", offset("2017-01-05T09:00:00", i),
            full + acct_xml(a1, i % 3, broker, f"Main {cid}")
            + "    </Customer>\n")
        if i % 2 == 0:
            act("ADDACCT", offset("2017-02-10T10:00:00", i),
                f'    <Customer C_ID="{cid}">\n'
                + acct_xml(a2, (i + 1) % 3, broker, f"Second {cid}")
                + "    </Customer>\n")
        if i % 10 == 0:
            act("UPDCUST", offset("2017-03-01T11:00:00", i),
                f'    <Customer C_ID="{cid}" C_TIER="{i % 3 % 2 + 1}">\n'
                f"      <ContactInfo>\n"
                f"        <C_PRIM_EMAIL>u{i}.new@example.com"
                f"</C_PRIM_EMAIL>\n      </ContactInfo>\n"
                f"    </Customer>\n")
        if i % 20 == 5:
            act("UPDACCT", offset("2017-03-10T12:00:00", i),
                f'    <Customer C_ID="{cid}">\n'
                + acct_xml(a1, i % 3, broker, f"Renamed {cid}")
                + "    </Customer>\n")
        if i % 25 == 7:
            act("CLOSEACCT", offset("2018-12-01T08:00:00", i),
                f'    <Customer C_ID="{cid}">\n'
                + acct_xml(a1, i % 3, broker, f"Main {cid}")
                + "    </Customer>\n")
        if i % 100 == 13:
            act("INACT", offset("2018-12-15T08:00:00", i),
                f'    <Customer C_ID="{cid}">\n    </Customer>\n')
    out.append("</TPCDI:Actions>\n")
    return "".join(out)


# ---------------------------------------------------------------------------


def synthesize_raw(
    spark: SparkSession,
    target: str | Path,
    n_symbols: int = 12_500,
    n_customers: int = 25_000,
    n_trades: int = 1_000_000,
    dm_days: int = 400,
    watch_pairs: int = 400_000,
) -> Path:
    """Write the volume-scale raw/ tree; idempotent via a marker file
    keyed by the full parameterization. Returns the raw dir."""
    target = Path(target)
    key = f"{n_symbols}_{n_customers}_{n_trades}_{dm_days}_{watch_pairs}"
    raw = target / "raw"
    marker = target / f"_BIG_COMPLETE_{key}"
    if marker.exists():
        return raw
    for stale in target.glob("_BIG_COMPLETE_*"):
        stale.unlink()
    raw.mkdir(parents=True, exist_ok=True)

    # volume-invariant reference feeds (identical to the hand fixture)
    for source, (fname, rows) in FX.delimited_tables().items():
        if source in ("daily_market", "watch_history", "trade",
                      "trade_history", "holding_history",
                      "cash_transaction"):
            continue
        sep = "," if fname.endswith(".csv") else "|"
        FX.write_delimited(raw / fname, rows, sep)

    _write_lines(
        _finwire_lines(spark, n_symbols), F.col("line"),
        raw / "FINWIRE2017Q1", files=8)
    _write_lines(
        _daily_market(spark, n_symbols, dm_days), F.col("line"),
        raw / "DailyMarket.txt", files=32)
    trade, history, holding, cash = _trades(
        spark, n_trades, n_symbols, n_customers)
    _write_lines(trade, F.col("line"), raw / "Trade.txt", files=16)
    _write_lines(history, F.col("line"), raw / "TradeHistory.txt",
                 files=16)
    _write_lines(holding, F.col("line"), raw / "HoldingHistory.txt",
                 files=16)
    _write_lines(cash, F.col("line"), raw / "CashTransaction.txt",
                 files=16)
    _write_lines(
        _watches(spark, watch_pairs, n_symbols, n_customers),
        F.col("line"), raw / "WatchHistory.txt", files=8)
    (raw / "CustomerMgmt.xml").write_text(_customer_xml(n_customers))
    marker.touch()
    return raw


# ---------------------------------------------------------------------------
# Batch2 delta synthesis (r10): the incremental-refresh path at fact
# volume — the fixture Batch2 is 2 trades; this is 10% of the corpus.


def synthesize_batch2(
    spark: SparkSession,
    target: str | Path,
    n_symbols: int = 12_500,
    n_customers: int = 25_000,
    n_trades: int = 1_000_000,
    n_new_trades: int = 100_000,
    update_pred: str = "id % 10 = 9",
    new_id_base: int | None = None,
    dir_name: str = "raw_batch2",
) -> Path:
    """Write a raw_batch2/ delta drop coherent with ``synthesize_raw``
    output of the same parameterization:

    - every Batch1 trade matching ``update_pred`` (default
      ``id % 10 = 9``: 10 % of the corpus, spread across the whole id
      range — the LARGE-delta shape) is UPDATED to its completed final
      state (new Trade.txt row with a price — the
      full-version-replacement shape) with ACTV/CMPT history rows
      strictly after every Batch1 row of that trade;
    - ``n_new_trades`` new trades (ids above ``new_id_base``, default
      the Batch1 range) land completed in Nov 2018 (inside the Date
      calendar, after every Batch1 fact), accounts/symbols via the
      Batch1 formulas.

    Pass ``update_pred="id >= <hi>"`` with a small count for the
    SMALL-delta shape (late corrections clustered in the newest id
    blocks — the realistic steady-state refresh) and ``dir_name`` to
    keep it beside the big batch. Idempotent via a marker file;
    returns the delta dir."""
    target = Path(target)
    raw2 = target / dir_name
    base = n_trades if new_id_base is None else new_id_base
    pred_tag = hashlib.md5(update_pred.encode()).hexdigest()[:8]
    key = (f"{dir_name}_{n_symbols}_{n_customers}_{n_trades}_"
           f"{n_new_trades}_{base}_{pred_tag}")
    marker = target / f"_BIG2_COMPLETE_{key}"
    if marker.exists():
        return raw2
    # markers are per-dir_name so a small-delta synthesis never
    # invalidates the big batch2 next to it (and vice versa)
    for stale in target.glob(f"_BIG2_COMPLETE_{dir_name}_*"):
        stale.unlink()
    for stale in target.glob("_BIG2_COMPLETE_[0-9]*"):
        stale.unlink()  # pre-r11 un-namespaced markers
    raw2.mkdir(parents=True, exist_ok=True)
    sym_mod = _symbol_mod(n_symbols, n_customers)

    upd = (
        spark.range(1, n_trades + 1).filter(update_pred)
        .selectExpr(
            "id AS t",
            f"(id - 1) % {n_customers} AS cust",
            f"((id - 1) * 131) % {sym_mod} AS sidx",
        )
        .selectExpr(
            "t",
            "CASE WHEN cust % 2 = 0 AND t % 7 = 0 THEN 2 * cust + 2 "
            "     ELSE 2 * cust + 1 END AS ca",
            "format_string('S%06d', sidx) AS symb",
            "element_at(array('TMB','TMS','TLB','TLS'), "
            "           CAST(t % 4 + 1 AS INT)) AS tt",
            "CASE WHEN t % 2 = 0 THEN 'true' ELSE 'false' END AS is_cash",
            "CAST(t % 100 + 1 AS DOUBLE) AS qty",
            "5.0D + (t % 80) * 0.25D AS bid",
            _ts("2017-04-01 08:00:00",
                "(t % 550) * 86400 + (t * 7919) % 43200") + " AS dts",
        )
    )
    new = (
        spark.range(base + 1, base + n_new_trades + 1)
        .selectExpr(
            "id AS t",
            f"(id - 1) % {n_customers} AS cust",
            f"((id - 1) * 131) % {sym_mod} AS sidx",
        )
        .selectExpr(
            "t",
            "CASE WHEN cust % 2 = 0 AND t % 7 = 0 THEN 2 * cust + 2 "
            "     ELSE 2 * cust + 1 END AS ca",
            "format_string('S%06d', sidx) AS symb",
            "element_at(array('TMB','TMS','TLB','TLS'), "
            "           CAST(t % 4 + 1 AS INT)) AS tt",
            "CASE WHEN t % 2 = 0 THEN 'true' ELSE 'false' END AS is_cash",
            "CAST(t % 100 + 1 AS DOUBLE) AS qty",
            "5.0D + (t % 80) * 0.25D AS bid",
            _ts("2018-11-01 08:00:00",
                "(t % 30) * 86400 + (t * 7919) % 43200") + " AS dts",
        )
    )

    def trade_line(df: DataFrame) -> DataFrame:
        return df.selectExpr(
            "concat_ws('|', CAST(t AS STRING), " + _fmt_ts("dts")
            + ", 'CMPT', tt, is_cash, symb,"
            " format_string('%.1f', qty), format_string('%.2f', bid),"
            " CAST(ca AS STRING), format_string('Exec %03d', t % 997),"
            " format_string('%.2f', bid + 0.25D), '1.0', '0.5',"
            " '0.25') AS line"
        )

    _write_lines(
        trade_line(upd).unionAll(trade_line(new)), F.col("line"),
        raw2 / "Trade.txt", files=8)

    # updated trades: history STRICTLY AFTER their Batch1 SBMT row;
    # new trades: a fresh SBMT + CMPT pair
    hist = (
        upd.selectExpr(
            "concat_ws('|', CAST(t AS STRING), "
            + _fmt_ts("dts + INTERVAL 1 DAY") + ", 'ACTV') AS line")
        .unionAll(upd.selectExpr(
            "concat_ws('|', CAST(t AS STRING), "
            + _fmt_ts("dts + INTERVAL 2 DAY") + ", 'CMPT') AS line"))
        .unionAll(new.selectExpr(
            "concat_ws('|', CAST(t AS STRING), " + _fmt_ts("dts")
            + ", 'SBMT') AS line"))
        .unionAll(new.selectExpr(
            "concat_ws('|', CAST(t AS STRING), "
            + _fmt_ts("dts + INTERVAL 6 HOUR") + ", 'CMPT') AS line"))
    )
    _write_lines(hist, F.col("line"), raw2 / "TradeHistory.txt", files=8)
    marker.touch()
    return raw2
