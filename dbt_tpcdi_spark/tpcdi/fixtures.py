"""Deterministic TPC-DI source fixtures.

Generates into a target directory:

- ``raw/``      the Batch1-style source files the engine ingests
                (delimited text, FINWIRE fixed-width, CustomerMgmt.xml)
- ``logical/``  the same data as typed parquet, written directly with
                pyarrow — an *independent* rendering the DuckDB oracle
                reads, so every Spark ingest path (offsets, casts,
                phone assembly, XML flattening) is cross-checked.

Coverage follows FIXTURES.md: multi-version CMP companies, SEC
referencing companies by CIK and by name, ≥5 FIN quarters, the full
XML action vocabulary (NEW/ADDACCT/UPDACCT/UPDCUST/CLOSEACCT/INACT)
with partial UPDCUST for forward-fill, matched+unmatched prospects,
placed/cancelled watches + an orphan symbol, multi-status trades,
orphan cash transactions, and ≥365 trading days per symbol with
deliberate ties in highs/lows.

Money-ish doubles are multiples of 0.25 so every aggregation is exact
in binary floating point — cross-engine sums cannot drift.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from dbt_tpcdi_spark.sources.delimited import SCHEMAS
from dbt_tpcdi_spark.sources.finwire import CMP_LAYOUT, FIN_LAYOUT, SEC_LAYOUT

D = dt.date
TS = dt.datetime

SENTINEL = TS(9999, 12, 31, 23, 59, 59, 999000)

# ---------------------------------------------------------------------------
# reference/code tables

STATUS_TYPE = [
    ("ACTV", "Active"), ("CMPT", "Completed"), ("CNCL", "Canceled"),
    ("PNDG", "Pending"), ("SBMT", "Submitted"), ("INAC", "Inactive"),
]
TRADE_TYPE = [
    ("TMB", "Market Buy", False, True),
    ("TMS", "Market Sell", True, True),
    ("TLB", "Limit Buy", False, False),
    ("TLS", "Limit Sell", True, False),
]
INDUSTRY = [("AM", "Automotive", "SC1"), ("BK", "Banking", "SC2"),
            ("CH", "Chemicals", "SC1")]
TAX_RATE = [("US1", "US Rate 1", 0.05), ("US2", "US Rate 2", 0.08),
            ("CA1", "Canada Rate 1", 0.07), ("DE1", "Germany Rate 1", 0.09)]
HR = [
    (1, 3, "Alice", "Abel", "A", 314, "B1", "O1", "555-0001"),
    (2, 3, "Bob", "Baker", "B", 314, "B1", "O2", "555-0002"),
    (3, 3, "Carol", "Chief", "C", 101, "B1", "O3", "555-0003"),
    (4, 3, "Dan", "Dale", "D", 314, "B2", "O4", "555-0004"),
]

PROSPECT = [
    ("AG01", "Brown", "Olivia", "B", "F", "99 Pine St", "Suite 7", "94105",
     "San Francisco", "CA", "USA", "4155550199", 120000, 2, 1, "S", 35, 720,
     "O", "TechCo", 3, 500000),
    ("AG02", "Nomatch", "Ned", None, "M", "1 Nowhere Rd", "Unit 0", "00000",
     "Ghost Town", "ZZ", "USA", None, 50000, 1, 0, "M", 60, 600, "R",
     "NullCo", 1, 10000),
]

WATCH_HISTORY = [
    (100, "AAA", TS(2017, 3, 1, 10, 0, 0), "ACTV"),
    (100, "AAA", TS(2017, 9, 1, 10, 0, 0), "CNCL"),
    (101, "BBB", TS(2017, 5, 5, 11, 0, 0), "ACTV"),
    (100, "ZZZ", TS(2017, 4, 1, 10, 0, 0), "ACTV"),  # orphan symbol
]

TRADE = [
    # t_id, t_dts, st, tt, is_cash, symb, qty, bid, ca_id, exec, price, chrg, comm, tax
    (9001, TS(2017, 5, 2, 10, 0, 0), "CMPT", "TMB", True, "AAA", 100.0, 10.0,
     500, "Emma Smith", 10.25, 1.0, 0.5, 0.25),
    (9002, TS(2017, 5, 3, 10, 0, 0), "CMPT", "TMS", False, "AAA", 50.0, 10.5,
     500, "Emma Smith", 10.0, 1.0, 0.5, 0.25),
    (9003, TS(2017, 6, 15, 11, 0, 0), "CNCL", "TLB", True, "BBB", 200.0, 5.0,
     501, "Bob Baker", None, 0.5, 0.25, None),
    (9004, TS(2017, 8, 1, 12, 0, 0), "CMPT", "TLS", False, "BBB", 75.0, 5.5,
     502, "Liam Jones", 5.25, 0.25, 0.25, 0.25),
    (9005, TS(2018, 6, 20, 9, 0, 0), "SBMT", "TMB", True, "AAA", 10.0, 12.0,
     500, "Emma Smith", None, 0.25, 0.0, None),
    (9006, TS(2017, 9, 1, 10, 30, 0), "CMPT", "TMB", True, "BBB", 40.0, 5.25,
     502, "Liam Jones", 5.5, 0.5, 0.25, 0.0),
]

TRADE_HISTORY = [
    (9001, TS(2017, 5, 2, 10, 0, 0), "SBMT"),
    (9001, TS(2017, 5, 2, 10, 0, 5), "ACTV"),
    (9001, TS(2017, 5, 2, 16, 0, 0), "CMPT"),
    (9002, TS(2017, 5, 3, 10, 0, 0), "SBMT"),
    (9002, TS(2017, 5, 3, 15, 0, 0), "CMPT"),
    (9003, TS(2017, 6, 15, 11, 0, 0), "SBMT"),
    (9003, TS(2017, 6, 16, 11, 0, 0), "CNCL"),
    (9004, TS(2017, 8, 1, 12, 0, 0), "ACTV"),
    (9004, TS(2017, 8, 1, 17, 0, 0), "CMPT"),
    (9005, TS(2018, 6, 20, 9, 0, 0), "SBMT"),
    (9006, TS(2017, 9, 1, 10, 30, 0), "SBMT"),
    (9006, TS(2017, 9, 1, 14, 0, 0), "CMPT"),
]

HOLDING_HISTORY = [
    # hh_h_t_id (previous), hh_t_id (current), before, after
    (9001, 9001, 0.0, 100.0),
    (9001, 9002, 100.0, 50.0),
    (9004, 9004, 0.0, 75.0),
    (9004, 9006, 75.0, 115.0),
]

CASH_TRANSACTION = [
    (500, TS(2017, 5, 2, 9, 0, 0), 10000.0, "Initial deposit"),
    (500, TS(2017, 5, 4, 10, 0, 0), -1005.5, "Trade settlement"),
    (501, TS(2017, 6, 20, 10, 0, 0), 5000.0, "Wire in"),
    (502, TS(2017, 8, 1, 8, 0, 0), 2500.0, "Deposit"),
    (502, TS(2018, 3, 1, 9, 0, 0), -100.25, "Fee"),
    (500, TS(2016, 1, 1, 0, 0, 0), 999.0, "Orphan before account"),
]

# ---------------------------------------------------------------------------
# FINWIRE records (field dicts keyed by layout names; values are the
# logical/trimmed strings placed into the fixed-width line)

CMP_RECORDS = [
    ("20170101-000000", {
        "company_name": "Alpha Corp", "cik": "0000001001", "status": "ACTV",
        "industry_id": "AM", "sp_rating": "A+", "founding_date": "19800101",
        "address_line1": "1 Alpha Way", "address_line2": "Floor 2",
        "postal_code": "10001", "city": "New York", "state_province": "NY",
        "country": "USA", "ceo_name": "Ada Lovelace",
        "description": "Automobiles and components",
    }),
    ("20180615-000000", {
        "company_name": "Alpha Corp", "cik": "0000001001", "status": "ACTV",
        "industry_id": "AM", "sp_rating": "A", "founding_date": "19800101",
        "address_line1": "1 Alpha Way", "address_line2": "Floor 3",
        "postal_code": "10001", "city": "New York", "state_province": "NY",
        "country": "USA", "ceo_name": "Grace Hopper",
        "description": "Automobiles and components",
    }),
    ("20170301-000000", {
        "company_name": "Beta Industries", "cik": "0000001002",
        "status": "ACTV", "industry_id": "BK", "sp_rating": "BB+",
        "founding_date": "19900215", "address_line1": "2 Beta Blvd",
        "address_line2": "", "postal_code": "60601", "city": "Chicago",
        "state_province": "IL", "country": "USA", "ceo_name": "Bill Beta",
        "description": "Diversified banks",
    }),
]

SEC_RECORDS = [
    ("20170201-000000", {
        "symbol": "AAA", "issue_type": "COMMON", "status": "ACTV",
        "name": "Alpha Common Stock", "ex_id": "NYSE", "sh_out": "1000000",
        "first_trade_date": "20170201", "first_exchange_date": "20170201",
        "dividend": "0.50", "co_name_or_cik": "1001",
    }),
    ("20170401-000000", {
        "symbol": "BBB", "issue_type": "COMMON", "status": "ACTV",
        "name": "Beta Common Stock", "ex_id": "NASDAQ", "sh_out": "2000000",
        "first_trade_date": "20170401", "first_exchange_date": "20170401",
        "dividend": "0.25", "co_name_or_cik": "Beta Industries",
    }),
    ("20180110-000000", {
        "symbol": "BBB", "issue_type": "COMMON", "status": "INAC",
        "name": "Beta Common Stock", "ex_id": "NASDAQ", "sh_out": "2100000",
        "first_trade_date": "20170401", "first_exchange_date": "20170401",
        "dividend": "0.25", "co_name_or_cik": "Beta Industries",
    }),
]


def _fin(pts, year, q, qstart, post, eps, by):
    # eps values are 0.25-multiples → exact binary → window sums are
    # association-independent across engines.
    return (pts, {
        "year": str(year), "quarter": str(q), "quarter_start_date": qstart,
        "posting_date": post, "revenue": "1000000.00", "earnings": "100000.00",
        "eps": f"{eps:.2f}", "diluted_eps": f"{eps - 0.25:.2f}",
        "margin": "0.10", "inventory": "50000.00", "assets": "5000000.00",
        "liabilities": "2000000.00", "sh_out": "1000000",
        "diluted_sh_out": "1050000", "co_name_or_cik": by,
    })


FIN_RECORDS = [
    _fin("20170405-000000", 2017, 1, "20170101", "20170405", 1.00, "1001"),
    _fin("20170705-000000", 2017, 2, "20170401", "20170705", 1.25, "1001"),
    _fin("20171005-000000", 2017, 3, "20170701", "20171005", 1.50, "1001"),
    _fin("20180105-000000", 2017, 4, "20171001", "20180105", 1.75, "1001"),
    _fin("20180405-000000", 2018, 1, "20180101", "20180405", 2.00, "1001"),
    _fin("20180705-000000", 2018, 2, "20180401", "20180705", 2.25, "1001"),
    _fin("20170705-000000", 2017, 2, "20170401", "20170705", 3.00,
         "Beta Industries"),
    _fin("20171005-000000", 2017, 3, "20170701", "20171005", 3.25,
         "Beta Industries"),
]

# ---------------------------------------------------------------------------
# CustomerMgmt actions

_C100 = {
    "c_id": 100, "c_tax_id": "100-00-1000", "c_gndr": "F", "c_tier": 1,
    "c_dob": "1980-01-15",
    "name": {"C_L_NAME": "Smith", "C_F_NAME": "Emma", "C_M_NAME": "J"},
    "address": {"C_ADLINE1": "10 Main St", "C_ADLINE2": "Apt 4",
                "C_ZIPCODE": "10001", "C_CITY": "New York",
                "C_STATE_PROV": "NY", "C_CTRY": "USA"},
    "contact": {
        "C_PRIM_EMAIL": "emma@example.com", "C_ALT_EMAIL": "emma@alt.com",
        "C_PHONE_1": {"C_CTRY_CODE": "1", "C_AREA_CODE": "212",
                      "C_LOCAL": "5550100", "C_EXT": "12"},
        # missing C_EXT → whole phone NULL (concat null-propagation)
        "C_PHONE_2": {"C_AREA_CODE": "646", "C_LOCAL": "5550101"},
        # phone absent entirely → NULL
    },
    "tax": {"C_LCL_TX_ID": "US1", "C_NAT_TX_ID": "US2"},
}

_C101 = {
    "c_id": 101, "c_tax_id": "101-00-1010", "c_gndr": "M", "c_tier": 2,
    "c_dob": "1975-09-09",
    "name": {"C_L_NAME": "Jones", "C_F_NAME": "Liam"},
    "address": {"C_ADLINE1": "5 Oak Ave", "C_ADLINE2": "Suite 9",
                "C_ZIPCODE": "02110", "C_CITY": "Boston",
                "C_STATE_PROV": "MA", "C_CTRY": "USA"},
    "contact": {
        "C_PRIM_EMAIL": "liam@example.com",
        "C_PHONE_1": {"C_CTRY_CODE": "1", "C_AREA_CODE": "617",
                      "C_LOCAL": "5550111", "C_EXT": "7"},
    },
    "tax": {"C_LCL_TX_ID": "CA1", "C_NAT_TX_ID": "DE1"},
}

_C102 = {
    "c_id": 102, "c_tax_id": "102-00-1020", "c_gndr": "F", "c_tier": 3,
    "c_dob": "1990-12-01",
    "name": {"C_L_NAME": "Brown", "C_F_NAME": "Olivia", "C_M_NAME": "B"},
    "address": {"C_ADLINE1": "99 Pine St", "C_ADLINE2": "Suite 7",
                "C_ZIPCODE": "94105", "C_CITY": "San Francisco",
                "C_STATE_PROV": "CA", "C_CTRY": "USA"},
    "contact": {
        "C_PRIM_EMAIL": "olivia@example.com",
        "C_PHONE_1": {"C_CTRY_CODE": "1", "C_AREA_CODE": "415",
                      "C_LOCAL": "5550199", "C_EXT": "3"},
    },
    "tax": {"C_LCL_TX_ID": "US1", "C_NAT_TX_ID": "US2"},
}

ACTIONS = [
    ("NEW", "2017-01-05T09:00:00", _C100,
     {"ca_id": 500, "ca_tax_st": 1, "CA_B_ID": 1, "CA_NAME": "Emma Main"}),
    ("ADDACCT", "2017-02-10T10:00:00", {"c_id": 100},
     {"ca_id": 501, "ca_tax_st": 2, "CA_B_ID": 2, "CA_NAME": "Emma Second"}),
    ("NEW", "2017-03-15T09:30:00", _C101,
     {"ca_id": 502, "ca_tax_st": 0, "CA_B_ID": 2, "CA_NAME": "Liam Main"}),
    # partial update: only tier + primary email → forward-fill fodder
    ("UPDCUST", "2017-05-01T11:00:00",
     {"c_id": 100, "c_tier": 2,
      "contact": {"C_PRIM_EMAIL": "emma.new@example.com"}}, None),
    ("UPDACCT", "2017-06-01T12:00:00", {"c_id": 100},
     {"ca_id": 500, "ca_tax_st": 1, "CA_B_ID": 1, "CA_NAME": "Emma Prime"}),
    ("NEW", "2017-07-01T08:45:00", _C102,
     {"ca_id": 503, "ca_tax_st": 1, "CA_B_ID": 4, "CA_NAME": "Olivia Main"}),
    ("INACT", "2018-03-01T08:00:00", {"c_id": 101}, None),
    ("CLOSEACCT", "2018-03-02T08:00:00", {"c_id": 101},
     {"ca_id": 502, "ca_tax_st": 0, "CA_B_ID": 2, "CA_NAME": "Liam Main"}),
]

# ---------------------------------------------------------------------------
# Batch2 incremental deltas (the Batch2/3 path the reference defers,
# reference README.md:53-55). Designed so every SCD2 merge is valid:
# CMP/SEC/FIN/XML deltas only append versions with pts/action_ts AFTER
# every Batch1 record of the same entity (so no existing row's temporal
# join target changes), while the trade delta exercises the
# full-version-replacement path (an updated Trade.txt row rewrites
# t-attributes on ALL versions of that trade -> merge must replace the
# touched keys' history, not append to it).

_C103 = {
    "c_id": 103, "c_tax_id": "103-00-1030", "c_gndr": "M", "c_tier": 1,
    "c_dob": "1985-04-20",
    "name": {"C_L_NAME": "Brown", "C_F_NAME": "Noah"},
    "address": {"C_ADLINE1": "7 Elm Rd", "C_ADLINE2": "Apt 2",
                "C_ZIPCODE": "73301", "C_CITY": "Austin",
                "C_STATE_PROV": "TX", "C_CTRY": "USA"},
    "contact": {
        "C_PRIM_EMAIL": "noah@example.com",
        "C_PHONE_1": {"C_CTRY_CODE": "1", "C_AREA_CODE": "512",
                      "C_LOCAL": "5550142", "C_EXT": "9"},
    },
    "tax": {"C_LCL_TX_ID": "US1", "C_NAT_TX_ID": "US2"},
}

ACTIONS2 = [
    ("NEW", "2019-01-10T09:00:00", _C103,
     {"ca_id": 504, "ca_tax_st": 1, "CA_B_ID": 1, "CA_NAME": "Noah Main"}),
    ("UPDCUST", "2019-02-01T10:00:00",
     {"c_id": 102, "contact": {"C_PRIM_EMAIL": "olivia.new@example.com"}},
     None),
    ("UPDACCT", "2019-02-15T11:00:00", {"c_id": 100},
     {"ca_id": 500, "ca_tax_st": 2, "CA_B_ID": 1,
      "CA_NAME": "Emma Prime Plus"}),
    ("ADDACCT", "2019-03-01T09:30:00", {"c_id": 102},
     {"ca_id": 505, "ca_tax_st": 0, "CA_B_ID": 4,
      "CA_NAME": "Olivia Margin"}),
]

CMP_RECORDS2 = [
    ("20190101-000000", {
        "company_name": "Gamma LLC", "cik": "0000001003", "status": "ACTV",
        "industry_id": "CH", "sp_rating": "B+", "founding_date": "20000101",
        "address_line1": "3 Gamma Ct", "address_line2": "",
        "postal_code": "73301", "city": "Austin", "state_province": "TX",
        "country": "USA", "ceo_name": "Grace Gamma",
        "description": "Specialty chemicals",
    }),
    ("20190201-000000", {
        "company_name": "Alpha Corp", "cik": "0000001001", "status": "ACTV",
        "industry_id": "AM", "sp_rating": "A-", "founding_date": "19800101",
        "address_line1": "1 Alpha Way", "address_line2": "Floor 4",
        "postal_code": "10001", "city": "New York", "state_province": "NY",
        "country": "USA", "ceo_name": "Alan Turing",
        "description": "Automobiles and components",
    }),
]

SEC_RECORDS2 = [
    ("20190301-000000", {
        "symbol": "CCC", "issue_type": "COMMON", "status": "ACTV",
        "name": "Gamma Common Stock", "ex_id": "NYSE", "sh_out": "500000",
        "first_trade_date": "20190301", "first_exchange_date": "20190301",
        "dividend": "0.00", "co_name_or_cik": "1003",
    }),
    ("20190401-000000", {
        "symbol": "AAA", "issue_type": "COMMON", "status": "ACTV",
        "name": "Alpha Common Stock", "ex_id": "NYSE", "sh_out": "1100000",
        "first_trade_date": "20170201", "first_exchange_date": "20170201",
        "dividend": "0.75", "co_name_or_cik": "1001",
    }),
]

FIN_RECORDS2 = [
    _fin("20190405-000000", 2019, 1, "20190101", "20190405", 2.50, "1001"),
    _fin("20190405-000000", 2019, 1, "20190101", "20190405", 0.50, "1003"),
]

#: Batch2 Trade.txt delta: trade 9005 is UPDATED (SBMT -> CMPT with a
#: final price), trade 9007 is new. A rebuild sees only the updated
#: 9005 row, so the combined source replaces — never duplicates — the
#: Batch1 row with the same t_id.
TRADE2 = [
    (9005, TS(2018, 6, 20, 9, 0, 0), "CMPT", "TMB", True, "AAA", 10.0, 12.0,
     500, "Emma Smith", 12.25, 0.25, 0.0, 0.25),
    (9007, TS(2019, 5, 1, 10, 0, 0), "CMPT", "TMS", False, "CCC", 20.0, 8.0,
     504, "Noah Brown", 8.25, 0.5, 0.25, 0.25),
]

TRADE_HISTORY2 = [
    (9005, TS(2018, 6, 21, 9, 0, 0), "ACTV"),
    (9005, TS(2018, 6, 21, 16, 0, 0), "CMPT"),
    (9007, TS(2019, 5, 1, 10, 0, 0), "SBMT"),
    (9007, TS(2019, 5, 1, 15, 0, 0), "CMPT"),
]

# ---------------------------------------------------------------------------
# Batch3 deltas: a SECOND round of increments layered on the Batch2
# state — merges must compose (merge onto an already-merged warehouse),
# including a replace-mode update of a trade that Batch2 itself
# introduced (9007). All pts/action_ts strictly after every Batch2
# record of the same entity.

ACTIONS3 = [
    ("NEW", "2019-06-01T09:00:00",
     {
         "c_id": 104, "c_tax_id": "104-00-1040", "c_gndr": "F", "c_tier": 2,
         "c_dob": "1992-07-07",
         "name": {"C_L_NAME": "Stone", "C_F_NAME": "Ava"},
         "address": {"C_ADLINE1": "12 Lake Dr", "C_ADLINE2": "",
                     "C_ZIPCODE": "60601", "C_CITY": "Chicago",
                     "C_STATE_PROV": "IL", "C_CTRY": "USA"},
         "contact": {
             "C_PRIM_EMAIL": "ava@example.com",
             "C_PHONE_1": {"C_CTRY_CODE": "1", "C_AREA_CODE": "312",
                           "C_LOCAL": "5550177", "C_EXT": ""},
         },
         "tax": {"C_LCL_TX_ID": "US1", "C_NAT_TX_ID": "US2"},
     },
     {"ca_id": 506, "ca_tax_st": 1, "CA_B_ID": 2, "CA_NAME": "Ava Main"}),
    ("UPDCUST", "2019-07-01T10:00:00",
     {"c_id": 103, "c_tier": 3}, None),
    ("UPDACCT", "2019-07-15T11:00:00", {"c_id": 102},
     {"ca_id": 505, "ca_tax_st": 1, "CA_B_ID": 4,
      "CA_NAME": "Olivia Margin Plus"}),
]

CMP_RECORDS3 = [
    ("20190601-000000", {
        "company_name": "Gamma LLC", "cik": "0000001003", "status": "ACTV",
        "industry_id": "CH", "sp_rating": "A-", "founding_date": "20000101",
        "address_line1": "3 Gamma Ct", "address_line2": "Floor 2",
        "postal_code": "73301", "city": "Austin", "state_province": "TX",
        "country": "USA", "ceo_name": "Grace Gamma",
        "description": "Specialty chemicals",
    }),
]

SEC_RECORDS3 = [
    ("20190701-000000", {
        "symbol": "CCC", "issue_type": "COMMON", "status": "INAC",
        "name": "Gamma Common Stock", "ex_id": "NYSE", "sh_out": "500000",
        "first_trade_date": "20190301", "first_exchange_date": "20190301",
        "dividend": "0.10", "co_name_or_cik": "1003",
    }),
]

FIN_RECORDS3 = [
    _fin("20190705-000000", 2019, 2, "20190401", "20190705", 2.75, "1001"),
]

#: trade 9007 (introduced by Batch2) flips to canceled with a final
#: price change; 9008 is new
TRADE3 = [
    (9007, TS(2019, 5, 1, 10, 0, 0), "CNCL", "TMS", False, "CCC", 20.0, 8.0,
     504, "Noah Brown", 0.0, 0.5, 0.25, 0.0),
    (9008, TS(2019, 8, 1, 9, 30, 0), "CMPT", "TMB", True, "AAA", 5.0, 12.5,
     506, "Ava Stone", 12.75, 0.3, 0.1, 0.2),
]

TRADE_HISTORY3 = [
    (9007, TS(2019, 6, 2, 9, 0, 0), "CNCL"),
    (9008, TS(2019, 8, 1, 9, 30, 0), "SBMT"),
    (9008, TS(2019, 8, 1, 14, 0, 0), "CMPT"),
]

#: CDC DELETE feeds (TPC-DI Batch2+ rows flagged CDC_FLAG='D'): the
#: named trades' ENTIRE version history is purged from the warehouse.
#: Batch2 purges 9003 (a canceled Batch1 trade), Batch3 purges 9001 —
#: deletes must compose across merge rounds and survive later merges
#: that do not touch the purged keys.
TRADE_DELETES2 = [(9003,)]
TRADE_DELETES3 = [(9001,)]

# ---------------------------------------------------------------------------
# generated series

DM_START = D(2017, 1, 2)
DM_DAYS = 400
DM_SYMBOLS = ("AAA", "BBB")


def daily_market_rows():
    rows = []
    for symb in DM_SYMBOLS:
        base = 10.0 if symb == "AAA" else 5.0
        for i in range(DM_DAYS):
            close = base + ((i * 7) % 40) * 0.25
            high = close + 0.5 + (i % 3) * 0.25
            low = close - 0.5 - (i % 5) * 0.25
            vol = float(1000 + i)
            rows.append((DM_START + dt.timedelta(days=i), symb, close, high,
                         low, vol))
    return rows


DATE_START = D(2017, 1, 1)
DATE_END = D(2018, 12, 31)

_DOW = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
        "Sunday"]
_HOLIDAYS = {(1, 1), (7, 4), (12, 25)}


def date_rows():
    rows = []
    d = DATE_START
    while d <= DATE_END:
        y, m = d.year, d.month
        q = (m - 1) // 3 + 1
        iso = d.isocalendar()
        fy = y + (1 if m >= 7 else 0)
        fq = ((m - 7) % 12) // 3 + 1
        rows.append((
            int(d.strftime("%Y%m%d")), d, d.isoformat(),
            y, str(y),
            y * 10 + q, f"{y}-Q{q}",
            y * 100 + m, f"{y}-{m:02d}",
            iso[0] * 100 + iso[1], f"{iso[0]}-W{iso[1]:02d}",
            iso[2], _DOW[iso[2] - 1],
            fy, f"FY{fy}",
            fy * 10 + fq, f"FY{fy}-Q{fq}",
            (m, d.day) in _HOLIDAYS,
        ))
        d += dt.timedelta(days=1)
    return rows


# ---------------------------------------------------------------------------
# raw-file rendering

def _cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, TS):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, D):
        return v.isoformat()
    return str(v)


def write_delimited(path: Path, rows, sep: str) -> None:
    path.write_text("\n".join(sep.join(_cell(c) for c in r) for r in rows)
                    + "\n")


def finwire_line(pts: str, rec_type: str, fields: dict, layout) -> str:
    end = max(f.pos + f.length for f in layout) - 1
    buf = [" "] * end
    def place(s: str, pos: int, ln: int) -> None:
        s = (s or "")[:ln]
        buf[pos - 1 : pos - 1 + len(s)] = list(s)
    place(pts, 1, 15)
    place(rec_type, 16, 3)
    for f in layout:
        place(str(fields.get(f.name, "") or ""), f.pos, f.length)
    return "".join(buf)


def _xml_elem(tag: str, children: dict | str | None, indent: str) -> str:
    if children is None:
        return ""
    if isinstance(children, str):
        return f"{indent}<{tag}>{children}</{tag}>\n"
    inner = "".join(
        _xml_elem(k, v, indent + "  ") for k, v in children.items() if v is not None
    )
    return f"{indent}<{tag}>\n{inner}{indent}</{tag}>\n"


def action_xml_fragments(actions=None) -> list[str]:
    """One self-contained ``<TPCDI:Action>`` element per action — the
    document body ``render_customer_mgmt_xml`` wraps, and the per-row
    strings the driver-gate ``from_xml`` query parses."""
    frags = []
    for action_type, action_ts, cust, acct in (ACTIONS if actions is None
                                               else actions):
        out = [
            f'  <TPCDI:Action ActionType="{action_type}" ActionTS="{action_ts}">\n'
        ]
        attrs = [f'C_ID="{cust["c_id"]}"']
        for a, key in (("C_TAX_ID", "c_tax_id"), ("C_GNDR", "c_gndr"),
                       ("C_TIER", "c_tier"), ("C_DOB", "c_dob")):
            if cust.get(key) is not None:
                attrs.append(f'{a}="{cust[key]}"')
        out.append(f"    <Customer {' '.join(attrs)}>\n")
        for tag, key in (("Name", "name"), ("Address", "address"),
                         ("ContactInfo", "contact"), ("TaxInfo", "tax")):
            out.append(_xml_elem(tag, cust.get(key), "      "))
        if acct is not None:
            out.append(
                f'      <Account CA_ID="{acct["ca_id"]}" '
                f'CA_TAX_ST="{acct["ca_tax_st"]}">\n'
                f'        <CA_B_ID>{acct["CA_B_ID"]}</CA_B_ID>\n'
                f'        <CA_NAME>{acct["CA_NAME"]}</CA_NAME>\n'
                f"      </Account>\n"
            )
        out.append("    </Customer>\n  </TPCDI:Action>\n")
        frags.append("".join(out))
    return frags


def render_customer_mgmt_xml(actions=None) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<TPCDI:Actions xmlns:TPCDI="http://www.tpc.org/tpc-di">\n'
        + "".join(action_xml_fragments(actions))
        + "</TPCDI:Actions>\n"
    )


# ---------------------------------------------------------------------------
# logical (typed parquet) rendering

_PA_TYPES = {
    "integer": pa.int32(), "long": pa.int64(), "double": pa.float64(),
    "string": pa.string(), "date": pa.date32(), "timestamp": pa.timestamp("us"),
    "boolean": pa.bool_(),
}


def _schema_to_arrow(spark_schema) -> pa.Schema:
    return pa.schema(
        [(f.name, _PA_TYPES[f.dataType.typeName()]) for f in spark_schema.fields]
    )


def _write_logical(path: Path, rows, arrow_schema: pa.Schema) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in arrow_schema.names]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, arrow_schema)],
        schema=arrow_schema,
    )
    pq.write_table(table, path)


def _phone_logical(p: dict | None) -> str | None:
    """Python mirror of the reference phone concat (tpcdi.py:174-186):
    any missing part → NULL; empty-string part → separator dropped."""
    if p is None:
        return None
    parts = [p.get(k) for k in ("C_CTRY_CODE", "C_AREA_CODE", "C_LOCAL", "C_EXT")]
    if any(v is None for v in parts):
        return None
    c, a, l, e = parts
    return (c + ("" if c == "" else "-") + a + ("" if a == "" else "-") + l
            + ("" if e == "" else " ext: ") + e)


CUSTOMER_MGMT_ARROW = pa.schema([
    ("action_type", pa.string()), ("action_ts", pa.timestamp("us")),
    ("c_id", pa.int64()), ("c_tax_id", pa.string()), ("c_gndr", pa.string()),
    ("c_tier", pa.int32()), ("c_dob", pa.date32()),
    ("c_l_name", pa.string()), ("c_f_name", pa.string()),
    ("c_m_name", pa.string()),
    ("c_adline1", pa.string()), ("c_adline2", pa.string()),
    ("c_zipcode", pa.string()), ("c_city", pa.string()),
    ("c_state_prov", pa.string()), ("c_ctry", pa.string()),
    ("c_prim_email", pa.string()), ("c_alt_email", pa.string()),
    ("c_phone_1", pa.string()), ("c_phone_2", pa.string()),
    ("c_phone_3", pa.string()),
    ("c_lcl_tx_id", pa.string()), ("c_nat_tx_id", pa.string()),
    ("ca_id", pa.int64()), ("ca_tax_st", pa.int32()),
    ("ca_b_id", pa.int64()), ("ca_name", pa.string()),
])


def customer_mgmt_logical_rows():
    rows = []
    for action_type, action_ts, cust, acct in ACTIONS:
        name = cust.get("name") or {}
        addr = cust.get("address") or {}
        contact = cust.get("contact") or {}
        tax = cust.get("tax") or {}
        rows.append((
            action_type, TS.fromisoformat(action_ts),
            cust["c_id"], cust.get("c_tax_id"), cust.get("c_gndr"),
            cust.get("c_tier"),
            D.fromisoformat(cust["c_dob"]) if cust.get("c_dob") else None,
            name.get("C_L_NAME"), name.get("C_F_NAME"), name.get("C_M_NAME"),
            addr.get("C_ADLINE1"), addr.get("C_ADLINE2"), addr.get("C_ZIPCODE"),
            addr.get("C_CITY"), addr.get("C_STATE_PROV"), addr.get("C_CTRY"),
            contact.get("C_PRIM_EMAIL"), contact.get("C_ALT_EMAIL"),
            _phone_logical(contact.get("C_PHONE_1")),
            _phone_logical(contact.get("C_PHONE_2")),
            _phone_logical(contact.get("C_PHONE_3")),
            tax.get("C_LCL_TX_ID"), tax.get("C_NAT_TX_ID"),
            acct["ca_id"] if acct else None,
            acct["ca_tax_st"] if acct else None,
            acct["CA_B_ID"] if acct else None,
            acct["CA_NAME"] if acct else None,
        ))
    return rows


def _finwire_logical(records, layout):
    """pts + typed/trimmed fields, exactly what the Spark slicer emits
    (CMP carries loader-level casts: cik→long, founding_date→date)."""

    def conv(f, v):
        if v is None or v == "":
            return None
        if f.dtype in ("int", "long"):
            return int(v)
        if f.dtype == "double":
            return float(v)
        if f.dtype == "date":
            return TS.strptime(v, "%Y%m%d").date()
        return v

    rows = []
    for pts, fields in records:
        vals = [TS.strptime(pts, "%Y%m%d-%H%M%S")]
        vals += [conv(f, fields.get(f.name, "")) for f in layout]
        rows.append(tuple(vals))
    pa_type = {"int": pa.int32(), "long": pa.int64(), "double": pa.float64(),
               "date": pa.date32(), "string": pa.string()}
    schema = pa.schema([("pts", pa.timestamp("us"))]
                       + [(f.name, pa_type[f.dtype]) for f in layout])
    return rows, schema


FINWIRE_SETS = (
    ("CMP", CMP_LAYOUT, CMP_RECORDS),
    ("SEC", SEC_LAYOUT, SEC_RECORDS),
    ("FIN", FIN_LAYOUT, FIN_RECORDS),
)

#: the Batch2/Batch3 quarterly drops (written by ``generate`` to
#: raw_batch2/FINWIRE2019Q1 and raw_batch3/FINWIRE2019Q2)
FINWIRE_SETS2 = (
    ("CMP", CMP_LAYOUT, CMP_RECORDS2),
    ("SEC", SEC_LAYOUT, SEC_RECORDS2),
    ("FIN", FIN_LAYOUT, FIN_RECORDS2),
)
FINWIRE_SETS3 = (
    ("CMP", CMP_LAYOUT, CMP_RECORDS3),
    ("SEC", SEC_LAYOUT, SEC_RECORDS3),
    ("FIN", FIN_LAYOUT, FIN_RECORDS3),
)


def delimited_tables() -> dict[str, tuple[str, list]]:
    """source name -> (raw file name, rows)."""
    return {
        "date": ("Date.txt", date_rows()),
        "daily_market": ("DailyMarket.txt", daily_market_rows()),
        "industry": ("Industry.txt", INDUSTRY),
        "prospect": ("Prospect.csv", PROSPECT),
        "tax_rate": ("TaxRate.txt", TAX_RATE),
        "hr": ("HR.csv", HR),
        "watch_history": ("WatchHistory.txt", WATCH_HISTORY),
        "trade": ("Trade.txt", TRADE),
        "trade_history": ("TradeHistory.txt", TRADE_HISTORY),
        "status_type": ("StatusType.txt", STATUS_TYPE),
        "trade_type": ("TradeType.txt", TRADE_TYPE),
        "holding_history": ("HoldingHistory.txt", HOLDING_HISTORY),
        "cash_transaction": ("CashTransaction.txt", CASH_TRANSACTION),
    }


def logical_tables() -> dict[str, tuple[list, pa.Schema]]:
    """Every logical source table as (rows, arrow schema) — the same
    independent rendering ``generate`` writes to parquet, reusable for
    in-memory oracles (driver-gate VALUES CTEs)."""
    out: dict[str, tuple[list, pa.Schema]] = {}
    for source, (_fname, rows) in delimited_tables().items():
        out[source] = (rows, _schema_to_arrow(SCHEMAS[source]))
    for rec_type, layout, records in FINWIRE_SETS:
        out[rec_type.lower()] = _finwire_logical(records, layout)
    out["customer_mgmt"] = (customer_mgmt_logical_rows(), CUSTOMER_MGMT_ARROW)
    return out


def finwire_raw_lines(sets=FINWIRE_SETS) -> list[str]:
    """The mixed CMP/SEC/FIN fixed-width lines of the raw FINWIRE drop."""
    return [
        finwire_line(pts, rec_type, fields, layout)
        for rec_type, layout, records in sets
        for pts, fields in records
    ]


def generate(target: str | Path) -> Path:
    """Write raw/ + logical/ fixture trees; returns the target path."""
    target = Path(target)
    raw = target / "raw"
    logical = target / "logical"
    raw.mkdir(parents=True, exist_ok=True)
    logical.mkdir(parents=True, exist_ok=True)

    for source, (fname, rows) in delimited_tables().items():
        sep = "," if fname.endswith(".csv") else "|"
        write_delimited(raw / fname, rows, sep)
        _write_logical(logical / f"{source}.parquet", rows,
                       _schema_to_arrow(SCHEMAS[source]))

    for rec_type, layout, records in FINWIRE_SETS:
        rows, schema = _finwire_logical(records, layout)
        _write_logical(logical / f"{rec_type.lower()}.parquet", rows, schema)
    # single mixed file, like a real FINWIRE quarterly drop
    (raw / "FINWIRE2017Q1").write_text("\n".join(finwire_raw_lines()) + "\n")

    (raw / "CustomerMgmt.xml").write_text(render_customer_mgmt_xml())
    _write_logical(logical / "customer_mgmt.parquet",
                   customer_mgmt_logical_rows(), CUSTOMER_MGMT_ARROW)

    # Batch2 delta drop (same file-name conventions; only changed feeds)
    raw2 = target / "raw_batch2"
    raw2.mkdir(parents=True, exist_ok=True)
    write_delimited(raw2 / "Trade.txt", TRADE2, "|")
    write_delimited(raw2 / "TradeHistory.txt", TRADE_HISTORY2, "|")
    write_delimited(raw2 / "TradeDeletes.txt", TRADE_DELETES2, "|")
    (raw2 / "FINWIRE2019Q1").write_text(
        "\n".join(finwire_raw_lines(FINWIRE_SETS2)) + "\n")
    (raw2 / "CustomerMgmt.xml").write_text(render_customer_mgmt_xml(ACTIONS2))

    # Batch3 delta drop (second increment — merges must compose)
    raw3 = target / "raw_batch3"
    raw3.mkdir(parents=True, exist_ok=True)
    write_delimited(raw3 / "Trade.txt", TRADE3, "|")
    write_delimited(raw3 / "TradeHistory.txt", TRADE_HISTORY3, "|")
    write_delimited(raw3 / "TradeDeletes.txt", TRADE_DELETES3, "|")
    (raw3 / "FINWIRE2019Q2").write_text(
        "\n".join(finwire_raw_lines(FINWIRE_SETS3)) + "\n")
    (raw3 / "CustomerMgmt.xml").write_text(render_customer_mgmt_xml(ACTIONS3))
    return target
