"""Delimited-text ingest: the 13 TPC-DI flat-file schemas + reader.

Schemas transcribed from the reference loader's Snowpark StructTypes
(reference ``tpcdi.py:194-432``); delimiter rule from ``tpcdi.py:93-106``
(``.csv`` → comma, anything else → pipe). Reading with an explicit
schema (S1, ``tpcdi.py:129-145``) keeps type errors at the scan and
lets the parquet-side consumers trust the types.

Scale notes: ``spark.read.csv`` with a declared schema is splittable
and parallel per file; FloatType in the reference is widened to
DoubleType (Snowflake FLOAT is 8-byte) and IDs that overflow int32 at
100 TB scale factors use LongType (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = False) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_I, _L, _D, _S = T.IntegerType(), T.LongType(), T.DoubleType(), T.StringType()
_DT, _TS, _B = T.DateType(), T.TimestampType(), T.BooleanType()

#: source name -> StructType (reference tpcdi.py line cites in comments)
SCHEMAS: dict[str, T.StructType] = {
    # tpcdi.py:194-213
    "date": T.StructType([
        _f("sk_date_id", _L),
        _f("date_value", _DT),
        _f("date_desc", _S),
        _f("calendar_year_id", _I),
        _f("calendar_year_desc", _S),
        _f("calendar_qtr_id", _I),
        _f("calendar_qtr_desc", _S),
        _f("calendar_month_id", _I),
        _f("calendar_month_desc", _S),
        _f("calendar_week_id", _I),
        _f("calendar_week_desc", _S),
        _f("day_of_week_num", _I),
        _f("day_of_week_desc", _S),
        _f("fiscal_year_id", _I),
        _f("fiscal_year_desc", _S),
        _f("fiscal_qtr_id", _I),
        _f("fiscal_qtr_desc", _S),
        _f("holiday_flag", _B),
    ]),
    # tpcdi.py:218-226
    "daily_market": T.StructType([
        _f("dm_date", _DT),
        _f("dm_s_symb", _S),
        _f("dm_close", _D),
        _f("dm_high", _D),
        _f("dm_low", _D),
        _f("dm_vol", _D),
    ]),
    # tpcdi.py:229-235
    "industry": T.StructType([
        _f("in_id", _S), _f("in_name", _S), _f("in_sc_id", _S),
    ]),
    # tpcdi.py:238-263
    "prospect": T.StructType([
        _f("agency_id", _S),
        _f("last_name", _S, True),
        _f("first_name", _S, True),
        _f("middle_initial", _S, True),
        _f("gender", _S, True),
        _f("address_line1", _S, True),
        _f("address_line2", _S, True),
        _f("postal_code", _S, True),
        _f("city", _S, True),
        _f("state", _S, True),
        _f("country", _S, True),
        _f("phone", _S, True),
        _f("income", _L, True),
        _f("number_cars", _I, True),
        _f("number_children", _I, True),
        _f("marital_status", _S, True),
        _f("age", _I, True),
        _f("credit_rating", _I, True),
        _f("own_or_rent_flag", _S, True),
        _f("employer", _S, True),
        _f("number_credit_cards", _I, True),
        _f("net_worth", _L, True),
    ]),
    # tpcdi.py:334-340
    "tax_rate": T.StructType([
        _f("tx_id", _S), _f("tx_name", _S, True), _f("tx_rate", _D, True),
    ]),
    # tpcdi.py:343-354
    "hr": T.StructType([
        _f("employee_id", _L),
        _f("manager_id", _L),
        _f("employee_first_name", _S, True),
        _f("employee_last_name", _S, True),
        _f("employee_mi", _S, True),
        _f("employee_job_code", _I, True),
        _f("employee_branch", _S, True),
        _f("employee_office", _S, True),
        _f("employee_phone", _S, True),
    ]),
    # tpcdi.py:358-364
    "watch_history": T.StructType([
        _f("w_c_id", _L),
        _f("w_s_symb", _S, True),
        _f("w_dts", _TS, True),
        _f("w_action", _S, True),
    ]),
    # tpcdi.py:368-384
    "trade": T.StructType([
        _f("t_id", _L),
        _f("t_dts", _TS),
        _f("t_st_id", _S),
        _f("t_tt_id", _S),
        _f("t_is_cash", _B),
        _f("t_s_symb", _S),
        _f("t_qty", _D),
        _f("t_bid_price", _D),
        _f("t_ca_id", _L),
        _f("t_exec_name", _S),
        _f("t_trade_price", _D, True),
        _f("t_chrg", _D, True),
        _f("t_comm", _D, True),
        _f("t_tax", _D, True),
    ]),
    # tpcdi.py:388-394
    "trade_history": T.StructType([
        _f("th_t_id", _L), _f("th_dts", _TS), _f("th_st_id", _S),
    ]),
    # tpcdi.py:397-402
    "status_type": T.StructType([
        _f("st_id", _S), _f("st_name", _S),
    ]),
    # tpcdi.py:405-412
    "trade_type": T.StructType([
        _f("tt_id", _S), _f("tt_name", _S), _f("tt_is_sell", _B), _f("tt_is_market", _B),
    ]),
    # tpcdi.py:415-422
    "holding_history": T.StructType([
        _f("hh_h_t_id", _L), _f("hh_t_id", _L),
        _f("hh_before_qty", _D), _f("hh_after_qty", _D),
    ]),
    # tpcdi.py:425-432
    "cash_transaction": T.StructType([
        _f("ct_ca_id", _L), _f("ct_dts", _TS), _f("ct_amt", _D), _f("ct_name", _S),
    ]),
    # Batch2/3 CDC delete drop (TPC-DI incremental batches carry
    # CDC_FLAG='D' rows; the reference defers Batch2/3 entirely,
    # README.md:53-55 — this engine models the delete feed as its own
    # key file, consumed by Runner.merge_refresh(delete_keys=...))
    "trade_deletes": T.StructType([
        _f("td_t_id", _L),
    ]),
}


def delimiter_for(path: str) -> str:
    """Reference rule (``tpcdi.py:93-106``): .csv → ',', else '|'."""
    return "," if path.lower().endswith(".csv") else "|"


#: money columns per source — the reference's FloatType price/fee/amount
#: fields (``tpcdi.py:376-383`` for trade, ``:303-309`` for cash).
#: Under ``SPARK_TPCDI_MONEY=decimal`` these scan as DecimalType(15,2)
#: instead of the default DoubleType: exact cents at 100 TB (no
#: accumulation drift in SUMs) at the cost of slower arithmetic. The
#: default stays double for value-hash parity with the DuckDB oracles
#: (SURVEY §1.2 hazard 5); ``dag_fact_trade_decimal`` gates that the
#:  DAG is type-agnostic end to end.
MONEY_COLS: dict[str, tuple[str, ...]] = {
    "trade": ("t_bid_price", "t_trade_price", "t_chrg", "t_comm",
              "t_tax"),
    "cash_transaction": ("ct_amt",),
}


def money_mode_decimal() -> bool:
    """True when ``SPARK_TPCDI_MONEY=decimal`` — read at scan/build
    time (the ``SPARK_TPCDI_PARITY`` selector pattern), never baked at
    import."""
    import os

    return os.environ.get("SPARK_TPCDI_MONEY", "") == "decimal"


def schema_for(source: str) -> T.StructType:
    """The source's scan schema under the current money mode."""
    base = SCHEMAS[source]
    cols = MONEY_COLS.get(source)
    if not cols or not money_mode_decimal():
        return base
    dec = T.DecimalType(15, 2)
    return T.StructType([
        T.StructField(
            f.name, dec if f.name in cols else f.dataType, f.nullable
        )
        for f in base.fields
    ])


def read_delimited(
    spark: SparkSession, path: str, source: str, delimiter: str | None = None
) -> DataFrame:
    """Typed scan of one delimited source file/directory (S1)."""
    schema = schema_for(source)
    return (
        spark.read.schema(schema)
        .option("sep", delimiter or delimiter_for(path))
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("dateFormat", "yyyy-MM-dd")
        .csv(path)
    )
