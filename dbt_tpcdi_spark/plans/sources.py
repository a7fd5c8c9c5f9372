"""Raw-file source loading for the warehouse DAG (Batch1 layout).

Maps every source name the bronze layer consumes to its reader. File
name conventions follow the reference loader (``tpcdi.py:192-535``).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from dbt_tpcdi_spark.sources.delimited import read_delimited
from dbt_tpcdi_spark.sources.finwire import read_finwire
from dbt_tpcdi_spark.sources.xml import read_customer_mgmt

DELIMITED_FILES = {
    "date": "Date.txt",
    "daily_market": "DailyMarket.txt",
    "industry": "Industry.txt",
    "prospect": "Prospect.csv",
    "tax_rate": "TaxRate.txt",
    "hr": "HR.csv",
    "watch_history": "WatchHistory.txt",
    "trade": "Trade.txt",
    "trade_history": "TradeHistory.txt",
    "status_type": "StatusType.txt",
    "trade_type": "TradeType.txt",
    "holding_history": "HoldingHistory.txt",
    "cash_transaction": "CashTransaction.txt",
    # incremental batches only (CDC DELETE feed; absent in Batch1)
    "trade_deletes": "TradeDeletes.txt",
}


def load_dag_sources(spark: SparkSession, raw_dir: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name, fname in DELIMITED_FILES.items():
        path = os.path.join(raw_dir, fname)
        if os.path.exists(path):
            out[name] = read_delimited(spark, path, name)

    finwire_paths = sorted(
        p for p in glob.glob(os.path.join(raw_dir, "FINWIRE*"))
        if "_audit" not in os.path.basename(p)
    )
    if finwire_paths:
        # one scan shared by the CMP/SEC/FIN branches (persist = the
        # reference's temp-table trick, tpcdi.py:454)
        parsed = read_finwire(spark, finwire_paths)
        out["cmp"], out["sec"], out["fin"] = (
            parsed["CMP"], parsed["SEC"], parsed["FIN"],
        )

    xml_path = os.path.join(raw_dir, "CustomerMgmt.xml")
    if os.path.exists(xml_path):
        out["customer_mgmt"] = read_customer_mgmt(spark, xml_path)
    return out
