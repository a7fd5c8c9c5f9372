"""Coherence contract of the volume-scale raw synthesizer
(``tpcdi/bigdata.py``): at a tiny parameterization, every generated
fact row must survive the DAG's inner/temporal joins — the property
that makes the bench's 1 M-trade build measure real join work rather
than silently-dropped rows."""

from __future__ import annotations

import pytest

from dbt_tpcdi_spark.plans.runner import Runner
from dbt_tpcdi_spark.plans.sources import load_dag_sources
from dbt_tpcdi_spark.tpcdi.bigdata import synthesize_raw

_N_SYMBOLS, _N_CUST, _N_TRADES, _DM_DAYS, _PAIRS = 40, 80, 1500, 25, 400


@pytest.fixture(scope="module")
def big_wh(spark, tmp_path_factory):
    target = tmp_path_factory.mktemp("bigdata")
    raw = synthesize_raw(
        spark, target, n_symbols=_N_SYMBOLS, n_customers=_N_CUST,
        n_trades=_N_TRADES, dm_days=_DM_DAYS, watch_pairs=_PAIRS,
    )
    srcs = load_dag_sources(spark, str(raw))
    wh = str(target / "wh")
    Runner(spark, srcs, warehouse_dir=wh).run(parallelism=4)
    return wh, srcs


def _count(spark, wh, name):
    return spark.read.parquet(f"{wh}/{name}").count()


def test_fact_rows_exact(spark, big_wh):
    """Temporal joins match EXACTLY one dimension version per fact row:
    no drops (a coherence bug) and no multiplication (an overlap bug)."""
    wh, _ = big_wh
    assert _count(spark, wh, "fact_trade") == _N_TRADES
    assert _count(spark, wh, "fact_market_history") == (
        _N_SYMBOLS * _DM_DAYS)


def test_source_volumes(spark, big_wh):
    wh, srcs = big_wh
    assert srcs["trade"].count() == _N_TRADES
    assert srcs["daily_market"].count() == _N_SYMBOLS * _DM_DAYS
    # every trade has a SBMT history row plus finals: > 1 version/trade
    assert srcs["trade_history"].count() > _N_TRADES
    # both CIK- and name-resolved companies exist (the two fallback
    # arms of silver.securities both carry volume)
    sec = srcs["sec"]
    n_cik = sec.filter("co_name_or_cik rlike '^[0-9]+$'").count()
    assert 0 < n_cik < sec.count()


def test_dimension_versions(spark, big_wh):
    """SCD2 versions land for every entity family the generator
    claims: companies (v2 for k%10==0), securities (INAC v2 for
    k%10==5), customers (UPDCUST), accounts (ADDACCT/UPDACCT)."""
    wh, _ = big_wh
    from pyspark.sql import functions as F

    for name, key, extra in (
        ("dim_company", "company_id", _N_SYMBOLS // 10),
        ("dim_security", "symbol", _N_SYMBOLS // 10),
    ):
        df = spark.read.parquet(f"{wh}/{name}")
        n_entities = df.select(key).distinct().count()
        assert df.count() == n_entities + extra
    cust = spark.read.parquet(f"{wh}/dim_customer")
    assert cust.count() > cust.select("customer_id").distinct().count()
    acct = spark.read.parquet(f"{wh}/dim_account")
    assert acct.select("account_id").distinct().count() > _N_CUST
    # exactly one is_current version per entity
    dup = (
        cust.filter(F.col("is_current"))
        .groupBy("customer_id").count().filter("count > 1").count()
    )
    assert dup == 0


def test_symbol_customer_decorrelated(spark, big_wh):
    """The co-prime stride keeps (customer, symbol) pairs spread: watch
    groups must be ~n_pairs, not collapsed to n_customers."""
    wh, _ = big_wh
    fw = spark.read.parquet(f"{wh}/fact_watches")
    assert fw.count() >= _PAIRS  # >= : security-version multiplication
    tr = spark.read.parquet(f"{wh}/fact_trade")
    n_pairs = tr.select("sk_account_id", "sk_security_id").distinct().count()
    assert n_pairs > _N_CUST  # a customer trades more than one symbol


def test_idempotent_marker(spark, big_wh, tmp_path):
    raw = synthesize_raw(
        spark, tmp_path, n_symbols=5, n_customers=10, n_trades=20,
        dm_days=3, watch_pairs=10,
    )
    again = synthesize_raw(
        spark, tmp_path, n_symbols=5, n_customers=10, n_trades=20,
        dm_days=3, watch_pairs=10,
    )
    assert raw == again


def test_batch2_delta_merge_equals_rebuild(spark, big_wh, tmp_path):
    """synthesize_batch2 coherence: replace-mode merge_refresh of the
    delta into a versioned trades_history equals the from-scratch
    rebuild over combined sources — dag_incremental_equivalence's
    semantics on the volume generator's output."""
    from dbt_tpcdi_spark.tpcdi.bigdata import synthesize_batch2

    wh, srcs = big_wh
    target = tmp_path / "b2"
    raw2 = synthesize_batch2(
        spark, target, n_symbols=_N_SYMBOLS, n_customers=_N_CUST,
        n_trades=_N_TRADES, n_new_trades=200,
    )
    b2 = load_dag_sources(spark, str(raw2))
    assert b2["trade"].count() == _N_TRADES // 10 + 200

    vwh = str(tmp_path / "vwh")
    vr = Runner(spark, srcs, warehouse_dir=vwh, materialize="versioned")
    vr.run(targets=["trades_history"], parallelism=4)
    touched = b2["trade_history"].select("th_t_id").distinct()
    cum_trade = (
        srcs["trade"].join(b2["trade"].select("t_id"), "t_id",
                           "left_anti").unionByName(b2["trade"])
    )
    cum_th = srcs["trade_history"].unionByName(b2["trade_history"])
    vr.merge_refresh(
        "trades_history",
        {
            "brokerage_trade_history": cum_th.join(
                touched, "th_t_id", "left_semi"),
            "brokerage_trade": cum_trade.join(
                touched.withColumnRenamed("th_t_id", "t_id"),
                "t_id", "left_semi"),
        },
        replace=True,
    )
    cum = dict(srcs)
    cum["trade"], cum["trade_history"] = cum_trade, cum_th
    rwh = str(tmp_path / "rwh")
    Runner(spark, cum, warehouse_dir=rwh).run(
        targets=["trades_history"], parallelism=4)
    merged = vr.table("trades_history").read()
    rebuilt = spark.read.parquet(f"{rwh}/trades_history")
    assert merged.exceptAll(rebuilt).isEmpty()
    assert rebuilt.exceptAll(merged).isEmpty()
