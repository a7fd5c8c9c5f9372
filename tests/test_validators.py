"""Generic data tests (plans/validators.py): the suite passes on a
clean fixture warehouse and catches injected corruption."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpcdi_spark.plans.runner import Runner
from dbt_tpcdi_spark.plans.sources import load_dag_sources
from dbt_tpcdi_spark.plans.validators import (
    STANDARD_CHECKS,
    accepted_values,
    not_null,
    relationships,
    run_checks,
    unique,
)
from dbt_tpcdi_spark.tpcdi.fixtures import generate


def _warehouse(spark, tmp_path):
    root = generate(tmp_path / "v")
    srcs = load_dag_sources(spark, str(root / "raw"))
    wh = str(root / "wh")
    Runner(spark, srcs, warehouse_dir=wh).run(
        ["fact_trade", "dim_customer", "dim_account", "fact_holdings",
         "dim_trade"],
        parallelism=8,
    )
    return wh


def test_standard_suite_passes_clean(spark, tmp_path):
    wh = _warehouse(spark, tmp_path)
    results = run_checks(lambda n: spark.read.parquet(f"{wh}/{n}"))
    assert len(results) == len(STANDARD_CHECKS)
    assert all(n == 0 for _, n in results), results


def test_checks_catch_injected_corruption(spark, tmp_path):
    wh = _warehouse(spark, tmp_path)
    clean = {
        n: spark.read.parquet(f"{wh}/{n}")
        for n in ("fact_trade", "dim_account", "dim_customer")
    }

    # duplicate a fact row -> unique violation
    corrupt = dict(clean)
    corrupt["fact_trade"] = clean["fact_trade"].unionAll(
        clean["fact_trade"].limit(1)
    )
    assert unique("fact_trade", ["sk_trade_id"]).violations(
        corrupt.__getitem__).count() == 1

    # drop a referenced dim row -> relationship violation
    some_sk = clean["fact_trade"].select("sk_account_id").first()[0]
    corrupt = dict(clean)
    corrupt["dim_account"] = clean["dim_account"].filter(
        F.col("sk_account_id") != some_sk
    )
    assert relationships(
        "fact_trade", "sk_account_id", "dim_account", "sk_account_id"
    ).violations(corrupt.__getitem__).count() > 0

    # null out a key -> not_null violation; alien enum -> accepted_values
    corrupt = dict(clean)
    corrupt["dim_customer"] = clean["dim_customer"].withColumn(
        "status", F.lit("Zombie")
    ).withColumn("customer_id", F.lit(None).cast("long"))
    assert not_null("dim_customer", ["sk_customer_id", "customer_id"]) \
        .violations(corrupt.__getitem__).count() > 0
    assert accepted_values("dim_customer", "status",
                           ["Active", "Inactive"]) \
        .violations(corrupt.__getitem__).count() == 1
