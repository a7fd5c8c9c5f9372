"""Date-partitioned fact writes: a date-key filter must prune
partitions at the scan (PartitionFilters), and results must equal the
unpartitioned build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_tpcdi_spark.plans.runner import Runner
from dbt_tpcdi_spark.plans.sources import load_dag_sources
from dbt_tpcdi_spark.tpcdi.fixtures import generate


@pytest.fixture(scope="module")
def part_env(spark, tmp_path_factory):
    root = generate(tmp_path_factory.mktemp("partwh"))
    sources = load_dag_sources(spark, str(root / "raw"))
    plain_wh = str(root / "wh_plain")
    part_wh = str(root / "wh_part")
    Runner(spark, sources, warehouse_dir=plain_wh).run(["fact_trade"])
    Runner(
        spark, sources, warehouse_dir=part_wh,
        partition_spec={"fact_trade": ["sk_create_date"]},
    ).run(["fact_trade"])
    return plain_wh, part_wh


def test_partition_pruning_in_scan(spark, part_env):
    _, part_wh = part_env
    df = spark.read.parquet(f"{part_wh}/fact_trade").filter(
        F.col("sk_create_date") == "2017-05-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(sk_create_date" in plan, plan
    assert df.count() > 0


def test_partitioned_equals_plain(spark, part_env):
    plain_wh, part_wh = part_env
    cols = sorted(spark.read.parquet(f"{plain_wh}/fact_trade").columns)
    plain = sorted(map(tuple, spark.read.parquet(f"{plain_wh}/fact_trade")
                       .select(*cols).collect()))
    part = sorted(map(tuple, spark.read.parquet(f"{part_wh}/fact_trade")
                      .select(*cols).collect()))
    assert plain == part
