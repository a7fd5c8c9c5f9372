"""Bucketed-table co-location: with both join sides bucketed on the
join key (and broadcast disabled so the bucket path is actually
exercised), Catalyst must plan the join with NO shuffle exchange on
the key — the 100 TB strategy SCALE.md §1 prescribes for repeated
fact-dim joins."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dbt_tpcdi_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    # spark.sql.warehouse.dir is a static conf; tables land in
    # ./spark-warehouse (gitignored). Clean stale locations first —
    # a fresh session's catalog does not know about old dirs.
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("orders_b"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("lineitem_b"))
    return spark.table("orders_b"), spark.table("lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o, li = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, "o_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    # both scans read bucketed, and the join key needs no repartition
    assert plan.count("Bucketed: true") == 2, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan


def test_bucketed_join_matches_plain(spark, bucketed):
    o, li = bucketed
    got = sorted(
        map(tuple, li.join(o, "o_orderkey").groupBy("o_orderstatus")
            .agg(F.count("*").alias("n")).collect())
    )
    plain_o = load_table(spark, SF_SMOKE, "orders")
    plain_li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = sorted(
        map(tuple, plain_li.join(plain_o, "o_orderkey")
            .groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect())
    )
    assert got == want
