"""Run-level warehouse snapshot manifest (VERDICT r9 item 4): a reader
pinned at manifest N sees a consistent cross-table view at EVERY point
while a refresh lands table-by-table — the deterministic interleaving
twin of the dag_warehouse_manifest gate."""

from __future__ import annotations

import pytest

from dbt_tpcdi_spark.plans.runner import (
    MANIFEST_TABLE,
    Runner,
    commit_warehouse_manifest,
    read_warehouse,
)
from dbt_tpcdi_spark.plans.versioned import VersionedTable


@pytest.fixture(scope="module")
def vwh(spark, tmp_path_factory):
    from dbt_tpcdi_spark.plans.sources import load_dag_sources
    from dbt_tpcdi_spark.tpcdi.fixtures import generate

    root = generate(tmp_path_factory.mktemp("mwh"))
    b1 = load_dag_sources(spark, str(root / "raw"))
    wh = str(root / "wh")
    r = Runner(spark, b1, warehouse_dir=wh, materialize="versioned")
    built = r.run(targets=["fact_trade"], parallelism=8)
    return wh, r, sorted(built)


def _dangling(view):
    return (
        view["fact_trade"]
        .join(view["dim_trade"].select("sk_trade_id"),
              "sk_trade_id", "left_anti")
        .count()
    )


def test_run_commits_manifest(spark, vwh):
    wh, r, cone = vwh
    mt = VersionedTable(spark, f"{wh}/{MANIFEST_TABLE}")
    assert mt.latest_version() == 0
    rows = {r0["model"]: r0["version"] for r0 in mt.read(0).collect()}
    assert set(rows) == set(cone)
    assert all(v == 0 for v in rows.values())


def test_pinned_reader_never_tears(spark, vwh):
    """Land a multi-table refresh ONE COMMIT AT A TIME; between every
    commit the manifest-pinned reader must stay referentially closed,
    while the unpinned latest-latest mix must tear at some point."""
    from pyspark.sql import functions as F

    wh, r, cone = vwh
    # the 'refresh': shift every trade's surrogate keys by rewriting
    # dim_trade and fact_trade with bumped trade ids (stand-in for a
    # batch that changes the sk population)
    dt_new = r.table("dim_trade").read().withColumn(
        "sk_trade_id", F.concat(F.col("sk_trade_id"), F.lit("_v2")))
    ft_new = r.table("fact_trade").read().withColumn(
        "sk_trade_id", F.concat(F.col("sk_trade_id"), F.lit("_v2")))

    pin = VersionedTable(
        spark, f"{wh}/{MANIFEST_TABLE}").latest_version()
    torn_seen = False
    # commit fact_trade FIRST (the adversarial order: the fact now
    # references dim rows that do not exist yet at latest)
    for name, df in (("fact_trade", ft_new), ("dim_trade", dt_new)):
        r.table(name).commit(df)
        pinned = read_warehouse(spark, wh, pin)
        assert _dangling(pinned) == 0  # pinned reader: never torn
        latest = {
            "fact_trade": r.table("fact_trade").read(),
            "dim_trade": r.table("dim_trade").read(),
        }
        if _dangling(latest) > 0:
            torn_seen = True
    assert torn_seen  # the hazard is real without pinning
    # refresh complete: new manifest restores a consistent latest
    m2 = commit_warehouse_manifest(spark, wh)
    assert _dangling(read_warehouse(spark, wh, m2)) == 0


def test_read_warehouse_defaults_to_latest_manifest(spark, vwh):
    wh, r, cone = vwh
    view = read_warehouse(spark, wh)
    assert set(view) == set(cone)
