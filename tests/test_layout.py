"""Z-order write layout: the clustered write must actually produce
files whose per-file min/max spans are narrow on BOTH interleaved
dimensions — that is the property parquet stat-based skipping prunes
on."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dbt_tpcdi_spark.operators.layout import zorder_repartition
from dbt_tpcdi_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _file_spans(path_glob: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(path_glob):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        lo = min(
            pf.metadata.row_group(i).column(idx).statistics.min
            for i in range(pf.metadata.num_row_groups)
        )
        hi = max(
            pf.metadata.row_group(i).column(idx).statistics.max
            for i in range(pf.metadata.num_row_groups)
        )
        spans.append((lo, hi))
    return spans


def test_zorder_write_narrow_spans(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / "z")
    zorder_repartition(li, "l_partkey", "l_suppkey", 8).write.parquet(out)
    spans = _file_spans(f"{out}/*.parquet", "l_partkey")
    assert len(spans) >= 4  # range partitioner actually split the space
    global_lo = min(lo for lo, _ in spans)
    global_hi = max(hi for _, hi in spans)
    avg_span = sum(hi - lo for lo, hi in spans) / len(spans)
    # each file covers a small slice of the partkey domain: a point
    # lookup on l_partkey overlaps few files (stat-based skipping)
    assert avg_span < (global_hi - global_lo) / 2.5, spans
    # and a given partkey value overlaps at most a couple of files
    probe = (global_lo + global_hi) // 2
    overlapping = sum(1 for lo, hi in spans if lo <= probe <= hi)
    assert overlapping <= max(2, len(spans) // 3), spans


def test_zorder_value_int32_no_overflow(spark):
    # bit 15 of a 32-bit int lands at position 31; without bigint
    # widening the term wraps to Integer.MIN_VALUE
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (0, 40000), (40000, 40000)], "x int, y int"
    )
    rows = (
        df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z"))
        .orderBy("y", "x")
        .collect()
    )
    zs = [r["z"] for r in rows]
    assert all(z >= 0 for z in zs), zs
    assert zs[0] < zs[1] < zs[2], zs


def test_normalized_zorder_prunes_on_both_dims(spark, tmp_path):
    """Mismatched domains (x 12-bit, y 6-bit): raw interleave makes
    every high z-bit an x bit, so a range split never narrows y; the
    normalized grid must yield files narrow in BOTH dims — pruning on
    either column via footer stats."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.layout import (
        zorder_repartition_normalized,
    )
    from dbt_tpcdi_spark.plans.versioned import VersionedTable

    df = spark.range(0, 20_000).select(
        (F.col("id") % 4096).alias("x"), (F.col("id") % 61).alias("y")
    )
    t = VersionedTable(spark, str(tmp_path / "z"))
    t.commit(
        zorder_repartition_normalized(df, "x", "y", num_files=16),
        stats_cols=["x", "y"],
    )
    for col, lo, hi in (("x", 100, 500), ("y", 5, 15)):
        pruned, rep = t.read_where(col, lo=lo, hi=hi)
        assert rep["files_read"] < rep["files_total"], (col, rep)
        expect = t.read().filter(
            (F.col(col) >= lo) & (F.col(col) <= hi)).count()
        assert pruned.count() == expect


def test_conjunctive_pruning_multiplies_on_zorder(spark, tmp_path):
    """read_where_all on a Z-ordered layout: the (x AND y) window
    prunes at least as hard as either single-dim window, and the
    result still equals full-scan + both filters."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.layout import (
        zorder_repartition_normalized,
    )
    from dbt_tpcdi_spark.plans.versioned import VersionedTable

    df = spark.range(0, 20_000).select(
        (F.col("id") % 4096).alias("x"), (F.col("id") % 61).alias("y")
    )
    t = VersionedTable(spark, str(tmp_path / "z"))
    t.commit(
        zorder_repartition_normalized(df, "x", "y", num_files=16),
        stats_cols=["x", "y"],
    )
    both, rb = t.read_where_all({"x": (100, 500), "y": (5, 15)})
    _, rx = t.read_where("x", lo=100, hi=500)
    _, ry = t.read_where("y", lo=5, hi=15)
    assert rb["files_read"] <= min(rx["files_read"], ry["files_read"])
    assert rb["files_read"] < rb["files_total"]
    expect = t.read().filter(
        (F.col("x").between(100, 500)) & (F.col("y").between(5, 15))
    ).count()
    assert both.count() == expect
