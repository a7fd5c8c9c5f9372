"""Ingest cross-checks: every Spark source reader must reproduce the
independently-rendered logical tables byte-for-byte (offsets, casts,
delimiters, XML flattening, phone concat NULL semantics)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from dbt_tpcdi_spark.sources.delimited import SCHEMAS, read_delimited
from dbt_tpcdi_spark.sources.finwire import read_finwire
from dbt_tpcdi_spark.sources.xml import read_customer_mgmt
from tests.conftest import SF_CORRECT, SF_SMOKE, normalize
from dbt_tpcdi_spark.tpcdi.fixtures import generate

RAW_FILES = {
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
}


@pytest.fixture(scope="session")
def tpcdi_dir(tmp_path_factory):
    return generate(tmp_path_factory.mktemp("tpcdi"))


def _assert_same(spark_df, logical_path, name):
    got = normalize(spark_df.toPandas())
    want = normalize(pq.read_table(logical_path).to_pandas())
    assert sorted(got.columns) == sorted(want.columns), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.parametrize("source", sorted(RAW_FILES))
def test_delimited_source(source, spark, tpcdi_dir):
    df = read_delimited(spark, str(tpcdi_dir / "raw" / RAW_FILES[source]), source)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in SCHEMAS[source].fields
    ]
    _assert_same(df, tpcdi_dir / "logical" / f"{source}.parquet", source)


@pytest.mark.parametrize("rec_type", ["cmp", "sec", "fin"])
def test_finwire_source(rec_type, spark, tpcdi_dir):
    parsed = read_finwire(spark, str(tpcdi_dir / "raw" / "FINWIRE2017Q1"),
                          persist=False)
    _assert_same(parsed[rec_type.upper()],
                 tpcdi_dir / "logical" / f"{rec_type}.parquet", rec_type)


def test_customer_mgmt_xml(spark, tpcdi_dir):
    df = read_customer_mgmt(spark, str(tpcdi_dir / "raw" / "CustomerMgmt.xml"))
    _assert_same(df, tpcdi_dir / "logical" / "customer_mgmt.parquet",
                 "customer_mgmt")


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_events_event_id_unique_fixture_guard(spark, sf_dir):
    # streaming_dedup's oracle is the RAW events table, which is only
    # the right answer because event_id is unique in the fixture (its
    # only duplicates are the query's own simulated redelivery). A
    # regenerated fixture with duplicate event_ids would silently flip
    # the query's meaning vs the oracle — assert the assumption.
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    counts = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("d"),
    ).collect()[0]
    assert counts["n"] == counts["d"], (
        f"{sf_dir}: events.event_id no longer unique "
        f"({counts['n']} rows, {counts['d']} distinct) — "
        "streaming_dedup's oracle assumption is broken"
    )


def test_documents_within_oracle_chunk_bound(spark):
    # the passage-chunking oracles enumerate chunk indexes up to
    # _PASSAGE_MAX_CHUNKS; a fixture doc near that bound would chunk
    # fully in Spark but truncate in DuckDB — pin plenty of headroom
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.text import token_count
    from dbt_tpcdi_spark.queries.llm import (
        _PASSAGE_CHUNK,
        _PASSAGE_MAX_CHUNKS,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    max_tokens = d.agg(
        F.max(token_count(F.col("text")))
    ).first()[0]
    assert max_tokens * 10 < _PASSAGE_MAX_CHUNKS * _PASSAGE_CHUNK, max_tokens


def test_spread_is_metadata_only_for_file_scans(spark):
    """spread() must decide from file metadata (no DataFrame→RDD
    conversion, which costs ~1 s/lineage) and still fix local scan
    under-parallelism; non-file plans take the RDD fallback."""
    from dbt_tpcdi_spark.sources.parquet import (
        _size_conf,
        load_table,
        spread,
    )
    from tests.conftest import SF_SMOKE

    target = spark.sparkContext.defaultParallelism
    d = load_table(spark, SF_SMOKE, "documents")
    s = spread(d)
    assert s.rdd.getNumPartitions() >= min(target, 2)
    assert s.count() == d.count()
    # already-parallel input is a no-op (same object, no exchange)
    wide = d.repartition(target)
    assert spread(wide) is wide
    # non-file plan falls back without raising
    rng = spark.range(2)
    assert spread(rng).rdd.getNumPartitions() >= min(target, 2)
    # conf parsing covers Spark's byte-size spellings
    spark.conf.set("spark.x.test.size", "128m")
    assert _size_conf(spark, "spark.x.test.size", 0) == 128 * 1024**2
    spark.conf.set("spark.x.test.size", "134217728b")
    assert _size_conf(spark, "spark.x.test.size", 0) == 134217728
    spark.conf.set("spark.x.test.size", "1g")
    assert _size_conf(spark, "spark.x.test.size", 0) == 1024**3
    assert _size_conf(spark, "spark.x.test.absent", 7) == 7
    spark.conf.unset("spark.x.test.size")


def test_finwire_stream_reader_offsets_and_replay(tmp_path):
    """One drop per read() call, stable no-advance tail, and
    readBetweenOffsets replays any committed range byte-identically
    (the exactly-once recovery contract)."""
    from dbt_tpcdi_spark.sources.pyds import FinwireStreamReader

    for i, body in enumerate(("a1\na2\n", "b1\n", "c1\nc2\nc3\n")):
        (tmp_path / f"FINWIRE200{i}Q1").write_text(body)
    r = FinwireStreamReader({"path": str(tmp_path / "FINWIRE*")})
    off = r.initialOffset()
    assert off == {"index": 0}
    seen = []
    for expected in (2, 1, 3):
        rows, off2 = r.read(off)
        rows = list(rows)
        assert len(rows) == expected
        assert off2["index"] == off["index"] + 1
        seen.extend(rows)
        off = off2
    rows, off3 = r.read(off)
    assert list(rows) == [] and off3 == off  # no-advance tail
    # deterministic replay of the full committed range
    assert list(r.readBetweenOffsets({"index": 0}, {"index": 3})) == seen
    # ...and of a partial range (restart mid-stream)
    assert list(r.readBetweenOffsets({"index": 1}, {"index": 2})) == [("b1",)]


def test_finwire_stream_reader_detects_glob_instability(tmp_path):
    """ADVICE r12: offsets are indices into the sorted glob, so the
    reader stamps the last-served basename into each offset and RAISES
    if the file at index-1 no longer matches — a removed file or a new
    file sorting before an unprocessed one must be a loud error, never
    a silent mis-replay of the wrong lines."""
    import pytest

    from dbt_tpcdi_spark.sources.pyds import FinwireStreamReader

    for i, body in enumerate(("a1\n", "b1\n", "c1\n")):
        (tmp_path / f"FINWIRE200{i}Q1").write_text(body)
    r = FinwireStreamReader({"path": str(tmp_path / "FINWIRE*")})
    rows, off1 = r.read(r.initialOffset())
    assert list(rows) == [("a1",)]
    assert off1 == {"index": 1, "name": "FINWIRE2000Q1"}

    # a new file that sorts BEFORE the committed prefix shifts every
    # index — the next read must refuse rather than re-serve
    (tmp_path / "FINWIRE1999Q4").write_text("z1\n")
    with pytest.raises(RuntimeError, match="no longer matches"):
        r.read(off1)
    with pytest.raises(RuntimeError, match="no longer matches"):
        r.readBetweenOffsets({"index": 0}, off1)
    (tmp_path / "FINWIRE1999Q4").unlink()

    # files appended AFTER the committed prefix keep working
    (tmp_path / "FINWIRE2003Q1").write_text("d1\n")
    rows, off2 = r.read(off1)
    assert list(rows) == [("b1",)]
    assert off2 == {"index": 2, "name": "FINWIRE2001Q1"}

    # removing the just-served file is equally loud
    (tmp_path / "FINWIRE2001Q1").unlink()
    with pytest.raises(RuntimeError, match="no longer matches"):
        r.read(off2)
