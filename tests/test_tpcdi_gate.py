"""Driver-gate TPC-DI queries vs their self-contained DuckDB oracles —
the same comparison the grading driver performs, plus a drift guard
pinning the normalization specs to the actual Spark output schemas."""

from __future__ import annotations

import duckdb
import pytest

from dbt_tpcdi_spark.queries import all_queries
from dbt_tpcdi_spark.queries import tpcdi_gate as gate
from tests.conftest import assert_matches_oracle

GATE_QUERIES = sorted(gate.NORM_SPECS)


@pytest.fixture(scope="module")
def plain_duck():
    # deliberately NO views: gate oracles must be self-contained
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    yield con
    con.close()


@pytest.mark.parametrize("name", GATE_QUERIES)
def test_gate_query_matches_oracle(spark, plain_duck, name):
    q = all_queries()[name]
    assert q.oracle is not None
    df = q.build(spark, "/root/testdata/sf0.001")  # sf_dir unused
    assert_matches_oracle(df, plain_duck, q.oracle, name)


@pytest.mark.parametrize("name", GATE_QUERIES)
def test_norm_spec_matches_schema(spark, name):
    """After normalization no timestamp/date columns survive, and the
    stringified nullable-int columns exist — i.e. NORM_SPECS matches the
    real model schema, so the oracle's REPLACE list can't drift."""
    df = all_queries()[name].build(spark, "/root/testdata/sf0.001")
    ts, dates, int2str = gate.NORM_SPECS[name]
    by_name = {f.name: f.dataType.typeName() for f in df.schema.fields}
    for c in (*ts, *dates, *int2str):
        assert c in by_name, f"{name}: spec column {c} missing from output"
        assert by_name[c] == "string", f"{name}: {c} not normalized"
    leftover = [c for c, t in by_name.items() if t in ("timestamp", "date")]
    assert not leftover, f"{name}: unnormalized temporal columns {leftover}"


def test_gate_covers_verdict_rows():
    """The round-1 verdict's pytest-only operator rows now have driver
    CORRECTNESS coverage: S2-S6, J3, J5, J9, A2, F-casts."""
    tags = {t for n in GATE_QUERIES for t in all_queries()[n].tags}
    for required in ("S2", "S3", "S4", "S5", "S6", "J3", "J5", "J9", "A2",
                     "F-casts"):
        assert required in tags, required
