"""JSONL source behavior: declared schema, malformed-line modes, shard
layout. The value round-trip itself is gated by the ``jsonl_scan``
oracle query; these pin the scan semantics the gate relies on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dbt_tpcdi_spark.sources import jsonl as J

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
    ]
)


@pytest.fixture()
def shard_dir(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("line \"quoted\" é\n#"), F.col("id"))
        .alias("text"),
    )
    root = str(tmp_path / "corpus")
    J.write_jsonl(df, root, compression="gzip", shards=3)
    with open(os.path.join(root, "bad.json"), "w") as fh:
        fh.write('{"id": 1, "text": "unterminated\n')
        fh.write("garbage\n")
    return root


def test_dropmalformed_keeps_clean_rows(spark, shard_dir):
    df = J.read_jsonl(spark, shard_dir, SCHEMA)
    assert df.schema == SCHEMA  # declared, not inferred
    rows = df.collect()
    assert len(rows) == 100
    by_id = {r["id"]: r["text"] for r in rows}
    assert by_id[7] == 'line "quoted" é\n#7'  # escaping round-trips


def test_failfast_raises_on_malformed(spark, shard_dir):
    with pytest.raises(Exception):
        J.read_jsonl(spark, shard_dir, SCHEMA, mode="FAILFAST").collect()


def test_permissive_nullfills_malformed(spark, shard_dir):
    df = J.read_jsonl(spark, shard_dir, SCHEMA, mode="PERMISSIVE")
    n_null = df.filter(F.col("id").isNull()).count()
    assert n_null >= 1  # broken lines surface as null-filled rows
    assert df.filter(F.col("id").isNotNull()).count() == 100


def test_gzip_shard_layout(spark, shard_dir):
    gz = [
        f
        for f in os.listdir(shard_dir)
        if f.startswith("part-") and f.endswith(".json.gz")
    ]
    assert len(gz) == 3  # shard count == requested write parallelism
    df = J.read_jsonl(spark, shard_dir, SCHEMA)
    # each gzip shard is one split; +1 for the plain bad.json shard
    assert len(df.inputFiles()) == 4
