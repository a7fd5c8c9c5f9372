"""Newline-delimited JSON (JSONL) corpus source/sink.

JSONL is the interchange format LLM training corpora actually ship in
(one JSON object per line, usually gzip/zstd per shard: The Pile,
RedPajama, Dolma, FineWeb all publish this shape), so an engine that
claims the training-data pipeline surface needs a first-class scan for
it — the analog of the reference's typed delimited scans
(``dbt-tpcdi/tpcdi.py:359-430``) for the corpus side of the house.

Scale rules baked in here (the 100 TB posture):

1. **Schema is DECLARED, never inferred.** ``spark.read.json`` without
   a schema runs a full extra pass over every byte just to infer types
   — at 100 TB that is a second 100 TB scan before the first real job.
   ``read_jsonl`` requires a StructType.
2. **Malformed lines are dropped at the scan** (``DROPMALFORMED``), not
   crashed on (a trillion-line web crawl always has broken lines) and
   not routed through ``_corrupt_record`` (whose column cannot be
   filtered without materializing the parse twice — Spark disallows
   queries over the corrupt column alone).
3. **Compression: prefer splittable or many-shard layouts.** gzip is
   supported (it's what public corpora ship) but a .json.gz file is
   ONE split — parallelism then comes from shard COUNT, which is how
   those corpora are actually published (thousands of ~256 MB shards).
   The writer here defaults to gzip to exercise that path; at scale
   prefer zstd (splittable via frames in recent Hadoop codecs) or no
   codec + parquet conversion on ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip",
                shards: int | None = None) -> None:
    """Write ``df`` as JSONL shards under ``path`` (one JSON object per
    line per row). ``shards`` repartitions first — the shard count IS
    the read parallelism for gzip'd corpora (rule 3 above)."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType,
               mode: str = "DROPMALFORMED") -> DataFrame:
    """Scan JSONL shards with a DECLARED schema (no inference pass).

    ``mode``: DROPMALFORMED (default — skip broken lines),
    FAILFAST (abort on the first broken line), or PERMISSIVE
    (null-fill broken lines). Column pruning still applies: Catalyst
    pushes the required-column set into the JSON parser
    (``spark.sql.optimizer.enableJsonExpressionOptimization``), so a
    2-column projection never materializes the other fields."""
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        # corpora in the wild mix shard layouts; recursive pickup keeps
        # nested shard dirs (snapshot=.../part=...) one logical table
        .option("recursiveFileLookup", "true")
        .json(path)
    )
