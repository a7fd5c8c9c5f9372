"""Custom source extensibility seam: the FINWIRE fixed-width drop as a
registered Spark 4 Python DataSource (``pyspark.sql.datasource``).

The engine's default FINWIRE path is ``spark.read.text`` + the shared
prefix parse (``sources/finwire.py`` — JVM-native scan, the fast path);
this module demonstrates the OTHER half of the source contract: when a
format has no built-in reader at all (proprietary ticker feeds, archive
containers, anything with record structure the line reader can't see),
the Python DataSource API gives it a first-class ``spark.read.format``
surface with planner-visible partitioning. Reference parity:
``tpcdi.py:434-535`` consumes the same FINWIRE drop via Snowpark file
upload; here the format itself becomes a source.

Scale posture: ``partitions()`` returns one ``InputPartition`` per file
(a real quarterly FINWIRE drop is many files), so read parallelism =
file count and each task streams its file line-by-line — no whole-file
materialization. The Python-side cost is the documented trade of this
seam; everything downstream (prefix parse, demux, bronze casts) is the
identical JVM plan the default path uses.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FinwireFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class FinwireReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("finwire source requires a path")

    def partitions(self) -> list[InputPartition]:
        # planner-visible split: one task per file of the drop
        matches = sorted(glob.glob(self._path))
        if not matches:
            raise FileNotFoundError(self._path)
        files: list[str] = []
        for m in matches:
            if os.path.isdir(m):
                files.extend(
                    sorted(
                        p for p in glob.glob(os.path.join(m, "*"))
                        if os.path.isfile(p)
                    )
                )
            else:
                files.append(m)
        return [_FinwireFilePartition(p) for p in files]

    def read(self, partition: _FinwireFilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                yield (line.rstrip("\n"),)


class FinwireDataSource(DataSource):
    """``spark.read.format("finwire").load(path_or_glob)`` → one
    ``line`` column, partitioned per file."""

    @classmethod
    def name(cls) -> str:
        return "finwire"

    def schema(self) -> str:
        return "line string"

    def reader(self, schema) -> FinwireReader:
        return FinwireReader(self.options)


_REGISTERED: set[str] = set()


def register_finwire_source(spark: SparkSession) -> None:
    """Idempotent per-SparkContext registration."""
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(FinwireDataSource)
        _REGISTERED.add(app)
