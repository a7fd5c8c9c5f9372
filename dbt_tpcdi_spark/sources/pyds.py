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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


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


class FinwireStreamReader(SimpleDataSourceStreamReader):
    """FINWIRE drops as a stream: the offset is an index into the
    glob's SORTED file list, and each micro-batch advances it by AT
    MOST ONE file — so a quarterly drop landing in the watched
    directory becomes exactly one batch, offsets are checkpointable
    dicts, and ``readBetweenOffsets`` replays any committed range
    deterministically (the exactly-once recovery contract). New files
    must sort after processed ones (drop names are period-stamped —
    FINWIRE2017Q1 < FINWIRE2019Q1 — exactly like real feeds); the
    offset also records the LAST-SERVED basename, and every read
    re-checks it against the current glob — a removed file or a new
    file sorting before an unprocessed one turns silent mis-replay
    into a loud error instead of re-serving the wrong lines."""

    def __init__(self, options: dict) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("finwire stream source requires a path")

    def _files(self) -> list[str]:
        return sorted(
            p for p in glob.glob(self._path) if os.path.isfile(p)
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _read_file(self, path: str) -> list[tuple]:
        # materialized, not a generator: the engine's prefetch cache
        # copy.copy()s the returned records for replay
        with open(path, encoding="utf-8") as f:
            return [(line.rstrip("\n"),) for line in f]

    @staticmethod
    def _check_stable(files: list[str], off: dict) -> None:
        """The sorted-glob index is only a valid offset while the
        prefix it was minted against is unchanged: files[index-1]
        must still be the file the offset says was served last."""
        i = off.get("index", 0)
        name = off.get("name")
        if i > 0 and name is not None:
            if i > len(files) or os.path.basename(files[i - 1]) != name:
                have = (os.path.basename(files[i - 1])
                        if i <= len(files) else "<missing>")
                raise RuntimeError(
                    f"finwire stream offset {off} no longer matches the "
                    f"directory: expected files[{i - 1}] = {name!r}, "
                    f"found {have!r} — a file was removed or a new file "
                    f"sorted before an unprocessed one"
                )

    def read(self, start: dict) -> tuple:
        files = self._files()
        self._check_stable(files, start)
        i = start["index"]
        if i >= len(files):
            # no-advance contract: the engine probes this with next()
            # (so: an iterator), while ADVANCING reads are cached and
            # copy.copy()d for replay (so: a list). Hence the split.
            return iter(()), start
        return self._read_file(files[i]), {
            "index": i + 1, "name": os.path.basename(files[i])}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        files = self._files()
        self._check_stable(files, end)
        out: list[tuple] = []
        for i in range(start["index"], end["index"]):
            out.extend(self._read_file(files[i]))
        return out

    def commit(self, end: dict) -> None:
        pass  # files are immutable drops; nothing to release


class FinwireDataSource(DataSource):
    """``spark.read.format("finwire").load(path_or_glob)`` → one
    ``line`` column, partitioned per file; ``spark.readStream`` on the
    same format tails the directory one drop per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "finwire"

    def schema(self) -> str:
        return "line string"

    def reader(self, schema) -> FinwireReader:
        return FinwireReader(self.options)

    def simpleStreamReader(self, schema) -> FinwireStreamReader:
        return FinwireStreamReader(self.options)


_REGISTERED: set[str] = set()


def register_finwire_source(spark: SparkSession) -> None:
    """Idempotent per-SparkContext registration."""
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(FinwireDataSource)
        _REGISTERED.add(app)
