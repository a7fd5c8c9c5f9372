"""FINWIRE ingest: multi-record-type fixed-width files (S2-S4).

One FINWIRE file family holds three record types (CMP/SEC/FIN)
discriminated by bytes 16-18, with a shared 15-byte PTS prefix
(reference ``tpcdi.py:434-535``; golden sample
``devrel/multi-record.txt``). The Spark shape:

    spark.read.text(path)            # one 'value' column per line (S2)
      → shared prefix parse          # pts, rec_type (S4)
      → 3 filtered fan-out branches  # substring slicing per layout (S3)

Each (pos,len) below is the 1-based substring window from the
reference loader: CMP ``tpcdi.py:458-489``, SEC ``:492-509``,
FIN ``:512-535``.

Divergence from the reference, on purpose (SURVEY.md §7.5 hazard 1):
fixed-width extracts are **rtrim'd and blank→NULL normalized at
ingest**. The reference keeps trailing pad spaces and relies on
Snowflake joins to still match; in Spark a padded ``symbol`` would
silently miss every join to the unpadded CSV symbols.

Scale: ``spark.read.text`` is splittable by line; the three branches
share one scan when the caller persists the prefix-parsed frame (the
reference materializes a temp table for the same reason,
``tpcdi.py:454``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Field:
    name: str
    pos: int  # 1-based
    length: int
    dtype: str = "string"  # string | date | int | long | double


# reference tpcdi.py:458-489
CMP_LAYOUT = [
    Field("company_name", 19, 60),
    Field("cik", 79, 10, "long"),
    Field("status", 89, 4),
    Field("industry_id", 93, 2),
    Field("sp_rating", 95, 4),
    Field("founding_date", 99, 8, "date"),
    Field("address_line1", 107, 80),
    Field("address_line2", 187, 80),
    Field("postal_code", 267, 12),
    Field("city", 279, 25),
    Field("state_province", 304, 20),
    Field("country", 324, 24),
    Field("ceo_name", 348, 46),
    Field("description", 394, 150),
]

# reference tpcdi.py:492-509 — loader keeps SEC values as strings; the
# bronze model (finwire_security.sql:1-18) does to_number/to_date + the
# CIK-vs-company-name disambiguation.
SEC_LAYOUT = [
    Field("symbol", 19, 15),
    Field("issue_type", 34, 6),
    Field("status", 40, 4),
    Field("name", 44, 70),
    Field("ex_id", 114, 6),
    Field("sh_out", 120, 13),
    Field("first_trade_date", 133, 8),
    Field("first_exchange_date", 141, 8),
    Field("dividend", 149, 12),
    Field("co_name_or_cik", 161, 60),
]

# reference tpcdi.py:512-535 — strings at loader level, see SEC note.
FIN_LAYOUT = [
    Field("year", 19, 4),
    Field("quarter", 23, 1),
    Field("quarter_start_date", 24, 8),
    Field("posting_date", 32, 8),
    Field("revenue", 40, 17),
    Field("earnings", 57, 17),
    Field("eps", 74, 12),
    Field("diluted_eps", 86, 12),
    Field("margin", 98, 12),
    Field("inventory", 110, 17),
    Field("assets", 127, 17),
    Field("liabilities", 144, 17),
    Field("sh_out", 161, 13),
    Field("diluted_sh_out", 174, 13),
    Field("co_name_or_cik", 187, 60),
]

LAYOUTS = {"CMP": CMP_LAYOUT, "SEC": SEC_LAYOUT, "FIN": FIN_LAYOUT}


def _extract(field: Field) -> Column:
    raw = F.trim(F.substring(F.col("line"), field.pos, field.length))
    val = F.when(raw == "", F.lit(None)).otherwise(raw)
    if field.dtype == "date":
        return F.try_to_timestamp(val, F.lit("yyyyMMdd")).cast("date").alias(field.name)
    if field.dtype in ("int", "long", "double"):
        # try_cast, not cast: reference uses try_to_number (tpcdi.py:469-477)
        # and Spark 4 runs ANSI mode where a plain cast on junk throws.
        return val.try_cast(field.dtype).alias(field.name)
    return val.alias(field.name)


def prefix_parse(lines: DataFrame) -> DataFrame:
    """S4: shared 18-byte prefix parse over a one-column ``line`` frame.

    Adds pts (timestamp) and rec_type ('CMP'|'SEC'|'FIN'). Split out of
    the file reader so in-memory line sets (driver-gate fixtures, unit
    tests) run the identical parsing plan as ``spark.read.text``.
    """
    return lines.withColumn(
        "pts",
        F.to_timestamp(F.substring(F.col("line"), 1, 15), "yyyyMMdd-HHmmss"),
    ).withColumn("rec_type", F.substring(F.col("line"), 16, 3))


def read_finwire_raw(spark: SparkSession, path: str) -> DataFrame:
    """S2+S4: whole-line scan + shared prefix parse.

    Returns columns: line, pts (timestamp), rec_type ('CMP'|'SEC'|'FIN').
    Callers fanning out to all three types should ``.persist()`` this
    (one scan, three consumers — the reference's temp-table trick).
    """
    return prefix_parse(spark.read.text(path).withColumnRenamed("value", "line"))


def parse_finwire(raw: DataFrame, rec_type: str) -> DataFrame:
    """S3: slice one record type out of the prefix-parsed frame."""
    layout = LAYOUTS[rec_type]
    return (
        raw.filter(F.col("rec_type") == rec_type)
        .select("pts", *[_extract(f) for f in layout])
    )


def read_finwire(
    spark: SparkSession, path: str, persist: bool = True
) -> dict[str, DataFrame]:
    """One scan → {'CMP': df, 'SEC': df, 'FIN': df}."""
    raw = read_finwire_raw(spark, path)
    if persist:
        raw = raw.persist()
    return {rt: parse_finwire(raw, rt) for rt in LAYOUTS}
