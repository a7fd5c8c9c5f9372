"""Write-layout operators: multi-dimensional clustering (Z-order).

Parquet data skipping is one-dimensional: row-group min/max stats prune
scans only on the column the file happens to be sorted by. Z-ordering
interleaves the bits of two (or more) dimensions into one sort key so a
range-partitioned, sorted write keeps EVERY interleaved dimension
locally narrow per file — min/max stats then prune on any of them.
This is the layout trick behind Delta OPTIMIZE ZORDER BY / Iceberg
sort orders, built here from plain integer expressions.

Scale shape: computing the z-value is a pure projection;
``zorder_repartition`` is one range shuffle (sampled range boundaries,
the same mechanism as any global sort) + an in-partition sort — the
identical cost profile to ``df.sort(col)``, but buying skip-ability on
all interleaved dimensions instead of one.

Determinism: bit interleaving is exact integer math, identical in any
engine — the DuckDB twin reproduces it bit-for-bit. For unbounded or
skewed domains, rank-normalize each dimension into [0, 2^bits) first;
the interleave itself assumes non-negative inputs below 2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_value(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    projection — 2·bits shift/mask terms, all inside codegen.

    Inputs are widened to bigint FIRST: on a 32-bit int column,
    ``<< 31`` (bit 15 of y with the default 16 bits) wraps to
    Integer.MIN_VALUE and corrupts the sort key inside the documented
    input domain."""
    xl, yl = x.cast("bigint"), y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_value_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    xl, yl = f"cast({x} AS bigint)", f"cast({y} AS bigint)"
    terms = []
    for i in range(bits):
        terms.append(f"((({xl} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yl} >> {i}) & 1) << {2 * i + 1})")
    return "cast((" + " + ".join(terms) + ") AS bigint)"


def zorder_repartition(
    df: DataFrame, x: str, y: str, num_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-value into
    ``num_files`` output partitions and sort within each — every file
    then covers a narrow hyper-rectangle of (x, y), so parquet min/max
    stats skip on either column. Write with
    ``.write.parquet(...)`` afterwards."""
    z = zorder_value(F.col(x), F.col(y), bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
