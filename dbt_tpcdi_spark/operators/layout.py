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


def zorder_repartition_normalized(
    df: DataFrame, x: str, y: str, num_files: int, bits: int = 8
) -> DataFrame:
    """Z-order clustering with per-dimension min/max normalization:
    each dim is scaled onto the same 2^bits grid BEFORE interleaving,
    so both dims contribute equally-significant bits.

    This is load-bearing whenever the raw domains differ in width —
    e.g. partkey (11 bits) × suppkey (7 bits): interleaving the raw
    values makes every high z-bit a partkey bit, the range split then
    cuts only on partkey, and each file stays FULL-WIDTH in suppkey —
    zero files prunable on the second dim (measured: 16/16 files read).
    Normalized, a 1/num_files z-slice fixes the top bits of BOTH grid
    coordinates and per-file ranges narrow in each dim.

    Cost: one 4-number min/max aggregate to the driver (metadata-sized,
    the documented-collect pattern) + the same range shuffle as any
    sorted write. Grid mapping is exact integer arithmetic."""
    lo_x, hi_x, lo_y, hi_y = [
        int(v) for v in df.agg(
            F.min(x), F.max(x), F.min(y), F.max(y)
        ).first()
    ]
    span = (1 << bits) - 1

    def grid(col: str, lo: int, hi: int):
        if hi <= lo:
            return F.lit(0).cast("bigint")
        return F.expr(
            f"((cast({col} AS bigint) - {lo}) * {span}) div {hi - lo}"
        )

    z = zorder_value(grid(x, lo_x, hi_x), grid(y, lo_y, hi_y), bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


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
