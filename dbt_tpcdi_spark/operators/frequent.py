"""Frequent-items (heavy-hitter) detection with bounded memory.

The naive plan — ``groupBy(token).count()`` over the full stream —
shuffles one row per DISTINCT token. At web-corpus scale the token
vocabulary (URLs, hostnames, n-grams) can exceed executor memory and
the shuffle becomes vocabulary-sized. The classic fix is the
Misra–Gries summary (Misra & Gries 1982; mergeable-batch form per
Agarwal et al., "Mergeable Summaries", PODS 2012): each partition
keeps at most ``k`` counters, and any item whose true partition count
exceeds n_p/(k+1) is guaranteed to survive as a candidate.

Two-pass exact heavy hitters built on it:

1. **Candidates** (this module): one ``mapInPandas`` pass emitting at
   most k tokens per partition — O(k) memory, no shuffle of the
   vocabulary. mapInPandas is the right tool here: the summary is
   per-partition imperative state (counter eviction) that no built-in
   aggregate expresses with bounded memory.
2. **Exact recount** (caller): semi-join the token stream against the
   (tiny, broadcast) candidate set and count ONLY candidates, then
   filter ``count · s > n``. Because candidates are a guaranteed
   superset of every token with count > n/s (for k ≥ s), the final
   answer is EXACT and independent of summary internals — which is
   what lets a DuckDB oracle verify it with a plain GROUP BY.

Guarantee chain: a token with global count > n/s has, in at least one
partition (pigeonhole over the partition sums), count_p > n_p/s ≥
n_p/(k+1) when k ≥ s — so it survives that partition's summary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["mg_candidates", "mg_reduce", "mg_summary"]


def mg_reduce(counts: dict[str, int], k: int) -> dict[str, int]:
    """One Misra–Gries eviction: subtract the (k+1)-th largest counter
    value from every counter and drop the non-positive, leaving at most
    k survivors. Each eviction removes ≥ (k+1)·d total weight while
    undercounting any single item by ≤ d, which telescopes to the
    n_p/(k+1) error bound."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values(), reverse=True)
    d = vals[k]  # (k+1)-th largest
    return {t: c - d for t, c in counts.items() if c > d}


def mg_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summary in ONE pass over the token
    stream: ≤ k candidate rows per partition PLUS one sentinel row
    (``col`` NULL) carrying the partition's row count — so the caller
    gets candidates AND the corpus total from a single corpus scan
    instead of two (at 100 TB, one fewer full scan is the whole win).

    Input: a DataFrame with a string column ``col`` (one row per token
    OCCURRENCE). Candidates are a superset of every token whose
    partition count exceeds n_p/(k+1).

    Arrow batches are pre-reduced with ``value_counts`` (vectorized)
    before touching the Python dict, so per-row Python cost is
    amortized over batch-level dedup."""
    in_field = df.select(col).schema.fields[0]
    schema = StructType(
        [in_field, StructField("__part_n", LongType(), True)]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for tok, c in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            counts = mg_reduce(counts, k)
        yield pd.DataFrame(
            {col: list(counts) + [None], "__part_n": [None] * len(counts) + [n_p]}
        )

    return df.select(col).mapInPandas(summarize, schema)


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Candidate values only (see ``mg_summary``): ≤ k rows per
    partition, a superset of every token with partition count >
    n_p/(k+1)."""
    return (
        mg_summary(df, col, k)
        .filter(F.col(col).isNotNull())
        .select(col)
    )
