"""Skew mitigation: deterministic salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only helps sort-merge joins on shuffle boundaries. For
the pathological case — a broadcast-ineligible dim joined on a key
where a handful of values dominate the fact — salting is the classic
manual fix: replicate each dim row N ways, scatter fact rows across
the replicas, join on (key, salt).

The salt must be **deterministic** (this engine hash-checks results
across runs and engines): we derive it from a uniquely-identifying
fact column via a positive modular hash, never from rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    salt_from: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key shuffle spread across ``n_salts`` buckets.

    ``salt_from``: a fact column (ideally unique, e.g. the fact's id)
    whose hash scatters rows; dim rows are exploded ``n_salts``× via a
    sequence — dim-side blowup is n_salts·|dim|, which is the price of
    de-skewing and why this is for small-but-not-broadcastable dims.

    Result equals the plain join exactly (salt columns are internal).
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt_col = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts)))
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    joined = f.join(d, [*keys, "__salt"], how)
    return joined.drop("__salt")
