"""Surrogate-key generation, hash-compatible with dbt_utils 1.1.1.

The reference keys every gold dim with
``dbt_utils.generate_surrogate_key([cols])`` (e.g. reference
``models/gold/dim_broker.sql:2``), which macro-expands to
``md5(coalesce(cast(c1 as varchar), '') || '-' || coalesce(...))``.
We replicate those semantics exactly so keys hash-match across engines
(SURVEY.md §2.8 "Hash/key" row): NULL → '', every value cast to string,
joined with '-', md5 → 32-char lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dbt_utils.generate_surrogate_key default null placeholder + separator.
_NULL_PLACEHOLDER = ""
_SEPARATOR = "-"


def surrogate_key(*cols: Column | str) -> Column:
    """md5-based surrogate key over one or more columns.

    Matches dbt_utils.generate_surrogate_key semantics: each column is
    cast to string, NULLs become '', parts join with '-'.

    Note: ``concat_ws`` skips NULL args (unlike Snowflake ``||`` which
    propagates), so we coalesce *before* concat — this is what makes the
    output byte-identical to the dbt macro.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(_NULL_PLACEHOLDER))
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEPARATOR, *parts))


def surrogate_key_sql(*cols: str) -> str:
    """The same key as ANSI SQL text (for DuckDB oracles / SQL authoring)."""
    parts = [f"coalesce(cast({c} as varchar), '')" for c in cols]
    joiner = f" || '{_SEPARATOR}' || "
    return f"md5({joiner.join(parts)})"
