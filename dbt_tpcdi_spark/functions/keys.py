"""Surrogate-key generation, hash-compatible with dbt_utils 1.1.1.

The reference keys every gold dim with
``dbt_utils.generate_surrogate_key([cols])`` (e.g. reference
``models/gold/dim_broker.sql:2``), which macro-expands to
``md5(coalesce(cast(c1 as varchar), '_dbt_utils_surrogate_key_null_')
|| '-' || coalesce(...))``.
We replicate those semantics exactly so keys hash-match across engines
(SURVEY.md §2.8 "Hash/key" row): NULL → the dbt_utils 1.x default
placeholder ``_dbt_utils_surrogate_key_null_`` (the reference's
dbt_project.yml does NOT set
``surrogate_key_treat_nulls_as_empty_strings``), every value cast to
string, joined with '-', md5 → 32-char lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dbt_utils.generate_surrogate_key default null placeholder + separator
# (dbt_utils 1.1.1 generate_surrogate_key.sql default branch).
_NULL_PLACEHOLDER = "_dbt_utils_surrogate_key_null_"
_SEPARATOR = "-"


def surrogate_key(*cols: Column | str) -> Column:
    """md5-based surrogate key over one or more columns.

    Matches dbt_utils.generate_surrogate_key semantics: each column is
    cast to string, NULLs become '_dbt_utils_surrogate_key_null_'
    (the 1.x default — all reference key inputs are non-null in
    practice, but NULL inputs now hash identically to a
    reference-built warehouse too), parts join with '-'.

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
    parts = [
        f"coalesce(cast({c} as varchar), '{_NULL_PLACEHOLDER}')" for c in cols
    ]
    joiner = f" || '{_SEPARATOR}' || "
    return f"md5({joiner.join(parts)})"


def surrogate_key_spark_sql(*cols: str) -> str:
    """The same key as SPARK SQL text — the SQL-authoring surface for
    models written as SQL strings (reference parity: the reference
    authors every model as SQL; dialect note: Spark casts to
    ``string`` where DuckDB needs ``varchar``, both render identical
    md5 hex for the same parts). ``concat_ws`` is NULL-skipping, so
    parts coalesce first — same note as the Column builder."""
    parts = [
        f"coalesce(cast({c} as string), '{_NULL_PLACEHOLDER}')"
        for c in cols
    ]
    return f"md5(concat_ws('{_SEPARATOR}', {', '.join(parts)}))"
