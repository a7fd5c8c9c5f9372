"""dbt-style generic data tests over the warehouse.

The reference ships one singular test
(``tests/fact_trade__unique_trade.sql``) and relies on dbt's generic
test machinery for the rest; this module is that machinery re-expressed
as DataFrame builders: the four dbt generics (``unique``, ``not_null``,
``relationships``, ``accepted_values``), each returning a VIOLATIONS
DataFrame (empty == PASS, same contract as dbt), plus a standard suite
over the TPC-DI gold layer.

Scale notes: unique is one map-side-combined count per key;
relationships is a broadcast-or-SMJ left-anti join (Catalyst picks);
not_null/accepted_values are scan-resident filters. Nothing collects
more than the violation count.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Resolve = Callable[[str], DataFrame]


@dataclass(frozen=True)
class Check:
    name: str
    model: str
    #: resolve(model_name) -> DataFrame; returns violations (empty == PASS)
    violations: Callable[[Resolve], DataFrame]


def unique(model: str, cols: list[str]) -> Check:
    def v(resolve: Resolve) -> DataFrame:
        return (
            resolve(model)
            .groupBy(*cols)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )

    return Check(f"{model}__unique_{'_'.join(cols)}", model, v)


def not_null(model: str, cols: list[str]) -> Check:
    def v(resolve: Resolve) -> DataFrame:
        cond = None
        for c in cols:
            p = F.col(c).isNull()
            cond = p if cond is None else cond | p
        return resolve(model).filter(cond).select(*cols)

    return Check(f"{model}__not_null_{'_'.join(cols)}", model, v)


def relationships(model: str, col: str, to_model: str, to_col: str) -> Check:
    def v(resolve: Resolve) -> DataFrame:
        child = resolve(model).select(F.col(col)).filter(F.col(col).isNotNull())
        parent = resolve(to_model).select(F.col(to_col).alias(col))
        return child.join(parent, col, "left_anti")

    return Check(f"{model}__{col}_refs_{to_model}", model, v)


def accepted_values(model: str, col: str, values: list) -> Check:
    def v(resolve: Resolve) -> DataFrame:
        # NULLs pass, as in dbt's generic (NOT IN over NULL filters
        # itself out there too) — nullability is not_null's job
        return (
            resolve(model)
            .select(col)
            .filter(F.col(col).isNotNull() & ~F.col(col).isin(values))
            .distinct()
        )

    return Check(f"{model}__{col}_accepted_values", model, v)


#: The standard warehouse suite. The first entry is the reference's own
#: singular test (tests/fact_trade__unique_trade.sql); the rest encode
#: the dimensional-model invariants dbt projects typically declare in
#: schema.yml (surrogate-key uniqueness, fact→dim referential
#: integrity, enum domains).
STANDARD_CHECKS: tuple[Check, ...] = (
    unique("fact_trade", ["sk_trade_id"]),
    unique("dim_customer", ["sk_customer_id"]),
    unique("dim_account", ["sk_account_id"]),
    not_null("fact_trade", ["sk_trade_id", "sk_account_id"]),
    not_null("dim_customer", ["sk_customer_id", "customer_id"]),
    relationships("fact_trade", "sk_account_id", "dim_account",
                  "sk_account_id"),
    # fact_holdings' trade keys come from dim_trade (current + previous
    # role joins, gold/fact_holdings.sql) — NOT fact_trade, whose grain
    # differs
    relationships("fact_holdings", "sk_current_trade_id", "dim_trade",
                  "sk_trade_id"),
    relationships("fact_holdings", "sk_trade_id", "dim_trade",
                  "sk_trade_id"),
    accepted_values("dim_customer", "status",
                    ["Active", "Inactive"]),
)


def run_checks(
    resolve: Resolve, checks: tuple[Check, ...] = STANDARD_CHECKS
) -> list[tuple[str, int]]:
    """(check_name, violation_count) per check — 0 == PASS."""
    return [(c.name, c.violations(resolve).count()) for c in checks]
