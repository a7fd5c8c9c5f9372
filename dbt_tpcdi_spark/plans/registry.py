"""Model registry: name → (layer, deps, sources, builder).

A builder is ``fn(ref, src) -> DataFrame`` where ``ref(name)`` resolves
an upstream model and ``src(name)`` a raw source table — the engine's
analog of dbt's ``{{ ref() }}`` / ``{{ source() }}``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

Ref = Callable[[str], DataFrame]

LAYERS = ("bronze", "silver", "gold", "work")


@dataclass(frozen=True)
class Model:
    name: str
    layer: str
    deps: tuple[str, ...]
    sources: tuple[str, ...]
    build: Callable[[Ref, Ref], DataFrame]
    #: entity key for SCD2-versioned models — enables row-level
    #: incremental refresh (Runner.merge_refresh): build() over delta
    #: sources, then merge_scd2 against the existing table.
    scd2_key: str | None = None


MODELS: dict[str, Model] = {}


def model(
    layer: str,
    deps: tuple[str, ...] = (),
    sources: tuple[str, ...] = (),
    scd2_key: str | None = None,
):
    assert layer in LAYERS, layer

    def wrap(fn: Callable[[Ref, Ref], DataFrame]):
        name = fn.__name__
        assert name not in MODELS, f"duplicate model {name}"
        MODELS[name] = Model(name, layer, tuple(deps), tuple(sources), fn,
                             scd2_key)
        return fn

    return wrap


def all_models() -> dict[str, Model]:
    # imports register the models
    from dbt_tpcdi_spark.plans.models import bronze, gold, silver  # noqa: F401

    return dict(MODELS)
