"""Incremental DAG refresh — the engine's dynamic-table analog.

The reference materializes every model as a Snowflake Dynamic Table
with a declarative ``target_lag`` (reference ``dbt_project.yml:33-47``)
and lets the warehouse decide what is stale. Spark has no managed
incremental-view machinery, so we implement the same *semantics* as
metadata-driven selective recompute:

- every source gets a **fingerprint** (file names + sizes + mtimes);
- every model's fingerprint folds its sources' and upstream models'
  fingerprints (so staleness propagates exactly like
  ``target_lag: downstream``);
- ``refresh()`` rebuilds only models whose fingerprint changed since
  the last materialization, reusing the parquet output of fresh ones.

This keeps the reference's only-ever-exercised behavior (Batch1 full
load, then refresh-on-change; README.md:53-55 defers Batch2/3) while
giving O(changed subtree) incremental cost. True row-level
incrementality (MERGE for late SCD2 rows) is the documented v2 step
(SURVEY.md §7.4) and needs a table format with upserts (Delta/Iceberg,
not in this image).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

from dbt_tpcdi_spark.plans.registry import all_models
from dbt_tpcdi_spark.plans.runner import topo_order
from dbt_tpcdi_spark.plans.sources import DELIMITED_FILES, load_dag_sources


def _file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def source_fingerprints(raw_dir: str) -> dict[str, str]:
    """Fingerprint every raw source present in the directory."""
    out: dict[str, str] = {}
    for name, fname in DELIMITED_FILES.items():
        p = os.path.join(raw_dir, fname)
        if os.path.exists(p):
            out[name] = _file_fingerprint(p)
    finwire = sorted(
        p for p in os.listdir(raw_dir)
        if p.startswith("FINWIRE") and "_audit" not in p
    )
    if finwire:
        fp = "|".join(_file_fingerprint(os.path.join(raw_dir, p)) for p in finwire)
        out["cmp"] = out["sec"] = out["fin"] = fp
    xml = os.path.join(raw_dir, "CustomerMgmt.xml")
    if os.path.exists(xml):
        out["customer_mgmt"] = _file_fingerprint(xml)
    return out


class IncrementalRunner:
    """Selective-recompute runner with persisted freshness state."""

    def __init__(self, spark: SparkSession, raw_dir: str, warehouse_dir: str):
        self.spark = spark
        self.raw_dir = raw_dir
        self.warehouse_dir = warehouse_dir
        self.state_path = os.path.join(warehouse_dir, "_freshness.json")

    def _load_state(self) -> dict[str, str]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                return json.load(f)
        return {}

    def _save_state(self, state: dict[str, str]) -> None:
        os.makedirs(self.warehouse_dir, exist_ok=True)
        with open(self.state_path, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)

    def compute_fingerprints(self) -> dict[str, str]:
        """Current model fingerprints for this raw dir (staleness folds
        through the dep graph)."""
        models = all_models()
        src_fp = source_fingerprints(self.raw_dir)
        fps: dict[str, str] = {}
        for name in topo_order(models):
            m = models[name]
            h = hashlib.md5()
            for s in m.sources:
                h.update(src_fp.get(s, "missing").encode())
            for d in m.deps:
                h.update(fps[d].encode())
            fps[name] = h.hexdigest()
        return fps

    def record_state(self) -> None:
        """Mark the warehouse fresh w.r.t. the current raw files —
        called after a full build done outside this runner, so the next
        refresh() is a no-op instead of a cold rebuild."""
        self._save_state(self.compute_fingerprints())

    def mark_batches_landed(self, batches: list[int]) -> None:
        """Record that this warehouse carries MERGED delta batches
        beyond Batch1. ``refresh()`` then refuses to run: its
        staleness model fingerprints ONE raw dir, so a fingerprint
        miss would rebuild models from the Batch1 feeds alone and
        silently drop the landed batches. Multi-batch warehouses
        advance through ``build --batches`` (or ``Runner.
        merge_refresh`` directly)."""
        state = self.compute_fingerprints()
        state["__batches__"] = ",".join(str(b) for b in batches)
        self._save_state(state)

    def refresh(self) -> dict[str, str]:
        """Bring every model up to date; returns name → 'refreshed' |
        'fresh'."""
        models = all_models()
        prev = self._load_state()
        if "__batches__" in prev:
            raise ValueError(
                f"warehouse {self.warehouse_dir} carries merged delta "
                f"batches ({prev['__batches__']}); single-raw-dir "
                "refresh would rebuild stale models from the Batch1 "
                "feeds alone and drop the merged rows. Land further "
                "deltas with `build --batches ...` instead."
            )
        fps = self.compute_fingerprints()

        sources_loaded: dict[str, DataFrame] | None = None
        built: dict[str, DataFrame] = {}
        status: dict[str, str] = {}
        for name in topo_order(models):
            path = os.path.join(self.warehouse_dir, name)
            # a warehouse built with materialize="versioned" refreshes
            # through commits, never raw overwrites into the table root
            versioned = os.path.isdir(os.path.join(path, "_log"))
            if fps[name] == prev.get(name) and os.path.exists(path):
                built[name] = self._read(path, versioned)
                status[name] = "fresh"
                continue
            if sources_loaded is None:
                sources_loaded = load_dag_sources(self.spark, self.raw_dir)
            df = models[name].build(
                built.__getitem__, sources_loaded.__getitem__
            )
            if versioned:
                from dbt_tpcdi_spark.plans.runner import apply_layout
                from dbt_tpcdi_spark.plans.versioned import VersionedTable

                # honor the model's declared physical layout on every
                # refresh commit (same as Runner._materialize /
                # merge_refresh) — otherwise one incremental refresh
                # would silently strip the fact tables' skipping
                # metadata and every pruned read would degrade to a
                # full scan
                mp = models[name].merge_partition
                layout = models[name].layout
                if mp:
                    # keep the internal partition manifest alive across
                    # full refreshes so merge_refresh's pruned path
                    # stays available (same as Runner._materialize)
                    from pyspark.sql import functions as F

                    from dbt_tpcdi_spark.plans.runner import _key_derived

                    VersionedTable(self.spark, path).partitioned_upsert(
                        df.withColumn(mp[0], F.expr(mp[1])),
                        key=models[name].scd2_key, partition_col=mp[0],
                        internal=True, overwrite=True,
                        check_key_spread=not _key_derived(
                            df, models[name].scd2_key, mp[1]),
                    )
                elif layout:
                    df = apply_layout(df, layout)
                    VersionedTable(self.spark, path).commit(
                        df, op="refresh",
                        partition_by=list(layout.partition_by) or None,
                        stats_cols=list(layout.stats_cols) or None,
                        bloom_cols=list(layout.bloom_cols) or None,
                    )
                else:
                    VersionedTable(self.spark, path).commit(
                        df, op="refresh")
            else:
                df.write.mode("overwrite").parquet(path)
            built[name] = self._read(path, versioned)
            status[name] = "refreshed"
        self._save_state(fps)
        # one run-level manifest per refresh cycle: readers pinning it
        # see all of this cycle's commits or none of them
        if any(
            os.path.isdir(os.path.join(self.warehouse_dir, n, "_log"))
            for n in status
        ):
            from dbt_tpcdi_spark.plans.runner import (
                commit_warehouse_manifest,
            )

            commit_warehouse_manifest(self.spark, self.warehouse_dir)
        return status

    def _read(self, path: str, versioned: bool) -> DataFrame:
        if versioned:
            from dbt_tpcdi_spark.plans.versioned import VersionedTable

            return VersionedTable(self.spark, path).read()
        return self.spark.read.parquet(path)
