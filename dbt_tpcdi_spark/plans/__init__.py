"""The TPC-DI warehouse DAG: model registry + topological runner.

The reference wires 45 dbt models into a dependency DAG materialized
as Snowflake Dynamic Tables (reference ``dbt_project.yml:29-50``,
run log ``README.md:209-312``). Here the registry maps model name →
DataFrame builder, and the runner materializes in topological order —
the v1 batch analog of dynamic-table refresh (SURVEY.md §3.2, §7.4).
"""

from dbt_tpcdi_spark.plans.registry import MODELS, all_models, model
from dbt_tpcdi_spark.plans.runner import Runner

__all__ = ["MODELS", "all_models", "model", "Runner"]
