"""TPC-DI fixture generation and the DuckDB oracle for the model DAG.

``fixtures`` renders deterministic Batch1-style source data three ways
(raw files for ingest, typed parquet for the pytest oracle, in-memory
rows for the driver-gate VALUES oracles); ``oracle`` holds the per-model
DuckDB SQL twins of the Spark DAG.
"""
