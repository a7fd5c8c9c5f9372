"""Streaming layer: incremental DAG refresh (the Spark analog of
Snowflake dynamic-table ``target_lag``) and Structured Streaming
operators over append-only sources."""
