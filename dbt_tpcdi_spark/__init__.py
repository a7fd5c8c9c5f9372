"""dbt_tpcdi_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the ``stewartbryson/dbt-tpcdi`` reference (a Snowpark
loader + dbt/Snowflake dynamic-table warehouse), re-expressed as
idiomatic PySpark: declarative DataFrame/SQL plans optimized by
Catalyst, with Pandas-UDF escape hatches only where built-in operators
cannot express the semantics.

Layout
------
- ``session``    SparkSession factory tuned for oracle-comparable output
- ``functions``  scalar expression builders (surrogate keys, decode, phones)
- ``operators``  reusable relational operators (SCD2, temporal join,
                 window idioms, dedup, similarity, text analysis,
                 multimodal column plumbing)
- ``sources``    ingest readers (delimited, FINWIRE fixed-width, XML)
- ``plans``      the TPC-DI model DAG (bronze/silver/gold) + runner
- ``streaming``  incremental refresh (dynamic-table analog) + streaming ops
"""

__version__ = "0.1.0"
