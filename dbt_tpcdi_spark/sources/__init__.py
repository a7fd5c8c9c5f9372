"""Ingest readers: delimited text, FINWIRE fixed-width, XML, parquet."""
