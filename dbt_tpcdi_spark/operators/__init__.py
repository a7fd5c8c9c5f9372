"""Reusable relational operators.

Each module re-expresses one operator family from SURVEY.md §2 as
composition of built-in DataFrame ops (the Catalyst-friendly path);
Pandas-UDF fallbacks exist only where Spark genuinely lacks the
primitive (multimodal decode).
"""
