"""Scalar expression builders (all return Column — zero server-side UDFs).

The reference's only "functions" are client-side expression builders
(``get_xml_element`` / ``get_xml_attribute`` / ``get_phone_number``,
reference ``tpcdi.py:148-186``) and the dbt_utils ``generate_surrogate_key``
macro. We keep the same design: plain Python helpers that compose
built-in Spark functions, so every expression stays inside Catalyst
codegen (SURVEY.md §2.10).
"""

from dbt_tpcdi_spark.functions.keys import surrogate_key
from dbt_tpcdi_spark.functions.scalar import decode, phone_number

__all__ = ["surrogate_key", "decode", "phone_number"]
