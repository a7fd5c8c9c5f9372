"""CustomerMgmt.xml ingest (S5-S6): nested XML → flat bronze table.

The reference loads the TPC-DI CustomerMgmt file into a Snowflake
VARIANT column and traverses it with ``xmlget``/``get`` chains
(reference ``tpcdi.py:265-331``). Spark 4 ships a native XML
datasource, so the document lands as a **typed nested StructType** and
"traversal" is plain struct-field access — no runtime VARIANT needed
(SURVEY.md §1.1).

Document shape (one row per ``<TPCDI:Action>``):

    Action @ActionType @ActionTS
    └── Customer @C_ID @C_TAX_ID @C_GNDR @C_TIER @C_DOB
        ├── Name: C_L_NAME, C_F_NAME, C_M_NAME
        ├── Address: C_ADLINE1, C_ADLINE2, C_ZIPCODE, C_CITY, C_STATE_PROV, C_CTRY
        ├── ContactInfo: C_PRIM_EMAIL, C_ALT_EMAIL, C_PHONE_1|2|3{C_CTRY_CODE,...}
        ├── TaxInfo: C_LCL_TX_ID, C_NAT_TX_ID
        └── Account @CA_ID @CA_TAX_ST: CA_B_ID, CA_NAME

Attributes surface as ``_AttrName`` fields (attributePrefix '_').
Output columns mirror the reference's flattened CUSTOMER_MGMT table
(``tpcdi.py:276-328``) so silver models read identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from dbt_tpcdi_spark.functions.scalar import phone_number

ROW_TAG = "TPCDI:Action"


def _s(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.StringType(), True) for n in names]


_PHONE = T.StructType(_s("C_CTRY_CODE", "C_AREA_CODE", "C_LOCAL", "C_EXT"))

#: Explicit document schema: schema inference drops any field absent
#: from the sampled data (a phone with no C_EXT anywhere would make
#: struct access fail), and mangles leading-zero zips/account ids.
#: Every leaf is a string; all casts are explicit in the flattener,
#: exactly like the reference's xmlget(...).cast(...) chains.
XML_SCHEMA = T.StructType([
    T.StructField("_ActionTS", T.StringType(), True),
    T.StructField("_ActionType", T.StringType(), True),
    T.StructField("Customer", T.StructType([
        T.StructField("_C_ID", T.StringType(), True),
        T.StructField("_C_TAX_ID", T.StringType(), True),
        T.StructField("_C_GNDR", T.StringType(), True),
        T.StructField("_C_TIER", T.StringType(), True),
        T.StructField("_C_DOB", T.StringType(), True),
        T.StructField("Name", T.StructType(
            _s("C_L_NAME", "C_F_NAME", "C_M_NAME")), True),
        T.StructField("Address", T.StructType(
            _s("C_ADLINE1", "C_ADLINE2", "C_ZIPCODE", "C_CITY",
               "C_STATE_PROV", "C_CTRY")), True),
        T.StructField("ContactInfo", T.StructType(
            _s("C_PRIM_EMAIL", "C_ALT_EMAIL")
            + [T.StructField(f"C_PHONE_{i}", _PHONE, True) for i in (1, 2, 3)]
        ), True),
        T.StructField("TaxInfo", T.StructType(
            _s("C_LCL_TX_ID", "C_NAT_TX_ID")), True),
        T.StructField("Account", T.StructType([
            T.StructField("_CA_ID", T.StringType(), True),
            T.StructField("_CA_TAX_ST", T.StringType(), True),
            T.StructField("CA_B_ID", T.StringType(), True),
            T.StructField("CA_NAME", T.StringType(), True),
        ]), True),
    ]), True),
])


def _elem(path: str, dtype: str | None = None) -> Column:
    """Element text / attribute access with NULL-safe casting.

    With the native XML schema, a leaf element is already a typed or
    string field; the reference's ``get(xmlget(...), '$').cast(t)``
    collapses to struct access + try_cast (SURVEY §2.8 semi-structured).
    """
    c = F.col(path)
    if dtype is None:
        return c
    return c.cast("string").try_cast(dtype)


def read_customer_mgmt_raw(spark: SparkSession, path: str) -> DataFrame:
    """S5: one row per Action element, nested schema inferred."""
    return (
        spark.read.format("xml")
        .option("rowTag", ROW_TAG)
        .option("attributePrefix", "_")
        .schema(XML_SCHEMA)
        .load(path)
    )


def flatten_customer_mgmt(raw: DataFrame) -> DataFrame:
    """S6: flatten the Action tree to the reference's column set."""
    phone = lambda i: phone_number(  # noqa: E731
        _elem(f"Customer.ContactInfo.C_PHONE_{i}.C_CTRY_CODE"),
        _elem(f"Customer.ContactInfo.C_PHONE_{i}.C_AREA_CODE"),
        _elem(f"Customer.ContactInfo.C_PHONE_{i}.C_LOCAL"),
        _elem(f"Customer.ContactInfo.C_PHONE_{i}.C_EXT"),
    )
    return raw.select(
        _elem("_ActionType").alias("action_type"),
        F.to_timestamp(_elem("_ActionTS"), "yyyy-MM-dd'T'HH:mm:ss").alias("action_ts"),
        _elem("Customer._C_ID", "long").alias("c_id"),
        _elem("Customer._C_TAX_ID").alias("c_tax_id"),
        _elem("Customer._C_GNDR").alias("c_gndr"),
        _elem("Customer._C_TIER", "int").alias("c_tier"),
        _elem("Customer._C_DOB", "date").alias("c_dob"),
        _elem("Customer.Name.C_L_NAME").alias("c_l_name"),
        _elem("Customer.Name.C_F_NAME").alias("c_f_name"),
        _elem("Customer.Name.C_M_NAME").alias("c_m_name"),
        _elem("Customer.Address.C_ADLINE1").alias("c_adline1"),
        _elem("Customer.Address.C_ADLINE2").alias("c_adline2"),
        _elem("Customer.Address.C_ZIPCODE").alias("c_zipcode"),
        _elem("Customer.Address.C_CITY").alias("c_city"),
        _elem("Customer.Address.C_STATE_PROV").alias("c_state_prov"),
        _elem("Customer.Address.C_CTRY").alias("c_ctry"),
        _elem("Customer.ContactInfo.C_PRIM_EMAIL").alias("c_prim_email"),
        _elem("Customer.ContactInfo.C_ALT_EMAIL").alias("c_alt_email"),
        phone(1).alias("c_phone_1"),
        phone(2).alias("c_phone_2"),
        phone(3).alias("c_phone_3"),
        _elem("Customer.TaxInfo.C_LCL_TX_ID").alias("c_lcl_tx_id"),
        _elem("Customer.TaxInfo.C_NAT_TX_ID").alias("c_nat_tx_id"),
        _elem("Customer.Account._CA_ID", "long").alias("ca_id"),
        _elem("Customer.Account._CA_TAX_ST", "int").alias("ca_tax_st"),
        _elem("Customer.Account.CA_B_ID", "long").alias("ca_b_id"),
        _elem("Customer.Account.CA_NAME").alias("ca_name"),
    )


def read_customer_mgmt(spark: SparkSession, path: str) -> DataFrame:
    return flatten_customer_mgmt(read_customer_mgmt_raw(spark, path))
