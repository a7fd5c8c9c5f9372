"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Pandas-UDF decode/feature-extraction over mapInPandas.

The Spark-side architecture is the real deliverable here: binary
columns travel as parquet BYTE_ARRAY with a metadata struct alongside;
decode/resize/frame-sample run as Arrow-batched ``mapInPandas`` so the
expensive Python work is amortized per batch, partition-parallel, and
never widens the shuffle (features are extracted before any join).

The actual image/audio codecs are NOT in this container, so the decode
step is stubbed: ``decode_features(..., codec="fake")`` computes
deterministic features from the raw bytes (length, byte-sum checksum,
derived fake dimensions) and is cross-checked against a SQL oracle;
``codec="pil"``/``"ffmpeg"`` raise NotImplementedError at the exact
seam where the real library call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: checksum modulus for the fake decoder (shared with the SQL oracle)
CHECKSUM_MOD = 997

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, checksum long, "
    "fake_width long, fake_height long"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Pack a column into (payload binary, meta struct) — the canonical
    multimodal layout: payload stays opaque; meta is columnar and
    filterable without touching bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: Arrow record batches of (doc_id, payload, meta); output
    one feature row per input row. This is where a real pipeline calls
    PIL/librosa/ffmpeg per batch.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec={codec!r}: image/audio libraries are not available in "
            "this environment; wire the real decoder here"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % CHECKSUM_MOD)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    # deterministic fake "image dimensions" from size
                    "fake_width": n_bytes % 640 + 1,
                    "fake_height": n_bytes // 640 + 1,
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_features_sql(from_table: str, text_col: str = "text") -> str:
    """DuckDB oracle for the fake codec (ASCII text ⇒ bytes == chars)."""
    return f"""
        SELECT doc_id,
               'application/octet-stream' AS mime,
               cast(octet_length(encode({text_col})) AS bigint) AS n_bytes,
               cast(list_sum(list_transform(range(1, length({text_col}) + 1),
                    i -> ord(substr({text_col}, i, 1)))) % {CHECKSUM_MOD}
                    AS bigint) AS checksum,
               cast(octet_length(encode({text_col})) % 640 + 1 AS bigint)
                   AS fake_width,
               cast(octet_length(encode({text_col})) // 640 + 1 AS bigint)
                   AS fake_height
        FROM {from_table}
    """
