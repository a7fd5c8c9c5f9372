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


FRAME_SIZE = 256

FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_bytes long, frame_checksum long"
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over binary payloads: one output row per
    FRAME_SIZE-byte chunk — the 1-to-N mapInPandas shape a video/audio
    pipeline uses (decode once per batch, emit per-frame features).
    Stubbed decode: chunks of the raw bytes with deterministic
    checksums; the Spark-side batch fan-out plumbing is real."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k in range(0, max(len(payload), 1), FRAME_SIZE):
                    chunk = payload[k : k + FRAME_SIZE]
                    ids.append(doc_id)
                    idxs.append(k // FRAME_SIZE)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk) % CHECKSUM_MOD)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_checksum": sums,
                }
            )

    return df.mapInPandas(extract, schema=FRAME_SCHEMA)


def sample_frames_sql(from_table: str, text_col: str = "text") -> str:
    """DuckDB oracle: correlated range (lateral) reproduces the chunking
    over ASCII text (bytes == chars)."""
    return f"""
        SELECT doc_id, t.k AS frame_idx,
               cast(least({FRAME_SIZE},
                          octet_length(encode({text_col})) - t.k * {FRAME_SIZE})
                    AS bigint) AS frame_bytes,
               cast(list_sum(list_transform(
                    range(1, cast(least({FRAME_SIZE},
                          octet_length(encode({text_col})) - t.k * {FRAME_SIZE})
                          AS bigint) + 1),
                    i -> ord(substr({text_col}, t.k * {FRAME_SIZE} + i, 1))))
                    % {CHECKSUM_MOD} AS bigint) AS frame_checksum
        FROM {from_table} d, range(0, 4096) t(k)
        WHERE t.k * {FRAME_SIZE} < octet_length(encode({text_col}))
           OR (t.k = 0 AND octet_length(encode({text_col})) = 0)
    """


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
