"""Synthetic bench inputs beyond the driver testdata.

Two generators, both fully distributed (``spark.range`` + column
expressions — no driver-side row lists, no Python UDFs) and
deterministic (hash-derived, no RNG state):

- ``realistic_corpus``: a document table whose token distribution
  models text AFTER shingling — near-uniform draws from a huge space
  (real dedup pipelines hash 5-gram shingles, whose distribution is
  close to uniform even though raw words are Zipf). The driver's
  ``documents`` table is the adversarial opposite (31-word vocabulary,
  every doc overlaps every doc, ~3M true near-dup pairs at sf0.1);
  this corpus shows the *designed* asymptotics instead — candidate
  pairs ≪ n² because band buckets stay small.
- ``replicate_sf``: writes a key-shifted N× copy of the driver
  testdata, giving bench a second scale point (~sf1 from sf0.1)
  that can catch AQE switch-point regressions (broadcast→SMJ
  demotions) that a single small scale can't see. Fact keys
  (orderkey/custkey/user/vec ids) shift per replica so cardinalities
  really grow; dimension tables and their foreign keys stay fixed so
  join fan-out per row is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_tpcdi_spark.sources.parquet import load_table, table_path

#: larger than any key in the driver testdata at any sf
KEY_SHIFT = 1_000_000_000


def realistic_corpus(
    spark: SparkSession,
    n_docs: int = 20_000,
    doc_len: int = 60,
    vocab: int = 200_000,
    dup_frac: float = 0.05,
) -> DataFrame:
    """(doc_id, text): open-vocabulary corpus (uniform draws from a
    ``vocab``-sized shingle space) with a planted ``dup_frac`` of
    near-duplicates.

    Tokens derive from ``xxhash64(doc, position)``, so generation is a
    pure projection. The last ``dup_frac`` of docs copy an earlier doc
    with one token substituted — true near-dups a minhash pipeline
    must find.
    """
    base_n = int(n_docs * (1.0 - dup_frac))
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    src = F.when(
        F.col("doc_id") >= base_n, F.col("doc_id") - base_n
    ).otherwise(F.col("doc_id"))

    def token(j):
        rank = F.pmod(
            F.xxhash64(src * doc_len + j, F.lit("tok")), F.lit(vocab)
        )
        return F.concat(F.lit("w"), rank.cast("string"))

    words = F.transform(F.sequence(F.lit(0), F.lit(doc_len - 1)), token)
    # near-dup docs: substitute one position with a doc-unique token
    perturb_at = F.pmod(F.col("doc_id"), F.lit(doc_len)).cast("int")
    words = F.when(
        F.col("doc_id") >= base_n,
        F.transform(
            words,
            lambda w, i: F.when(
                i == perturb_at,
                F.concat(F.lit("x"), F.col("doc_id").cast("string")),
            ).otherwise(w),
        ),
    ).otherwise(words)
    return docs.select("doc_id", F.array_join(words, " ").alias("text"))


def clustered_embeddings(
    spark: SparkSession,
    n: int = 20_000,
    dim: int = 64,
    k: int = 10,
    noise_milli: int = 60,
) -> DataFrame:
    """(vec_id, embedding array<float>, label int): ``k`` well-
    separated hash-derived cluster centers with ±``noise_milli``/1000
    per-component noise — the PLANTED neighbor structure the driver's
    uniform-random embeddings lack (there, label carries no metric
    signal and any ANN method's recall is ~1/k by construction).
    Deterministic pure projection: centers from xxhash64(label, i),
    noise from xxhash64(vec_id, i). On this corpus a correct
    quantizer recovers the true neighbors, so recall floors become
    meaningful regression tripwires (VERDICT r7 item 8)."""
    rows = spark.range(n).select(F.col("id").alias("vec_id"))
    lbl = F.pmod(
        F.xxhash64(F.col("vec_id"), F.lit("emb-cl")), F.lit(k)
    ).cast("int")

    def component(i):
        center = (
            F.pmod(
                F.xxhash64(F.col("label") * dim + i, F.lit("emb-ctr")),
                F.lit(2001),
            )
            - 1000
        ) / 1000.0
        noise = (
            F.pmod(
                F.xxhash64(F.col("vec_id") * dim + i, F.lit("emb-nz")),
                F.lit(2 * noise_milli + 1),
            )
            - noise_milli
        ) / 1000.0
        return (center + noise).cast("float")

    return rows.withColumn("label", lbl).withColumn(
        "embedding",
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), component),
    ).select("vec_id", "embedding", "label")


#: per-table bigint columns shifted by ``replica * KEY_SHIFT``;
#: tables absent here are copied once (dimensions)
REPLICATE_SHIFTS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
REPLICATE_COPY = ("nation", "region", "supplier", "part")


def _source_fingerprint(sf_dir: str) -> str:
    """Size+mtime digest of the source tables — regenerated testdata
    must invalidate a cached replica, not silently reuse it."""
    import hashlib

    h = hashlib.md5()
    for name in sorted(list(REPLICATE_SHIFTS) + list(REPLICATE_COPY)):
        p = table_path(sf_dir, name)
        st = os.stat(p)
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def replicate_sf(
    spark: SparkSession, sf_dir: str, out_dir: str, copies: int,
    tables: tuple[str, ...] | None = None,
) -> str:
    """Write a ``copies``× key-shifted testdata tree; returns out_dir.
    Idempotent via a marker keyed by the SOURCE fingerprint (bench
    reruns reuse the replica; regenerated testdata rebuilds it).
    ``tables`` restricts the replica to a subset (e.g. only
    documents+embeddings for the x100 ANN rung — replicating 60 M
    lineitem rows nobody reads would dominate the prep wall); use a
    DISTINCT out_dir per subset, the marker tags the subset."""
    tag = "all" if tables is None else "-".join(sorted(tables))
    marker = os.path.join(
        out_dir,
        f"_COMPLETE_x{copies}_{tag}_{_source_fingerprint(sf_dir)}",
    )
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name, shift_cols in REPLICATE_SHIFTS.items():
        if tables is not None and name not in tables:
            continue
        base = load_table(spark, sf_dir, name)
        parts = []
        for rep in range(copies):
            df = base
            for c in shift_cols:
                df = df.withColumn(c, F.col(c) + F.lit(rep * KEY_SHIFT))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(table_path(out_dir, name))
    for name in REPLICATE_COPY:
        if tables is not None and name not in tables:
            continue
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            table_path(out_dir, name)
        )
    for stale in os.listdir(out_dir):  # markers from older source states
        if stale.startswith("_COMPLETE_x"):
            os.unlink(os.path.join(out_dir, stale))
    open(marker, "w").close()
    return out_dir


def zipf_events(
    spark: SparkSession,
    n_rows: int = 1_000_000,
    hot_keys: int = 3,
    cold_keys: int = 100_000,
    hot_pct: int = 50,
) -> DataFrame:
    """(row_id, k, ts_ms, v): a fact table with a zipf-like hot head —
    ``hot_pct`` percent of all rows land on just ``hot_keys`` keys, the
    rest spread uniformly over ``cold_keys``. Pure projection over
    ``spark.range`` (hash-derived, deterministic, no RNG state); the
    shape the uniform driver testdata never produces, so skew
    mitigations (AQE skew-split, salting) can be proven NECESSARY, not
    just correct."""
    pick = F.pmod(F.xxhash64(F.col("id"), F.lit("zipf-pick")), F.lit(100))
    hot = F.pmod(F.xxhash64(F.col("id"), F.lit("zipf-hot")),
                 F.lit(hot_keys))
    cold = (
        F.pmod(F.xxhash64(F.col("id"), F.lit("zipf-cold")),
               F.lit(cold_keys))
        + hot_keys
    )
    return spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.when(pick < hot_pct, hot).otherwise(cold).alias("k"),
        (F.col("id") * 137 % 86_400_000).alias("ts_ms"),
        (F.col("id") % 997).cast("double").alias("v"),
    )


def zipf_dim(spark: SparkSession, hot_keys: int = 3,
             cold_keys: int = 100_000) -> DataFrame:
    """(k, grp): the dimension joined against zipf_events — small but
    (for the probe) forced non-broadcastable, the exact regime salting
    exists for."""
    return spark.range(hot_keys + cold_keys).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(25)).alias("grp"),
    )
