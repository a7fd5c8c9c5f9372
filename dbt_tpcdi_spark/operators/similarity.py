"""Similarity search over embedding columns (array<float>).

Determinism is the hard constraint: float summation order differs
between engines, so **all dot products run on quantized integers** —
each element becomes round(x·10⁴) as a bigint, sums are exact and
order-free, and the derived cosine is a single deterministic double
division at the end. (At 64 dims and |x| ≤ ~20 the integer dot stays
far below 2^63.)

Two paths:

- ``brute force``: one projection computes the quantized dot against a
  (broadcast) query vector, then deterministic top-k. Linear scan —
  the correctness baseline, and on a cluster it's an embarrassingly
  parallel map + small top-k shuffle.
- ``sign-LSH``: bucket vectors by the sign pattern of fixed ±1
  hyperplanes (derived from (i·7 + j·13) mod 3 — shared constants, no
  RNG), probe only the query's bucket. The scale path: candidate set
  shrinks ~2^nbits-fold; same integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_tpcdi_spark.functions.scalar import round4, round4_sql

QUANT = 10000  # fixed-point scale for embedding elements

LSH_PLANES = 4  # sign bits per bucket


def _q(x: Column) -> Column:
    return F.round(x.cast("double") * QUANT).cast("long")


def qdot(a: Column, b: Column) -> Column:
    """Quantized integer dot product (exact, order-independent)."""
    prods = F.zip_with(a, b, lambda x, y: _q(x) * _q(y))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, p: acc + p)


def qdot_sql(a: str, b: str) -> str:
    # cast(... AS double) BEFORE scaling: DuckDB FLOAT * INT stays
    # float32, which rounds differently than Spark's double math.
    return (
        f"cast(list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint) * "
        f"cast(round(cast({b}[i] AS double) * {QUANT}) AS bigint))) AS bigint)"
    )


def qnorm2(a: Column) -> Column:
    return qdot(a, a)


def qcosine(a: Column, b: Column) -> Column:
    """Deterministic cosine from exact integer dot/norms: one double
    division + sqrt at the end (sqrt is IEEE-exact, so still
    bit-identical across engines)."""
    return round4(
        qdot(a, b)
        / (F.sqrt(qnorm2(a).cast("double")) * F.sqrt(qnorm2(b).cast("double")))
    )


def qcosine_sql(a: str, b: str) -> str:
    return round4_sql(
        f"{qdot_sql(a, b)} / "
        f"(sqrt(cast({qdot_sql(a, a)} AS double)) * "
        f"sqrt(cast({qdot_sql(b, b)} AS double)))"
    )


def sign_bucket_q(a: Column, planes: int = LSH_PLANES) -> Column:
    """``sign_bucket`` over an ALREADY-quantized integer vector (the
    form centroids live in): bit j = sign of Σ_i s_ij·x_i."""
    def signed(j: int):
        return lambda x, i: F.when(
            ((i * 7 + F.lit(j) * 13) % 3) == 0, x
        ).otherwise(-x)

    bucket = None
    for j in range(planes):
        proj = F.aggregate(
            F.transform(a, signed(j)),
            F.lit(0).cast("long"),
            lambda acc, p: acc + p,
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def sign_bucket(a: Column, planes: int = LSH_PLANES) -> Column:
    """LSH bucket id: bit j = sign of Σ_i s_ij·q(x_i) with
    s_ij = +1 if (i·7 + j·13) % 3 == 0 else −1 (fixed pattern)."""
    return sign_bucket_q(F.transform(a, _q), planes)


def bucket_of_qvec(qvec: list[int], planes: int = LSH_PLANES) -> int:
    """Driver-side twin of ``sign_bucket_q`` for centroid lists —
    exact integer sums, so it agrees bit-for-bit with the Spark and
    SQL forms."""
    b = 0
    for j in range(planes):
        s = sum(
            v if (i * 7 + j * 13) % 3 == 0 else -v
            for i, v in enumerate(qvec)
        )
        if s > 0:
            b |= 1 << j
    return b


def sign_bucket_q_sql(a: str, planes: int = LSH_PLANES) -> str:
    """DuckDB twin of ``sign_bucket_q`` (1-based list index)."""
    terms = []
    for j in range(planes):
        proj = (
            f"cast(list_sum(list_transform(range(1, len({a}) + 1), i -> "
            f"CASE WHEN ((i - 1) * 7 + {j} * 13) % 3 = 0 "
            f"THEN {a}[i] ELSE -{a}[i] END)) AS bigint)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    return f"cast({' + '.join(terms)} AS int)"


def quantized_centroids(
    df: DataFrame,
    vec_col: str,
    cluster_col: str,
    pre_quantized: bool = False,
) -> DataFrame:
    """IVF coarse quantizer: per-cluster integer centroids.

    Each centroid dimension is the integer-rounded mean of the
    quantized elements — all arithmetic exact (bigint sums, one
    integer division), so centroids are bit-identical on any engine or
    partitioning. Output: (cluster_col, __centroid array<bigint>).

    Plan: posexplode → one shuffle on (cluster, dim) with map-side
    partial sums → re-assembled via sort_array(collect_list) — the
    collect_list is bounded by the dimension count, not data size.
    """
    q = F.posexplode(F.col(vec_col))
    elem = F.col("__x") if pre_quantized else _q(F.col("__x"))
    per_dim = (
        df.select(F.col(cluster_col), q.alias("__pos", "__x"))
        .groupBy(cluster_col, "__pos")
        .agg(
            F.sum(elem).alias("__s"),
            F.count("*").alias("__c"),
        )
        # integer-rounded mean: floor((2s + c) / 2c) == round(s/c) for s>=0;
        # use floor-div on shifted numerator to stay in exact bigints
        .withColumn(
            "__cq",
            F.floor(
                (F.lit(2) * F.col("__s") + F.col("__c"))
                / (F.lit(2) * F.col("__c"))
            ).cast("long"),
        )
    )
    return per_dim.groupBy(cluster_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__pos", "__cq"))),
            lambda s: s["__cq"],
        ).alias("__centroid")
    )


def quantized_centroids_sql(
    from_table: str, vec_col: str, cluster_col: str, dim: int
) -> str:
    """DuckDB twin of quantized_centroids (fixed dimension count)."""
    return f"""
        SELECT {cluster_col}, list(__cq ORDER BY i) AS __centroid FROM (
            SELECT {cluster_col}, i,
                   cast(floor((2 * sum(cast(round(cast({vec_col}[i] AS double)
                        * {QUANT}) AS bigint)) + count(*))
                        / (2 * count(*))) AS bigint) AS __cq
            FROM {from_table}, range(1, {dim + 1}) t(i)
            GROUP BY 1, 2
        ) GROUP BY 1
    """


def qdist2_int(v: Column, centroid: Column) -> Column:
    """Exact integer squared distance between a quantized vector and an
    integer centroid."""
    diffs = F.zip_with(v, centroid, lambda x, c: (_q(x) - c) * (_q(x) - c))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, d: acc + d)


def qdist2_int_sql(v: str, centroid: str) -> str:
    return (
        f"cast(list_sum(list_transform(range(1, len({v}) + 1), i -> "
        f"(cast(round(cast({v}[i] AS double) * {QUANT}) AS bigint) - {centroid}[i])"
        f" * (cast(round(cast({v}[i] AS double) * {QUANT}) AS bigint) - {centroid}[i])"
        f")) AS bigint)"
    )


def sign_bucket_sql(a: str, planes: int = LSH_PLANES) -> str:
    terms = []
    for j in range(planes):
        proj = (
            f"cast(list_sum(list_transform(range(1, len({a}) + 1), i -> "
            f"CASE WHEN ((i - 1) * 7 + {j} * 13) % 3 = 0 "
            f"THEN cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint) "
            f"ELSE -cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint) "
            f"END)) AS bigint)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    return f"cast({' + '.join(terms)} AS int)"


# ---------------------------------------------------------------------------
# banded sign-LSH: independent bucket per band, OR-ed for recall.
# The single-bucket family above is fine for ONE coarse bucket but has
# algebraic structure (period 3 in j), so stacking planes/bands from it
# yields correlated bits and far fewer effective buckets than 2^planes.
# This family bakes md5-derived ±1 sign matrices as plan literals —
# genuinely independent balanced hyperplanes, identical constants on
# every engine, and the per-row cost is one zip_with per plane.

import hashlib as _hashlib


def _band_signs(band: int, planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random ±1 matrix for (band, plane, dim) —
    derived from md5 of the index triple, so any engine/driver
    regenerates the identical family."""
    return [
        [
            1
            if _hashlib.md5(f"{band}:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -1
            for i in range(dim)
        ]
        for j in range(planes)
    ]


def band_sign_bucket_q(
    a: Column, band: int, planes: int = LSH_PLANES, dim: int = 64
) -> Column:
    """Sign-LSH bucket for one band over an already-quantized integer
    vector of length ``dim``: bit j = sign of Σ_i s_ij·x_i with the
    ±1 matrix from ``_band_signs``."""
    rows = _band_signs(band, planes, dim)
    bucket = None
    for j in range(planes):
        signs = F.array(*[F.lit(s) for s in rows[j]])
        proj = F.aggregate(
            F.zip_with(a, signs, lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, p: acc + p,
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def band_sign_bucket(
    a: Column, band: int, planes: int = LSH_PLANES, dim: int = 64
) -> Column:
    return band_sign_bucket_q(F.transform(a, _q), band, planes, dim)


def band_sign_proj_q(
    a: Column, band: int, j: int, dim: int = 64
) -> Column:
    """The signed projection behind bit ``j`` of ``band_sign_bucket_q``
    (already-quantized input) — exposed for multi-probe LSH, where the
    planes with the SMALLEST |projection| are the ones whose bucket
    bit is least reliable and therefore worth flipping."""
    rows = _band_signs(band, j + 1, dim)
    signs = F.array(*[F.lit(s) for s in rows[j]])
    return F.aggregate(
        F.zip_with(a, signs, lambda x, s: x * s.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )


def band_sign_proj_sql(a: str, band: int, j: int, dim: int = 64) -> str:
    rows = _band_signs(band, j + 1, dim)
    signs = "[" + ", ".join(str(s) for s in rows[j]) + "]"
    return (
        f"cast(list_sum(list_transform(range(1, {dim} + 1), i -> "
        f"cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint) "
        f"* ({signs})[i])) AS bigint)"
    )


def quantize_vec(a: Column) -> Column:
    """float vector → quantized integer vector (materialize ONCE per
    row before any pair join: per-pair re-quantization doubles the
    dominant cost of a candidate-verification join)."""
    return F.transform(a, _q)


def rawdot(a: Column, b: Column) -> Column:
    """Integer dot of two ALREADY-quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )


def band_sign_bucket_sql(
    a: str, band: int, planes: int = LSH_PLANES, dim: int = 64
) -> str:
    """DuckDB twin of ``band_sign_bucket`` (1-based list index, same
    baked ±1 literals)."""
    rows = _band_signs(band, planes, dim)
    terms = []
    for j in range(planes):
        signs = "[" + ", ".join(str(s) for s in rows[j]) + "]"
        proj = (
            f"cast(list_sum(list_transform(range(1, {dim} + 1), i -> "
            f"cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint) "
            f"* ({signs})[i])) AS bigint)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    return f"cast({' + '.join(terms)} AS int)"


# ---------------------------------------------------------------------------
# k-means (Lloyd) over quantized embeddings — the clustering step a
# training-data pipeline needs for corpus bucketing / IVF training.


def _qlist(vec: Column) -> Column:
    return F.transform(vec, _q)


#: assignment switches from literal-unrolled to broadcast-join above
#: this k: the literal plan embeds O(k·dim) expression nodes (argmin
#: unrolled per centroid), which is free of shuffles but blows plan
#: compilation once k leaves single digits.
LITERAL_ASSIGN_MAX_K = 8


def qdist2_q(a: Column, b: Column) -> Column:
    """Exact integer squared distance between two ALREADY-quantized
    integer vectors."""
    diffs = F.zip_with(a, b, lambda x, c: (x - c) * (x - c))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, d: acc + d)


def seed_centroid_table(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Seed centroids as a TABLE — ``(__cl bigint, __cent
    array<bigint>)`` — never driver-collected: the k smallest ids
    resolve via orderBy+limit (executor-side top-k), and the cluster
    LABEL is the seed row's id itself, so no dense 0..k-1 rank (which
    would need a global window or a collect) ever exists. Labels stay
    monotone in id, so (dist, label) tie-breaks order identically to
    the old rank labels and to the SQL twins."""
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("__cl"),
            _qlist(F.col(vec_col)).alias("__cent"),
        )
    )


def assign_centroids_bcast(
    base: DataFrame, id_col: str, cdf: DataFrame
) -> DataFrame:
    """Flat assignment as a pure-JVM plan: k-row broadcast fan-out +
    ``min(struct(dist2, label))`` hash aggregate (map-side partials
    collapse the k copies before the exchange, so the shuffle carries
    one row per input row and the plan is O(1) in k). ``base`` =
    (id, __qv quantized vec); ``cdf`` = the centroid table. Output:
    (id, __qv, cluster, dist2)."""
    d = qdist2_q(F.col("__qv"), F.col("__cent"))
    return (
        base.join(F.broadcast(cdf))
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(d.alias("d"), F.col("__cl").alias("c"))
            ).alias("__best"),
            F.first("__qv").alias("__qv"),
        )
        .select(
            id_col,
            "__qv",
            F.col("__best")["c"].alias("cluster"),
            F.col("__best")["d"].alias("dist2"),
        )
    )


def assign_centroids_blas(
    base: DataFrame, id_col: str, cdf: DataFrame, parts: int | None = None
) -> DataFrame:
    """Flat assignment as a cogrouped Arrow-batched matrix product —
    the n·k·dim hot loop done by vectorized numpy instead of one
    zip_with lambda per (row, centroid) pair (~20× on the bench
    corpus; the per-pair SQL expression path is ``assign_centroids_
    bcast``).

    Distribution: rows hash into ``parts`` buckets; the centroid
    table is replicated to every bucket by a crossJoin with a
    ``range(parts)`` literal (k·parts rows of metadata — the shuffle
    analog of a broadcast, with NO driver materialization anywhere);
    ``cogroup(...).applyInPandas`` hands each bucket its rows and the
    full centroid set as pandas frames. Inside: exact integer argmin
    via float64 matmul — every product ≤ (QUANT·|x|)²·dim < 2⁵³, so
    float64 BLAS is bit-exact here; an int64 fallback guards the
    magnitudes where it wouldn't be. First-occurrence argmin over
    label-ascending columns = the (dist, label) lexicographic
    tie-break shared with the SQL twins. Output: (id, __qv, cluster,
    dist2)."""
    spark = base.sparkSession
    if parts is None:
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            parts = 32
    parts = max(1, parts)
    ep = base.withColumn(
        "__pid", F.pmod(F.hash(F.col(id_col)), F.lit(parts)).cast("int")
    )
    crep = cdf.crossJoin(
        spark.range(parts).select(F.col("id").cast("int").alias("__pid"))
    )
    id_field = base.schema[id_col]

    def fn(left, right):  # pandas cogroup: rows of one bucket × all cents
        import numpy as np
        import pandas as pd

        if len(left) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=left[id_col].dtype),
                    "__qv": pd.Series(dtype=object),
                    "cluster": pd.Series(dtype="int64"),
                    "dist2": pd.Series(dtype="int64"),
                }
            )
        cents = right.sort_values("__cl")
        C = np.stack(cents["__cent"].to_numpy()).astype(np.int64)
        labels = cents["__cl"].to_numpy().astype(np.int64)
        X = np.stack(left["__qv"].to_numpy()).astype(np.int64)
        hi = max(int(np.abs(X).max(initial=0)), int(np.abs(C).max(initial=0)))
        # float64 path only when the final subtraction's exact result
        # d = ||x-c||^2 <= 4*hi^2*dim stays < 2^53 (every intermediate
        # and the result exactly representable); hi^2*dim < 2^51
        # guarantees it. The boundary region [2^51, 2^52) — where an
        # odd d >= 2^53 would round and could flip the argmin — takes
        # the exact int64 path instead.
        if hi * hi * X.shape[1] < (1 << 51):
            Xf, Cf = X.astype(np.float64), C.astype(np.float64)
            d = (
                (Xf * Xf).sum(axis=1)[:, None]
                + (Cf * Cf).sum(axis=1)[None, :]
                - 2.0 * (Xf @ Cf.T)
            )
            d = d.astype(np.int64)
        else:  # magnitudes where float64 would round: exact int64 path
            d = (
                (X * X).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (X @ C.T)
            )
        j = d.argmin(axis=1)  # first min -> smallest label (sorted cols)
        return pd.DataFrame(
            {
                id_col: left[id_col].to_numpy(),
                "__qv": left["__qv"].to_numpy(),
                "cluster": labels[j],
                "dist2": d[np.arange(len(X)), j],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("__qv", T.ArrayType(T.LongType())),
            T.StructField("cluster", T.LongType()),
            T.StructField("dist2", T.LongType()),
        ]
    )
    return (
        ep.groupby("__pid")
        .cogroup(crep.groupby("__pid"))
        .applyInPandas(fn, schema=out_schema)
    )


def assign_centroids_blas_grouped(
    base: DataFrame, id_col: str, cdf: DataFrame, group_col: str
) -> DataFrame:
    """Per-GROUP exact BLAS argmin: each group's rows meet ONLY its
    own group's centroids — the inner loop of two-level (sharded)
    clustering, where a fixed-k coarse quantizer has already cut the
    corpus into cells and each cell clusters independently.

    ``base`` = (group_col, id_col, __qv); ``cdf`` = (group_col, __cl,
    __cent). Cogroup keys on the group column directly (no hash-pid
    replication — a group's centroid set is exactly the cogroup
    partner), so the distance work is Σ_g n_g·k_g·dim instead of
    n·k·dim, and a skewed cell bounds only its own task. Same
    bit-exact float64/int64 guard and (dist, label) first-occurrence
    tie-break as ``assign_centroids_blas``. Output: (group_col,
    id_col, __qv, cluster, dist2)."""
    id_field = base.schema[id_col]
    grp_field = base.schema[group_col]

    def fn(left, right):  # pandas cogroup: one group's rows × its cents
        import numpy as np
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    group_col: pd.Series(dtype="int64"),
                    id_col: pd.Series(dtype=left[id_col].dtype),
                    "__qv": pd.Series(dtype=object),
                    "cluster": pd.Series(dtype="int64"),
                    "dist2": pd.Series(dtype="int64"),
                }
            )
        cents = right.sort_values("__cl")
        C = np.stack(cents["__cent"].to_numpy()).astype(np.int64)
        labels = cents["__cl"].to_numpy().astype(np.int64)
        X = np.stack(left["__qv"].to_numpy()).astype(np.int64)
        hi = max(int(np.abs(X).max(initial=0)), int(np.abs(C).max(initial=0)))
        # same exactness envelope as assign_centroids_blas: float64
        # BLAS only while hi²·dim < 2^51 (result < 2^53 exact), else
        # the exact int64 path
        if hi * hi * X.shape[1] < (1 << 51):
            Xf, Cf = X.astype(np.float64), C.astype(np.float64)
            d = (
                (Xf * Xf).sum(axis=1)[:, None]
                + (Cf * Cf).sum(axis=1)[None, :]
                - 2.0 * (Xf @ Cf.T)
            )
            d = d.astype(np.int64)
        else:
            d = (
                (X * X).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (X @ C.T)
            )
        j = d.argmin(axis=1)  # first min -> smallest label (sorted cols)
        return pd.DataFrame(
            {
                group_col: left[group_col].to_numpy(),
                id_col: left[id_col].to_numpy(),
                "__qv": left["__qv"].to_numpy(),
                "cluster": labels[j],
                "dist2": d[np.arange(len(X)), j],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField(group_col, grp_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("__qv", T.ArrayType(T.LongType())),
            T.StructField("cluster", T.LongType()),
            T.StructField("dist2", T.LongType()),
        ]
    )
    return (
        base.groupby(group_col)
        .cogroup(cdf.groupby(group_col))
        .applyInPandas(fn, schema=out_schema)
    )


def semdedup_dropped_blas(
    km: DataFrame,
    id_col: str,
    cluster_col: str,
    threshold: float,
) -> DataFrame:
    """Within-cluster SemDedup drop rule as ONE grouped Arrow matmul:
    ``km`` = (cluster_col, id_col, __qv quantized vector) →
    (id_col, is_kept), where a row is dropped iff some SMALLER-id row
    of its cluster has cosine ≥ ``threshold`` with it.

    This replaces the cluster-equality self-join whose per-pair
    ``zip_with`` dot product runs INTERPRETED (no codegen for
    higher-order functions — measured ~40-70 µs per 64-dim pair) with
    one shuffle on the cluster key and an exact numpy Gram matrix per
    cluster (~ns per pair). Work and memory are O(g²) per cluster —
    bounded by construction in every caller (width-scaled k in flat
    SemDedup, cell size in the sharded variant).

    Bit-identical to the expression path: the integer Gram matrix is
    exact (float64 only while hi²·dim < 2^51, the shared guard, else
    int64), norms are exact integer, and the cosine + round4 chain
    (``qdot/(sqrt(n2a)·sqrt(n2b))``, ``floor(x·10⁴+0.5)/10⁴``) is
    replicated as the same IEEE-754 double primitives numpy applies
    elementwise — so the same DuckDB oracles cover both plans."""
    id_field = km.schema[id_col]

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        X = np.stack(pdf["__qv"].to_numpy()).astype(np.int64)
        hi = int(np.abs(X).max(initial=0))
        if hi * hi * X.shape[1] < (1 << 51):
            Xf = X.astype(np.float64)
            D = Xf @ Xf.T
        else:
            D = (X @ X.T).astype(np.float64)
        n2 = np.einsum("ij,ij->i", X, X).astype(np.float64)
        denom = np.sqrt(n2)[:, None] * np.sqrt(n2)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            qcos = np.floor((D / denom) * 10000.0 + 0.5) / 10000.0
        hit = qcos >= threshold
        # rows sorted by id: dropped_j = any hit from a smaller-id row
        dropped = np.triu(hit, k=1).any(axis=0)
        return pd.DataFrame(
            {id_col: pdf[id_col].to_numpy(), "is_kept": ~dropped}
        )

    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("is_kept", T.BooleanType()),
        ]
    )
    return (
        km.select(cluster_col, id_col, "__qv")
        .groupby(cluster_col)
        .applyInPandas(fn, schema=out_schema)
    )


def _literal_centroid_state(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> dict[int, list[int]]:
    """Driver-held centroid dict for the LITERAL assignment plan only —
    the MLlib small-k pattern (centers as plan literals). Gated to
    k ≤ LITERAL_ASSIGN_MAX_K by the caller, so this collect is
    O(1)-bounded, never corpus-linear; labels match the table path
    (the seed row's id)."""
    seed = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("__cl"),
            _qlist(F.col(vec_col)).alias("__c"),
        )
        .collect()
    )
    return {int(r["__cl"]): list(r["__c"]) for r in seed}


def _kmeans_literal(
    df: DataFrame, id_col: str, vec_col: str, k: int, iters: int
) -> DataFrame:
    """Literal-assignment Lloyd (centers as plan literals, MLlib
    style): joinless, shuffle-free assignment; per-round centroid
    state lives on the driver — which is why this path is gated to
    k ≤ LITERAL_ASSIGN_MAX_K and the table path is the default."""
    cents = _literal_centroid_state(df, id_col, vec_col, k)

    def assign(centroids: dict[int, list[int]]) -> Column:
        structs = [
            F.struct(
                qdist2_int(
                    F.col(vec_col),
                    F.array(*[F.lit(v).cast("long") for v in c]),
                ).alias("d"),
                F.lit(cid).cast("long").alias("c"),
            )
            for cid, c in sorted(centroids.items())
        ]
        return F.array_min(F.array(*structs))

    for _ in range(iters):
        assigned = df.withColumn("__cluster", assign(cents)["c"])
        new = quantized_centroids(assigned, vec_col, "__cluster").collect()
        cents.update({r["__cluster"]: list(r["__centroid"]) for r in new})
    best = assign(cents)
    return df.withColumn("cluster", best["c"]).withColumn(
        "dist2", best["d"]
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 3,
    assign_mode: str = "auto",
    parts: int | None = None,
) -> DataFrame:
    """Distributed Lloyd iterations, fully deterministic, with the
    centroid set held as a DATAFRAME end-to-end (never collected — at
    SemDedup's k = n/width the centroid set grows linearly with the
    corpus, so any driver materialization is a scale ceiling):

    - **Init**: ``seed_centroid_table`` — the quantized vectors of
      the ``k`` smallest ids, labeled BY id (deterministic; k-means++
      would add RNG).
    - **Assign** — three plans, same arithmetic and same
      (dist, label) lexicographic tie-break, selected by
      ``assign_mode`` ("literal" | "broadcast" | "blas" | "auto" =
      literal iff k ≤ LITERAL_ASSIGN_MAX_K else blas):

      * ``literal`` (the MLlib pattern — centers are driver state in
        every distributed k-means): centroids enter the plan as
        literals, assignment is a pure projection via ``array_min``
        of k unrolled structs. No join, no shuffle — but the plan
        carries O(k·dim) literal expression nodes, so it caps k.
      * ``broadcast``: ``assign_centroids_bcast`` — k-row broadcast
        fan-out + min(struct) hash aggregate; plan O(1) in k, pure
        JVM codegen, n·k·dim lambda evaluations.
      * ``blas`` (the scale-in-n·k path and the non-literal
        default): ``assign_centroids_blas`` — cogrouped Arrow
        batches, exact vectorized argmin; same output bit-for-bit.

    - **Update**: one (cluster, dim) shuffle with map-side partial
      sums (``quantized_centroids``); integer-rounded means keep
      centroids bit-identical on any engine/partitioning. Empty
      clusters keep their previous centroid (left-join +
      coalesce on the centroid TABLE — k-row metadata joins).

    Each round's centroid table is persist()ed and the superseded
    round's blocks are released as soon as the next round
    materializes (one k-row count per round — bounded metadata, never
    the corpus), so the block cache holds exactly one live centroid
    table however many rounds run. Fixed ``iters`` (no convergence
    test) keeps the
    computation SQL-expressible for the oracle (``kmeans_sql``
    unrolls the same iterations as chained CTEs; its CROSS JOIN +
    QUALIFY argmin is arbitrary-k already).

    Returns ``df`` + ``cluster`` (bigint: the winning seed's id) +
    ``dist2`` (bigint, exact squared distance to that centroid).
    """
    if assign_mode not in ("auto", "literal", "broadcast", "blas"):
        raise ValueError(f"assign_mode={assign_mode!r}")
    literal = (
        assign_mode == "literal"
        or (assign_mode == "auto" and k <= LITERAL_ASSIGN_MAX_K)
    )

    if literal:
        return _kmeans_literal(df, id_col, vec_col, k, iters)

    base, cdf, assign_fn = _kmeans_table(
        df, id_col, vec_col, k, iters, assign_mode, parts
    )
    final = assign_fn(base, id_col, cdf).select(id_col, "cluster", "dist2")
    return df.join(final, id_col)


def _kmeans_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    assign_mode: str = "blas",
    parts: int | None = None,
):
    """The shared Lloyd loop over the centroid TABLE: returns
    (quantized base, final centroid table, assign_fn). Nothing here
    ever collects."""
    assign_fn = (
        assign_centroids_bcast
        if assign_mode == "broadcast"
        else lambda b, i, c: assign_centroids_blas(b, i, c, parts=parts)
    )
    base = df.select(id_col, _qlist(F.col(vec_col)).alias("__qv"))
    cdf = seed_centroid_table(df, id_col, vec_col, k).persist()
    for _ in range(iters):
        assigned = assign_fn(base, id_col, cdf)
        new = quantized_centroids(
            assigned.select("cluster", "__qv"),
            "__qv",
            "cluster",
            pre_quantized=True,
        )
        nxt = (
            cdf.join(new, cdf["__cl"] == new["cluster"], "left")
            .select(
                cdf["__cl"],
                F.coalesce(new["__centroid"], cdf["__cent"]).alias(
                    "__cent"
                ),
            )
            .persist()
        )
        # replace-then-release (same ordering bpe._checkpoint_replacing
        # uses): materialize the new round's k-row table, THEN drop the
        # superseded round's blocks — otherwise iters copies of the
        # centroid table accumulate in the block cache (k = n/width at
        # SemDedup scale makes that linear in the corpus).
        nxt.count()
        cdf.unpersist()
        cdf = nxt
    return base, cdf, assign_fn


def kmeans_centroid_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 3,
    assign_mode: str = "blas",
    parts: int | None = None,
) -> DataFrame:
    """The trained centroid TABLE itself — ``(__cl bigint, __cent
    array<bigint>)`` after ``iters`` Lloyd rounds; what a codebook
    consumer (PQ, IVF index build) needs instead of per-point
    assignments. Same lifecycle as ``kmeans_quantized``: zero driver
    materialization (``kmeans_sql(..., final='cents')`` is the SQL
    twin)."""
    _, cdf, _ = _kmeans_table(
        df, id_col, vec_col, k, iters, assign_mode, parts
    )
    return cdf


def kmeans_sql(
    from_table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 4,
    iters: int = 3,
    k_sql: str | None = None,
    final: str = "assign",
) -> str:
    """DuckDB twin: the same fixed Lloyd iterations unrolled as chained
    CTEs (init → [assign → update → carry-forward] × iters → final
    assignment). Same integer arithmetic, same tie-breaks.

    ``k_sql`` (a scalar SQL expression, e.g. a corpus-size-derived
    subquery) replaces the literal ``k`` in the seed bound — only the
    seed depends on k, the unrolled assign/update CTEs are
    arbitrary-k — so the oracle tracks a Spark side that derives k
    from the data (SemDedup's k = ⌈n / cluster_width⌉).

    ``final="assign"`` yields per-point (id, cluster, dist2);
    ``final="cents"`` yields the trained centroid table (c, centroid)
    — the twin of ``kmeans_centroid_table``."""
    q = (
        f"list_transform(range(1, {dim} + 1), i -> "
        f"cast(round(cast({{v}}[i] AS double) * {QUANT}) AS bigint))"
    )
    dist = qdist2_int_sql(f"e.{vec_col}", "c.centroid")
    k_bound = f"({k_sql})" if k_sql is not None else str(k)
    ctes = [
        # cluster label = the seed row's id (the Spark side holds
        # centroids as a table and never ranks — a dense 0..k-1 label
        # would need a global window or a driver collect)
        f"""cents_0 AS (
            SELECT cast({id_col} AS bigint) AS c,
                   {q.format(v=vec_col)} AS centroid
            FROM {from_table}
            QUALIFY row_number() OVER (ORDER BY {id_col}) <= {k_bound}
        )"""
    ]
    for i in range(iters):
        ctes.append(f"""assign_{i} AS (
            SELECT e.{id_col}, c.c, {dist} AS d
            FROM {from_table} e CROSS JOIN cents_{i} c
            QUALIFY row_number() OVER (
                PARTITION BY e.{id_col} ORDER BY d, c.c) = 1
        )""")
        ctes.append(f"""upd_{i} AS (
            SELECT c, list(cq ORDER BY i) AS centroid FROM (
                SELECT a.c, i,
                       cast(floor((2 * sum(cast(round(cast(e.{vec_col}[i]
                            AS double) * {QUANT}) AS bigint)) + count(*))
                            / (2 * count(*))) AS bigint) AS cq
                FROM assign_{i} a
                JOIN {from_table} e USING ({id_col}),
                     range(1, {dim} + 1) t(i)
                GROUP BY 1, 2
            ) GROUP BY 1
        )""")
        ctes.append(f"""cents_{i + 1} AS (
            SELECT o.c, coalesce(u.centroid, o.centroid) AS centroid
            FROM cents_{i} o LEFT JOIN upd_{i} u USING (c)
        )""")
    if final == "cents":
        return f"""
        WITH {', '.join(ctes)}
        SELECT c, centroid FROM cents_{iters}
        """
    return f"""
        WITH {', '.join(ctes)}
        SELECT e.{id_col}, c.c AS cluster, {dist} AS dist2
        FROM {from_table} e CROSS JOIN cents_{iters} c
        QUALIFY row_number() OVER (PARTITION BY e.{id_col} ORDER BY {dist}, c.c) = 1
    """


# ---------------------------------------------------------------------------
# embedding codecs: L2 normalization + symmetric int8 quantization —
# the storage/serving transforms an embedding pipeline applies before
# indexing (int8 cuts the column 4x; normalized vectors make cosine a
# plain dot product).


def l2_normalize(vec: Column) -> Column:
    """Unit-norm embedding as array<double>, each element round4'd.
    x/||x|| == x_q/sqrt(||x_q||²) (the fixed-point scale cancels), so
    the only float ops are one sqrt + one division per element — both
    IEEE-exact, hence engine-independent. Zero vectors map to zeros."""
    norm = F.sqrt(qnorm2(vec).cast("double"))
    return F.transform(
        vec,
        lambda x: F.when(norm == 0.0, F.lit(0.0)).otherwise(
            round4(_q(x).cast("double") / norm)
        ),
    )


def l2_normalize_sql(vec: str) -> str:
    norm = f"sqrt(cast({qdot_sql(vec, vec)} AS double))"
    el = f"cast(round(cast({vec}[i] AS double) * {QUANT}) AS bigint)"
    return (
        f"list_transform(range(1, len({vec}) + 1), i -> "
        f"CASE WHEN {norm} = 0 THEN 0.0 ELSE "
        f"{round4_sql(f'cast({el} AS double) / {norm}')} END)"
    )


def int8_scale(vec: Column) -> Column:
    """Per-vector quantization scale: max |q(x)| (bigint)."""
    return F.array_max(F.transform(vec, lambda x: F.abs(_q(x))))


def int8_scale_sql(vec: str) -> str:
    return (
        f"list_max(list_transform(range(1, len({vec}) + 1), i -> "
        f"abs(cast(round(cast({vec}[i] AS double) * {QUANT}) AS bigint))))"
    )


def int8_codes(vec: Column) -> Column:
    """Symmetric int8 codes in [-127, 127]: sign(x)·round(127·|x_q|/s)
    computed as exact integer math — floor((254·|x_q| + s) / (2s)) —
    so codes never hit a cross-engine float-rounding boundary. Zero
    vectors (s = 0) code to all zeros."""
    s = int8_scale(vec)

    def code(x: Column) -> Column:
        xq = _q(x)
        mag = F.floor((F.lit(254) * F.abs(xq) + s) / (F.lit(2) * s))
        return (
            F.when(s == 0, F.lit(0))
            .when(xq < 0, -mag)
            .otherwise(mag)
            .cast("int")
        )

    return F.transform(vec, code)


def int8_codes_sql(vec: str) -> str:
    s = int8_scale_sql(vec)
    el = f"cast(round(cast({vec}[i] AS double) * {QUANT}) AS bigint)"
    mag = f"cast(floor((254 * abs({el}) + ({s})) / (2 * ({s}))) AS int)"
    return (
        f"list_transform(range(1, len({vec}) + 1), i -> "
        f"CASE WHEN ({s}) = 0 THEN 0 WHEN {el} < 0 THEN -{mag} "
        f"ELSE {mag} END)"
    )


# ---------------------------------------------------------------------------
# IVF-style prefiltered assignment — the next rung above the flat
# broadcast-join argmin. Flat assignment computes n·k distances; at
# SemDedup's k = n/width that is O(n²·dim/width). Prefiltering by the
# shared sign-LSH bucket cuts the candidate set to the centroids in
# the vector's bucket (~k/2^planes), trading exactness for the
# classic IVF bound: assignment may pick the nearest IN-BUCKET
# centroid rather than the global nearest. Vectors whose bucket holds
# no centroid fall back to the exact global argmin, so assignment is
# always total.


def assign_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: DataFrame,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Assign each vector to its nearest same-bucket centroid
    (broadcast join on the bucket id — candidates ≈ k/2^planes per
    row instead of k), exact-global fallback for empty buckets.

    ``cents`` is a centroid TABLE ``(__cl bigint, __cent
    array<bigint>)`` (``seed_centroid_table`` or a Lloyd output) —
    it flows into the broadcast exchange as a DataFrame, so no O(k)
    state ever materializes on the Python driver; its LSH bucket is
    computed in-plan with the shared ``sign_bucket_q``.

    Returns (id_col, cluster, dist2, via_bucket): ``via_bucket`` is
    false for fallback rows. Deterministic end-to-end — bucket ids,
    distances, and tie-breaks are all exact integer arithmetic shared
    with the SQL twin (``assign_ivf_sql``)."""
    cdf = F.broadcast(
        cents.select(
            F.col("__cl"),
            F.col("__cent"),
            sign_bucket_q(F.col("__cent"), planes).alias("__cb"),
        )
    )
    e = df.select(
        id_col, vec_col, sign_bucket(F.col(vec_col), planes).alias("__b")
    )
    d = qdist2_int(F.col(vec_col), F.col("__cent"))
    best = (
        e.join(cdf, e["__b"] == cdf["__cb"])
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(d.alias("d"), F.col("__cl").alias("c"))
            ).alias("__best")
        )
        .select(
            id_col,
            F.col("__best")["c"].alias("cluster"),
            F.col("__best")["d"].alias("dist2"),
            F.lit(True).alias("via_bucket"),
        )
    )
    missing = e.join(best.select(id_col), id_col, "left_anti")
    fallback = (
        missing.join(cdf)
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(d.alias("d"), F.col("__cl").alias("c"))
            ).alias("__best")
        )
        .select(
            id_col,
            F.col("__best")["c"].alias("cluster"),
            F.col("__best")["d"].alias("dist2"),
            F.lit(False).alias("via_bucket"),
        )
    )
    return best.unionByName(fallback)


def assign_ivf_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: DataFrame,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """``assign_ivf`` with the per-bucket hot loop as a cogrouped
    Arrow BLAS argmin — bit-identical outputs (A/B-asserted in
    tests; the (dist, label) tie-break and the int64/float64
    exactness guard are the shared ones), ~an order of magnitude less
    wall and allocation churn than the per-(row, centroid) zip_with
    expression at IVF sizes: the expression path materializes a
    64-element array per candidate pair (the GC-pressure storm the
    x10 eager-build profile showed), the BLAS path one matmul per
    bucket.

    Shape: cogroup keys directly on the sign-LSH bucket (a bucket's
    centroid set IS its cogroup partner — no replication), so
    distance work is Σ_b n_b·k_b·dim; rows whose bucket has no
    centroid fall out of the cogroup and take the exact-global
    fallback via the flat BLAS assignment, mirroring ``assign_ivf``'s
    fallback branch. Returns (id, cluster, dist2, via_bucket)."""
    base = df.select(
        id_col,
        sign_bucket(F.col(vec_col), planes).alias("__g"),
        _qlist(F.col(vec_col)).alias("__qv"),
    )
    cdfg = cents.select(
        sign_bucket_q(F.col("__cent"), planes).alias("__g"),
        "__cl",
        "__cent",
    )
    best = assign_centroids_blas_grouped(base, id_col, cdfg, "__g").select(
        id_col,
        "cluster",
        "dist2",
        F.lit(True).alias("via_bucket"),
    )
    missing = base.join(best.select(id_col), id_col, "left_anti")
    fallback = assign_centroids_blas(
        missing.select(id_col, "__qv"), id_col, cents
    ).select(
        id_col,
        "cluster",
        "dist2",
        F.lit(False).alias("via_bucket"),
    )
    return best.unionByName(fallback)


def assign_ivf_sql(
    from_table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k_bound: str | None = None,
    planes: int = LSH_PLANES,
    cents_sql: str | None = None,
) -> str:
    """DuckDB twin: centroids from either the raw seeds (k smallest
    ids, same as ``kmeans_sql`` — pass ``k_bound``, a SQL scalar
    expression) or ANY (c, centroid) query passed as ``cents_sql``
    (e.g. ``kmeans_sql(..., final='cents')`` for Lloyd-trained
    centroids); bucket both sides with the shared sign formula,
    nearest-in-bucket via QUALIFY, NOT-EXISTS fallback to the global
    argmin."""
    if (k_bound is None) == (cents_sql is None):
        raise ValueError("pass exactly one of k_bound / cents_sql")
    q = (
        f"list_transform(range(1, {dim} + 1), i -> "
        f"cast(round(cast({vec_col}[i] AS double) * {QUANT}) AS bigint))"
    )
    if cents_sql is not None:
        cents_cte = f"cents AS MATERIALIZED ({cents_sql})"
    else:
        cents_cte = f"""cents AS MATERIALIZED (
        SELECT cast({id_col} AS bigint) AS c,
               {q} AS centroid
        FROM {from_table}
        QUALIFY row_number() OVER (ORDER BY {id_col}) <= ({k_bound})
    )"""
    dist = qdist2_int_sql(f"e.{vec_col}", "c.centroid")
    return f"""
    WITH {cents_cte},
    cb AS MATERIALIZED (
        SELECT c, centroid, {sign_bucket_q_sql('centroid', planes)} AS b
        FROM cents
    ),
    e AS MATERIALIZED (
        SELECT {id_col}, {vec_col},
               {sign_bucket_q_sql(q, planes)} AS b
        FROM {from_table}
    ),
    best AS (
        SELECT e.{id_col}, c.c AS cluster, {dist} AS dist2,
               true AS via_bucket
        FROM e JOIN cb c USING (b)
        QUALIFY row_number() OVER (
            PARTITION BY e.{id_col} ORDER BY {dist}, c.c) = 1
    ),
    fallback AS (
        SELECT e.{id_col}, c.c AS cluster, {dist} AS dist2,
               false AS via_bucket
        FROM e CROSS JOIN cb c
        WHERE NOT EXISTS (SELECT 1 FROM cb x WHERE x.b = e.b)
        QUALIFY row_number() OVER (
            PARTITION BY e.{id_col} ORDER BY {dist}, c.c) = 1
    )
    SELECT * FROM best UNION ALL SELECT * FROM fallback
    """


# ---------------------------------------------------------------------------
# product quantization (Jégou, Douze, Schmid 2011, "Product
# quantization for nearest neighbor search"): split each vector into
# `blocks` subvectors, train a per-block codebook by k-means, store
# each vector as `blocks` small codes (64 dims × float → 8 bytes of
# codes: the compression that makes billion-vector ANN serveable), and
# answer queries by asymmetric distance (ADC): one (block, code) →
# distance lookup table per query, then a per-vector sum of lookups —
# no full-vector math ever touches the corpus at query time.


def pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    blocks: int = 8,
    codes: int = 16,
    iters: int = 1,
    assign_mode: str = "broadcast",
    parts: int | None = None,
) -> DataFrame:
    """Per-block PQ codebooks: ``(block int, __cl bigint, __cent
    array<bigint>)`` — one ``kmeans_centroid_table`` per block over
    that block's subvector slice. The loop is O(blocks) driver-side
    orchestration only (bounded by the layout, never the corpus);
    each block's training is the table-lifecycle k-means — zero O(k)
    driver state. SQL twin: ``pq_adc_topk_sql``'s per-block
    ``kmeans_sql(..., final='cents')`` chains.

    Returned codebook is persist()ed (it is consumed at least twice:
    encode + ADC distance table); superseded Lloyd-round tables are
    released as each round materializes, so exactly one
    blocks·codes-row table stays cached per trained codebook.

    All ``blocks`` codebooks train in ONE GROUPED Lloyd loop over the
    exploded (id, block, subvector) rows — per-block training is
    independent (seeds = the k smallest ids within each block, i.e.
    the same ids every block; assignment and the quantized-mean
    update never cross blocks), so the grouped loop is bit-identical
    to ``blocks`` separate ``kmeans_centroid_table`` runs and the SQL
    twin's per-block ``kmeans_sql`` chains remain the oracle — but
    the job count per iteration is 1 instead of ~4·blocks (at toy
    scale the sequential per-block loop was pure scheduling overhead;
    at cluster scale it was ``blocks`` separate corpus scans).

    ``assign_mode``/``parts`` are kept for API compatibility; any
    mode other than "broadcast" falls back to the per-block loop
    (the grouped join IS broadcast assignment — the codebook is
    blocks·codes metadata rows)."""
    sub = dim // blocks
    if sub * blocks != dim:
        raise ValueError(f"dim {dim} not divisible by blocks {blocks}")
    if assign_mode != "broadcast":
        return _pq_codebooks_blockwise(
            df, id_col, vec_col, dim, blocks, codes, iters,
            assign_mode, parts,
        )
    sv = df.select(
        F.col(id_col),
        F.explode(_subvector_structs(vec_col, dim, blocks)).alias("__s"),
    ).select(id_col, "__s.block", F.col("__s.__qsv").alias("__qv"))
    wseed = Window.partitionBy("block").orderBy(id_col)
    cdf = (
        sv.withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= codes)
        .select(
            "block",
            F.col(id_col).cast("long").alias("__cl"),
            F.col("__qv").alias("__cent"),
        )
        .persist()
    )
    for _ in range(iters):
        d = qdist2_q(F.col("__qv"), F.col("__cent"))
        # argmin per (vector, block): (d, __cl) is unique per code so
        # the struct-min tie-break matches assign_centroids_bcast;
        # the subvector rides along (never compared — (d, c) decides)
        assigned = (
            sv.join(F.broadcast(cdf), "block")
            .groupBy(id_col, "block")
            .agg(
                F.min(
                    F.struct(
                        d.alias("d"),
                        F.col("__cl").alias("c"),
                        F.col("__qv").alias("v"),
                    )
                ).alias("__b")
            )
            .select(
                "block",
                F.col("__b")["c"].alias("__c2"),
                F.col("__b")["v"].alias("__v"),
            )
        )
        # quantized_centroids' exact integer mean, grouped by
        # (block, cluster): floor((2s + c) / 2c) == round(s/c)
        q = F.posexplode(F.col("__v"))
        per_dim = (
            assigned.select("block", "__c2", q.alias("__pos", "__x"))
            .groupBy("block", "__c2", "__pos")
            .agg(F.sum("__x").alias("__s"), F.count("*").alias("__c"))
            .withColumn(
                "__cq",
                F.floor(
                    (F.lit(2) * F.col("__s") + F.col("__c"))
                    / (F.lit(2) * F.col("__c"))
                ).cast("long"),
            )
        )
        # new derives from cdf's lineage (sv ⋈ cdf) — rename its join
        # keys so the carry-forward join can't resolve both sides to
        # the same attribute (labels repeat across blocks: seeds are
        # the same smallest ids in every block, so a lineage-ambiguous
        # block equality would silently fan out 1 → blocks rows)
        new = (
            per_dim.groupBy("block", "__c2")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__pos", "__cq"))
                    ),
                    lambda s: s["__cq"],
                ).alias("__centroid")
            )
            .withColumnRenamed("block", "__b2")
        )
        nxt = (
            cdf.join(
                new,
                (cdf["block"] == new["__b2"])
                & (cdf["__cl"] == new["__c2"]),
                "left",
            )
            .select(
                cdf["block"],
                cdf["__cl"],
                F.coalesce(new["__centroid"], cdf["__cent"]).alias(
                    "__cent"
                ),
            )
            .persist()
        )
        nxt.count()  # replace-then-release (see _kmeans_table)
        cdf.unpersist()
        cdf = nxt
    if iters == 0:
        cdf.count()
    return cdf


def _pq_codebooks_blockwise(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    blocks: int,
    codes: int,
    iters: int,
    assign_mode: str,
    parts: int | None,
) -> DataFrame:
    """Per-block sequential training (the pre-grouped shape) — kept
    for non-broadcast assign modes; result-identical to the grouped
    loop."""
    sub = dim // blocks
    out = None
    finals = []
    for b in range(blocks):
        sv = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), b * sub + 1, sub).alias("__sv"),
        )
        fin = kmeans_centroid_table(
            sv, id_col, "__sv", k=codes, iters=iters,
            assign_mode=assign_mode, parts=parts,
        )
        finals.append(fin)
        cb = fin.select(
            F.lit(b).cast("int").alias("block"), "__cl", "__cent"
        )
        out = cb if out is None else out.unionByName(cb)
    out = out.persist()
    out.count()  # replace-then-release: union live before blocks drop
    for fin in finals:
        fin.unpersist()
    return out


def _subvector_structs(vec_col: str, dim: int, blocks: int):
    sub = dim // blocks
    return F.array(*[
        F.struct(
            F.lit(b).cast("int").alias("block"),
            _qlist(F.slice(F.col(vec_col), b * sub + 1, sub)).alias(
                "__qsv"
            ),
        )
        for b in range(blocks)
    ])


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    dim: int,
    blocks: int = 8,
) -> DataFrame:
    """(id, block, code, dist2): each subvector's nearest codebook
    entry — explode to (id, block, quantized subvector), broadcast the
    codebook table (blocks·codes metadata rows), argmin via the same
    min(struct(dist, label)) the flat k-means uses. Shuffle carries
    one row per (vector, block); no driver state."""
    sv = df.select(
        F.col(id_col),
        F.explode(_subvector_structs(vec_col, dim, blocks)).alias("__s"),
    ).select(id_col, "__s.block", "__s.__qsv")
    d = qdist2_q(F.col("__qsv"), F.col("__cent"))
    return (
        sv.join(F.broadcast(codebooks), "block")
        .groupBy(id_col, "block")
        .agg(
            F.min(
                F.struct(d.alias("d"), F.col("__cl").alias("c"))
            ).alias("__best")
        )
        .select(
            id_col,
            "block",
            F.col("__best")["c"].alias("code"),
            F.col("__best")["d"].alias("dist2"),
        )
    )


def pq_encode_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    dim: int,
    blocks: int = 8,
    parts: int | None = None,
) -> DataFrame:
    """``pq_encode`` as a cogrouped Arrow matmul — bit-identical
    output, BLAS economics (r12, VERDICT r11 item 1's second half):
    the broadcast fan-out streams n·blocks·codes rows through one
    ``zip_with`` per (subvector, codeword) pair and its min(struct)
    ObjectHashAggregate falls back to sort-based past ~128 keys per
    partition — at the x1000 probe (2M vectors × 8 blocks × 64 codes
    = 1B fanned rows) the encode pass alone cost ~150 s, dominating
    the sampled-training index build. Here rows hash into ``parts``
    buckets, the blocks·codes codebook table replicates to each
    bucket via a range crossJoin (metadata-sized, never collected),
    and each Arrow batch quantizes its subvector slices and takes the
    exact integer argmin per block via float64 matmul (same
    magnitude guard and first-occurrence-over-sorted-labels tie-break
    as ``assign_centroids_blas``, so (dist, code) ordering matches
    the SQL twins bit for bit). Quantization replicates Spark's
    ``round`` (HALF_UP, away from zero) — on this pipeline's residual
    inputs the products are exact integers over QUANT, so the two
    paths agree exactly, which ``test_pq_encode_blas_equals_fanout``
    pins including negative components and distance ties."""
    spark = df.sparkSession
    if parts is None:
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            parts = 32
    parts = max(1, parts)
    sub = dim // blocks
    if sub * blocks != dim:
        raise ValueError(f"dim {dim} not divisible by blocks {blocks}")
    ep = df.select(id_col, F.col(vec_col).alias("__v")).withColumn(
        "__pid", F.pmod(F.hash(F.col(id_col)), F.lit(parts)).cast("int")
    )
    crep = codebooks.crossJoin(
        spark.range(parts).select(F.col("id").cast("int").alias("__pid"))
    )
    id_field = df.schema[id_col]

    def fn(left, right):
        import numpy as np
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=left[id_col].dtype),
                    "block": pd.Series(dtype="int32"),
                    "code": pd.Series(dtype="int64"),
                    "dist2": pd.Series(dtype="int64"),
                }
            )
        V = np.stack(left["__v"].to_numpy()).astype(np.float64)
        # Spark round(): HALF_UP away from zero (np.round would be
        # HALF_EVEN — differs on exact .5, so replicate explicitly)
        Q = (np.sign(V) * np.floor(np.abs(V) * QUANT + 0.5)).astype(
            np.int64
        )
        ids = left[id_col].to_numpy()
        frames = []
        for b, grp in right.groupby("block"):
            grp = grp.sort_values("__cl")
            C = np.stack(grp["__cent"].to_numpy()).astype(np.int64)
            labels = grp["__cl"].to_numpy().astype(np.int64)
            X = Q[:, b * sub:(b + 1) * sub]
            hi = max(int(np.abs(X).max(initial=0)),
                     int(np.abs(C).max(initial=0)))
            if hi * hi * X.shape[1] < (1 << 51):
                Xf, Cf = X.astype(np.float64), C.astype(np.float64)
                d = (
                    (Xf * Xf).sum(axis=1)[:, None]
                    + (Cf * Cf).sum(axis=1)[None, :]
                    - 2.0 * (Xf @ Cf.T)
                )
                d = d.astype(np.int64)
            else:
                d = (
                    (X * X).sum(axis=1)[:, None]
                    + (C * C).sum(axis=1)[None, :]
                    - 2 * (X @ C.T)
                )
            j = d.argmin(axis=1)  # first min -> smallest label
            frames.append(pd.DataFrame(
                {
                    id_col: ids,
                    "block": np.full(len(X), b, dtype=np.int32),
                    "code": labels[j],
                    "dist2": d[np.arange(len(X)), j],
                }
            ))
        return pd.concat(frames, ignore_index=True)

    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("block", T.IntegerType()),
            T.StructField("code", T.LongType()),
            T.StructField("dist2", T.LongType()),
        ]
    )
    return (
        ep.groupby("__pid")
        .cogroup(crep.groupby("__pid"))
        .applyInPandas(fn, schema=out_schema)
    )


def pq_query_subvectors(
    query_df: DataFrame, vec_col: str, dim: int, blocks: int = 8
) -> DataFrame:
    """(block, __qsv): the query vector's quantized subvector per
    block — a 1×blocks metadata table feeding the ADC lookup join (the
    query row flows as a DataFrame; never collected)."""
    return query_df.select(
        F.explode(_subvector_structs(vec_col, dim, blocks)).alias("__s")
    ).select("__s.block", "__s.__qsv")


def pq_adc_topk_sql(
    from_table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    blocks: int = 8,
    codes: int = 16,
    iters: int = 1,
    k: int = 10,
    train_where: str | None = None,
) -> str:
    """DuckDB twin of the full PQ pipeline: per-block codebook
    training (nested ``kmeans_sql(..., final='cents')`` chains over
    the subvector slices), per-(vector, block) encode via the same
    (dist, code) argmin, the query's (block, code) → distance table,
    and the ADC top-k with (adc asc, id asc) tie-break.

    ``train_where`` restricts CODEBOOK TRAINING to a predicate (the
    deterministic-hash-sample scale path — encode and ADC always run
    over the full corpus)."""
    sub = dim // blocks
    tw = f"WHERE {train_where}" if train_where else ""
    ctes = []
    for b in range(blocks):
        lo, hi = b * sub + 1, (b + 1) * sub
        ctes.append(
            f"""__pqs{b} AS MATERIALIZED (
                SELECT {id_col}, {vec_col}[{lo}:{hi}] AS sv
                FROM {from_table} {tw}
            )"""
        )
        km = kmeans_sql(
            f"__pqs{b}", id_col, "sv", dim=sub, k=codes, iters=iters,
            final="cents",
        )
        ctes.append(
            f"""__pqcb{b} AS MATERIALIZED (
                SELECT {b} AS block, c, centroid FROM ({km})
            )"""
        )
    cb_union = " UNION ALL ".join(
        f"SELECT * FROM __pqcb{b}" for b in range(blocks)
    )
    ctes.append(f"__pqcb AS MATERIALIZED ({cb_union})")
    sv_union = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS block, "
        f"{vec_col}[{b * sub + 1}:{(b + 1) * sub}] AS sv "
        f"FROM {from_table}"
        for b in range(blocks)
    )
    ctes.append(f"__pqsv AS MATERIALIZED ({sv_union})")
    dist = qdist2_int_sql("e.sv", "c.centroid")
    ctes.append(
        f"""__pqcode AS MATERIALIZED (
            SELECT e.{id_col}, e.block, c.c AS code
            FROM __pqsv e JOIN __pqcb c USING (block)
            QUALIFY row_number() OVER (
                PARTITION BY e.{id_col}, e.block
                ORDER BY {dist}, c.c) = 1
        )"""
    )
    q_union = " UNION ALL ".join(
        f"SELECT {b} AS block, "
        f"{vec_col}[{b * sub + 1}:{(b + 1) * sub}] AS sv "
        f"FROM (SELECT {vec_col} FROM {from_table} "
        f"ORDER BY {id_col} LIMIT 1)"
        for b in range(blocks)
    )
    ctes.append(f"__pqq AS MATERIALIZED ({q_union})")
    qdist = qdist2_int_sql("q.sv", "c.centroid")
    ctes.append(
        f"""__pqd AS MATERIALIZED (
            SELECT c.block, c.c AS code, {qdist} AS d
            FROM __pqcb c JOIN __pqq q USING (block)
        )"""
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT e.{id_col}, cast(sum(d.d) AS bigint) AS adc_dist2
    FROM __pqcode e
    JOIN __pqd d ON e.block = d.block AND e.code = d.code
    GROUP BY 1
    ORDER BY adc_dist2 ASC, {id_col} ASC
    LIMIT {k}
    """


def ivfpq_adc_topk_sql(
    from_table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    cells: int = 16,
    blocks: int = 8,
    codes: int = 16,
    iters: int = 1,
    refine: int = 50,
    k: int = 10,
    nprobe: int | None = None,
    train_where: str | None = None,
) -> str:
    """DuckDB twin of the full IVFADC pipeline (Jégou et al. 2011,
    the IVF+residual-PQ composition): coarse seed cells + exact
    argmin assignment, RESIDUAL vectors ``(q(v) − cell_centroid) /
    QUANT`` (integers over QUANT — the float round-trips exactly
    through the shared quantizer, so the plain PQ CTE chains train on
    residuals unchanged), per-block residual codebooks, per-(vector,
    block) encode, the query's per-CELL residual (block, code) →
    distance table, ADC top-``refine``, and an exact quantized-L2
    re-rank to the final top-``k``. ``nprobe`` restricts the ADC to
    the query's ``nprobe`` nearest cells (dist asc, cell asc) — the
    serve-from-persisted-index shape where unprobed cells' codes are
    never read. ``train_where`` (a predicate over ``id_col``)
    restricts cell SEEDS and codebook TRAINING to a subset — the
    build-then-append lifecycle's twin, where later batches are
    encoded against codebooks frozen on the initial corpus; assign,
    encode, and ADC always run over the full corpus."""
    sub = dim // blocks
    if sub * blocks != dim:
        raise ValueError(f"dim {dim} not divisible by blocks {blocks}")
    if nprobe is not None and nprobe <= 0:
        # nprobe=0 would build the probe CTE yet skip the ADC join
        # (`if nprobe` is falsy), silently serving the FULL corpus
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    qv = (
        f"list_transform(range(1, {dim} + 1), i -> "
        f"cast(round(cast({{v}}[i] AS double) * {QUANT}) AS bigint))"
    )
    cdist = qdist2_int_sql(f"e.{vec_col}", "c.ccent")
    tw = f"WHERE {train_where}" if train_where else ""
    res_src = "__res_tr" if train_where else "__res"
    ctes = [
        f"""__cc AS MATERIALIZED (
            SELECT cast({id_col} AS bigint) AS cell,
                   {qv.format(v=vec_col)} AS ccent
            FROM {from_table} {tw}
            QUALIFY row_number() OVER (ORDER BY {id_col}) <= {cells}
        )""",
        f"""__casg AS MATERIALIZED (
            SELECT e.{id_col}, c.cell, c.ccent, e.{vec_col}
            FROM {from_table} e CROSS JOIN __cc c
            QUALIFY row_number() OVER (
                PARTITION BY e.{id_col} ORDER BY {cdist}, c.cell) = 1
        )""",
        # residual as float: exact — both terms are integers over
        # QUANT, so /QUANT then the shared round(×QUANT) round-trips
        f"""__res AS MATERIALIZED (
            SELECT {id_col}, cell,
                   list_transform(range(1, {dim} + 1), i ->
                       (cast(round(cast({vec_col}[i] AS double)
                            * {QUANT}) AS bigint) - ccent[i])
                       / cast({QUANT} AS double)) AS rv
            FROM __casg
        )""",
    ]
    if train_where:
        ctes.append(
            f"""__res_tr AS MATERIALIZED (
                SELECT * FROM __res WHERE {train_where}
            )"""
        )
    for b in range(blocks):
        lo, hi = b * sub + 1, (b + 1) * sub
        ctes.append(
            f"""__pqs{b} AS MATERIALIZED (
                SELECT {id_col}, rv[{lo}:{hi}] AS sv FROM {res_src}
            )"""
        )
        km = kmeans_sql(
            f"__pqs{b}", id_col, "sv", dim=sub, k=codes, iters=iters,
            final="cents",
        )
        ctes.append(
            f"""__pqcb{b} AS MATERIALIZED (
                SELECT {b} AS block, c, centroid FROM ({km})
            )"""
        )
    cb_union = " UNION ALL ".join(
        f"SELECT * FROM __pqcb{b}" for b in range(blocks)
    )
    ctes.append(f"__pqcb AS MATERIALIZED ({cb_union})")
    sv_union = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS block, "
        f"rv[{b * sub + 1}:{(b + 1) * sub}] AS sv FROM __res"
        for b in range(blocks)
    )
    ctes.append(f"__pqsv AS MATERIALIZED ({sv_union})")
    dist = qdist2_int_sql("e.sv", "c.centroid")
    ctes.append(
        f"""__pqcode AS MATERIALIZED (
            SELECT e.{id_col}, e.block, c.c AS code
            FROM __pqsv e JOIN __pqcb c USING (block)
            QUALIFY row_number() OVER (
                PARTITION BY e.{id_col}, e.block
                ORDER BY {dist}, c.c) = 1
        )"""
    )
    # the query's residual w.r.t. EVERY cell (cells rows), sliced to
    # per-block subvectors → the (cell, block, code) → d lookup table
    ctes.append(
        f"""__qrow AS MATERIALIZED (
            SELECT {qv.format(v=vec_col)} AS qq
            FROM {from_table} ORDER BY {id_col} LIMIT 1
        )""",
    )
    ctes.append(
        f"""__qres AS MATERIALIZED (
            SELECT c.cell,
                   list_transform(range(1, {dim} + 1), i ->
                       (q.qq[i] - c.ccent[i])
                       / cast({QUANT} AS double)) AS rv
            FROM __cc c CROSS JOIN __qrow q
        )""",
    )
    if nprobe is not None:
        pdist = (f"list_sum(list_transform(range(1, {dim} + 1), i -> "
                 "(q.qq[i] - c.ccent[i]) * (q.qq[i] - c.ccent[i])))")
        ctes.append(f"""__probe AS MATERIALIZED (
            SELECT c.cell FROM __cc c CROSS JOIN __qrow q
            ORDER BY {pdist} ASC, c.cell ASC
            LIMIT {nprobe}
        )""")
    qsv_union = " UNION ALL ".join(
        f"SELECT cell, {b} AS block, "
        f"rv[{b * sub + 1}:{(b + 1) * sub}] AS sv FROM __qres"
        for b in range(blocks)
    )
    ctes.append(f"__qsv AS MATERIALIZED ({qsv_union})")
    qdist = qdist2_int_sql("q.sv", "c.centroid")
    ctes.append(
        f"""__pqd AS MATERIALIZED (
            SELECT q.cell, c.block, c.c AS code, {qdist} AS d
            FROM __pqcb c JOIN __qsv q USING (block)
        )"""
    )
    ctes.append(
        f"""__adc AS MATERIALIZED (
            SELECT e.{id_col}, a.cell,
                   cast(sum(d.d) AS bigint) AS adc_dist2
            FROM __pqcode e
            JOIN __casg a USING ({id_col})
            {"JOIN __probe p ON a.cell = p.cell"
             if nprobe is not None else ""}
            JOIN __pqd d ON a.cell = d.cell AND e.block = d.block
                         AND e.code = d.code
            GROUP BY 1, 2
            ORDER BY adc_dist2 ASC, {id_col} ASC
            LIMIT {refine}
        )"""
    )
    rr = qdist2_raw_sql(f"e.{vec_col}", "q.qv2")
    return f"""
    WITH {', '.join(ctes)}
    SELECT a.{id_col}, {rr} AS dist2
    FROM __adc a
    JOIN {from_table} e USING ({id_col})
    CROSS JOIN (SELECT {vec_col} AS qv2 FROM {from_table}
                ORDER BY {id_col} LIMIT 1) q
    ORDER BY dist2 ASC, a.{id_col} ASC
    LIMIT {k}
    """


def qdist2_raw_sql(a: str, b: str) -> str:
    """Exact integer squared distance between two RAW float vectors
    (both sides quantized in-expression) — DuckDB twin of
    ``qdist2_q(_qlist(a), _qlist(b))``."""
    qa = f"cast(round(cast({a}[i] AS double) * {QUANT}) AS bigint)"
    qb = f"cast(round(cast({b}[i] AS double) * {QUANT}) AS bigint)"
    return (
        f"cast(list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"({qa} - {qb}) * ({qa} - {qb}))) AS bigint)"
    )


def pq_adc_rerank_topk_sql(
    from_table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    blocks: int = 8,
    codes: int = 16,
    iters: int = 1,
    refine: int = 100,
    k: int = 10,
    train_where: str | None = None,
) -> str:
    """DuckDB twin of flat-PQ ADC + exact re-rank (the FAISS
    ``IndexPQ`` + ``IndexRefineFlat`` composition): the plain ADC
    top-``refine`` shortlist (``pq_adc_topk_sql`` verbatim, as a
    subquery), then an exact quantized-L2 re-rank of those ``refine``
    rows against the raw query vector, final top-``k`` by
    (dist2 asc, id asc). ``train_where`` as in ``pq_adc_topk_sql``."""
    inner = pq_adc_topk_sql(
        from_table, id_col, vec_col, dim,
        blocks=blocks, codes=codes, iters=iters, k=refine,
        train_where=train_where,
    )
    rr = qdist2_raw_sql(f"e.{vec_col}", "q.qv2")
    return f"""
    SELECT s.{id_col}, {rr} AS dist2
    FROM ({inner}) s
    JOIN {from_table} e USING ({id_col})
    CROSS JOIN (SELECT {vec_col} AS qv2 FROM {from_table}
                ORDER BY {id_col} LIMIT 1) q
    ORDER BY dist2 ASC, s.{id_col} ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# scalar quantization (SQ8): per-dimension linear 8-bit codes


def sq8_dequant(
    e: DataFrame, id_col: str, vec_col: str, dim: int
) -> tuple[DataFrame, DataFrame]:
    """Scalar 8-bit quantization (the FAISS SQ8 rung — the cheap
    compression step BEFORE PQ is worth its training): per-dimension
    [min, max] over the corpus maps each component to an integer code
    0..255, and distances are computed on the DEQUANTIZED integers
    ``lo + (code·(hi−lo)) div 255`` — all integer arithmetic over the
    shared fixed-point quantizer, so the DuckDB twin reproduces every
    code and distance bit-for-bit.

    Returns (dequantized per-dim rows ``(id, d, dq)``, the 
    ``(d, lo, hi)`` stats table). Scale shape: training is ONE
    map-side-combined agg over n·dim exploded rows to a dim-row
    stats table (broadcast); encode/dequant is a broadcast join —
    no shuffle beyond the final per-id aggregate the caller adds.
    Compression: 8 bits/dim vs 64-bit fixed point — the 8× memory
    rung that makes brute-force scans over RAM-resident shards
    feasible before any IVF structure."""
    dims = e.select(
        F.col(id_col),
        F.posexplode(_qlist(F.col(vec_col))).alias("__d", "__x"),
    )
    stats = dims.groupBy("__d").agg(
        F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
    )
    # integer div end to end: float division + cast would truncate a
    # rounding-error float and diverge from the twin's `//`
    dq_expr = (
        "__lo + ((((__x - __lo) * 255) div greatest(__hi - __lo, 1)) "
        "* (__hi - __lo)) div 255"
    )
    dq = dims.join(F.broadcast(stats), "__d").select(
        id_col,
        "__d",
        F.expr(dq_expr).cast("long").alias("__dq"),
    )
    return dq, stats


def sq8_dequant_sql(
    from_table: str, id_col: str, vec_col: str, dim: int
) -> str:
    """DuckDB CTE chain ending in ``__sqdq(id, d, dq)`` — the twin of
    ``sq8_dequant`` (identical integer codes and dequantized
    values)."""
    qv = (
        f"list_transform(range(1, {dim} + 1), i -> "
        f"cast(round(cast({vec_col}[i] AS double) * {QUANT}) AS bigint))"
    )
    return f"""__sqv AS MATERIALIZED (
        SELECT {id_col}, {qv} AS v FROM {from_table}
    ),
    __sqd AS MATERIALIZED (
        SELECT {id_col}, i AS d, v[i] AS x
        FROM __sqv CROSS JOIN range(1, {dim} + 1) t(i)
    ),
    __sqstats AS MATERIALIZED (
        SELECT d, min(x) AS lo, max(x) AS hi FROM __sqd GROUP BY 1
    ),
    __sqdq AS MATERIALIZED (
        SELECT e.{id_col}, e.d,
               s.lo + (((e.x - s.lo) * 255 // greatest(s.hi - s.lo, 1))
                       * (s.hi - s.lo)) // 255 AS dq
        FROM __sqd e JOIN __sqstats s USING (d)
    )"""
