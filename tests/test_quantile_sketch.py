"""Quantile-sketch operator properties: mergeability (bottom-k of a
union == bottom-k of concatenated shard sketches), bounded size, and
estimate determinism. The accuracy contract (DKW bound) is pinned by
the ``quantile_sketch`` oracle query's ``within_dkw`` audit column."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators import frequent as FQ
from tests.conftest import SF_SMOKE


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5) AS bigint)")
        .alias("v"),
    )


def test_sketch_is_mergeable(spark):
    o = _orders(spark)
    full = FQ.qs_sketch(o, "o_orderkey", "v")
    shards = [
        FQ.qs_sketch(o.filter(F.col("o_orderkey") % 3 == i),
                     "o_orderkey", "v")
        for i in range(3)
    ]
    merged_input = shards[0].unionByName(shards[1]).unionByName(
        shards[2]
    )
    # bottom-k over the concatenated shard sketches == sketch of the
    # union (the property that makes shard-at-a-time corpus passes
    # combinable without revisiting data)
    from pyspark.sql import Window

    k = FQ.QS_K
    direct = (
        merged_input.withColumn(
            "__rn", F.row_number().over(Window.orderBy("h"))
        )
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    a = sorted((r["h"], r["v"]) for r in full.collect())
    b = sorted((r["h"], r["v"]) for r in direct.collect())
    assert a == b
    assert len(a) <= k


def test_sketch_size_bounded(spark):
    o = _orders(spark)
    assert FQ.qs_sketch(o, "o_orderkey", "v").count() == min(
        FQ.QS_K, o.count()
    )


def test_estimates_monotone_in_q(spark):
    est = FQ.qs_estimates(
        FQ.qs_sketch(_orders(spark), "o_orderkey", "v")
    ).orderBy("q_pm").collect()
    vals = [r["est_v"] for r in est]
    assert vals == sorted(vals)
    assert len(est) == len(FQ.QS_Q_PM)


def test_grouped_sketch_sampling_branch_at_sf01(spark):
    """sf0.1 has 250 docs/source > k=64, so the grouped sketch's
    SAMPLING branch runs (smaller SFs are exhaustive); the oracle
    compare at sf0.1 plus the within_dkw audit pin it. Uses a FRESH
    DuckDB connection — registering an sf0.1 view on the shared
    session fixture would poison every later sf0.001 oracle test."""
    import duckdb

    from tests.conftest import assert_matches_oracle
    from dbt_tpcdi_spark.queries import all_queries

    sf = "/root/testdata/sf0.1"
    q = all_queries()["grouped_quantile_sketch"]
    df = q.build(spark, sf)
    rows = df.collect()
    assert rows and all(r["within_dkw"] for r in rows)
    assert all(r["n_sample"] == 64 for r in rows)  # truly sampled
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        assert_matches_oracle(df, con, q.oracle,
                              "grouped_quantile_sketch@sf0.1")
    finally:
        con.close()


def test_grouped_sketch_prefilter_prunes_and_stays_exact(spark):
    """On a group large enough to trigger the 20-bit hash prefilter
    (5000 rows vs k=64 → ~5% admitted), the sketch must equal the
    no-prefilter whole-group bottom-k and the survivor set must be
    a real reduction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.text import md5_60bit

    df = spark.range(5000).select(
        F.lit("g0").alias("src"),
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("val"),
    )
    sk = FQ.qs_sketch_grouped(df, "src", "k", "val", k=64)
    got = sorted(map(tuple, sk.collect()))
    th = df.select(
        F.lit("g0").alias("g"),
        md5_60bit(
            F.concat(F.lit(FQ.QS_SALT), F.col("k").cast("string"))
        ).alias("h"),
        F.col("val").alias("v"),
    )
    want = sorted(
        map(
            tuple,
            th.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("g").orderBy("h", "v")
                ),
            )
            .filter(F.col("__rn") <= 64)
            .drop("__rn")
            .collect(),
        )
    )
    assert got == want and len(got) == 64
    # the prefilter is active: ~4*64/5000 of the group survives
    thr = (4 * 64 * (1 << 20) + 4999) // 5000
    n_surv = th.filter(
        F.shiftright(F.col("h"), 40) < thr
    ).count()
    assert 64 <= n_surv < 1000, n_surv
