"""Corpus-statistics operators: Misra–Gries guarantee mechanics,
weighted-sampling determinism, containment directionality. (Each
registered query's oracle equivalence is covered by
test_queries_oracle.py; these test the operator-level contracts the
oracle can't see.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpcdi_spark.functions.scalar import weighted_keep
from dbt_tpcdi_spark.operators import dedup as D
from dbt_tpcdi_spark.operators.frequent import mg_candidates, mg_reduce


def test_mg_reduce_bounds_survivors_and_undercount():
    counts = {f"t{i}": i + 1 for i in range(20)}  # 1..20, n = 210
    k = 5
    out = mg_reduce(dict(counts), k)
    assert len(out) <= k
    # survivors are the largest, undercounted by exactly the evicted
    # (k+1)-th largest value (= 15 here)
    assert out == {"t19": 5, "t18": 4, "t17": 3, "t16": 2, "t15": 1}
    # under capacity: untouched
    assert mg_reduce({"a": 1}, k) == {"a": 1}


def test_mg_candidates_keep_heavy_token_under_eviction(spark):
    # vocabulary (300) >> capacity (10), so eviction MUST trigger;
    # one token holds >1/3 of the stream and must survive it
    rows = [("heavy",)] * 600 + [(f"rare{i}",) for i in range(300)] * 4
    df = spark.createDataFrame(rows, "token string").repartition(4)
    cand = {r["token"] for r in mg_candidates(df, "token", 10).collect()}
    assert "heavy" in cand
    # candidate volume stays bounded by k per partition
    assert len(cand) <= 10 * 4


def test_weighted_keep_is_deterministic_and_monotone(spark):
    d = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    total = d.agg(F.sum("w")).first()[0]
    pred = weighted_keep(F.col("k"), F.col("w"), F.lit(total), 50, "s")
    kept = lambda df: sorted(r["k"] for r in df.filter(pred).collect())
    a = kept(d)
    b = kept(d.repartition(13))  # partitioning-independent
    assert a == b and len(a) > 0
    # zero weight is never kept; weight ≥ W/target is always kept
    z = spark.createDataFrame([(1, 0)], "k long, w long")
    assert z.filter(pred).count() == 0
    big = spark.createDataFrame([(1, 10**6)], "k long, w long")
    assert big.filter(pred).count() == 1


def test_containment_is_directional(spark):
    # b's text contains ALL of a's shingles plus more: containment
    # a→b = 1.0, b→a < threshold — only the subset direction fires
    a_text = "one two three four five"
    b_text = a_text + " six seven eight nine ten eleven twelve thirteen"
    df = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string"
    )
    rows = {
        (r["src"], r["dst"]): r["containment"]
        for r in D.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert rows == {(1, 2): 1.0}


def test_export_order_resume_equality_and_stability(spark, tmp_path):
    """The dataloader-order contract (r13): resuming from rank K reads
    EXACTLY the sequences after K in the global order, and the order
    is a pure function of the data — identical under any partitioning
    of the snapshot read."""
    from dbt_tpcdi_spark.plans.versioned import VersionedTable
    from dbt_tpcdi_spark.queries.corpus import (
        export_order_frame,
        export_order_read,
        training_export_frame,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    root = str(tmp_path / "corpus_v")
    d = load_table(spark, SF_SMOKE, "documents")
    training_export_frame(d, root)
    vt = VersionedTable(spark, root)

    def rows(df):
        return sorted(
            (r["ord_rank"], r["lang"], r["seq_id"], r["shard"],
             r["n_docs"], r["n_tokens"])
            for r in df.collect()
        )

    full = rows(export_order_read(vt, 0))
    # ord_rank is a dense 1..n permutation
    n = len(full)
    assert [r[0] for r in full] == list(range(1, n + 1))
    k = n // 3
    resumed = rows(export_order_read(vt, k))
    assert resumed == [r for r in full if r[0] > k]
    # hash-stability across partitionings: wildly repartitioned input,
    # identical order assignment on every row
    reparted = rows(export_order_frame(vt.read().repartition(13)))
    assert reparted == full
