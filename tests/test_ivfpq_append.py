"""Incremental IVFPQ index maintenance (VERDICT r9 item 3): append
batches encode against FROZEN codebooks via O(batch) append commits;
compact(range_by=["cell"]) folds fragmentation and RESTORES skipping;
serve results are identical at every stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpcdi_spark.queries.llm import (
    _IVFPQ_CELLS,
    _IVFPQ_CODES,
    ivfpq_index_append,
    ivfpq_index_build,
    ivfpq_serve_topk,
)
from dbt_tpcdi_spark.sources.parquet import load_table, spread

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [(r["vec_id"], r["dist2"]) for r in df.collect()]


def test_append_lifecycle(spark, tmp_path):
    e = spread(load_table(spark, SF, "embeddings"))
    base = e.filter("vec_id % 3 <> 0")
    b1 = e.filter("vec_id % 3 = 0 AND vec_id % 2 = 0")
    b2 = e.filter("vec_id % 3 = 0 AND vec_id % 2 = 1")
    idx = ivfpq_index_build(
        base, str(tmp_path / "idx"), cells=_IVFPQ_CELLS, blocks=8,
        codes=_IVFPQ_CODES,
    )
    codes_t = idx["codes"]
    n_base = codes_t.read().count()

    v1 = ivfpq_index_append(idx, b1)
    v2 = ivfpq_index_append(idx, b2)
    assert v2 == v1 + 1
    # O(batch) commits: multi-directory snapshots, base dir untouched
    e2 = codes_t._entry(v2)
    assert "datas" in e2 and len(e2["datas"]) == 3
    n_all = codes_t.read().count()
    assert n_all == e.count() * 8  # one row per vector x block
    assert n_all > n_base

    # serve BEFORE compaction: appends inherit the codes table's
    # stats/bloom (r10, Delta per-add-action shape), so the fragmented
    # snapshot is still file-pruned — and still correct
    top_frag, rep_frag = ivfpq_serve_topk(e, idx, nprobe=4,
                                          refine=50, k=10)
    frag_rows = _rows(top_frag)
    assert rep_frag["files_read"] < rep_frag["files_total"], rep_frag
    ev2 = codes_t._entry(v2)
    assert ev2.get("stats") and ev2.get("bloom")
    assert any(k.startswith(ev2["datas"][-1]) for k in ev2["bloom"])

    # compact folds the appends AND restores the cell skipping that
    # the initial commit declared (stats + bloom re-derived)
    codes_t.compact(target_files=8, range_by=["cell"])
    entry = codes_t._entry(codes_t.latest_version())
    assert entry.get("stats") and entry.get("bloom")
    top, rep = ivfpq_serve_topk(e, idx, nprobe=4, refine=50, k=10)
    assert _rows(top) == frag_rows  # identical serve at every stage
    assert rep["files_read"] < rep["files_total"]

    # appended vectors are actually servable: every appended id is in
    # the codes table with a valid frozen-codebook cell
    cells = set(
        r["__cl"] for r in idx["cents"].read().select("__cl").collect()
    )
    app_cells = (
        codes_t.read().join(b1.select("vec_id"), "vec_id")
        .select("cell").distinct().collect()
    )
    assert app_cells and all(r["cell"] in cells for r in app_cells)


def test_append_then_compact_equals_fresh_encode(spark, tmp_path):
    """Rebuild-equivalence: an index appended in two batches serves
    the same top-k as encoding the full corpus in one pass against
    the same frozen training set (codebooks trained on `base` both
    ways — the FAISS add() contract)."""
    e = spread(load_table(spark, SF, "embeddings"))
    base = e.filter("vec_id % 4 <> 0")
    rest = e.filter("vec_id % 4 = 0")

    idx_a = ivfpq_index_build(
        base, str(tmp_path / "a"), cells=8, blocks=8, codes=8)
    ivfpq_index_append(idx_a, rest.filter("vec_id % 8 = 0"))
    ivfpq_index_append(idx_a, rest.filter("vec_id % 8 = 4"))
    idx_a["codes"].compact(target_files=4, range_by=["cell"])
    top_a, _ = ivfpq_serve_topk(e, idx_a, nprobe=3, refine=40, k=10)

    idx_b = ivfpq_index_build(
        base, str(tmp_path / "b"), cells=8, blocks=8, codes=8)
    ivfpq_index_append(idx_b, rest)  # one shot
    idx_b["codes"].compact(target_files=4, range_by=["cell"])
    top_b, _ = ivfpq_serve_topk(e, idx_b, nprobe=3, refine=40, k=10)
    assert _rows(top_a) == _rows(top_b)


def test_pq_encode_blas_equals_fanout(spark):
    """pq_encode_blas must be BIT-IDENTICAL to the broadcast fan-out
    pq_encode — codes AND distances — on inputs that exercise the
    risky corners: negative residual components (HALF_UP rounding is
    away from zero), exact distance ties (first-occurrence argmin must
    pick the smallest code label), and empty-bucket Arrow batches."""
    from dbt_tpcdi_spark.operators import similarity as S

    e = spread(load_table(spark, SF, "embeddings"))
    cents = S.seed_centroid_table(e, "vec_id", "embedding", 8)
    base = e.select(
        "vec_id", S._qlist(F.col("embedding")).alias("__qv"))
    asg = S.assign_centroids_blas(base, "vec_id", cents)
    resid = asg.join(
        F.broadcast(cents), asg["cluster"] == cents["__cl"]
    ).select(
        "vec_id",
        F.zip_with(
            F.col("__qv"), F.col("__cent"),
            lambda a, b: (a - b) / F.lit(10000.0),
        ).alias("__rv"),
    ).localCheckpoint(eager=True)
    cb = S.pq_codebooks(
        resid, "vec_id", "__rv", 64, blocks=8, codes=8,
        iters=1, assign_mode="blas",
    )
    ref = {
        (r["vec_id"], r["block"]): (r["code"], r["dist2"])
        for r in S.pq_encode(
            resid, "vec_id", "__rv", cb, 64, blocks=8).collect()
    }
    blas = {
        (r["vec_id"], r["block"]): (r["code"], r["dist2"])
        for r in S.pq_encode_blas(
            resid, "vec_id", "__rv", cb, 64, blocks=8).collect()
    }
    assert ref == blas
    # ties exist in real data rarely; force one synthetically: two
    # codewords at equal distance from a residual must pick the
    # SMALLER code in both paths
    rows = [(1, [0.5] * 64)]
    df = spark.createDataFrame(rows, "vec_id bigint, __rv array<double>")
    cb2 = spark.createDataFrame(
        [(b, c, [5000 + (1 if c == 0 else -1)] * 8)
         for b in range(8) for c in (0, 7)],
        "block int, __cl bigint, __cent array<bigint>",
    )
    r1 = {(r["block"], r["code"], r["dist2"]) for r in S.pq_encode(
        df, "vec_id", "__rv", cb2, 64, blocks=8).collect()}
    r2 = {(r["block"], r["code"], r["dist2"]) for r in S.pq_encode_blas(
        df, "vec_id", "__rv", cb2, 64, blocks=8).collect()}
    assert r1 == r2
    assert all(code == 0 for _b, code, _d in r1)
