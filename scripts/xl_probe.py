#!/usr/bin/env python
"""One-off ×1000 scale probe (r10): the linear-by-design dedup/ANN
rungs at a corpus one decade past the per-round bench ×100 point —
5 M documents / 2 M embedding vectors — re-measuring the ×100 walls in
the same session so the growth factors are apples-to-apples.

Pins: wall(×1000) ≤ 20 × wall(×100) for each rung (the same
subquadratic envelope the per-round bench uses between ×10 and ×100;
a quadratic op would grow ~100×). SemDedup runs the two-level sharded
variant with CONSTANT cell size (k_coarse = n/2000), which is the
production scaling rule — fixed k at 10× the corpus would inflate the
per-cell Gram quadratically by design, not by defect.

Writes BENCH_r{N}_xl.json (pass the round as argv[1], default r10).
Run manually; not part of the per-round bench (adds ~10 min of wall).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r10"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from dbt_tpcdi_spark import benchdata
    from dbt_tpcdi_spark.operators import dedup as D
    from dbt_tpcdi_spark.queries import all_queries
    from dbt_tpcdi_spark.queries.llm import (
        _LSH_BOILER,
        semdedup_sharded_frame,
    )
    from dbt_tpcdi_spark.session import get_spark
    from dbt_tpcdi_spark.sources.parquet import load_table, spread

    spark = get_spark("xl_probe")
    out: dict = {"metric": "xl_probe", "unit": "sec", "probes": {},
                 "checks": {}, "prep": {}}
    probes, checks, prep = out["probes"], out["checks"], out["prep"]

    dirs = {}
    for tag, copies in (("x100", 100), ("x1000", 1000)):
        t0 = time.perf_counter()
        dirs[tag] = benchdata.replicate_sf(
            spark, sf_dir,
            os.path.join("/tmp", "spark_graft_bench",
                         os.path.basename(sf_dir.rstrip("/"))
                         + f"_{tag}xl"),
            copies=copies,
            tables=("documents", "embeddings"),
        )
        prep[f"{tag}_replicate"] = round(time.perf_counter() - t0, 3)

    def timed_median3(name: str, build) -> None:
        for tag, d in dirs.items():
            df = build(d)
            trials = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                trials.append(round(time.perf_counter() - t0, 3))
            probes[f"{tag}:{name}"] = sorted(trials)[1]
            prep[f"{tag}_{name}_trials"] = trials
        checks[f"x1000_{name}_subquadratic"] = (
            probes[f"x1000:{name}"]
            <= 20.0 * max(probes[f"x100:{name}"], 0.5)
        )

    qs = all_queries()
    timed_median3("kmeans_assign_ivf",
                  lambda d: qs["kmeans_assign_ivf"].build(spark, d))
    timed_median3("pq_ann_topk",
                  lambda d: qs["pq_ann_topk"].build(spark, d))
    # tokenizer family at the decade rungs (r11): the DP/matcher runs
    # over the distinct-word table (constant under replication — which
    # is Heaps'-law reality), so growth must track the corpus joins
    timed_median3("wordpiece_encode",
                  lambda d: qs["wordpiece_encode"].build(spark, d))
    timed_median3("unigram_encode",
                  lambda d: qs["unigram_encode"].build(spark, d))
    # r12: epoch replication (zero-shuffle projection) and no-split
    # next-fit packing (one hash shuffle + per-shard Arrow scan —
    # shards hold ~250k rows at x1000, the fits-a-task contract)
    timed_median3("epoch_mix_sample",
                  lambda d: qs["epoch_mix_sample"].build(spark, d))
    timed_median3("pack_bins",
                  lambda d: qs["pack_bins"].build(spark, d))

    # two-level SemDedup at constant cell size (~2000 vectors/cell)
    def _sharded(d: str):
        e = spread(load_table(spark, d, "embeddings"))
        n = e.count()
        return semdedup_sharded_frame(e, max(n // 2000, 10))

    timed_median3("semdedup_sharded_constcell", _sharded)

    # capped LSH on the boilerplate-heavy corpus (hot buckets at any
    # scale); signature build included in the wall — it IS the linear
    # part
    for tag, d in dirs.items():
        docs = (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .select("doc_id", F.concat(
                F.col("text"), F.lit(" " + _LSH_BOILER)).alias("text"))
        )
        t0 = time.perf_counter()
        sigs = D.with_minhash_signature(docs, "text").persist()
        sigs.count()
        capped = D.lsh_candidate_pairs_capped(
            sigs, "doc_id", cap=8, distinct=False)
        n_cap = capped.count()
        probes[f"{tag}:lshcap"] = round(time.perf_counter() - t0, 3)
        prep[f"{tag}_lshcap_candidates"] = n_cap
        D.release_lsh_caches(capped)
        sigs.unpersist()
    checks["x1000_lshcap_subquadratic"] = (
        probes["x1000:lshcap"] <= 20.0 * max(probes["x100:lshcap"], 0.5))
    # candidates grow ~linearly with singleton buckets, never bucket²
    checks["x1000_lshcap_candidates_linear"] = (
        prep["x1000_lshcap_candidates"]
        <= 15 * max(prep["x100_lshcap_candidates"], 1))

    # persisted IVFPQ index at x1000 (VERDICT r10 item 6): 2M vectors
    # through build → pruned serve → 1% frozen-codebook append →
    # compact → pruned serve, with the same economics pins the
    # per-round bench holds at x100. Cell schedule is SUB-linear
    # (256 cells, ~7.8k vectors/cell vs 64/~3k at x100 — the √n-ish
    # rule real IVF deployments use): the coarse pass is Θ(n·cells),
    # so constant cell SIZE would grow it quadratically by design;
    # probing 26/256 cells keeps the same ~10% serve fraction.
    import uuid as _uuid

    from dbt_tpcdi_spark.functions.scalar import hash_sample
    from dbt_tpcdi_spark.queries.llm import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_serve_topk,
    )

    exl = spread(load_table(spark, dirs["x1000"], "embeddings"))
    idx_root = os.path.join(
        "/tmp", "spark_graft_bench", f"ivfpq_xl_{_uuid.uuid4().hex[:8]}")
    t0 = time.perf_counter()
    idx = ivfpq_index_build(
        exl, idx_root, cells=256, blocks=8, codes=64, files=64)
    probes["x1000:ivfpq_index_build"] = round(time.perf_counter() - t0, 3)
    # r12 (VERDICT r11 item 1): the persisted build trains quantizers
    # on the deterministic 25% hash-sample by default; the r11
    # full-corpus build was 290 s at this rung — the sampled build
    # must land at or under ~150 s with the same oracles green
    checks["x1000_ivfpq_build_sample_trained"] = (
        probes["x1000:ivfpq_index_build"] <= 150.0)
    t0 = time.perf_counter()
    top, rep = ivfpq_serve_topk(exl, idx, nprobe=26, refine=200, k=10)
    top.collect()
    probes["x1000:ivfpq_index_probe"] = round(time.perf_counter() - t0, 3)
    prep["x1000_ivfpq_files"] = rep
    checks["x1000_ivfpq_probe_pruned"] = (
        rep["files_read"] * 2 <= rep["files_total"])
    checks["x1000_ivfpq_probe_fast"] = (
        probes["x1000:ivfpq_index_probe"]
        <= 0.5 * probes["x1000:ivfpq_index_build"])
    batch = (
        exl.filter(hash_sample(F.col("vec_id"), 0.01, salt="ivfpqxl"))
        .withColumn("vec_id", F.col("vec_id") + F.lit(100_000_000))
    )
    t0 = time.perf_counter()
    ivfpq_index_append(idx, batch)
    probes["x1000:ivfpq_index_append"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    idx["codes"].compact(target_files=64, range_by=["cell"])
    probes["x1000:ivfpq_index_compact"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    top2, rep2 = ivfpq_serve_topk(exl, idx, nprobe=26, refine=200, k=10)
    top2.collect()
    probes["x1000:ivfpq_probe_after_append"] = round(
        time.perf_counter() - t0, 3)
    prep["x1000_ivfpq_append_files"] = rep2
    checks["x1000_ivfpq_append_obatch"] = (
        probes["x1000:ivfpq_index_append"]
        <= 0.1 * probes["x1000:ivfpq_index_build"])
    checks["x1000_ivfpq_append_probe_pruned"] = (
        rep2["files_read"] * 2 <= rep2["files_total"])

    # persisted BM25 index at x1000 (r13, VERDICT r12 item 3): the
    # lexical lifecycle at 5M docs with the postings layout scaled to
    # the corpus (files=64 — the same grow-with-data schedule as the
    # IVFPQ cells; 8 at x10, 32 at x100). Economics pins mirror the
    # IVFPQ x1000 rungs: Bloom-pruned serve well under build, O(batch)
    # append (structural: base dirs carried forward + one delta dir),
    # compact restores narrow pruning.
    from dbt_tpcdi_spark.queries.corpus import (
        _BM25_BASE_FRAC,
        _BM25_IDX_SALT,
        _BM25_IDX_TERMS,
        bm25_index_append,
        bm25_index_build,
        bm25_index_topk,
    )

    bdocs = spark.read.parquet(
        os.path.join(dirs["x1000"], "documents.parquet"))
    bbase = bdocs.filter(
        hash_sample(F.col("doc_id"), _BM25_BASE_FRAC, _BM25_IDX_SALT))
    bdelta = bdocs.filter(
        ~hash_sample(F.col("doc_id"), _BM25_BASE_FRAC, _BM25_IDX_SALT))
    bmroot = os.path.join(
        "/tmp", "spark_graft_bench", f"bm25_xl_{_uuid.uuid4().hex[:8]}")
    t0 = time.perf_counter()
    bidx = bm25_index_build(bbase, bmroot, files=64)
    probes["x1000:bm25_index_build"] = round(time.perf_counter() - t0, 3)
    pre_entry = bidx["post"]._entry(bidx["post"].latest_version())
    t0 = time.perf_counter()
    bm25_index_append(bidx, bdelta)
    probes["x1000:bm25_index_append"] = round(time.perf_counter() - t0, 3)
    post_entry = bidx["post"]._entry(bidx["post"].latest_version())
    pre_d, post_d = (set(pre_entry.get("datas", [])),
                     set(post_entry.get("datas", [])))
    checks["x1000_bm25_append_only_delta_dir"] = (
        pre_d <= post_d and len(post_d - pre_d) == 1)
    t0 = time.perf_counter()
    btop, brep = bm25_index_topk(bidx, _BM25_IDX_TERMS)
    btop.collect()
    probes["x1000:bm25_index_serve"] = round(time.perf_counter() - t0, 3)
    prep["x1000_bm25_prune"] = brep
    checks["x1000_bm25_serve_pruned"] = (
        brep["files_read"] * 2 <= brep["files_total"])
    checks["x1000_bm25_serve_fast"] = (
        probes["x1000:bm25_index_serve"]
        <= 0.5 * probes["x1000:bm25_index_build"])
    t0 = time.perf_counter()
    bidx["post"].compact(target_files=64, range_by=["w"])
    probes["x1000:bm25_index_compact"] = round(
        time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    btop2, brep2 = bm25_index_topk(bidx, _BM25_IDX_TERMS)
    btop2.collect()
    probes["x1000:bm25_serve_after_compact"] = round(
        time.perf_counter() - t0, 3)
    prep["x1000_bm25_prune_after_compact"] = brep2
    checks["x1000_bm25_compact_restores_pruning"] = (
        brep2["files_read"] * 2 <= brep2["files_total"]
        and brep2["files_read"] <= brep["files_read"])

    # embedding inference at the decade rungs (r13): the Arrow encoder
    # is a narrow map whose cost is O(tokens) with a bounded token
    # memo (replication keeps the vocabulary constant — Heaps'-law
    # reality), so growth must be ~linear in the corpus
    timed_median3("embed_inference",
                  lambda d: qs["embed_inference"].build(spark, d))

    payload = json.dumps(out)
    print(payload)
    with open(os.path.join(REPO, f"BENCH_{rnd}_xl.json"), "w") as f:
        f.write(payload + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
