"""Physical-plan regression guards: the properties that make these
queries scale (verified once with .explain, pinned here so a future
refactor can't silently lose them)."""

from __future__ import annotations

import pytest

from dbt_tpcdi_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_queries()[name].build(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    # date predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused columns never leave the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    # two-phase aggregation (map-side partial)
    assert plan.count("HashAggregate") >= 2


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least
    # no sort-merge join should be needed at this shape
    assert "SortMergeJoin" not in plan


def test_temporal_join_no_fact_shuffle(spark):
    plan = _plan(spark, "temporal_join_agg")
    # the version-windowed dim broadcasts; the fact side streams
    assert "BroadcastHashJoin" in plan
    # the only hashpartitioning exchanges allowed: dim window + final agg
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_scd2_single_window_exchange(spark):
    plan = _plan(spark, "scd2_versions")
    # both SCD2 columns must reuse ONE shuffle on the entity key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ann_topk_is_scan_plus_topk(spark):
    plan = _plan(spark, "ann_topk")
    # the query vector joins via broadcast; no shuffle of embeddings
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "ngram_jaccard_pairs"])
def test_dedup_no_cartesian(spark, name):
    # candidate generation must go through equi-joins (band hash /
    # block+key), never a cartesian product
    assert "CartesianProduct" not in _plan(spark, name)


@pytest.mark.parametrize(
    "name", ["top_revenue_orders", "ann_topk", "ann_lsh_topk", "ann_ivf_topk"]
)
def test_global_topk_is_take_ordered(spark, name):
    # global top-k must plan as TakeOrderedAndProject (per-partition
    # partial top-k, driver merges k rows) — NEVER a partition-less
    # window that funnels every row through one task
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan, plan


def _partitionless_windows(df) -> list[str]:
    """Walk the optimized logical plan; return Window nodes whose
    partition spec is empty (the 'Moving all data to a single
    partition' pattern)."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out.append(node.simpleStringWithNodeId())
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    return out


def test_no_global_window_anywhere(spark):
    # a Window with an empty partition spec single-partitions the input;
    # banned across the entire registered query surface
    offenders = {}
    for name, q in all_queries().items():
        bad = _partitionless_windows(q.build(spark, SF_SMOKE))
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_pii_redaction_stays_in_codegen(spark):
    plan = _plan(spark, "pii_redaction")
    # redaction is a pure expression chain: no Python evaluation, no
    # shuffle — one codegen'd scan+project
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    assert "*(1) Project" in plan  # whole-stage-codegen'd projection


def test_embedding_codecs_projection_only(spark):
    plan = _plan(spark, "embedding_codecs")
    assert "Exchange" not in plan  # per-row codecs never shuffle
    assert "BatchEvalPython" not in plan


def test_kmeans_literal_assignment_is_joinless(spark):
    # small-k path: centroids enter the plan as literals (driver
    # state, MLlib-style) — no join, zero exchanges, pure projection
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.similarity import kmeans_quantized
    from dbt_tpcdi_spark.sources.parquet import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    out = kmeans_quantized(e, "vec_id", "embedding", k=4, iters=1,
                           assign_mode="literal")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_kmeans_blas_assignment_plan(spark):
    # registered kmeans_clusters (k=64) runs the cogrouped Arrow
    # assignment (vectorized argmin — the n·k·dim hot loop); the
    # centroid table reaches every bucket via a range crossJoin of
    # metadata rows (planned as a broadcast fan-out), never a
    # CartesianProduct over data
    plan = _plan(spark, "kmeans_clusters")
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_broadcast_assignment_scales_in_k(spark):
    # the pure-JVM fallback path: k-row broadcast fan-out
    # (BroadcastNestedLoopJoin over the centroid table — NOT a
    # CartesianProduct), collapsed by a partial-aggregating
    # min(struct) before the one row-per-input exchange
    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.sources.parquet import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    out = S.kmeans_quantized(
        e, "vec_id", "embedding", k=64, iters=1, assign_mode="broadcast"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_min(struct(d," in plan, plan


def test_centroid_lifecycle_no_driver_collect():
    # the k-scale contract: at SemDedup's k = n/width any O(k) driver
    # materialization is corpus-linear, so the table-lifecycle path —
    # seeding, both scale assignment modes, IVF assignment, the Lloyd
    # loop, and the registered kmeans/semdedup queries — must never
    # .collect() (the one remaining collect lives in the literal-mode
    # helper, gated to k ≤ LITERAL_ASSIGN_MAX_K)
    import inspect

    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.queries import llm

    for fn in (
        S.seed_centroid_table,
        S.assign_centroids_bcast,
        S.assign_centroids_blas,
        S.assign_ivf,
        S.quantized_centroids,
        S.kmeans_quantized,
        S._kmeans_table,
        S.kmeans_centroid_table,
        S.pq_codebooks,
        S.pq_encode,
        S.pq_query_subvectors,
    ):
        assert ".collect(" not in inspect.getsource(fn), fn.__name__
    for qname in ("kmeans_clusters", "kmeans_assign_ivf", "semdedup",
                  "semdedup_ivf", "pq_ann_topk"):
        src = inspect.getsource(all_queries()[qname].build)
        assert ".collect(" not in src, qname


def test_dedup_clusters_no_cartesian_no_global_sort(spark):
    import re

    plan = _plan(spark, "dedup_clusters")
    assert "CartesianProduct" not in plan
    # star-contraction never sorts globally (the scale-killer pattern
    # the round-1 review flagged elsewhere); per-partition sorts
    # (SMJ locals — "..., false") are fine
    assert not re.search(r"Sort \[[^\]]*\], true", plan), plan


def test_temporal_join_binned_avoids_broadcast_nested_loop(spark):
    # the non-broadcast interval-join path must be an equi-join on
    # (key, bin) — never a nested-loop/cartesian over the dim
    plan = _plan(spark, "temporal_join_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_eval_set_broadcasts(spark):
    # the eval-side n-gram set must broadcast: corpus grams stream
    # through a broadcast hash join, never a sort-merge shuffle
    plan = _plan(spark, "contamination_check")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    "name", ["record_linkage", "semdedup", "gopher_repetition"]
)
def test_new_pair_ops_no_cartesian(spark, name):
    # blocked/clustered pair generation is always an equi-join on the
    # block key — a cartesian product would be the n^2 scale-killer
    assert "CartesianProduct" not in _plan(spark, name)


def test_quantile_gate_approx_has_no_per_group_row_sort(spark):
    # the scale-safe gate must not rank the data rows: no percent_rank
    # window anywhere, and the scored rows reach the filter through a
    # broadcast of the metadata-sized threshold table. (The only sort
    # allowed is the cumulative window over the per-(lang, score)
    # HISTOGRAM — aggregate output, bounded by score cardinality.)
    for name in ("quantile_filter_approx", "curation_pipeline_approx"):
        plan = _plan(spark, name)
        assert "percent_rank" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_semdedup_pair_space_is_linear_in_n(spark):
    # the corpus-derived k (= ⌈n/width⌉) must keep the within-cluster
    # pair count O(n·width) — the bound that makes SemDedup linear at
    # 100 TB. 4× slack over perfectly balanced clusters allows k-means
    # imbalance without letting a degenerate one-big-cluster (O(n²))
    # assignment through.
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.queries.llm import _SEMDEDUP_WIDTH
    from dbt_tpcdi_spark.sources.parquet import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    k = -(-n // _SEMDEDUP_WIDTH)
    km = S.kmeans_quantized(e, "vec_id", "embedding", k=k, iters=3)
    pairs = (
        km.groupBy("cluster")
        .agg(F.count("*").alias("sz"))
        .agg(F.sum(F.expr("sz * (sz - 1) div 2")).alias("p"))
        .collect()[0]["p"]
    )
    assert pairs <= 4 * n * _SEMDEDUP_WIDTH, (pairs, n)


def test_mixture_sample_sizing_broadcasts(spark):
    # the per-source k table is metadata-sized and must broadcast back
    # onto the ranked rows
    plan = _plan(spark, "mixture_sample")
    assert "BroadcastHashJoin" in plan, plan


def test_anomaly_zscore_no_sort(spark):
    # the 2-sigma gate is groupBy + equi-join + groupBy: no window,
    # no per-user sort anywhere in the plan
    plan = _plan(spark, "anomaly_zscore")
    assert "Window" not in plan
    assert "Sort " not in plan and "SortExec" not in plan, plan


def test_ewma_single_window_pass(spark):
    # all 8 lag() offsets must share ONE WindowExec (one sort per
    # user), not one window per term
    plan = _plan(spark, "ewma_trailing")
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, plan


def test_rrf_no_cartesian_no_corpus_window(spark):
    # both branches reduce via TakeOrderedAndProject before ranking;
    # ranks come from a bounded sorted-array posexplode, so no Window
    # node exists at all
    plan = _plan(spark, "rrf_hybrid_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan, plan


def test_passage_excise_linear_shape(spark):
    # owner resolution + join back are hash-keyed; no pairwise work
    plan = _plan(spark, "passage_excise")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_cap_twopass_equals_exact_and_prunes(spark):
    # at sf0.1 each source has ~250 docs vs cap 15: the bucket
    # prefilter must actually shrink the window input, and the result
    # must still be bit-identical to the whole-source rank
    sf = "/root/testdata/sf0.1"
    exact = all_queries()["source_cap_sample"].build(spark, sf)
    two = all_queries()["source_cap_sample_twopass"].build(spark, sf)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, two.collect())
    )
    from dbt_tpcdi_spark.queries.llm import (
        _CAP_BUCKETS, _CAP_PER_SOURCE, _CAP_SALT,
    )
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.sources.parquet import load_table

    d = load_table(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("__n"))
    thr = counts.withColumn(
        "__thr",
        F.least(
            F.lit(_CAP_BUCKETS).cast("long"),
            F.expr(
                f"({4 * _CAP_PER_SOURCE * _CAP_BUCKETS} + __n - 1) div __n"
            ),
        ),
    )
    h = F.md5(F.concat(F.lit(_CAP_SALT), F.col("doc_id").cast("string")))
    bucket = F.conv(F.substring(h, 1, 5), 16, 10).cast("long")
    survivors = d.join(F.broadcast(thr), "source").filter(
        bucket * _CAP_BUCKETS < F.col("__thr") * F.lit(1 << 20)
    )
    n_total, n_surv = d.count(), survivors.count()
    assert n_surv < n_total / 2, (n_surv, n_total)  # prefilter is active
    # and still enough headroom for the exact cap everywhere
    per_src = survivors.groupBy("source").count()
    assert per_src.agg(F.min("count")).first()[0] >= _CAP_PER_SOURCE


def test_pq_ann_plan_no_cartesian(spark):
    # PQ pipeline: 8 codebook trainings + encode + ADC — every join is
    # a broadcast fan-out or equi-join; nothing degenerates to a
    # CartesianProduct over data
    plan = _plan(spark, "pq_ann_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ann_recall_plan_no_cartesian(spark):
    plan = _plan(spark, "ann_recall")
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_ann_plan_no_cartesian_no_collect(spark):
    # residual IVFADC: coarse assign + 8 residual codebook trainings +
    # encode + per-cell ADC + exact refine — the crossJoins are
    # ≤cells-row metadata broadcasts, never a data cartesian
    plan = _plan(spark, "ivfpq_ann_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    import inspect

    from dbt_tpcdi_spark.queries import llm

    assert ".collect(" not in inspect.getsource(llm.ivfpq_ann_topk_frame)


def test_exact_substring_excise_plan_linear(spark):
    import re

    # gram explode → owner agg → equi-join → per-doc window → filter
    # projection: no cartesian, no global sort (per-doc windows only)
    plan = _plan(spark, "exact_substring_excise")
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"Sort \[[^\]]*\], true", plan), plan


def test_heavy_hitters_plan_one_final_scan_no_vocab_shuffle(spark):
    """Final plan reads the corpus ONCE (the MG summary pass already
    ran at build via localCheckpoint); candidates arrive broadcast, so
    the only hashpartitioning exchange is the candidate-bounded
    recount — never a vocabulary-wide groupBy feeding a sort."""
    plan = _plan(spark, "heavy_hitters")
    assert plan.count("Scan parquet") == 1, plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_collocation_plan_topk_and_no_cartesian(spark):
    plan = _plan(spark, "collocation_pmi")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_plan_keyed_window_no_global_sort(spark):
    plan = _plan(spark, "hard_negatives")
    assert "CartesianProduct" not in plan
    # the top-k is a keyed window: its sort is local (within the
    # q_id hash partitions), never a rangepartitioning global sort
    assert "Window" in plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_leakage_safe_split_adds_no_pair_work_beyond_dedup(spark):
    plan = _plan(spark, "leakage_safe_split")
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_filter_plus_scalar_broadcast(spark):
    """The kept set is decided by a pure filter against a broadcast
    1-row total: no sort, no window, no per-group state."""
    plan = _plan(spark, "weighted_sample")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    assert "SortMergeJoin" not in plan


def test_lsh_capped_lineage_structurally_shared(spark):
    """VERDICT r9 item 3 (updated for the r14 pair expansion): the
    capped-LSH kept set is persisted, so the signature explode +
    ranked guard execute once per cache fill STRUCTURALLY — the final
    plan reads the kept set from an InMemoryTableScan and the only
    Generate above the cache boundary is the bounded PAIR-STRUCT
    explode (≤ C(cap,2) per bucket), never the band-hash explode
    (``__bh``) re-deriving signatures. The pair multiset itself is
    pinned equal to the r13 self-join's in
    test_operators.test_capped_pair_expansion_equals_self_join."""
    from dbt_tpcdi_spark.operators import dedup as D

    rows = [(i, "the quick brown fox shared nav footer text")
            for i in range(60)]
    rows += [(1000 + i, f"unique doc {i} alpha beta") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash_signature(d, "text")
    pairs = D.lsh_candidate_pairs_capped(sigs, "doc_id", cap=8,
                                         distinct=False)
    pairs.collect()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    top = plan.split("InMemoryRelation", 1)[0]
    assert "InMemoryTableScan" in top, top
    assert "__bh" not in top, top
    assert "collect_list" in top, top
    D.release_lsh_caches(pairs)


def test_kmv_serving_plan_has_no_shuffle_join(spark):
    """VERDICT r9 item 9: the sketch-only KMV overlap SERVING plan
    must never self-join the shingle table — in fact it contains NO
    shuffle join at all (the only join is the broadcast source-list
    fan-out), so pair estimation is metadata work at any corpus
    size. The audited twin keeps the exact recount for the gate."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import text as X
    from dbt_tpcdi_spark.queries.llm import kmv_overlap_estimates

    d = spark.createDataFrame(
        [(i, f"src{i % 3}", f"alpha beta gamma delta {i} {i*7}")
         for i in range(60)],
        "doc_id bigint, source string, text string",
    ).withColumn("__tk", X.tokens(F.col("text")))
    est = kmv_overlap_estimates(d)
    est.collect()
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert est.columns == [
        "source_a", "source_b", "k_eff", "kmv_jaccard_pm"]


def test_rolling_extremes_default_skew_safe_shape(spark):
    """The DEFAULT rolling-extremes plan (r12: skew_safe became the
    default, VERDICT r11 item 2) is the two-block decomposition with
    hot-key-parallel evaluation. Pinned properties:

    - the ONLY joins are the construction's own equi-joins (offset
      broadcast + suffix fetch on ``rn − preceding``, visible as
      ``__rn_r``) — a J8 frame-rescan self-join regression would show
      up as a value-equality join WITHOUT ``__rn_r`` lineage, a
      BroadcastNestedLoopJoin, or a CartesianProduct;
    - no Window partitions by the bare entity key (no per-key serial
      task under a hot key);
    - the construction's shared subtrees are CACHED: the
      range-partitioned `part` feeds both the offsets aggregate and
      the main path from one execution (repartitionByRange samples
      boundaries per-execution — two executions can disagree on
      __pid, which corrupted global row numbers at the 5M-row dagbig
      probe until r12 pinned it), and the windowed `out` feeds both
      suffix-join sides. Multiple InMemoryTableScans prove the
      cache-backed single-execution structure."""
    plan = _plan(spark, "rolling_extremes")
    assert "__rn_r" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "InMemoryRelation" in plan, plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "__pid" in ln or "__blk" in ln, ln


def test_curation_approx_single_scored_execution(spark):
    """VERDICT r10 item 2: curation_pipeline_approx's returned plan
    must consume the scored subtree exactly ONCE — the per-group
    threshold is resolved eagerly at build and embedded as a literal
    broadcast (LocalTableScan), so re-executing the result (e.g.
    after clearCache) recomputes the text-feature lineage once, never
    twice. r10's plan re-ran the whole lineage per consumer: trials
    rose [1.9, 4.7, 4.5] instead of staying flat."""
    plan = _plan(spark, "curation_pipeline_approx")
    # the scored subtree appears as exactly ONE cached consumer (the
    # quality filter); nothing else in the result plan re-derives it
    assert plan.count("InMemoryTableScan") == 1, plan
    # the threshold side is a driver literal (createDataFrame), not a
    # recomputation of the scored lineage
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    # no trace of the threshold derivation (histogram cumsum) or the
    # exact gate's sort rank in the result plan
    assert "__cum" not in plan, plan
    assert "percent_rank" not in plan, plan
    # and the r10 regression shape is gone: no join-back of repetition
    # features (one documents scan per execution). clearCache first:
    # the approx build's persist would otherwise substitute its
    # InMemoryRelation into the exact plan's matching subtree
    spark.catalog.clearCache()
    exact = _plan(spark, "curation_pipeline")
    assert "percent_rank" in exact  # exact keeps rank semantics
    assert exact.count("Scan parquet") == 1, exact


def test_quantile_sketch_serving_single_scan(spark):
    """The serving plan reads orders ONCE (the audited twin's
    full-table rank recount is gate-only): one parquet scan, no
    shuffle join — the 6-row probe table joins broadcast."""
    plan = _plan(spark, "quantile_sketch_serving")
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


def test_token_budget_prefilter_prunes_and_stays_exact(spark):
    """At sf0.1 each source carries ~20k tokens vs budget 800: the
    bucket prefilter must shrink the window input, and the output must
    equal the whole-source cumulative rule (the no-prefilter twin)."""
    sf = "/root/testdata/sf0.1"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import text as X
    from dbt_tpcdi_spark.queries.corpus import _TB_BUDGET, _TB_SALT
    from dbt_tpcdi_spark.sources.parquet import load_table

    two = all_queries()["token_budget_sample"].build(spark, sf)
    d = load_table(spark, sf, "documents").select(
        "doc_id", "source",
        X.token_count(F.col("text")).cast("long").alias("w_tokens"),
    )
    h = F.md5(
        F.concat(F.lit(_TB_SALT), F.col("doc_id").cast("string"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy(h, F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exact = d.select(
        "doc_id", "source", "w_tokens",
        F.sum("w_tokens").over(w).cast("long").alias("cum_tokens"),
    ).filter(F.col("cum_tokens") <= _TB_BUDGET)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, two.collect())
    )
    # the prefilter is structurally part of the query plan: count the
    # window's input via the survivor predicate re-derivation
    totals = d.groupBy("source").agg(F.sum("w_tokens").alias("__W"))
    bits = 1 << 20
    bucket = F.conv(F.substring(h, 1, 5), 16, 10).cast("long")
    surv = d.join(F.broadcast(totals), "source").filter(
        bucket < F.least(
            F.lit(bits).cast("long"),
            F.expr(f"({4 * _TB_BUDGET * bits} + __W - 1) div __W"),
        )
    )
    n_total, n_surv = d.count(), surv.count()
    assert n_surv < n_total / 2, (n_surv, n_total)


@pytest.mark.parametrize("name", ["wordpiece_encode", "unigram_encode"])
def test_tokenizer_corpus_scans_bounded(spark, name):
    """The word table is checkpointed, so the corpus is tokenized at
    most twice per query (word-count pass + doc-reassembly pass) —
    without the checkpoint each of the three word-table consumers
    replayed the scan. Encode output joins broadcast; never a
    corpus-shuffling SortMergeJoin."""
    df = all_queries()[name].build(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_epoch_mix_zero_shuffle(spark):
    """Epoch replication must stay a scan-stage projection: explode
    directly above the file scan, no Exchange anywhere."""
    plan = _plan(spark, "epoch_mix_sample")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the explode fan-out
    assert "BatchScan" in plan or "FileScan" in plan


def test_pack_bins_one_exchange_one_arrow_seam(spark):
    """No-split packing: exactly one hash-partition shuffle (shard
    co-location) feeding the single Arrow group pass — and nothing
    Python upstream of it."""
    plan = _plan(spark, "pack_bins")
    assert plan.count("Exchange") == 1, plan
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_bloom_prune_join_injects_runtime_filter(spark):
    """The gate's own assert is the pin: building it must not raise —
    InjectRuntimeFilter fired with the confs the query scopes."""
    df = all_queries()["bloom_prune_join"].build(spark, SF_SMOKE)
    assert df.count() > 0
    # confs restored after the build
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold"
    ) != "0"


def test_finwire_pyds_partition_per_file(spark):
    """The Python DataSource plans one input partition per file of the
    drop (here: 1 file -> 1 partition) and the scan node is the
    python-source seam."""
    from dbt_tpcdi_spark.sources.pyds import (
        FinwireReader,
        register_finwire_source,
    )
    from dbt_tpcdi_spark.queries.tpcdi_gate import _fixture_root

    root = _fixture_root()
    reader = FinwireReader({"path": str(root / "raw" / "FINWIRE*")})
    parts = reader.partitions()
    assert len(parts) == 1  # one quarterly file in the fixture drop
    register_finwire_source(spark)
    df = spark.read.format("finwire").load(
        str(root / "raw" / "FINWIRE2017Q1"))
    assert df.rdd.getNumPartitions() == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonDataSource" in plan or "BatchScan" in plan, plan
