"""Edge-case unit tests for the text/dedup/similarity operators."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators.dedup import jaccard_pairs_bitset, \
    jaccard_pairs_via_postings
from dbt_tpcdi_spark.operators.similarity import qcosine, qdot
from dbt_tpcdi_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    tokens,
)


def test_tokens_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("  a  b\tc ",)], "t string"
    )
    got = [
        (r.n, r.toks)
        for r in df.select(
            token_count(F.col("t")).alias("n"), tokens(F.col("t")).alias("toks")
        ).collect()
    ]
    assert got == [(0, []), (0, []), (1, ["one"]), (3, ["a", "b", "c"])]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO   world.",)],
        "t string",
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",),
         ("der hund und die katze nicht",),
         ("le chat et les chiens",),
         ("el perro y los gatos",)],
        "t string",
    )
    got = [r.l for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "es"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog",), ("!!! ??? ...",)],
        "text string",
    )
    rows = quality_features(df).collect()
    assert all(0.0 <= r.quality_score <= 1.0 for r in rows)
    assert rows[0].quality_score > rows[1].quality_score  # prose beats punct


def test_bitset_equals_postings(spark):
    """Both exact jaccard plans must agree on a corpus with duplicate
    texts, disjoint texts, and subset relationships."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),       # identical set → 1.0
            (3, "a b c d"),         # 4/5 = 0.8 vs 1,2
            (4, "x y z"),           # disjoint
            (5, "a b"),             # below threshold
        ],
        "doc_id long, text string",
    )
    via_bitset = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs_bitset(df, "doc_id", "text",
                                      threshold=0.8).collect()
    )
    via_postings = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs_via_postings(df, "doc_id", "text",
                                            threshold=0.8).collect()
    )
    assert via_bitset == via_postings == [
        (1, 2, 1.0), (1, 3, 0.8), (2, 3, 0.8),
    ]


def test_qdot_qcosine(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], "same"),
         ([1.0, 0.0], [0.0, 1.0], "orth"),
         ([1.0, 0.0], [-1.0, 0.0], "anti")],
        "a array<float>, b array<float>, tag string",
    )
    got = {
        r.tag: (r.d, r.c)
        for r in df.select(
            "tag",
            qdot(F.col("a"), F.col("b")).alias("d"),
            qcosine(F.col("a"), F.col("b")).alias("c"),
        ).collect()
    }
    assert got["same"] == (100000000, 1.0)
    assert got["orth"] == (0, 0.0)
    assert got["anti"] == (-100000000, -1.0)


def test_redact_pii_all_categories(spark):
    from dbt_tpcdi_spark.operators.text import redact_pii, redaction_counts

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-amp.le.org call 555-867-5309 or 123.456.7890 "
             "ssn 078-05-1120 from 192.168.0.1")],
        "id int, text string",
    )
    row = df.select(
        redact_pii(F.col("text")).alias("clean"),
        *[c.alias(n) for n, c in
          redaction_counts(redact_pii(F.col("text"))).items()],
    ).first()
    assert row.clean == (
        "mail <EMAIL> call <PHONE> or <PHONE> ssn <SSN> from <IP>"
    )
    assert (row.n_email, row.n_ssn, row.n_phone, row.n_ipv4) == (1, 1, 2, 1)


def test_redact_pii_noop_and_markup(spark):
    from dbt_tpcdi_spark.operators.text import redact_pii, strip_markup

    df = spark.createDataFrame(
        [(1, "no pii here, just words"),
         (2, "<p>hello   <b>world</b></p>")],
        "id int, text string",
    )
    rows = {r.id: r for r in df.select(
        "id", redact_pii(F.col("text")).alias("r"),
        strip_markup(F.col("text")).alias("s")).collect()}
    assert rows[1].r == "no pii here, just words"
    assert rows[2].s == "hello world"


def test_kmeans_recovers_separated_clusters(spark):
    from dbt_tpcdi_spark.operators.similarity import kmeans_quantized

    # two tight blobs far apart; ids interleaved so init picks one
    # point from each blob region
    rows = []
    for i in range(20):
        base = [10.0, 10.0] if i % 2 == 0 else [-10.0, -10.0]
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1] - (i % 3) * 0.01]))
    df = spark.createDataFrame(rows, "id bigint, v array<float>")
    out = kmeans_quantized(df, "id", "v", k=2, iters=3)
    got = {r.id: r.cluster for r in out.collect()}
    evens = {got[i] for i in range(0, 20, 2)}
    odds = {got[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_partitioning_invariant_and_empty_cluster(spark):
    from dbt_tpcdi_spark.operators.similarity import kmeans_quantized

    # k=3 over data with only 2 real blobs -> one cluster goes empty
    # and must keep its previous centroid without erroring
    rows = [(i, [float(i % 2) * 8.0, 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "id bigint, v array<float>")
    a = {(r.id, r.cluster, r.dist2)
         for r in kmeans_quantized(df.coalesce(1), "id", "v",
                                   k=3, iters=2).collect()}
    b = {(r.id, r.cluster, r.dist2)
         for r in kmeans_quantized(df.repartition(7), "id", "v",
                                   k=3, iters=2).collect()}
    assert a == b


def test_boilerplate_scores_edges(spark):
    from dbt_tpcdi_spark.operators.text import boilerplate_scores

    df = spark.createDataFrame(
        [
            (1, "common header line alpha"),     # shares 'common header line'
            (2, "common header line beta"),
            (3, "totally unique content here"),
            (4, "ab"),                           # < 3 tokens -> 0 grams
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in boilerplate_scores(
        df, "doc_id", "text", n=3, min_docs=2).collect()}
    assert got[4].n_grams == 0 and got[4].boilerplate_ratio == 0.0
    assert got[3].n_frequent == 0
    # docs 1/2: 2 grams each, 1 frequent ('common header line')
    assert got[1].n_grams == 2 and got[1].n_frequent == 1
    assert got[1].boilerplate_ratio == 0.5
    assert got[2].n_frequent == 1


def test_split_sentences_udtf_multi(spark):
    from pyspark.sql.functions import udtf

    from dbt_tpcdi_spark.queries.llm import _sentence_udtf_cls

    spark.udtf.register(
        "split_sentences_t",
        udtf(_sentence_udtf_cls(),
             returnType="doc_id bigint, sentence_idx bigint, sentence string"),
    )
    spark.createDataFrame(
        [(1, "First one. Second!  Third?Tail"), (2, None), (3, "")],
        "doc_id bigint, text string",
    ).createOrReplaceTempView("__t_udtf")
    rows = spark.sql(
        "SELECT s.* FROM __t_udtf d, LATERAL split_sentences_t(d.doc_id, d.text) s"
    ).collect()
    got = [(r.doc_id, r.sentence_idx, r.sentence) for r in rows]
    # '?' not followed by whitespace does NOT split (rule is [.!?]\s+)
    assert got == [(1, 0, "First one"), (1, 1, "Second"), (1, 2, "Third?Tail")]


def _scored_docs(spark):
    from dbt_tpcdi_spark.operators import text as X
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    return X.quality_features(d.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", "quality_score"
    )


def test_quantile_gate_approx_threshold_is_exact_quantile(spark):
    # on bounded groups the histogram threshold must EQUAL the exact
    # inverse-CDF quantile (value at ascending position ceil(n/4))
    from math import ceil

    from dbt_tpcdi_spark.operators import text as X

    scored = _scored_docs(spark)
    got = {
        (r["lang"], r["qthreshold"])
        for r in X.quality_quantile_gate_approx(scored)
        .select("lang", "qthreshold").distinct().collect()
    }
    by_lang: dict[str, list[float]] = {}
    for r in scored.collect():
        by_lang.setdefault(r["lang"], []).append(r["quality_score"])
    want = set()
    for lang, scores in by_lang.items():
        scores.sort()
        want.add((lang, scores[ceil(len(scores) / 4) - 1]))
    assert got == want


def test_quantile_gate_approx_keeps_superset_of_exact(spark):
    # threshold semantics keep ALL rows tied at the cut score; the
    # exact percent_rank gate splits ties by id — so approx-kept must
    # be a superset of exact-kept, and identical on tie-free groups
    from dbt_tpcdi_spark.operators import text as X

    scored = _scored_docs(spark)
    exact = {r["doc_id"] for r in X.quality_quantile_gate(scored).collect()}
    approx = {
        r["doc_id"] for r in X.quality_quantile_gate_approx(scored).collect()
    }
    assert exact <= approx, exact - approx


def test_quantile_gate_approx_tie_flood(spark):
    # skewed fixture: one language where 90% of rows share one score —
    # the threshold lands ON the flooded score and keeps all of it;
    # the kept fraction stays within [3/4, 1] (never drops below the
    # exact gate's keep rate)
    rows = [(i, "xx", 0.5) for i in range(90)] + [
        (90 + j, "xx", 0.1 * (j % 3)) for j in range(10)
    ]
    from dbt_tpcdi_spark.operators import text as X

    df = spark.createDataFrame(
        rows, "doc_id long, lang string, quality_score double"
    )
    kept = X.quality_quantile_gate_approx(df).collect()
    assert all(r["qthreshold"] == 0.5 for r in kept)
    assert len(kept) == 90  # the flood is at/above the cut, all kept


def test_assign_ivf_properties(spark):
    # IVF assignment is total (every vector assigned once), in-bucket
    # rows really share the centroid's bucket, and the approximation
    # never beats the exact argmin — equality exactly when the global
    # winner lives in the vector's bucket
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    cents_tbl = S.seed_centroid_table(e, "vec_id", "embedding", 16)
    ivf = S.assign_ivf(e, "vec_id", "embedding", cents_tbl)
    rows = ivf.collect()
    assert len(rows) == e.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    # collect in the TEST only (the operator path never does): the
    # driver-side bucket twin must agree with the in-plan buckets
    cents = {
        int(r["__cl"]): list(r["__cent"]) for r in cents_tbl.collect()
    }
    cbucket = {c: S.bucket_of_qvec(v) for c, v in cents.items()}
    vbucket = {
        r["vec_id"]: r["b"]
        for r in e.select(
            "vec_id", S.sign_bucket(F.col("embedding")).alias("b")
        ).collect()
    }
    flat = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in S.kmeans_quantized(
            e, "vec_id", "embedding", k=16, iters=0,
            assign_mode="broadcast",
        ).collect()
    }
    for r in rows:
        if r["via_bucket"]:
            assert cbucket[r["cluster"]] == vbucket[r["vec_id"]]
        fc, fd = flat[r["vec_id"]]
        assert r["dist2"] >= fd
        if cbucket[fc] == vbucket[r["vec_id"]]:
            assert (r["cluster"], r["dist2"]) == (fc, fd)


def test_pq_codebooks_encode_properties(spark):
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    cb = S.pq_codebooks(e, "vec_id", "embedding", 64, blocks=8,
                        codes=16, iters=1, assign_mode="broadcast")
    rows = cb.collect()
    assert len(rows) == 8 * 16  # one codebook entry per (block, code)
    assert all(len(r["__cent"]) == 8 for r in rows)  # subdim = 64/8
    codes = S.pq_encode(e, "vec_id", "embedding", cb, 64, blocks=8)
    got = codes.collect()
    assert len(got) == n * 8  # every vector encodes every block
    # each (vector, block) picks a code that exists in that block's book
    valid = {(r["block"], r["__cl"]) for r in rows}
    assert all((r["block"], r["code"]) in valid for r in got)
    # deterministic under repartitioning
    e7 = e.repartition(7)
    cb7 = S.pq_codebooks(e7, "vec_id", "embedding", 64, blocks=8,
                         codes=16, iters=1, assign_mode="broadcast")
    got7 = {(r["vec_id"], r["block"]): (r["code"], r["dist2"])
            for r in S.pq_encode(e7, "vec_id", "embedding", cb7, 64,
                                 blocks=8).collect()}
    assert got7 == {(r["vec_id"], r["block"]): (r["code"], r["dist2"])
                    for r in got}


def test_pq_codebooks_grouped_equals_blockwise(spark):
    """The grouped one-pass Lloyd loop must be BIT-IDENTICAL to the
    sequential per-block k-means it replaced — that equivalence is
    what lets the per-block SQL twins stay the oracle after the
    training path changed."""
    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.operators.similarity import (
        _pq_codebooks_blockwise,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    for iters in (0, 1, 2):
        grouped = sorted(
            (r["block"], r["__cl"], tuple(r["__cent"]))
            for r in S.pq_codebooks(
                e, "vec_id", "embedding", 64, blocks=4, codes=8,
                iters=iters, assign_mode="broadcast",
            ).collect()
        )
        blockwise = sorted(
            (r["block"], r["__cl"], tuple(r["__cent"]))
            for r in _pq_codebooks_blockwise(
                e, "vec_id", "embedding", 64, blocks=4, codes=8,
                iters=iters, assign_mode="broadcast", parts=None,
            ).collect()
        )
        assert grouped == blockwise, iters


def test_funnel_conversion_invariants(spark):
    """Funnel-shape invariants at sf0.001: step user-sets are nested
    (n_users non-increasing down the funnel), mean gaps respect the
    48h window, and a user whose only clicks precede every view never
    reaches step 2 (ordering, not co-occurrence)."""
    from pyspark.sql import Row

    from dbt_tpcdi_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    rows = {r["step"]: r for r in all_queries()["funnel_conversion"]
            .build(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["mean_gap_ms"] is None
    for s in (2, 3):
        if rows[s]["n_users"] > 0:
            assert 0 < rows[s]["mean_gap_ms"] <= 48 * 3_600_000
    # ordering matters: click-before-view must not convert
    import dbt_tpcdi_spark.queries.extended as X

    base = [
        Row(event_id=1, ts=1_000, user_id=1, event_type="click"),
        Row(event_id=2, ts=2_000, user_id=1, event_type="view"),
        Row(event_id=3, ts=1_000, user_id=2, event_type="view"),
        Row(event_id=4, ts=2_000, user_id=2, event_type="click"),
    ]
    df = spark.createDataFrame(base).withColumn(
        "ts", F.timestamp_seconds(F.col("ts"))
    )
    orig = X._t
    X._t = lambda *_: df
    try:
        got = {r["step"]: r for r in X.funnel_conversion(
            spark, SF_SMOKE).collect()}
    finally:
        X._t = orig
    assert got[1]["n_users"] == 2  # both users viewed
    assert got[2]["n_users"] == 1  # only user 2 clicked AFTER viewing
    assert got[3]["n_users"] == 0


def test_pq_rerank_full_refine_is_exact(spark):
    """pq_ann_rerank_frame with refine >= n degrades to EXACT search:
    the ADC shortlist covers the whole corpus, so the re-rank's output
    must equal the brute-force quantized-L2 top-10 — the invariant
    that makes 'size refine to the cell population' a recall
    guarantee rather than a heuristic."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.queries.llm import pq_ann_rerank_frame
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    got = pq_ann_rerank_frame(e, refine=n).collect()
    qv = e.orderBy("vec_id").limit(1).select(
        S._qlist(F.col("embedding")).alias("__qq"))
    d2 = S.qdist2_q(S._qlist(F.col("embedding")), F.col("__qq"))
    want = (
        e.crossJoin(F.broadcast(qv))
        .select("vec_id", d2.alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    assert [(r["vec_id"], r["dist2"]) for r in got] == [
        (r["vec_id"], r["dist2"]) for r in want]
    # and the shortlist rung is consistent: a narrower refine returns
    # a subset of the corpus ranked by the same exact metric
    nar = pq_ann_rerank_frame(e, refine=50).collect()
    assert len(nar) == 10
    assert all(r["dist2"] >= got[0]["dist2"] for r in nar)


def test_exact_substring_excise_invariants(spark):
    """Cross-query semantics: excision removes foreign-owned runs
    (owner = min doc_id per gram), spans flags ALL shared-gram runs —
    so excised docs ⊆ spans docs, per-doc excised ≤ shared union, and
    the globally smallest doc in spans owns everything it shares."""
    from dbt_tpcdi_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    qs = all_queries()
    exc = {
        r["doc_id"]: (r["n_tok"], r["n_excised"])
        for r in qs["exact_substring_excise"].build(spark, SF_SMOKE).collect()
    }
    spans = {
        r["doc_id"]: r["dup_tokens"]
        for r in qs["exact_substring_spans"].build(spark, SF_SMOKE).collect()
    }
    assert spans, "smoke corpus has no shared runs — test is vacuous"
    excised = {d for d, (_, n) in exc.items() if n > 0}
    assert excised, "smoke corpus excises nothing — test is vacuous"
    assert excised <= set(spans)
    for d in excised:
        n_tok, n_exc = exc[d]
        assert 0 < n_exc <= n_tok
        assert n_exc <= spans[d]  # foreign-owned ⊆ shared
    # every gram the minimal spans-doc shares has owner == itself
    assert exc[min(spans)][1] == 0


def test_kmv_bucket_union_contains_global_bottom_k(spark):
    """Structural exactness of the two-level bottom-k: the union of
    per-bucket bottom-k provably contains the global bottom-k, so the
    sketch's kth value equals the true kth smallest distinct hash."""
    import random

    rng = random.Random(7)
    vals = list({rng.randrange(1 << 60) for _ in range(5000)})
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    k, B = 64, 16
    wb = Window.partitionBy(F.pmod(F.col("h"), F.lit(B))).orderBy("h")
    cand = [
        r.h
        for r in df.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= k)
        .collect()
    ]
    assert sorted(cand)[:k] == sorted(vals)[:k]
    # mergeability: bottom-k of two shard sketches == bottom-k of union
    half = len(vals) // 2
    s1 = sorted(vals[:half])[:k]
    s2 = sorted(vals[half:])[:k]
    assert sorted(s1 + s2)[:k] == sorted(vals)[:k]


def test_ridge_gram_is_single_aggregation_pass(spark):
    from dbt_tpcdi_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["ridge_normal_equations"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one partial + one final HashAggregate, no join, no window: the
    # whole corpus cost of fitting the model is a single agg pass
    assert plan.count("HashAggregate") == 2, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_ridge_fit_solves_planted_linear_relation(spark):
    """On a corpus where tokens = exact linear function of the other
    features, the fit must verify (solve_ok) and explain the variance
    (fit_improves)."""
    import os
    import tempfile

    from dbt_tpcdi_spark.queries import all_queries

    rows = []
    for i in range(200):
        toks = ["w%d" % (j % 7) for j in range(3 + i % 40)]
        text = " ".join(toks) + ("." * (i % 5)) + ("7" * (i % 3))
        rows.append((i, text, "en", "src%d" % (i % 4), len(text)))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r.coef_idx: r
            for r in all_queries()["ridge_fit"].build(spark, tmp).collect()
        }
    assert set(out) == {0, 1, 2, 3}
    assert all(r.solve_ok for r in out.values())
    assert all(r.fit_improves for r in out.values())


def test_simhash_hamming_pigeonhole_is_complete(spark):
    """The multi-index candidate set must find EVERY pair within
    Hamming distance d (pigeonhole over d+1 blocks) — verified against
    the brute-force all-pairs scan on the smoke corpus."""
    from dbt_tpcdi_spark.operators.text import simhash
    from dbt_tpcdi_spark.queries import all_queries
    from dbt_tpcdi_spark.queries.llm import _SIMHAM_D
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in all_queries()["simhash_hamming_pairs"]
        .build(spark, SF_SMOKE).collect()
    }
    sh = simhash(
        load_table(spark, SF_SMOKE, "documents"), ["doc_id"], "text"
    )
    l = sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    r = sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    brute = {
        (x.a, x.b, x.hd)
        for x in l.crossJoin(r)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "hd",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"),
        )
        .filter(F.col("hd") <= _SIMHAM_D)
        .collect()
    }
    assert brute, "smoke corpus has no near-dup fingerprints — vacuous"
    assert got == brute


def test_simhash_hamming_plan_no_cartesian(spark):
    from dbt_tpcdi_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["simhash_hamming_pairs"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pca_covariance_matches_numpy(spark):
    """The distributed sufficient statistics reassemble to exactly the
    covariance numpy computes on the same quantized vectors."""
    import numpy as np

    from dbt_tpcdi_spark.queries import all_queries
    from dbt_tpcdi_spark.queries.llm import _PCA_DIM
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    rows = all_queries()["pca_covariance"].build(spark, SF_SMOKE).collect()
    by = {(r.i, r.j): r.s for r in rows}
    n = by[(-1, -1)]
    e = load_table(spark, SF_SMOKE, "embeddings").collect()
    Q = np.array([
        [round(float(x) * 10000) for x in r.embedding] for r in e
    ], dtype=np.int64)
    assert n == len(Q)
    # exact integer sums
    G = Q.T @ Q
    s = Q.sum(axis=0)
    for i in range(_PCA_DIM):
        assert by[(i, -1)] == s[i]
        for j in range(i, _PCA_DIM):
            assert by[(i, j)] == G[i, j], (i, j)


def test_pca_fit_planted_dominant_direction(spark):
    """On a rank-1-dominated corpus the top components must carry the
    variance (topk_explains) and the solve identities must hold."""
    import os
    import tempfile

    from dbt_tpcdi_spark.queries import all_queries

    rows = []
    for i in range(300):
        t = (i % 100) / 50.0 - 1.0
        vec = [t * (1.0 if j < 4 else 0.0) + 0.001 * ((i * 31 + j) % 7)
               for j in range(64)]
        rows.append((i, [float(x) for x in vec], i % 3))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(tmp, "embeddings.parquet"))
        out = all_queries()["pca_fit"].build(spark, tmp).collect()
    assert len(out) == 8
    assert all(r.psd_ok and r.eigsum_ok and r.topk_explains for r in out)
    assert out[0].n == 300 and out[0].trace_num > 0


def test_assign_ivf_blas_bit_identical_and_fallback(spark):
    """The cogrouped-BLAS IVF assignment must equal the expression
    path bit for bit — including the exact-global fallback rows for
    buckets holding no centroid (forced here with k=3 over 16
    buckets)."""
    from dbt_tpcdi_spark.operators import similarity as S
    from dbt_tpcdi_spark.sources.parquet import load_table, spread
    from tests.conftest import SF_SMOKE

    e = spread(load_table(spark, SF_SMOKE, "embeddings"))
    for k in (3, 20):
        cents = S.seed_centroid_table(e, "vec_id", "embedding", k)
        a = {
            r.vec_id: (r.cluster, r.dist2, r.via_bucket)
            for r in S.assign_ivf(
                e, "vec_id", "embedding", cents).collect()
        }
        b = {
            r.vec_id: (r.cluster, r.dist2, r.via_bucket)
            for r in S.assign_ivf_blas(
                e, "vec_id", "embedding", cents).collect()
        }
        assert a == b, k
        if k == 3:
            assert any(not v[2] for v in a.values()), \
                "k=3 produced no fallback rows — vacuous"


def test_embed_hashed_projection_seam(spark):
    """The inference seam's contracts: deterministic output independent
    of partitioning, the exact ±1 hashed projection per token, zero
    vector for empty/whitespace text, and fixed width on every row."""
    from dbt_tpcdi_spark.operators.embed import (
        EMBED_DIM,
        _DIM_SALT,
        _SIGN_SALT,
        _md5_mod,
        embed_hashed_projection,
    )

    rows = [
        (1, "Alpha beta  alpha"),
        (2, ""),
        (3, "   "),
        (4, None),
        (5, "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["embedding"]
           for r in embed_hashed_projection(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(len(v) == EMBED_DIM for v in out.values())
    # empty / whitespace / NULL text → the zero vector
    for k in (2, 3, 4):
        assert out[k] == [0.0] * EMBED_DIM
    # hand-derive doc 1: lowercased whitespace tokens, ±1 per token
    expect = [0.0] * EMBED_DIM
    for w in ("alpha", "beta", "alpha"):
        d = _md5_mod(w, EMBED_DIM, _DIM_SALT)
        expect[d] += 1 if _md5_mod(w, 2, _SIGN_SALT) == 0 else -1
    assert out[1] == expect
    # partitioning-independence: 1 partition vs many, same vectors
    out1 = {r["doc_id"]: r["embedding"]
            for r in embed_hashed_projection(
                df.repartition(7)).collect()}
    assert out1 == out


def test_repetition_predicate_equals_column(spark):
    """r14: the single-evaluation filter predicate must compute the
    exact boolean repetition_features emits as is_repetitive — on
    repetitive docs (dup lines / hot 2-grams / hot 3-grams), clean
    docs, empty and single-token edge cases."""
    from dbt_tpcdi_spark.operators.text import (
        repetition_features,
        repetition_predicate,
    )

    rows = [
        (1, "a b c d e f g h i j"),                      # clean
        (2, "x y " * 40),                                 # hot 2-gram
        (3, "p q r " * 30),                               # hot 3-gram
        (4, "line\nline\nline\nother"),                   # dup lines
        (5, ""),                                          # empty
        (6, "one"),                                       # single token
        (7, "  spaced   out\ttokens  "),                  # whitespace
        (8, "a a a a a a a a a a"),                       # dup tokens only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feat = repetition_features(df, "doc_id").select(
        "doc_id", "is_repetitive"
    )
    pred = df.select(
        "doc_id", repetition_predicate(F.col("text")).alias("p")
    )
    both = {r["doc_id"]: (r["is_repetitive"], r["p"])
            for r in feat.join(pred, "doc_id").collect()}
    assert len(both) == len(rows)
    for doc_id, (col_val, pred_val) in both.items():
        assert col_val == pred_val, doc_id
    # sanity: the fixture actually exercises both branches
    assert any(v for v, _ in both.values())
    assert any(not v for v, _ in both.values())
