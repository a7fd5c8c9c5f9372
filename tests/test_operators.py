"""Unit tests for the core operators on hand-built micro-fixtures.

These pin the semantics SURVEY.md §7.5 flags as easy to flip wrong:
lead-vs-lag direction in SCD2 (hazard 3), the forward-fill frame
(hazard 4), BETWEEN inclusivity in temporal joins, and as-of boundary
behavior.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators.scd2 import SCD2_SENTINEL, merge_scd2, with_scd2
from dbt_tpcdi_spark.operators.temporal import join_asof, temporal_join
from dbt_tpcdi_spark.operators.windows import (
    forward_fill,
    qualify_rn,
    rolling_extreme_with_date,
    trailing_agg_excluding_current,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_multi_version(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:00:00"), "v1"),
            (1, ts("2020-06-01 00:00:00"), "v2"),
            (1, ts("2021-01-01 00:00:00"), "v3"),
            (2, ts("2020-03-01 00:00:00"), "only"),
        ],
        "k int, effective_timestamp timestamp, payload string",
    )
    out = {
        (r.k, r.payload): r
        for r in with_scd2(df, key="k").collect()
    }
    # end = next version - 1ms (lead over ASC == reference's lag over DESC)
    assert out[(1, "v1")].end_timestamp == ts("2020-05-31 23:59:59.999")
    assert out[(1, "v2")].end_timestamp == ts("2020-12-31 23:59:59.999")
    # latest version gets the open sentinel + is_current
    assert out[(1, "v3")].end_timestamp == ts(SCD2_SENTINEL.replace(" ", "T"))
    assert out[(1, "v3")].is_current and not out[(1, "v1")].is_current
    # single-version entity: current, sentinel end
    assert out[(2, "only")].is_current
    assert out[(2, "only")].end_timestamp == ts(SCD2_SENTINEL.replace(" ", "T"))


def test_merge_scd2_incremental_equals_full(spark):
    """merge_scd2 over (existing ⊕ updates) must equal with_scd2 over
    the full union — including a LATE version that lands between two
    existing ones and rewrites its neighbors."""
    initial = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:00:00"), "v1"),
            (1, ts("2021-01-01 00:00:00"), "v3"),
            (2, ts("2020-01-01 00:00:00"), "stay"),
        ],
        "k int, effective_timestamp timestamp, payload string",
    )
    updates = spark.createDataFrame(
        [
            (1, ts("2020-06-01 00:00:00"), "v2-late"),  # lands in between
            (3, ts("2022-01-01 00:00:00"), "new-key"),
        ],
        "k int, effective_timestamp timestamp, payload string",
    )
    existing = with_scd2(initial, key="k")
    merged = merge_scd2(existing, updates, key="k")
    full = with_scd2(initial.unionByName(updates), key="k")
    key = lambda r: (r.k, r.payload)  # noqa: E731
    got = {key(r): (r.end_timestamp, r.is_current) for r in merged.collect()}
    want = {key(r): (r.end_timestamp, r.is_current) for r in full.collect()}
    assert got == want
    # the late row really did rewrite v1's end_timestamp
    assert got[(1, "v1")][0] == ts("2020-05-31 23:59:59.999")


def test_temporal_join_between_inclusive(spark):
    dim = with_scd2(
        spark.createDataFrame(
            [(1, ts("2020-01-01 00:00:00"), "v1"), (1, ts("2020-02-01 00:00:00"), "v2")],
            "k int, effective_timestamp timestamp, ver string",
        ),
        key="k",
    )
    fact = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:00:00"), "at-eff"),        # == eff of v1
            (1, ts("2020-01-31 23:59:59.999"), "at-end"),    # == end of v1
            (1, ts("2020-02-01 00:00:00"), "next"),          # eff of v2
            (1, ts("2019-12-31 00:00:00"), "orphan"),        # before all → dropped
        ],
        "fk int, ets timestamp, tag string",
    )
    got = {
        r.tag: r.ver
        for r in temporal_join(fact, dim, [("fk", "k")], ts="ets").collect()
    }
    assert got == {"at-eff": "v1", "at-end": "v1", "next": "v2"}


def test_join_asof_backward(spark):
    fact = spark.createDataFrame(
        [(1, ts("2020-01-15 00:00:00"), 100), (1, ts("2019-01-01 00:00:00"), 101),
         (3, ts("2020-01-01 00:00:00"), 102)],
        "k int, fts timestamp, fid int",
    )
    dim = spark.createDataFrame(
        [(1, ts("2020-01-01 00:00:00"), "a"), (1, ts("2020-01-15 00:00:00"), "b"),
         (2, ts("2020-01-01 00:00:00"), "z")],
        "k int, dts timestamp, dval string",
    )
    got = {r.fid: r.asof_dval
           for r in join_asof(fact, dim, "k", "fts", "dts").collect()}
    # exact-ts match included (backward picks the row at fts itself)
    assert got[100] == "b"
    # fact before any dim version → NULL, row preserved (left semantics)
    assert got[101] is None
    # key with no dim rows at all → NULL
    assert got[102] is None


def test_join_asof_forward(spark):
    fact = spark.createDataFrame(
        [(1, ts("2020-01-10 00:00:00"), 1), (1, ts("2020-03-01 00:00:00"), 2)],
        "k int, fts timestamp, fid int",
    )
    dim = spark.createDataFrame(
        [(1, ts("2020-01-15 00:00:00"), "next-a"),
         (1, ts("2020-02-01 00:00:00"), "next-b")],
        "k int, dts timestamp, dval string",
    )
    got = {r.fid: r.asof_dval
           for r in join_asof(fact, dim, "k", "fts", "dts",
                              direction="forward").collect()}
    # forward picks the EARLIEST dim at-or-after the fact timestamp
    assert got[1] == "next-a"
    # fact after all dim versions → NULL
    assert got[2] is None


def test_forward_fill_frame(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, "x"), (1, 3, None), (1, 4, "y"), (1, 5, None)],
        "k int, seq int, v string",
    )
    got = {r.seq: r.v for r in forward_fill(df, ["v"], key="k", order="seq").collect()}
    assert got == {1: None, 2: "x", 3: "x", 4: "y", 5: "y"}


def test_qualify_rn_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z")],
        "k int, ord int, v string",
    )
    got = sorted(
        (r.k, r.v) for r in qualify_rn(df, "k", [F.col("ord").asc()]).collect()
    )
    assert got == [(1, "a"), (2, "z")]


def test_rolling_extreme_struct_vs_ties(spark):
    # value 5.0 occurs twice in the window → extreme date must be the EARLIEST
    df = spark.createDataFrame(
        [
            (1, dt.date(2020, 1, 1), 5.0),
            (1, dt.date(2020, 1, 2), 3.0),
            (1, dt.date(2020, 1, 3), 5.0),
        ],
        "k int, d date, v double",
    )
    rows = {r.d: r for r in
            rolling_extreme_with_date(df, "k", "d", "v", preceding=6).collect()}
    last = rows[dt.date(2020, 1, 3)]
    assert last.v_high == 5.0 and last.v_high_d == dt.date(2020, 1, 1)
    assert last.v_low == 3.0 and last.v_low_d == dt.date(2020, 1, 2)


def test_trailing_agg_excludes_current(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)],
        "k int, seq int, v double",
    )
    got = {
        r.seq: r.prior_sum
        for r in trailing_agg_excluding_current(
            df, "k", "seq", "v", preceding=4, out="prior_sum"
        ).collect()
    }
    assert got == {1: 0.0, 2: 10.0, 3: 30.0}


def test_range_join_binned_matches_between(spark):
    from dbt_tpcdi_spark.operators.temporal import range_join_binned

    # intervals crossing bin boundaries, touching endpoints, single-bin
    dim = spark.createDataFrame(
        [(1, 0, 25), (1, 26, 26), (2, 10, 99), (3, 5, 7)],
        "k int, lo long, hi long",
    )
    fact = spark.createDataFrame(
        [(1, 0), (1, 25), (1, 26), (1, 27), (2, 10), (2, 99), (2, 100),
         (3, 6), (4, 6)],
        "k int, v long",
    )
    got = {
        (r.k, r.v, r.lo, r.hi)
        for r in range_join_binned(
            fact, dim, val="v", lo="lo", hi="hi", bin_width=10, keys=["k"]
        ).collect()
    }
    expected = {
        (fk, v, lo, hi)
        for fk, v in [(1, 0), (1, 25), (1, 26), (1, 27), (2, 10), (2, 99),
                      (2, 100), (3, 6), (4, 6)]
        for dk, lo, hi in [(1, 0, 25), (1, 26, 26), (2, 10, 99), (3, 5, 7)]
        if fk == dk and lo <= v <= hi
    }
    assert got == expected
    # no duplicate matches despite multi-bin intervals
    rows = range_join_binned(
        fact, dim, val="v", lo="lo", hi="hi", bin_width=10, keys=["k"]
    ).count()
    assert rows == len(expected)


def test_resample_daily_fill_gaps(spark):
    import datetime as ddt

    from dbt_tpcdi_spark.operators.timeseries import resample_daily_fill

    d = lambda day: ddt.date(2021, 3, day)
    df = spark.createDataFrame(
        [(1, d(1), 10.0), (1, d(4), 40.0), (2, d(2), 5.0)],
        "k int, d date, v double",
    )
    out = {(r.k, r.d): (r.v, r.is_filled)
           for r in resample_daily_fill(df, "k", "d", ["v"]).collect()}
    assert out == {
        (1, d(1)): (10.0, False),
        (1, d(2)): (10.0, True),   # gap forward-filled
        (1, d(3)): (10.0, True),
        (1, d(4)): (40.0, False),
        (2, d(2)): (5.0, False),   # single-day key: spine of one
    }


def test_resample_daily_fill_observed_null_preserved(spark):
    import datetime as ddt

    from dbt_tpcdi_spark.operators.timeseries import resample_daily_fill

    d = lambda day: ddt.date(2021, 3, day)
    df = spark.createDataFrame(
        [(1, d(1), 10.0), (1, d(2), None), (1, d(4), 40.0)],
        "k int, d date, v double",
    )
    out = {(r.k, r.d): (r.v, r.is_filled)
           for r in resample_daily_fill(df, "k", "d", ["v"]).collect()}
    # the observed NULL is an observation, not a gap; the gap on day 3
    # fills from the LAST OBSERVATION (the NULL), not from day 1
    assert out[(1, d(2))] == (None, False)
    assert out[(1, d(3))] == (None, True)
    assert out[(1, d(4))] == (40.0, False)


def test_bmp_parser_handles_topdown_and_rejects_garbage():
    import struct

    from dbt_tpcdi_spark.operators.multimodal import make_bmp, parse_bmp

    # round-trip sanity at several shapes (incl. width hitting padding)
    for doc_id, text in ((0, ""), (5, "ab"), (11, "abcdefg"), (3, "x" * 29)):
        w, h, r, g, b = parse_bmp(make_bmp(doc_id, text))
        assert w == len(text.encode()) % 8 + 2 and h == doc_id % 6 + 2
    # top-down variant (negative height) must read rows in file order:
    # flip the height sign on a 2-row image whose rows differ, and the
    # channel sums must be unchanged (sums are row-order invariant) —
    # but a parser that ignores the sign and double-flips would still
    # pass a sum check, so ALSO check first-pixel asymmetry via a
    # hand-built 1x2 image
    def tiny(topdown):
        htx = -2 if topdown else 2
        row0, row1 = bytes((1, 2, 3, 0)), bytes((9, 8, 7, 0))  # stride 4
        # bottom-up storage writes row1 (y=1) first
        body = (row1 + row0) if not topdown else (row0 + row1)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 1, htx, 1, 24, 0,
                          len(body), 0, 0, 0, 0)
        return hdr + dib + body
    assert parse_bmp(tiny(False)) == parse_bmp(tiny(True))
    try:
        parse_bmp(b"JUNKJUNKJUNK")
        raise AssertionError("parser accepted garbage")
    except ValueError:
        pass


def test_wav_parser_walks_unknown_chunks():
    import struct

    from dbt_tpcdi_spark.operators.multimodal import make_wav, parse_wav

    base = make_wav(2, "hello")
    rate, n, s, lo, hi = parse_wav(base)
    assert (rate, n) == (10000, 5)
    # splice a LIST chunk with an ODD size between fmt and data: a
    # reader assuming the fixed 44-byte layout, or skipping the RIFF
    # word-alignment pad byte, breaks here
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    assert parse_wav(spliced) == (rate, n, s, lo, hi)
    try:
        parse_wav(b"RIFFxxxxJUNK")
        raise AssertionError("parser accepted garbage")
    except ValueError:
        pass


def test_lsh_hot_bucket_cap_bounds_and_determinism(spark):
    from dbt_tpcdi_spark.operators import dedup as D

    # 60 docs sharing one boilerplate text -> every band collapses to
    # one hot bucket; 3 singleton-ish outliers stay below the cap
    rows = [(i, "the quick brown fox shared nav footer text") for i in range(60)]
    rows += [(100, "alpha beta gamma"), (101, "delta epsilon zeta"),
             (102, "eta theta iota")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash_signature(d, "text")
    kept = D.capped_bucket_members(sigs, "doc_id", cap=8).collect()
    per_bucket: dict = {}
    for r in kept:
        per_bucket.setdefault((r["band"], r["h"]), []).append(r)
    for (band, h), members in per_bucket.items():
        assert len(members) <= 8, (band, h, len(members))
        # sz carries the ORIGINAL size so overflow is reportable
        if members[0]["sz"] > 8:
            assert len(members) == 8
    # the hot bucket really was capped in every band
    hot = [m for m in per_bucket.values() if m[0]["sz"] >= 60]
    assert len(hot) == D.LSH_BANDS
    # pairs bounded: hot corpus yields <= buckets * C(8,2) per band
    pairs = D.lsh_candidate_pairs_capped(sigs, "doc_id", cap=8,
                                         distinct=False)
    assert pairs.count() <= len(per_bucket) * 28
    # deterministic under repartitioning
    sigs7 = D.with_minhash_signature(d.repartition(7), "text")
    kept7 = {(r["doc_id"], r["band"], r["h"])
             for r in D.capped_bucket_members(sigs7, "doc_id", cap=8)
             .collect()}
    assert kept7 == {(r["doc_id"], r["band"], r["h"]) for r in kept}


def test_lsh_cap_equals_exact_rank_topcap_even_when_prefilter_starves(spark):
    """The 20-bit md5 prefilter is only probabilistically sufficient;
    the deficient-bucket re-rank must make the kept set EQUAL the
    exact per-bucket (md5, id) rank top-cap structurally. cap=3,
    margin=1 over a 687-doc single-bucket corpus starves the
    prefilter (2 survivors < cap), so this test exercises the re-rank
    path — asserted below so a salt change can't silently turn it
    into a no-op."""
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators import dedup as D

    n, cap, margin = 687, 3, 1
    rows = [(i, "the quick brown fox shared nav footer text")
            for i in range(n)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash_signature(d, "text")

    # the starvation event really fires for this (salt, corpus): some
    # bucket has < cap members under the 20-bit threshold
    def v20(i: int) -> int:
        h = hashlib.md5(f"{D._LSH_CAP_SALT}{i}".encode()).hexdigest()
        return int(h[:5], 16)

    survivors = sum(v20(i) * n < margin * cap * (1 << 20)
                    for i in range(n))  # n: every doc shares the bucket
    assert survivors < cap, "corpus no longer starves the prefilter"

    got = {(r["doc_id"], r["band"], r["h"])
           for r in D.capped_bucket_members(
               sigs, "doc_id", cap=cap, margin=margin).collect()}

    # exact oracle: full-rank top-cap, no prefilter
    b = D.bucket_members(sigs, "doc_id")
    hs = F.md5(F.concat(F.lit(D._LSH_CAP_SALT),
                        F.col("doc_id").cast("string")))
    w = Window.partitionBy("band", "h").orderBy(hs.asc(), F.col("doc_id"))
    exact = {(r["doc_id"], r["band"], r["h"])
             for r in b.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= cap).collect()}
    assert got == exact


def test_lsh_cap_zero_survivor_bucket_recovered(spark):
    """ADVICE r8: a hot bucket in which ZERO members pass the 20-bit
    prefilter leaves no survivor row to flag deficiency from — the r8
    guard silently dropped its entire membership (P≈e^-margin·cap per
    hot bucket). Construct the event deterministically (4 ids whose
    salted md5 20-bit prefixes all sit above the threshold) and assert
    the exact rank-based top-cap still comes back."""
    import hashlib

    from dbt_tpcdi_spark.operators import dedup as D

    cap, margin = 3, 1
    thresh = margin * cap * (1 << 20)

    def v20(i: int) -> int:
        h = hashlib.md5(f"{D._LSH_CAP_SALT}{i}".encode()).hexdigest()
        return int(h[:5], 16)

    ids = [i for i in range(10_000) if v20(i) * 4 >= thresh][:4]
    assert len(ids) == 4, "search range too small"
    rows = [(i, "the quick brown fox shared nav footer text")
            for i in ids]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash_signature(d, "text")
    kept = D.capped_bucket_members(
        sigs, "doc_id", cap=cap, margin=margin).collect()
    per_bucket: dict = {}
    for r in kept:
        assert r["sz"] == 4  # hot: sz > margin*cap, zero survivors
        per_bucket.setdefault((r["band"], r["h"]), set()).add(
            r["doc_id"])
    assert len(per_bucket) == D.LSH_BANDS  # no band's bucket vanished
    order = sorted(ids, key=lambda i: (
        hashlib.md5(f"{D._LSH_CAP_SALT}{i}".encode()).hexdigest(), i))
    expect = set(order[:cap])
    for members in per_bucket.values():
        assert members == expect


def test_sliding_extremes_blocks_equals_naive_frame(spark):
    """The O(n) two-block decomposition (r10) must reproduce the naive
    O(frame·n) moving-frame min/max EXACTLY — values, tie dates, and
    partial leading frames — across frame sizes that hit every edge:
    frame 1 (prefix only), frames larger than a partition, frames that
    land exactly on block boundaries."""
    import random

    from pyspark.sql import Window

    from dbt_tpcdi_spark.operators.windows import sliding_extremes_blocks

    random.seed(42)
    rows = []
    for k in range(6):
        n = random.choice([1, 2, 7, 8, 14, 15, 16, 50])
        vals = [float(random.choice([1, 2, 3, 2, 1])) for _ in range(n)]
        rows += [(k, i, vals[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "k int, i int, v double")
    lo_st = F.struct(F.col("v").alias("v"), F.col("i").alias("d"))
    hi_st = F.struct(F.col("v").alias("v"), (-F.col("i")).alias("nd"))
    for prec in (0, 1, 6, 7, 8, 100):
        w = (
            Window.partitionBy("k").orderBy(F.col("i").asc())
            .rowsBetween(-prec, 0)
        )
        naive = df.select(
            "k", "i",
            F.min(lo_st).over(w).alias("lo"),
            F.max(hi_st).over(w).alias("hi"),
        )
        blk = sliding_extremes_blocks(
            df, "k", "i",
            [("lo", lo_st, "min"), ("hi", hi_st, "max")], prec,
            skew_safe=False,
        ).select("k", "i", "lo", "hi")
        assert naive.exceptAll(blk).isEmpty()
        assert blk.exceptAll(naive).isEmpty()
        # the hot-key-parallel plan (r11; the DEFAULT since r12) must
        # be row-identical too — same frames, no per-key serial pass
        safe = sliding_extremes_blocks(
            df, "k", "i",
            [("lo", lo_st, "min"), ("hi", hi_st, "max")], prec,
            skew_safe=True,
        ).select("k", "i", "lo", "hi")
        assert naive.exceptAll(safe).isEmpty(), prec
        assert safe.exceptAll(naive).isEmpty(), prec


def test_sliding_extremes_skew_safe_no_per_key_window(spark):
    """Plan shape of the skew-safe path: every Window partitions by
    MORE than the bare key ((key, slice) or (key, block)) and the
    suffix fetch is a join — so a key holding most of the table never
    serializes into one task."""
    from dbt_tpcdi_spark.operators.windows import sliding_extremes_blocks

    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 3 AS INT) AS k", "CAST(id AS INT) AS i",
        "CAST(id % 17 AS DOUBLE) AS v")
    out = sliding_extremes_blocks(
        df, "k", "i", [("lo", F.col("v"), "min")], 9, skew_safe=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no Window partitioned by the key alone: the key always rides
    # with __pid or __blk in the windowspecdefinition
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "__pid" in ln or "__blk" in ln, ln
    assert "Join" in plan  # the suffix fetch is the equi-join


def test_sliding_extremes_chunk_and_fallback_paths(spark):
    """The skew-safe numbering has two constructions (r12): VALUE
    chunks for date/integer orders (pure-function chunk ids — no
    range shuffle, no persist) and the sampled-range-partition
    fallback for other types. Both must equal the naive frame exactly,
    including NEGATIVE order values (div truncates toward zero, so
    chunks near 0 merge up to 2n-1 values — bounded, and order stays
    monotone)."""
    import random

    from pyspark.sql import Window

    from dbt_tpcdi_spark.operators.windows import sliding_extremes_blocks

    random.seed(7)
    rows = []
    for k in range(4):
        vals = sorted(random.sample(range(-40, 40), 25))
        rows += [(k, i, float(random.randint(1, 5))) for i in vals]
    for order_type, cast in (("int", int), ("double", float)):
        df = spark.createDataFrame(
            [(k, cast(i), v) for k, i, v in rows],
            f"k int, i {order_type}, v double")
        w = (Window.partitionBy("k").orderBy(F.col("i").asc())
             .rowsBetween(-6, 0))
        naive = df.select(
            "k", "i", F.min("v").over(w).alias("lo"))
        got = sliding_extremes_blocks(
            df, "k", "i", [("lo", F.col("v"), "min")], 6,
        ).select("k", "i", "lo")
        assert naive.exceptAll(got).isEmpty(), order_type
        assert got.exceptAll(naive).isEmpty(), order_type
        plan = got._jdf.queryExecution().executedPlan().toString()
        if order_type == "int":
            # value-chunk path: no range shuffle anywhere
            assert "rangepartitioning" not in plan, plan
        else:
            # fallback path: sampled range partitioning + persist
            assert "rangepartitioning" in plan, plan


def test_chunked_running_sum_equals_window_and_stays_parallel(spark):
    """The two-phase value-chunk running sum (r13, the training-export
    pack plan) must equal the textbook per-key cumulative window
    exactly — including a hot key holding most rows, sparse/negative
    order values, and zero values — and its plan must never window on
    the bare key alone."""
    import random

    from pyspark.sql import Window

    from dbt_tpcdi_spark.operators.windows import chunked_running_sum

    random.seed(13)
    rows = []
    # hot key 0 holds ~80% of rows; ids sparse and negative-capable
    ids = random.sample(range(-500, 4000), 400)
    for i, o in enumerate(ids):
        k = 0 if i % 5 else f"k{i % 3}"
        rows.append((str(k), o, random.randint(0, 9)))
    df = spark.createDataFrame(rows, "k string, o int, v long")
    w = (Window.partitionBy("k").orderBy("o")
         .rowsBetween(Window.unboundedPreceding, 0))
    naive = df.select("k", "o", F.sum("v").over(w).alias("c"))
    got = chunked_running_sum(df, ["k"], "o", "v", "c", chunk=32)
    assert naive.exceptAll(got.select("k", "o", "c")).isEmpty()
    assert got.select("k", "o", "c").exceptAll(naive).isEmpty()
    # plan shape: every local window rides (k, chunk); the only
    # bare-key window is the chunk-offset cumulation (chunk-count rows)
    plan = got._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert any("__rs_chk" in ln for ln in win_lines), plan
    # non-integral order column refuses loudly
    import pytest

    with pytest.raises(ValueError, match="integral"):
        chunked_running_sum(
            df.withColumn("o", F.col("o").cast("double")),
            ["k"], "o", "v", "c")


def test_pack_bins_invariants(spark):
    """Next-fit placement invariants beyond the oracle hash: no bin
    overflows the cap, offsets within a bin are contiguous (each doc
    starts where the previous ended), and every kept doc fits."""
    from dbt_tpcdi_spark.queries.llm import _BIN_CAP, pack_bins
    from tests.conftest import SF_SMOKE

    rows = pack_bins(spark, SF_SMOKE).collect()
    assert rows, "packing produced no rows"
    by_bin: dict = {}
    for r in rows:
        assert 1 <= r["n_tokens"] <= _BIN_CAP
        assert r["bin_offset"] + r["n_tokens"] <= _BIN_CAP
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    multi = 0
    for docs in by_bin.values():
        docs.sort(key=lambda r: r["bin_offset"])
        assert docs[0]["bin_offset"] == 0
        for a, b in zip(docs, docs[1:]):
            assert b["bin_offset"] == a["bin_offset"] + a["n_tokens"]
        multi += len(docs) > 1
    assert multi > 0, "cap so tight nothing ever packed together"


def test_epoch_mix_copy_counts(spark):
    """Every doc appears exactly n_copies times with epochs 1..n_copies,
    n_copies = ⌊u/4⌋ (+1 iff the hash keep fired) — and at least one
    source exercises each of the 0/1/2-full-epoch regimes."""
    from collections import Counter

    from dbt_tpcdi_spark.queries.llm import epoch_mix_sample
    from tests.conftest import SF_SMOKE

    rows = epoch_mix_sample(spark, SF_SMOKE).collect()
    per_doc = Counter()
    epochs: dict = {}
    for r in rows:
        per_doc[(r["doc_id"], r["source"])] += 1
        epochs.setdefault((r["doc_id"], r["source"]), set()).add(r["epoch"])
    fulls = set()
    for (doc, src), n in per_doc.items():
        u = (int(src[3:]) % 10) + 1
        assert n in (u // 4, u // 4 + 1)
        assert epochs[(doc, src)] == set(range(1, n + 1))
        fulls.add(u // 4)
    assert fulls == {0, 1, 2}


def test_bm25_index_compact_preserves_ranking_and_pruning(spark, tmp_path):
    """Maintenance on the lexical index: after two append batches the
    postings span base + 2 batch dirs; range-compacting on the term
    must (a) leave the served ranking bit-identical and (b) RESTORE
    term-file pruning (appends put every term in each batch file, so
    compaction is what keeps reads narrow)."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod
    from dbt_tpcdi_spark.queries.corpus import (
        _BM25_IDX_TERMS,
        bm25_index_append,
        bm25_index_build,
        bm25_index_topk,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    part = md5_mod(F.col("doc_id"), 3, "bm25compact")
    idx = bm25_index_build(d.filter(part == 0), str(tmp_path / "idx"))
    bm25_index_append(idx, d.filter(part == 1))
    bm25_index_append(idx, d.filter(part == 2))
    before, rep_before = bm25_index_topk(idx, _BM25_IDX_TERMS)
    before_rows = [(r["doc_id"], r["score_q"]) for r in before.collect()]

    idx["post"].compact(target_files=8, range_by=["w"])
    after, rep_after = bm25_index_topk(idx, _BM25_IDX_TERMS)
    after_rows = [(r["doc_id"], r["score_q"]) for r in after.collect()]

    assert after_rows == before_rows
    assert rep_after["files_read"] < rep_after["files_total"]
    # compaction narrowed the read back to the probed terms' files
    assert rep_after["files_read"] <= rep_before["files_read"]


def test_bm25_index_append_requires_disjoint_doc_ids(spark, tmp_path):
    """Pin the append-only contract (ADVICE r12): bm25_index_append is
    NOT an upsert — re-appending already-indexed doc_ids duplicates
    their (w, doc_id) postings rows (doubling tf and inflating
    serve-time df), so the index diverges from a rebuild. This test
    makes the failure mode concrete so a future caller who violates
    the documented precondition has a red pin, not a silent skew."""
    from dbt_tpcdi_spark.queries.corpus import (
        _BM25_IDX_TERMS,
        bm25_index_append,
        bm25_index_build,
        bm25_index_topk,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    clean = bm25_index_build(d, str(tmp_path / "clean"))
    clean_rows = [
        (r["doc_id"], r["score_q"])
        for r in bm25_index_topk(clean, _BM25_IDX_TERMS)[0].collect()
    ]

    dup = bm25_index_build(d, str(tmp_path / "dup"))
    n_post = dup["post"].read().count()
    bm25_index_append(dup, d)  # violates the disjointness precondition
    # every posting row is now duplicated ...
    assert dup["post"].read().count() == 2 * n_post
    # ... and the served scores diverge from the clean rebuild
    dup_rows = [
        (r["doc_id"], r["score_q"])
        for r in bm25_index_topk(dup, _BM25_IDX_TERMS)[0].collect()
    ]
    assert [s for _, s in dup_rows] != [s for _, s in clean_rows]


def test_bm25_index_delete_tombstones_survive_compact(spark, tmp_path):
    """The takedown path's maintenance interplay: tombstoned docs stay
    deleted after the postings table is range-compacted (compaction
    folds files, never logical state), and the served ranking equals a
    from-scratch build on the surviving docs."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod
    from dbt_tpcdi_spark.queries.corpus import (
        _BM25_IDX_TERMS,
        bm25_index_build,
        bm25_index_delete,
        bm25_index_topk,
    )
    from dbt_tpcdi_spark.sources.parquet import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    part = md5_mod(F.col("doc_id"), 4, "bm25del")
    idx = bm25_index_build(d, str(tmp_path / "full"))
    bm25_index_delete(idx, d.filter(part == 0).select("doc_id"))
    want = [
        (r["doc_id"], r["score_q"])
        for r in bm25_index_topk(
            bm25_index_build(d.filter(part != 0),
                             str(tmp_path / "rest")),
            _BM25_IDX_TERMS)[0].collect()
    ]
    got = [(r["doc_id"], r["score_q"])
           for r in bm25_index_topk(idx, _BM25_IDX_TERMS)[0].collect()]
    assert got == want
    idx["post"].compact(target_files=8, range_by=["w"])
    after = [(r["doc_id"], r["score_q"])
             for r in bm25_index_topk(idx, _BM25_IDX_TERMS)[0].collect()]
    assert after == want


def test_assemble_sessions_two_phase_equals_single_array(spark):
    """The r13 two-phase thread assembly (per-chunk sorted segments →
    chunk-ordered segment concat) must be byte-identical to the naive
    single collect_list + array_sort formulation — including sessions
    that straddle chunk edges, ties on ts_ms at a chunk boundary, and
    single-event sessions."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.queries.extended import (
        _SESSION_CHUNK_MS,
        assemble_sessions_frame,
        sessionize_chunked_events,
    )

    c = _SESSION_CHUNK_MS
    rows = [
        # user 1: ONE session straddling three 1-hour chunks — every
        # gap is 25 min (< the 30-min cutoff), with a tie on ts_ms
        (1, 10, 3_000_000, "a"), (1, 11, 4_500_000, "b"),
        (1, 12, 4_500_000, "c"), (1, 13, 6_000_000, "d"),
        (1, 14, 7_500_000, "e"), (1, 15, 9_000_000, "f"),
        # user 1: later second session (gap >> 30 min)
        (1, 16, 30_000_000, "g"),
        # user 2: single-event session exactly on a chunk boundary
        (2, 20, c, "h"),
        # user 2: two events same chunk, reversed insert order
        (2, 22, 5 * c + 2_000, "j"), (2, 21, 5 * c + 1_000, "i"),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, event_type string"
    ).repartition(7)

    def single_array(ev):
        sess = sessionize_chunked_events(ev).withColumn(
            "session_id", F.col("session_id").cast("bigint"))
        turn = F.struct("ts_ms", "event_id", "event_type")
        return sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_turns"),
            F.md5(F.array_join(F.transform(
                F.array_sort(F.collect_list(turn)),
                lambda t: F.concat(t["event_id"].cast("string"),
                                   F.lit(":"), t["event_type"]),
            ), "|")).alias("thread_fp"),
        )

    want = sorted(map(tuple, single_array(e).collect()))
    got = sorted(map(tuple, assemble_sessions_frame(e).collect()))
    assert got == want
    # the straddling session really is one thread of 6 turns
    assert (1, 1, 6) in {t[:3] for t in got}


def test_masked_intersection_unrolled_equals_hof(spark):
    """The r13 unrolled masked_intersection (plan-time nchunks) must
    equal the higher-order zip_with/aggregate form for every width —
    single-chunk, multi-chunk, empty-overlap — and the dense builder
    must expose the width it sized the arrays with."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.dedup import (
        _MASK_UNROLL_MAX,
        masked_intersection,
        with_token_masks,
    )

    rows = [
        ([1, 0, 5], [3, 0, 4]),          # overlap in chunks 1 and 3
        ([0, 0, 0], [7, 7, 7]),          # empty left
        ([-1, -1, -1], [-1, -1, -1]),    # all 64 bits set, 3 chunks
        ([2, 4, 8], [1, 2, 4]),          # disjoint bits
    ]
    df = spark.createDataFrame(rows, "a array<long>, b array<long>")
    got = df.select(
        masked_intersection(F.col("a"), F.col("b"), nchunks=3).alias("u"),
        masked_intersection(F.col("a"), F.col("b")).alias("h"),
    ).collect()
    assert all(r["u"] == r["h"] for r in got)
    # all-ones across 3 chunks is 3×64 shared bits
    assert got[2]["u"] == 192
    # widths beyond the unroll bound fall back to the HOF form (same
    # Column semantics; just assert it still evaluates correctly)
    wide = spark.createDataFrame(
        [([1] * (_MASK_UNROLL_MAX + 1), [1] * (_MASK_UNROLL_MAX + 1))],
        "a array<long>, b array<long>",
    ).select(masked_intersection(
        F.col("a"), F.col("b"), nchunks=_MASK_UNROLL_MAX + 1).alias("x"))
    assert wide.first()["x"] == _MASK_UNROLL_MAX + 1
    # the dense builder rides the width on the frame
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    dense = with_token_masks(d, "doc_id", "text", [])
    assert isinstance(dense._mask_nchunks, int) and dense._mask_nchunks >= 1


def test_capped_pair_expansion_equals_self_join(spark):
    """r14: lsh_candidate_pairs_capped expands pairs from per-bucket
    sorted id lists; the multiset must equal the r13 self-join's
    (band-duplicated, id_a < id_b) output exactly — including hot
    buckets over the cap and singleton buckets emitting nothing."""
    from dbt_tpcdi_spark.operators import dedup as D

    rows = [(i, "shared nav footer boilerplate text common")
            for i in range(40)]                      # one hot bucket set
    rows += [(500 + i, f"unique doc {i} alpha beta gamma")
             for i in range(12)]                     # mostly singletons
    rows += [(900, "pair doc zeta eta"), (901, "pair doc zeta eta")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash_signature(d, "text")
    new = D.lsh_candidate_pairs_capped(sigs, "doc_id", cap=8,
                                       distinct=False)
    kept = D.capped_bucket_members(sigs, "doc_id", 8, 4)
    l, r = kept.alias("l"), kept.alias("r")
    old = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.h") == F.col("r.h"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() > 0
    # distinct=True twin: the deduped sets agree too
    new_d = D.lsh_candidate_pairs_capped(sigs, "doc_id", cap=8,
                                         distinct=True)
    assert new_d.exceptAll(old.distinct()).count() == 0
    assert old.distinct().exceptAll(new_d).count() == 0
    D.release_lsh_caches(new)
    D.release_lsh_caches(new_d)
    D.release_lsh_caches(kept)
