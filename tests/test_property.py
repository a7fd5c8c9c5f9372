"""Property-style randomized tests (seeded, deterministic): invariants
that must hold for any input, run over several generated datasets.
Extends the reference's thin test strategy (SURVEY.md §5) with the
style it lacks."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators.dedup import (
    jaccard_pairs_bitset,
    jaccard_pairs_via_postings,
)
from dbt_tpcdi_spark.operators.scd2 import SCD2_SENTINEL, merge_scd2, with_scd2
from dbt_tpcdi_spark.operators.skew import salted_join

SEEDS = [7, 42, 1337]


def _random_versions(rng: random.Random, n_keys=8, max_versions=5):
    rows = []
    base = dt.datetime(2020, 1, 1)
    for k in range(n_keys):
        stamps = rng.sample(range(0, 10_000), rng.randint(1, max_versions))
        for i, s in enumerate(stamps):
            rows.append((k, base + dt.timedelta(minutes=s), f"p{k}-{i}"))
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_scd2_invariants(spark, seed):
    rng = random.Random(seed)
    df = spark.createDataFrame(
        _random_versions(rng),
        "k int, effective_timestamp timestamp, payload string",
    )
    out = with_scd2(df, key="k").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    sentinel = dt.datetime.fromisoformat(SCD2_SENTINEL.replace(" ", "T"))
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.effective_timestamp)
        # exactly one current version per key, and it's the last one
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].end_timestamp == sentinel
        # windows tile the timeline with 1ms gaps, no overlap
        for a, b in zip(rows, rows[1:]):
            assert a.end_timestamp == b.effective_timestamp - dt.timedelta(
                milliseconds=1
            )


@pytest.mark.parametrize("seed", SEEDS)
def test_merge_scd2_equals_full_recompute(spark, seed):
    rng = random.Random(seed)
    rows = _random_versions(rng, n_keys=6)
    rng.shuffle(rows)
    cut = len(rows) // 2
    schema = "k int, effective_timestamp timestamp, payload string"
    initial = spark.createDataFrame(rows[:cut], schema)
    updates = spark.createDataFrame(rows[cut:], schema)
    merged = merge_scd2(with_scd2(initial, key="k"), updates, key="k")
    full = with_scd2(initial.unionByName(updates), key="k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_bitset_jaccard_equals_postings(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(rng.randint(5, 80))]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 15))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tau = rng.choice([0.3, 0.5, 0.8])
    a = sorted(map(tuple, jaccard_pairs_bitset(
        df, "doc_id", "text", threshold=tau).collect()))
    b = sorted(map(tuple, jaccard_pairs_via_postings(
        df, "doc_id", "text", threshold=tau).collect()))
    assert a == b


@pytest.mark.parametrize("seed", SEEDS)
def test_salted_join_equals_plain_join(spark, seed):
    rng = random.Random(seed)
    # skewed fact: 80% of rows on one key
    fact = spark.createDataFrame(
        [(i, 0 if rng.random() < 0.8 else rng.randint(1, 5), rng.random())
         for i in range(500)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(6)], "k long, label string"
    )
    salted = salted_join(fact, dim, "k", salt_from="row_id", n_salts=8)
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.select("row_id", "k", "v", "label").collect())) == \
        sorted(map(tuple, plain.select("row_id", "k", "v", "label").collect()))


def test_hash_sample_partitioning_invariant(spark):
    """The whole point of hash_sample: the selected set must not depend
    on partitioning (df.sample() fails this)."""
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.functions.scalar import hash_sample
    from dbt_tpcdi_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    pred = hash_sample(F.col("doc_id"), 0.2, salt="x")
    a = sorted(r.doc_id for r in d.filter(pred).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in d.repartition(17, "lang").filter(pred).select("doc_id").collect()
    )
    c = sorted(
        r.doc_id for r in d.coalesce(1).filter(pred).select("doc_id").collect()
    )
    assert a == b == c and 0 < len(a) < d.count()


def test_approx_distinct_bounded_error(spark):
    """The query now emits the error-envelope check itself (exact counts
    + within_rel_err booleans, so the sketch has an exact oracle);
    independently re-verify exact_parts and assert every envelope bool.
    """
    from dbt_tpcdi_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["approx_distinct"].build(spark, SF_SMOKE).collect()
    from dbt_tpcdi_spark.sources.parquet import load_table

    exact = {
        r.l_returnflag: r.exact
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r.exact_parts == exact[r.l_returnflag]
        assert r.hll_within_rel_err and r.median_within_rel_err


@pytest.mark.parametrize("seed", SEEDS)
def test_merge_scd2_random_splits_equal_full_build(spark, seed):
    """Any partition of the version stream into base + N delta batches,
    merged sequentially, must equal the one-shot SCD2 build — the
    invariant behind Batch2/3 incremental loading AND the streaming
    merge (which replays arbitrary re-batchings)."""
    rng = random.Random(seed)
    rows = _random_versions(rng, n_keys=10, max_versions=6)
    schema = "k int, effective_timestamp timestamp, payload string"
    n_batches = rng.randint(2, 4)
    batches: list[list] = [[] for _ in range(n_batches)]
    for row in rows:
        batches[rng.randrange(n_batches)].append(row)
    base, *deltas = batches
    if not base:  # keep the base non-empty: steal a row from a delta
        donor = next(d for d in deltas if d)
        base.append(donor.pop())

    merged = with_scd2(spark.createDataFrame(base, schema), key="k")
    for d in deltas:
        if not d:
            continue
        merged = merge_scd2(
            merged, spark.createDataFrame(d, schema), key="k"
        )
    full = with_scd2(spark.createDataFrame(rows, schema), key="k")
    assert merged.exceptAll(full).isEmpty()
    assert full.exceptAll(merged).isEmpty()


@pytest.mark.parametrize("seed", SEEDS)
def test_versioned_upsert_last_writer_wins(spark, seed, tmp_path):
    from dbt_tpcdi_spark.plans.versioned import VersionedTable

    rng = random.Random(seed)
    state = {k: rng.randint(0, 99) for k in range(12)}
    vt = VersionedTable(spark, str(tmp_path / f"t{seed}"))
    vt.commit(spark.createDataFrame(list(state.items()), "k int, v int"))
    for _ in range(3):
        ups = {rng.randrange(18): rng.randint(100, 199)
               for _ in range(rng.randint(1, 6))}
        vt.upsert(spark.createDataFrame(list(ups.items()), "k int, v int"),
                  key="k")
        state.update(ups)
    got = {r.k: r.v for r in vt.read().collect()}
    assert got == state


def test_mg_reduce_invariants_hold_on_arbitrary_counters():
    """Misra–Gries eviction invariants on arbitrary count multisets:
    ≤ k survivors, every survivor undercounted by the SAME eviction
    total d, and d·(k+1) never exceeds the weight actually removed —
    the telescoping step behind the n/(k+1) error bound."""
    from hypothesis import given, strategies as st

    from dbt_tpcdi_spark.operators.frequent import mg_reduce

    @given(
        st.dictionaries(
            st.text(min_size=1, max_size=4),
            st.integers(min_value=1, max_value=10_000),
            min_size=0,
            max_size=40,
        ),
        st.integers(min_value=1, max_value=12),
    )
    def check(counts, k):
        before = dict(counts)
        out = mg_reduce(dict(counts), k)
        assert len(out) <= k
        if len(before) <= k:
            assert out == before
            return
        vals = sorted(before.values(), reverse=True)
        d = vals[k]
        # survivors: exactly the counters above d, each reduced by d
        assert out == {t: c - d for t, c in before.items() if c > d}
        removed = sum(before.values()) - sum(out.values())
        assert d * (k + 1) <= removed

    check()
