"""Unigram-LM Viterbi properties: optimality + deterministic tie
rule vs a brute-force enumerator, and qlog2 exactness. The corpus
gate is the ``unigram_encode`` oracle query."""

from __future__ import annotations

import math
import random

from dbt_tpcdi_spark.operators import unigram as U


def test_qlog2_monotone_and_tight():
    prev = None
    for c in list(range(1, 2000)) + [2**20, 2**40, 10**9]:
        q = U.qlog2(c)
        assert abs(q / U.UNI_LOG_Q - math.log2(c)) <= 0.09
        if prev is not None:
            assert q >= prev
        prev = q if c < 2000 else None


def _brute(word: str, scores: dict[str, int], max_len: int):
    """All segmentations by recursion; winner = max score, ties to the
    segmentation the longest-final-piece backtrace picks (compare
    piece-length sequences read from the END, descending)."""
    segs: list[list[str]] = []

    def rec(pos: int, acc: list[str]) -> None:
        if pos == len(word):
            segs.append(list(acc))
            return
        for ln in range(1, min(max_len, len(word) - pos) + 1):
            piece = word[pos:pos + ln]
            if piece in scores:
                rec(pos + ln, acc + [piece])

    rec(0, [])
    assert segs

    def key(seg):
        return (
            sum(scores[p] for p in seg),
            tuple(len(p) for p in reversed(seg)),
        )

    return max(segs, key=key)


def test_viterbi_matches_bruteforce(spark):
    rng = random.Random(11)
    alphabet = "abc"
    words = sorted(
        {
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 9)))
            for _ in range(150)
        }
    )
    # every char + random multi pieces; power-of-two weights make
    # qlog2 scores exact multiples of 1024, so score TIES between
    # different segmentations actually occur and the tie rule is
    # exercised, not just optimality
    wts = {c: rng.choice([2, 4, 8]) for c in alphabet}
    for _ in range(40):
        ln = rng.randint(2, 4)
        form = "".join(rng.choice(alphabet) for _ in range(ln))
        wts[form] = rng.choice([1, 2, 4, 8, 16])
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    vdf = spark.createDataFrame(
        sorted(wts.items()), "form string, wt long"
    )
    enc = U.uni_encode_words(wdf, vdf)
    qt = U.qlog2(sum(wts.values()))
    derived = {f: U.qlog2(w) - qt for f, w in wts.items()}
    got = {r["word"]: (r["pieces"], r["score"]) for r in enc.collect()}
    max_len = max(len(f) for f in wts)
    for w in words:
        seg = _brute(w, derived, max_len)
        want_score = sum(derived[p] for p in seg)
        assert got[w] == (" ".join(seg), want_score), w


def test_tie_rule_prefers_longest_final_piece(spark):
    # 'ab' can split as [ab] or [a b]; with wt chosen so scores tie is
    # impossible via qlog2 — instead check the documented rule on a
    # case where two optimal paths exist: pieces {a, b, ab} all with
    # equal wt give [ab] (1 piece, higher score) trivially; pieces
    # {a, b} only → [a b]. The interesting tie: word 'aaaa' with
    # {a, aa} at equal wt — score(aa)=score(a), so 2×aa beats 4×a and
    # [aa aa] wins; backtrace must NOT emit [a aa a] style mixes.
    wdf = spark.createDataFrame([("aaaa",)], "word string")
    vdf = spark.createDataFrame(
        [("a", 8), ("aa", 8)], "form string, wt long"
    )
    r = U.uni_encode_words(wdf, vdf).collect()[0]
    assert r["pieces"] == "aa aa"
    assert r["n_pieces"] == 2


def test_qlog2_sql_twin_parity_hypothesis():
    """Property: qlog2 (Python) == qlog2_sql (DuckDB) for ANY c ≥ 1 —
    the cross-engine contract every unigram DP cell rests on."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=2**52))
    def check(c):
        got = con.execute(
            f"SELECT {U.qlog2_sql(str(c))}"
        ).fetchone()[0]
        assert got == U.qlog2(c), c

    check()
    con.close()
