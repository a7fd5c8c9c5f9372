"""WordPiece operator properties: greedy-matcher equivalence against a
brute-force reference, UNK handling, and char-coverage termination.
The corpus-level gate is the ``wordpiece_encode`` oracle query."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators import wordpiece as W


def _ref_encode(word: str, vset: set[tuple[str, bool]],
                max_len: int) -> tuple[list[str], int]:
    """Reference greedy longest-match-first (independent impl)."""
    pos, out, unk = 0, [], 0
    while pos < len(word):
        piece = None
        for ln in range(min(max_len, len(word) - pos), 0, -1):
            cand = word[pos:pos + ln]
            if (cand, pos > 0) in vset:
                piece = cand
                break
        if piece is None:
            out.append(W.WP_UNK)
            unk += 1
            pos += 1
        else:
            out.append(piece if pos == 0 else "##" + piece)
            pos += len(piece)
    return out, unk


def test_greedy_matches_reference(spark):
    rng = random.Random(7)
    alphabet = "abcde"
    words = sorted(
        {
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 12)))
            for _ in range(200)
        }
    )
    # random vocab: every char in initial form only (forces UNK at
    # continuation positions unless a multi-char piece covers them)
    vset = {(c, False) for c in alphabet}
    for _ in range(60):
        ln = rng.randint(2, 4)
        form = "".join(rng.choice(alphabet) for _ in range(ln))
        vset.add((form, rng.random() < 0.5))
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    vdf = spark.createDataFrame(
        [(f, c) for f, c in sorted(vset)], "form string, cont boolean"
    )
    got = {
        r["word"]: (r["wp"], r["n_pieces"], r["n_unk"])
        for r in W.wp_encode_words(wdf, vdf).collect()
    }
    max_len = max(len(f) for f, _ in vset)
    assert set(got) == set(words)
    n_unk_total = 0
    for w in words:
        pieces, unk = _ref_encode(w, vset, max_len)
        assert got[w] == (" ".join(pieces), len(pieces), unk), w
        n_unk_total += unk
    assert n_unk_total > 0  # the UNK branch was actually exercised


def test_corpus_vocab_covers_all_chars(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from dbt_tpcdi_spark.operators import text as X

    wc = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    enc = W.wp_encode_words(wc, W.wp_vocab(wc))
    assert enc.filter(F.col("n_unk") > 0).count() == 0
    # multi-char pieces actually selected (not a char-only fallback)
    assert enc.filter(F.col("n_pieces") < F.length("word")).count() > 0
