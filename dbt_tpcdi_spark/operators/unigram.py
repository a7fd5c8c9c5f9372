"""Unigram-LM subword segmentation (Kudo 2018 / SentencePiece init):
Viterbi maximum-likelihood segmentation of each word against a
position-free piece vocabulary with count-derived scores — the third
tokenizer family next to BPE's merge chain (operators/bpe.py) and
WordPiece's greedy longest-match (operators/wordpiece.py). This is the
SentencePiece INITIALIZATION step (substring-count seed vocabulary +
one Viterbi pass); the EM prune/re-estimate loop is deliberately out
of scope — the init segmentation is already the family's
representative shape (DP over piece scores vs greedy vs merges).

Log-probabilities without libm: cross-engine float logs diverge at
boundaries, so piece scores use the integer piecewise-linear base-2
log

    qlog2(c) = 1024·(bitlen(c) − 1) + (1024·c) div 2^(bitlen(c)−1)
               − 1024

— exact integer arithmetic in Python, Spark SQL, and DuckDB alike,
monotone in c, and within 0.086 of true log2 (the maximal secant
error of the linear segment between powers of two), which only
rescales scores uniformly. A piece scores
``qlog2(count) − qlog2(total)`` (< 0), so Viterbi's Σ naturally
penalizes extra pieces.

Scale shape (same as the siblings): corpus-sized work stays
declarative — tokenize is one posexplode, doc reassembly one equi-join
on ``word`` + per-doc aggregate; the Viterbi DP runs executor-local
over the DISTINCT-WORD table (vocabulary-sized, Heaps' law) with the
bounded scored vocabulary broadcast, O(len · max_piece) per word.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

UNI_MAX_PIECE = 6
UNI_TOPK = 120

#: fixed-point resolution of qlog2 (2^10 steps per octave)
UNI_LOG_Q = 1024


def qlog2(c: int) -> int:
    """Integer piecewise-linear log2 (see module docstring). Exact
    Python mirror of ``qlog2_sql``."""
    bl = c.bit_length() - 1
    return UNI_LOG_Q * bl + ((UNI_LOG_Q * c) >> bl) - UNI_LOG_Q


def qlog2_sql(c: str) -> str:
    """DuckDB twin of ``qlog2`` — pure integer ops (bin() length for
    bit length, shift for the power of two, floor division). The
    argument is cast to BIGINT before scaling: DuckDB multiplies INT32
    literals in INT32, so ``1024 * c`` overflows at c ≥ 2^21 otherwise
    (found by the hypothesis parity test)."""
    big = f"cast({c} AS BIGINT)"
    bl = f"(length(bin({big})) - 1)"
    return (
        f"({UNI_LOG_Q} * {bl} + ({UNI_LOG_Q} * {big}) "
        f"// (1::BIGINT << {bl}) - {UNI_LOG_Q})"
    )


def uni_vocab(word_counts: DataFrame, topk: int = UNI_TOPK,
              max_len: int = UNI_MAX_PIECE) -> DataFrame:
    """Position-free piece vocabulary ``(form, wt)`` from a weighted
    word table ``(word, n)``: every substring of length ≤ ``max_len``
    weighted by Σ word count over occurrences (multiplicity within a
    word kept). All single characters survive unconditionally (so
    every word has at least the char segmentation — no UNK needed);
    multi-char pieces keep the global top-``topk`` by
    (weight DESC, form) via ``orderBy().limit()`` —
    TakeOrderedAndProject, no global window."""
    subs = word_counts.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), p ->
                    transform(sequence(1, least({max_len},
                                       length(word) - p + 1)), l ->
                        substring(word, p, l))))"""
            )
        ).alias("form"),
        F.col("n"),
    )
    agg = subs.groupBy("form").agg(F.sum("n").cast("long").alias("wt"))
    chars = agg.filter(F.length("form") == 1)
    multi = (
        agg.filter(F.length("form") >= 2)
        .orderBy(F.desc("wt"), F.asc("form"))
        .limit(topk)
    )
    return chars.unionByName(multi)


def uni_vocab_sql(wc_sql: str, topk: int = UNI_TOPK,
                  max_len: int = UNI_MAX_PIECE) -> str:
    """DuckDB twin of ``uni_vocab``: CTE chain ending in ``__unvocab``
    (form, wt); ``wc_sql`` must yield (word, n)."""
    return f"""__unwc AS MATERIALIZED ({wc_sql}),
    __unsub AS (
        SELECT substr(word, cast(p AS int), cast(l AS int)) AS form, n
        FROM (SELECT word, n, p,
                     unnest(range(1, least({max_len},
                                  length(word) - p + 1) + 1)) AS l
              FROM (SELECT word, n,
                           unnest(range(1, length(word) + 1)) AS p
                    FROM __unwc))
    ),
    __unagg AS (
        SELECT form, cast(sum(n) AS bigint) AS wt
        FROM __unsub GROUP BY 1
    ),
    __unvocab AS (
        SELECT form, wt FROM __unagg WHERE length(form) = 1
        UNION ALL
        SELECT form, wt FROM (
            SELECT form, wt FROM __unagg WHERE length(form) >= 2
            ORDER BY wt DESC, form LIMIT {topk})
    )"""


_UNI_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("pieces", StringType()),
        StructField("n_pieces", LongType()),
        StructField("score", LongType()),
    ]
)


def uni_encode_words(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Viterbi max-score segmentation of each distinct word: piece
    score = qlog2(wt) − qlog2(Σ wt); DP best[j] = max over vocab
    pieces ending at j; ties resolve to the LONGEST final piece (the
    deterministic backtrace rule the SQL twin replays). Returns
    ``(word, pieces, n_pieces, score)``.

    The vocab collect is bounded metadata (topk + chars); the DP runs
    Arrow-batched over the vocabulary-sized word table."""
    rows = vocab.collect()
    total = sum(r["wt"] for r in rows)
    qt = qlog2(total)
    scores = {r["form"]: qlog2(r["wt"]) - qt for r in rows}
    max_len = max((len(f) for f in scores), default=1)
    bv = words.sparkSession.sparkContext.broadcast((scores, max_len))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sc, mlen = bv.value
        neg = None  # -inf stand-in: below any achievable score
        for pdf in batches:
            out = {"word": [], "pieces": [], "n_pieces": [],
                   "score": []}
            for w in pdf["word"]:
                n = len(w)
                best: list[int | None] = [0] + [neg] * n
                for j in range(1, n + 1):
                    b = neg
                    for ln in range(1, min(mlen, j) + 1):
                        s = sc.get(w[j - ln:j])
                        if s is None or best[j - ln] is neg:
                            continue
                        cand = best[j - ln] + s
                        if b is neg or cand > b:
                            b = cand
                    best[j] = b
                if best[n] is neg:
                    # never loop silently: an uncovered character
                    # makes the word unsegmentable under this vocab
                    raise ValueError(
                        f"unigram vocab does not cover word {w!r}; "
                        "include all single characters (uni_vocab "
                        "does) or pre-filter the corpus"
                    )
                # backtrace, longest piece on score ties
                pieces: list[str] = []
                j = n
                while j > 0:
                    pick = 0
                    for ln in range(min(mlen, j), 0, -1):
                        s = sc.get(w[j - ln:j])
                        if (s is not None and best[j - ln] is not neg
                                and best[j - ln] + s == best[j]):
                            pick = ln
                            break
                    if pick == 0:
                        # mirror the forward pass's explicit failure: a
                        # broken DP invariant must raise, never spin on
                        # `j -= 0` forever
                        raise ValueError(
                            f"unigram backtrace stuck at {w!r}[:{j}]: "
                            "no piece length reproduces best[j]"
                        )
                    pieces.append(w[j - pick:j])
                    j -= pick
                pieces.reverse()
                out["word"].append(w)
                out["pieces"].append(" ".join(pieces))
                out["n_pieces"].append(len(pieces))
                out["score"].append(best[n])
            yield pd.DataFrame(out)

    return words.select("word").mapInPandas(enc, _UNI_SCHEMA)
