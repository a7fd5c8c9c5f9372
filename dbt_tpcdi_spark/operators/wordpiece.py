"""WordPiece subword tokenization (Wu et al. 2016 / BERT): greedy
longest-match-first encoding against a corpus-derived piece vocabulary
with ``##`` continuation marking — the third tokenizer family next to
BPE (merge-chain, operators/bpe.py) and the whitespace/regex counters
(operators/text.py).

Scale shape (same argument as BPE encode at 100 TB): everything
corpus-sized stays declarative — tokenization is one posexplode, doc
reassembly one equi-join on ``word`` + per-doc aggregate. The only
imperative step, greedy matching, runs executor-local over the
DISTINCT-WORD table (vocabulary-sized by Heaps' law, millions of rows
at web scale — not trillions) with the bounded piece vocabulary
broadcast; per word it is O(len · max_piece_len) with zero driver
round-trips.
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

#: vocabulary knobs: all observed single characters (both positional
#: forms — guarantees termination without UNK on in-corpus text) plus
#: the top-K weighted multi-char substrings, max piece length 6
WP_MAX_PIECE = 6
WP_TOPK = 120
WP_UNK = "[UNK]"


def wp_vocab(word_counts: DataFrame, topk: int = WP_TOPK,
             max_len: int = WP_MAX_PIECE) -> DataFrame:
    """Piece vocabulary ``(form, cont)`` from a weighted word table
    ``(word, n)``: every substring of length ≤ ``max_len`` of every
    word is a candidate in its positional form (word-initial vs
    continuation); weight = Σ word count over occurrences. All single
    characters are kept unconditionally; multi-char pieces keep the
    global top-``topk`` by (weight DESC, cont, form) — a total order,
    so the cut is deterministic cross-engine. The candidate table is
    distinct-words × O(len·max_len) rows — vocabulary-sized, so the
    top-K is ``orderBy().limit()`` — TakeOrderedAndProject:
    per-partition partial top-k, then one k-row merge; no global
    window, no full sort, however large the piece-candidate table
    grows (the same shape as ``uni_vocab``)."""
    subs = word_counts.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), p ->
                    transform(sequence(1, least({max_len},
                                       length(word) - p + 1)), l ->
                        struct(substring(word, p, l) AS form,
                               p > 1 AS cont))))"""
            )
        ).alias("s"),
        F.col("n"),
    ).select("s.form", "s.cont", "n")
    agg = subs.groupBy("form", "cont").agg(F.sum("n").alias("__w"))
    chars = agg.filter(F.length("form") == 1).select("form", "cont")
    multi = (
        agg.filter(F.length("form") >= 2)
        .orderBy(F.desc("__w"), F.asc("cont"), F.asc("form"))
        .limit(topk)
        .select("form", "cont")
    )
    return chars.unionByName(multi)


_WP_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("wp", StringType()),
        StructField("n_pieces", LongType()),
        StructField("n_unk", LongType()),
    ]
)


def wp_encode_words(words: DataFrame, vocab: DataFrame,
                    unk: str = WP_UNK) -> DataFrame:
    """Greedy longest-match-first WordPiece over the distinct-word
    table: at each position take the longest vocab piece whose
    positional form matches; no match → ``unk``, advance one char.
    Returns ``(word, wp, n_pieces, n_unk)`` with ``wp`` the
    space-joined piece string (``##`` continuation marks).

    The vocab collect is bounded metadata (topk + observed chars, the
    same driver-size class as k-means centroids); matching itself is
    Arrow-batched mapInPandas over the vocabulary-sized word table."""
    entries = {
        (r["form"], bool(r["cont"])) for r in vocab.collect()
    }
    max_len = max((len(f) for f, _ in entries), default=1)
    bv = words.sparkSession.sparkContext.broadcast((entries, max_len))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vset, mlen = bv.value
        for pdf in batches:
            out = {"word": [], "wp": [], "n_pieces": [], "n_unk": []}
            for w in pdf["word"]:
                pos, pieces, nunk = 0, [], 0
                n = len(w)
                while pos < n:
                    hit = 0
                    for ln in range(min(mlen, n - pos), 0, -1):
                        if (w[pos:pos + ln], pos > 0) in vset:
                            hit = ln
                            break
                    if hit == 0:
                        pieces.append(unk)
                        nunk += 1
                        pos += 1
                    else:
                        form = w[pos:pos + hit]
                        pieces.append(form if pos == 0 else "##" + form)
                        pos += hit
                out["word"].append(w)
                out["wp"].append(" ".join(pieces))
                out["n_pieces"].append(len(pieces))
                out["n_unk"].append(nunk)
            yield pd.DataFrame(out)

    return words.select("word").mapInPandas(enc, _WP_SCHEMA)
