"""Distributed BPE tokenizer training (fixed merge count).

Byte-pair encoding (Sennrich et al. 2016) trains the merge table every
LLM tokenizer ships with. The scale-relevant observation: after one
corpus pass collapses text to a (word, count) table, every training
iteration is vocabulary-sized, not corpus-sized — which is exactly how
production BPE trainers run, and why this fits Spark:

- **Pair counting**: words are held as space-joined symbol strings
  ("c a t"); adjacent symbol pairs explode from the distinct-word
  table weighted by word count, then one map-side-combined sum per
  pair.
- **Top pair**: global argmax with (count desc, pair asc) tie-break —
  ``orderBy().limit(1)`` plans TakeOrderedAndProject; the single
  winning pair becomes driver state (like k-means centroids).
- **Merge**: symbols are joined with a TWO-space separator and the
  padded string goes through ``replace(' x  y ', ' xy ')``. SQL
  replace scans left-to-right over non-overlapping occurrences, and
  the double-space separator donates one space to each adjacent
  match, so consecutive occurrences in a run all merge in one pass —
  'a a a a' → 'aa aa', exactly BPE's greedy merge order (a
  single-space scheme would leave 'aa a a': the shared boundary space
  gets consumed by the first match). Pure projection.

Everything is exact string/integer work, so the DuckDB twin
(``bpe_vocab_sql``) reproduces the training bit-for-bit with the top
pair as a scalar subquery per unrolled step — no RNG, no floats.
Fixed ``merges`` keeps it SQL-unrollable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators.text import (
    ngram_list,
    ngram_list_sql,
    tokens,
    tokens_sql,
)

#: symbol separator INSIDE a word's segmentation string. Two spaces so
#: the single-space-padded merge pattern can match back-to-back pair
#: occurrences (each separator donates one space to each neighbor).
SEP = "  "


def char_spaced(word: Column) -> Column:
    """'cat' → 'c  a  t' (two-space separator — see module docstring);
    per-char substr over a sequence — identical in any engine
    (split-on-empty-regex is not)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    return F.concat_ws(SEP, chars)


def char_spaced_sql(word: str) -> str:
    return (
        f"array_to_string(list_transform(range(1, len({word}) + 1), "
        f"i -> substr({word}, i, 1)), '{SEP}')"
    )


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wc): the corpus collapsed to its distinct-word table —
    the one corpus-sized shuffle; all training iterations run on
    this."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("wc"))
    )


def _merge_expr(sp: Column, pair: str) -> Column:
    """Apply one learned merge. ``pair`` is the 'x y' gram string; the
    pattern uses the two-space separator so runs merge greedily."""
    x, y = pair.split(" ")
    merged = x + y
    return F.trim(
        F.replace(
            F.concat(F.lit(" "), sp, F.lit(" ")),
            F.lit(f" {x}{SEP}{y} "),
            F.lit(f" {merged} "),
        )
    )


def bpe_train(
    df: DataFrame, text_col: str, merges: int = 4
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Train ``merges`` BPE merges over ``df[text_col]``.

    Returns (merge table [(pair, count), ...] in rank order, and the
    final (word, wc, sp) DataFrame with ``sp`` the space-joined symbol
    segmentation of each word)."""
    w = word_counts(df, text_col).withColumn(
        "sp", char_spaced(F.col("word"))
    )
    learned: list[tuple[str, int]] = []
    for _ in range(merges):
        # symbol-pair counts, weighted by word frequency
        top = (
            w.select(
                "wc", F.explode(ngram_list(F.col("sp"), 2)).alias("pair")
            )
            .groupBy("pair")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:  # corpus of single-char words only
            break
        pair, count = top[0]["pair"], int(top[0]["c"])
        learned.append((pair, count))
        w = w.withColumn("sp", _merge_expr(F.col("sp"), pair))
        # one tiny row per word: flatten lineage so the plan doesn't
        # stack `merges` replace-projections over the explode
        w = w.localCheckpoint(eager=True)
    return learned, w


def bpe_vocab(df: DataFrame, text_col: str, merges: int = 4) -> DataFrame:
    """Final symbol vocabulary after ``merges`` merges: (symbol,
    n_occurrences) with occurrences weighted by word frequency."""
    _, w = bpe_train(df, text_col, merges)
    return (
        w.select(
            "wc", F.explode(F.split(F.col("sp"), " +")).alias("symbol")
        )
        .groupBy("symbol")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
    )


def bpe_vocab_sql(from_table: str, text_col: str, merges: int = 4) -> str:
    """DuckDB twin: identical training unrolled as CTEs; the top pair
    per step is a scalar subquery with the same (count desc, pair asc)
    tie-break."""
    ctes = [
        f"""__wc AS (
            SELECT word, cast(count(*) AS bigint) AS wc FROM (
                SELECT unnest({tokens_sql(text_col)}) AS word
                FROM {from_table}
            ) GROUP BY 1
        )""",
        f"""__w0 AS (
            SELECT word, wc, {char_spaced_sql('word')} AS sp FROM __wc
        )""",
    ]
    for i in range(merges):
        ctes.append(f"""__p{i} AS (
            SELECT pair, sum(wc) AS c FROM (
                SELECT wc, unnest({ngram_list_sql('sp', 2)}) AS pair
                FROM __w{i}
            ) GROUP BY 1
        )""")
        ctes.append(f"""__t{i} AS (
            SELECT pair FROM __p{i} ORDER BY c DESC, pair ASC LIMIT 1
        )""")
        ctes.append(f"""__w{i + 1} AS (
            SELECT word, wc,
                   trim(replace(' ' || sp || ' ',
                                ' ' || replace((SELECT pair FROM __t{i}),
                                               ' ', '{SEP}') || ' ',
                                ' ' || replace((SELECT pair FROM __t{i}),
                                               ' ', '') || ' ')) AS sp
            FROM __w{i}
        )""")
    return (
        "WITH " + ", ".join(ctes)
        + f""" SELECT symbol, cast(sum(wc) AS bigint) AS n_occurrences
        FROM (SELECT wc, unnest(regexp_split_to_array(sp, ' +')) AS symbol
              FROM __w{merges})
        GROUP BY 1"""
    )
