"""Structured Streaming operators over the events table.

The reference has no streaming operators (SURVEY.md §2.9) — these are
the engine's forward-looking additions: watermarked tumbling windows,
session windows, and a custom stateful operator via
``applyInPandasWithState``. Batch/stream parity is the design
invariant: each streaming op has a batch twin, and tests drive the
stream with ``Trigger.AvailableNow`` + a memory sink and assert the
results equal the batch computation on the same files.

Scale notes: watermarks bound state; the window aggregations are
map-side partial-aggregated before the keyed state store; the
stateful op keys by user so state shards across executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """Pinned schema for the events file stream. Streaming sources never
    infer, and the driver's generator has stored ``ts`` as either
    TIMESTAMP(NANOS) (readable only as long under nanosAsLong) or
    TIMESTAMP(MICROS) (native TimestampType) across rounds — probe the
    footer like sources/parquet._nanos_columns does and pin whichever
    shape is on disk. Returns (schema, ts_is_nanos_long)."""
    from dbt_tpcdi_spark.sources.parquet import _nanos_columns, table_path

    nanos = "ts" in _nanos_columns(table_path(sf_dir, "events"))
    ts_type: T.DataType = T.LongType() if nanos else T.TimestampType()
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    return schema, nanos


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file stream (schema pinned — streaming sources never
    infer)."""
    schema, nanos = _events_schema(sf_dir)
    # the file-stream source wants a directory; select just events.parquet
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the
    streaming twin of queries/relational.tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessionization with a gap timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


_STATE_SCHEMA = "total double, n bigint"
_OUT_SCHEMA = "user_id bigint, total double, n bigint"


def _accumulate(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user totals: custom stateful operator body."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in batches:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total": [total], "n": [n]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running value totals, emitted each batch. State is a
    2-field tuple per user — bounded, shardable."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def write_idempotent_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Exactly-once-style sink via foreachBatch: each micro-batch lands
    in a batch-id-named subdirectory, so a replayed batch (failure
    between write and checkpoint commit) overwrites its own output
    instead of duplicating — the standard idempotent-sink pattern when
    the target store has no transactions."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drive a stream to completion synchronously (AvailableNow +
    memory sink) — the local test/bench harness; swap the sink for
    kafka/delta in production."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_merge_scd2(
    stream_df: DataFrame,
    table,
    key: str | list[str],
    ts: str = "effective_timestamp",
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming SCD2 ingestion with exactly-once EFFECT: each
    micro-batch of new entity versions is merged (``merge_scd2``) into
    a ``VersionedTable`` via ``foreachBatch``.

    foreachBatch is at-least-once — a crash between the sink write and
    the checkpoint commit replays the batch. Three layers make the
    effect exactly-once anyway:

    1. **Row-level idempotence** (the load-bearing one): the batch is
       ``exceptAll``-filtered against versions already in the table, so
       a replayed batch — even re-grouped into different micro-batches
       by the replay — merges zero rows and commits nothing.
    2. **Atomic publish**: the merge lands as one VersionedTable
       commit; readers see the pre-merge snapshot or the post-merge
       one, never a torn directory. (This is why the sink is a
       versioned table, not bare parquet: the idempotent-subdir
       pattern of ``write_idempotent_parquet`` can't express "rewrite
       neighbors' end_timestamps".)
    3. The batch id is recorded in the commit op for audit
       (``stream_merge:<id>``).

    Scale: per batch, cost is O(rows of touched keys) — merge_scd2
    semi-joins the touched slice; the exceptAll is an anti-join on the
    version key columns, shuffling only the batch + touched keys.
    """

    from dbt_tpcdi_spark.operators.scd2 import merge_scd2

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        existing = table.read()
        version_cols = [
            c for c in existing.columns
            if c not in ("end_timestamp", "is_current")
        ]
        fresh = batch_df.select(version_cols).exceptAll(
            existing.select(version_cols)
        )
        if fresh.isEmpty():
            return
        merged = merge_scd2(existing, fresh, key=key, ts=ts)
        table.commit(merged, op=f"stream_merge:{batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_STATE_Q_SCHEMA = "total_q bigint, n bigint"
_OUT_Q_SCHEMA = "user_id bigint, total_q bigint, n bigint"


def _accumulate_q(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Exact-integer running totals: the driver-gate-safe twin of
    ``_accumulate`` — values arrive pre-quantized (vq bigint), so the
    pandas sum is int64-exact and order-independent, making the
    operator's output engine-comparable (float accumulation isn't)."""
    total_q, n = state.get if state.exists else (0, 0)
    for pdf in batches:
        total_q += int(pdf["vq"].sum())
        n += len(pdf)
    state.update((total_q, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_q": [total_q], "n": [n]}
    )


def running_user_totals_q(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState) with
    exact integer state: per-user running quantized-value totals.
    State is a 2-int tuple per user — bounded, shardable by the
    grouping key across executors."""
    quantized = events.select(
        "user_id",
        F.round(F.col("value").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("vq"),
    )
    return quantized.groupBy("user_id").applyInPandasWithState(
        _accumulate_q,
        outputStructType=_OUT_Q_SCHEMA,
        stateStructType=_STATE_Q_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MG_STATE_SCHEMA = "toks array<string>, cnts array<bigint>, seq bigint, bucket_n bigint"
_MG_OUT_SCHEMA = (
    "bucket int, seq bigint, token string, bucket_n bigint"
)


def _mg_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-bucket streaming Misra–Gries: merge the micro-batch's token
    counts into ≤ k counters (same eviction as the batch operator —
    operators/frequent.mg_reduce), so state per bucket is O(k) forever
    no matter how many tokens stream through. Emits the CURRENT
    candidate set plus a sentinel row carrying the bucket's processed
    count; ``seq`` lets the reader keep only each bucket's final
    emission."""
    from dbt_tpcdi_spark.operators.frequent import mg_reduce

    counts: dict[str, int] = {}
    seq, n_b = 0, 0
    if state.exists:
        t, c, seq, n_b = state.get
        counts = dict(zip(t, c))
    for pdf in batches:
        n_b += len(pdf)
        for tok, c in pdf["token"].value_counts().items():
            counts[tok] = counts.get(tok, 0) + int(c)
        counts = mg_reduce(counts, MG_STREAM_K)
    seq += 1
    state.update(
        (list(counts), [int(v) for v in counts.values()], seq, n_b)
    )
    toks = list(counts) + [None]
    yield pd.DataFrame(
        {
            "bucket": [key[0]] * len(toks),
            "seq": [seq] * len(toks),
            "token": toks,
            "bucket_n": [None] * (len(toks) - 1) + [n_b],
        }
    )


MG_STREAM_K = 30  # counters per bucket (= the heavy-hitter s)
MG_STREAM_BUCKETS = 8


def streaming_mg_summary(toks: DataFrame) -> DataFrame:
    """Streaming heavy-hitter summary: tokens hash-route to
    ``MG_STREAM_BUCKETS`` stateful groups, each holding a ≤ k-counter
    Misra–Gries state — total state is buckets·k rows regardless of
    stream length. All occurrences of a token reach ONE bucket, so any
    token with global count > n/s (k ≥ s) survives its bucket's
    summary: n_bucket ≤ n ⇒ the n_bucket/(k+1) eviction bound is
    never looser than the batch per-partition one.

    Input: (token string). Output per micro-batch emission: the
    bucket's current candidates + one sentinel row with its processed
    count (token NULL)."""
    from dbt_tpcdi_spark.functions.scalar import md5_mod

    routed = toks.select(
        "token",
        md5_mod(F.col("token"), MG_STREAM_BUCKETS).cast("int").alias(
            "bucket"
        ),
    )
    return routed.groupBy("bucket").applyInPandasWithState(
        _mg_update,
        outputStructType=_MG_OUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a file stream (schema pinned — streaming sources
    never infer)."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


# ---------------------------------------------------------------------------
# streaming ordered funnel (VERDICT r9 item 8)

_FUNNEL_STATE_SCHEMA = (
    "views array<bigint>, clicks array<bigint>, "
    "purchases array<bigint>, seq int"
)
_FUNNEL_OUT_SCHEMA = (
    "user_id bigint, seq int, t1 bigint, t2 bigint, t3 bigint"
)


def _funnel_eval(
    views: list, clicks: list, purchases: list, gap_ms: int
):
    """Exact ordered-funnel evaluation over a user's accumulated event
    timestamps: earliest view, earliest click AFTER it within gap,
    earliest purchase after THAT within gap — identical semantics to
    the batch cascade (queries/extended.funnel_conversion)."""
    t1 = min(views) if views else None
    t2 = None
    if t1 is not None:
        q = [c for c in clicks if t1 < c <= t1 + gap_ms]
        t2 = min(q) if q else None
    t3 = None
    if t2 is not None:
        q = [p for p in purchases if t2 < p <= t2 + gap_ms]
        t3 = min(q) if q else None
    return t1, t2, t3


def _funnel_update_factory(gap_ms: int):
    def _funnel_update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        views, clicks, purchases, seq = (
            state.get if state.exists else ([], [], [], 0)
        )
        views, clicks, purchases = (
            list(views), list(clicks), list(purchases))
        for pdf in batches:
            for et, ts in zip(pdf["event_type"], pdf["ts_ms"]):
                if et == "view":
                    views.append(int(ts))
                elif et == "click":
                    clicks.append(int(ts))
                elif et == "purchase":
                    purchases.append(int(ts))
        seq = int(seq) + 1
        state.update((views, clicks, purchases, seq))
        t1, t2, t3 = _funnel_eval(views, clicks, purchases, gap_ms)
        yield pd.DataFrame({
            "user_id": [key[0]], "seq": [seq],
            "t1": [t1], "t2": [t2], "t3": [t3],
        })
    return _funnel_update


def streaming_funnel_state(events: DataFrame, gap_ms: int) -> DataFrame:
    """Custom stateful streaming funnel (applyInPandasWithState):
    per-user state holds the funnel-relevant event timestamps seen so
    far and every micro-batch re-emits the user's CURRENT (t1, t2, t3)
    with a monotone ``seq`` — out-of-order arrival is handled exactly
    (a late-arriving earlier view lowers t1 and the re-evaluation
    repairs t2/t3), the same dedupe-to-last-seq consumption as
    ``streaming_mg_summary``.

    State bound: the per-user funnel-type timestamps. On an unbounded
    production stream this is horizon-expired via the watermark (drop
    timestamps older than watermark − steps·gap — they can no longer
    change any step); the fixture replay is bounded, so the exact
    accumulation IS the horizon."""
    ev = events.select(
        "user_id", "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long")
        .alias("ts_ms"),
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_update_factory(gap_ms),
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_append_versioned(
    stream_df: DataFrame,
    table,
    checkpoint_dir: str,
    query_id: str = "stream",
) -> None:
    """Exactly-once streaming APPEND into a ``VersionedTable``: each
    micro-batch lands as one O(batch) append commit carrying a
    ``{"stream": {"query", "batch_id"}}`` fence, and a redelivered
    batch (failure between commit and checkpoint write) is SKIPPED
    because its id is already fenced — the Delta txnAppId/txnVersion
    contract on the engine's own commit log. Readers keep snapshot
    isolation throughout; fold fragmentation with ``compact()``.

    CONTRACT (ADVICE r9): ``query_id`` and ``checkpoint_dir`` are a
    PAIR — Spark's ``batch_id`` counter lives in the checkpoint, so a
    restart with a FRESH checkpoint directory restarts ids at 0, and
    reusing the old ``query_id`` would fence those genuinely-new
    batches as replays (silent data loss). Whenever the checkpoint
    location changes, change ``query_id`` too (exactly Delta's
    txnAppId contract), e.g. derive it from the checkpoint path."""

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = table.last_stream_batch(query_id)
        if last is not None and batch_id <= last:
            return  # fenced: this batch already committed
        table.append(
            batch_df,
            meta={"stream": {"query": query_id, "batch_id": batch_id}},
        )

    q = (
        stream_df.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# streaming bottom-k quantile sketch (operators/frequent.qs_sketch on
# an unbounded stream)

_QS_STATE_SCHEMA = "hs array<bigint>, vs array<bigint>, seq bigint"
_QS_OUT_SCHEMA = "bucket int, seq bigint, h bigint, v bigint"

QS_STREAM_BUCKETS = 8


def _qs_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-bucket streaming bottom-k: merge the micro-batch's (h, v)
    rows into the k smallest seen so far — state per bucket is O(k)
    forever. Bottom-k is a commutative/idempotent-under-union summary,
    so the result is independent of micro-batch boundaries and arrival
    order; ``seq`` lets the reader keep only each bucket's final
    emission."""
    from dbt_tpcdi_spark.operators.frequent import QS_K

    pairs: list[tuple[int, int]] = []
    seq = 0
    if state.exists:
        hs, vs, seq = state.get
        pairs = list(zip(hs, vs))
    for pdf in batches:
        pairs.extend(
            zip((int(x) for x in pdf["h"]),
                (int(x) for x in pdf["v"]))
        )
        pairs.sort()
        del pairs[QS_K:]
    seq = int(seq) + 1
    state.update(
        ([h for h, _ in pairs], [v for _, v in pairs], seq)
    )
    yield pd.DataFrame(
        {
            "bucket": [key[0]] * len(pairs),
            "seq": [seq] * len(pairs),
            "h": [h for h, _ in pairs],
            "v": [v for _, v in pairs],
        }
    )


def streaming_qs_sketch(rows: DataFrame) -> DataFrame:
    """Streaming quantile sketch: (h, v) rows hash-route to
    ``QS_STREAM_BUCKETS`` stateful groups each holding its bottom-k
    (applyInPandasWithState) — total state buckets·k rows no matter
    how long the stream runs. Per-bucket bottom-k is prefix-closed
    under the global hash order, so the union of drained bucket
    sketches provably contains the global bottom-k; the caller takes
    ``orderBy(h, v).limit(k)`` over it and gets the IDENTICAL sketch
    (hence identical estimates) as the batch operator — which is why
    the streaming query gates against the same SQL oracle."""
    routed = rows.withColumn(
        "bucket", (F.col("h") % QS_STREAM_BUCKETS).cast("int")
    )
    return routed.groupBy("bucket").applyInPandasWithState(
        _qs_update,
        outputStructType=_QS_OUT_SCHEMA,
        stateStructType=_QS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as a file stream (schema pinned — streaming sources
    never infer). o_orderdate is deliberately NOT pinned: the testdata
    generator has stored timestamps at different parquet precisions
    across rounds (see ``_events_schema``'s footer probe), and no
    streaming consumer projects it — pin it with a footer probe if one
    ever does."""
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
