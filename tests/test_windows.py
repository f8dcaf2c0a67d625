"""Event-time window semantics on literal fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from maggma_spark.streaming.windows import (
    session_windows,
    sliding_windows,
    tumbling_windows,
)


def T(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(user_id=1, ts=T(0), value=1.0),
        Row(user_id=1, ts=T(10), value=2.0),
        Row(user_id=1, ts=T(45), value=3.0),   # >30min gap => new session
        Row(user_id=2, ts=T(5), value=4.0),
    ]
    return spark.createDataFrame(rows)


def test_tumbling(events):
    out = {(r["window_start"].minute, r["n_events"])
           for r in tumbling_windows(events, "ts", "30 minutes").collect()}
    assert out == {(0, 3), (30, 1)}


def test_sliding(events):
    rows = sliding_windows(events, "ts", "30 minutes", "15 minutes").collect()
    # each event in exactly 2 windows
    assert sum(r["n_events"] for r in rows) == 8


def test_session(events):
    rows = session_windows(events, "ts", "30 minutes", group_by=["user_id"]).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2  # 0..10 session, 45 session
    s1 = sorted(by_user[1], key=lambda r: r["session_start"])
    assert s1[0]["n_events"] == 2
    assert s1[0]["session_end"] == T(40)  # last event + gap
    assert len(by_user[2]) == 1


def test_streaming_runner(spark, tmp_path):
    """End-to-end incremental run: parquet file-stream -> key-merge into a
    ParquetStore via foreachBatch, Trigger.AvailableNow."""
    from maggma_spark.sources.parquet import ParquetStore
    from maggma_spark.streaming.runner import (
        merge_into_store,
        run_incremental,
        stream_parquet_source,
    )

    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [Row(k=i, last_updated=dt.datetime(2024, 1, 1), v=i) for i in range(10)]
    ).write.parquet(src_dir)

    tgt = ParquetStore(spark, tgt_dir, key="k", last_updated_field="last_updated")
    stream = stream_parquet_source(spark, src_dir)
    q = run_incremental(stream, ckpt, merge_into_store(tgt))
    q.awaitTermination(120)
    assert tgt.count() == 10

    # new file arrives; only the delta is processed (checkpoint = watermark)
    spark.createDataFrame(
        [Row(k=i, last_updated=dt.datetime(2024, 2, 1), v=i * 100)
         for i in range(8, 12)]
    ).write.mode("append").parquet(src_dir)
    q2 = run_incremental(stream_parquet_source(spark, src_dir), ckpt,
                         merge_into_store(tgt))
    q2.awaitTermination(120)
    assert tgt.count() == 12
    assert tgt.query_one({"k": 9})["v"] == 900
    assert tgt.query_one({"k": 1})["v"] == 1


def test_streaming_window_watermark(spark, tmp_path):
    """Streaming windowed aggregation with a watermark: late events
    beyond the lateness bound are dropped from closed aggregates — the
    late-data capability the reference lacks (SURVEY §2.9)."""
    import datetime as dt

    from pyspark.sql import Row, functions as F

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    batch1 = [Row(ts=T(m), v=1.0) for m in (0, 5, 40, 45)]
    spark.createDataFrame(batch1).write.parquet(src)

    def run_once():
        stream = (spark.readStream.schema("ts timestamp, v double")
                  .parquet(src)
                  .withWatermark("ts", "10 minutes")
                  .groupBy(F.window("ts", "30 minutes").alias("w"))
                  .agg(F.count(F.lit(1)).alias("n")))
        q = (stream.writeStream.format("parquet")
             .option("checkpointLocation", ckpt)
             .option("path", out)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run_once()
    # append a very late event (minute 2, watermark has advanced to 35)
    spark.createDataFrame([Row(ts=T(2), v=1.0), Row(ts=T(50), v=1.0)]) \
        .write.mode("append").parquet(src)
    run_once()
    # close remaining windows with a far-future event
    spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 2))]).toDF("ts") \
        .withColumn("v", F.lit(1.0)).write.mode("append").parquet(src)
    run_once()

    got = {(r["w"]["start"].minute, r["n"])
           for r in spark.read.parquet(out).collect()}
    # window 0-30 closed with 2 events: the late minute-2 event was DROPPED
    assert (0, 2) in got
    # window 30-60 includes the on-time minute-50 arrival
    assert (30, 3) in got


def test_cli_pipeline_runner(spark, tmp_path):
    """python -m maggma_spark.run pipeline.json end-to-end."""
    import datetime as dt
    import json
    import subprocess
    import sys

    from pyspark.sql import Row

    src_path = str(tmp_path / "src")
    tgt_path = str(tmp_path / "tgt")
    spark.createDataFrame(
        [Row(task_id=i, last_updated=dt.datetime(2024, 1, 1), v=i)
         for i in range(7)]).write.parquet(src_path)
    spec = {
        "stores": {
            "src": {"@class": "maggma_spark.sources.parquet.ParquetStore",
                    "path": src_path, "key": "task_id"},
            "tgt": {"@class": "maggma_spark.sources.parquet.ParquetStore",
                    "path": tgt_path, "key": "task_id"}},
        "builders": [
            {"@class": "maggma_spark.operators.builders.CopyBuilder",
             "source": "$stores.src", "target": "$stores.tgt"}]}
    spec_file = tmp_path / "pipeline.json"
    spec_file.write_text(json.dumps(spec))
    proc = subprocess.run(
        [sys.executable, "-m", "maggma_spark.run", str(spec_file),
         "--cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["state"] == "successful"
    from maggma_spark.sources.parquet import ParquetStore

    assert ParquetStore(spark, tgt_path, key="task_id").count() == 7


def test_streaming_session_window(spark, tmp_path):
    """session_window in actual streaming mode (with watermark) produces
    the same sessions the batch path does."""
    from pyspark.sql import Row, functions as F

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    out = str(tmp_path / "sess_out")
    rows = [Row(user_id=1, ts=T(m)) for m in (0, 5, 45)] + \
           [Row(user_id=2, ts=T(10))]
    spark.createDataFrame(rows).write.parquet(src)
    # close sessions via a far-future event
    import datetime as dt

    spark.createDataFrame([Row(user_id=99, ts=dt.datetime(2024, 1, 2))]) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .parquet(src)
              .withWatermark("ts", "10 minutes")
              .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
              .agg(F.count(F.lit(1)).alias("n")))
    q = (stream.writeStream.format("parquet")
         .option("checkpointLocation", ckpt).option("path", out)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user_id"], r["w"]["start"].minute, r["n"])
           for r in spark.read.parquet(out).filter("user_id < 99").collect()}
    assert (1, 0, 2) in got   # minutes 0,5 merge into one session
    assert (1, 45, 1) in got  # 45 is a separate session (gap >= 30m)
    assert (2, 10, 1) in got


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state survives across micro-batches
    (maxFilesPerTrigger=1 forces multiple batches in one run)."""
    from pyspark.sql import Row

    from maggma_spark.streaming.stateful import running_totals

    src = str(tmp_path / "st_src")
    ckpt = str(tmp_path / "st_ckpt")
    out = str(tmp_path / "st_out")
    spark.createDataFrame(
        [Row(user_id=1, value=10.0), Row(user_id=2, value=5.0)]
    ).write.parquet(src)
    spark.createDataFrame(
        [Row(user_id=1, value=15.0), Row(user_id=2, value=1.0)]
    ).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("user_id long, value double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (running_totals(stream, "user_id", "value", alert_threshold=20.0)
         .writeStream.format("parquet")
         .option("checkpointLocation", ckpt).option("path", out)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["total_rows"])
    assert len(u1) == 2                      # one emission per batch
    assert u1[-1]["total_value"] == 25.0     # state accumulated across batches
    assert any(r["alert"] for r in u1)       # threshold crossed exactly once
    assert sum(r["alert"] for r in u1) == 1
    u2 = sorted(by_user[2], key=lambda r: r["total_rows"])
    assert u2[-1]["total_value"] == 6.0
    assert not any(r["alert"] for r in u2)


def test_stream_dedup_within_watermark(spark, tmp_path):
    from pyspark.sql import Row

    from maggma_spark.streaming.runner import stream_dedup

    src = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "dd_ckpt")
    out = str(tmp_path / "dd_out")
    spark.createDataFrame(
        [Row(k=1, ts=T(0), v="a"), Row(k=1, ts=T(1), v="dup"),
         Row(k=2, ts=T(2), v="b")]).write.parquet(src)
    spark.createDataFrame(  # second file: another dup of k=1 within watermark
        [Row(k=1, ts=T(3), v="dup2"), Row(k=3, ts=T(4), v="c")]
    ).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("k long, ts timestamp, v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_dedup(stream, ["k"], "ts", "30 minutes")
         .writeStream.format("parquet")
         .option("checkpointLocation", ckpt).option("path", out)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] in ("a", "dup")  # exactly one survivor for k=1


def test_continuous_rollup(spark, tmp_path):
    """Hypertable-rollup maintenance: per-hour rollups update additively
    as new event files arrive; untouched windows keep their rows."""
    import datetime as dt

    from pyspark.sql import Row

    from maggma_spark.sources.memory import MemoryStore
    from maggma_spark.streaming.rollup import run_continuous_rollup

    src = str(tmp_path / "ru_src")
    ckpt = str(tmp_path / "ru_ckpt")
    H = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    spark.createDataFrame([
        Row(ts=H(0, 10), event_type="click", value=1.0),
        Row(ts=H(0, 20), event_type="click", value=2.0),
        Row(ts=H(1, 5), event_type="view", value=5.0),
    ]).write.parquet(src)

    rollup = MemoryStore(
        spark, None, name="rollup", key=["window_start", "event_type"],
        schema="window_start timestamp, window_end timestamp, "
               "event_type string, cnt bigint, total double, "
               "vmin double, vmax double")
    q = run_continuous_rollup(spark, src, rollup, ckpt,
                              schema="ts timestamp, event_type string, value double")
    q.awaitTermination(120)
    got = {(r["window_start"].hour, r["event_type"]): (r["cnt"], r["total"])
           for r in rollup.df.collect()}
    assert got == {(0, "click"): (2, 3.0), (1, "view"): (1, 5.0)}

    # late-arriving file touching hour 0 only: hour-1 row survives, hour-0
    # row merges ADDITIVELY
    spark.createDataFrame([Row(ts=H(0, 40), event_type="click", value=4.0)]) \
        .write.mode("append").parquet(src)
    q2 = run_continuous_rollup(spark, src, rollup, ckpt,
                               schema="ts timestamp, event_type string, value double")
    q2.awaitTermination(120)
    got = {(r["window_start"].hour, r["event_type"]): (r["cnt"], r["total"])
           for r in rollup.df.collect()}
    assert got == {(0, "click"): (3, 7.0), (1, "view"): (1, 5.0)}


def test_dedup_within_watermark_batch(spark):
    """Greedy first-event-per-horizon dedup (the batch twin of
    dropDuplicatesWithinWatermark): events within `watermark` of the
    last KEPT event drop; the next one outside the horizon is kept."""
    import datetime as dt

    from maggma_spark.streaming.windows import dedup_within_watermark

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(k="a", ts=t0),                                   # keep
        Row(k="a", ts=t0 + dt.timedelta(minutes=4)),         # drop (<5m)
        Row(k="a", ts=t0 + dt.timedelta(minutes=8)),         # keep (>5m after t0)
        Row(k="a", ts=t0 + dt.timedelta(minutes=9)),         # drop
        Row(k="b", ts=t0 + dt.timedelta(minutes=1)),         # keep (own key)
    ]
    out = dedup_within_watermark(
        spark.createDataFrame(rows), ["k"], "ts", "5 minutes")
    got = sorted((r["k"], r["ts"].minute) for r in out.collect())
    assert got == [("a", 0), ("a", 8), ("b", 1)]


def test_dedup_within_watermark_streaming_plan(spark):
    """The streaming branch builds a genuine streaming plan with
    bounded per-key state (dropDuplicatesWithinWatermark)."""
    from maggma_spark.streaming.windows import dedup_within_watermark

    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    out = dedup_within_watermark(sdf, ["value"], "timestamp", "10 minutes")
    assert out.isStreaming


def test_dedup_within_watermark_batch_cross_batch_carry(spark):
    """A group spanning consecutive Arrow batches must continue the
    greedy horizon from carry state, not restart it."""
    import datetime as dt

    from maggma_spark.streaming.windows import dedup_within_watermark

    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(k="a", ts=t0 + dt.timedelta(minutes=m)) for m in range(40)]
    rows += [Row(k="b", ts=t0 + dt.timedelta(minutes=m)) for m in range(7)]
    df = spark.createDataFrame(rows).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        out = dedup_within_watermark(df, ["k"], "ts", "10 minutes")
        got = sorted((r["k"], r["ts"].minute) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # k=a: keep 0, 11, 22, 33 (each > 10 min after last kept); k=b: keep 0
    assert got == [("a", 0), ("a", 11), ("a", 22), ("a", 33), ("b", 0)]


def test_continuous_rollup_hll_distinct(spark, tmp_path):
    """Distinct-count sketch maintenance: the HLL column merges across
    micro-batches so the estimate tracks distinct users per window even
    though batch counts can't add."""
    import datetime as dt

    from pyspark.sql import Row

    from maggma_spark.sources.memory import MemoryStore
    from maggma_spark.streaming.rollup import (
        rollup_distinct,
        run_continuous_rollup,
    )

    src = str(tmp_path / "rh_src")
    ckpt = str(tmp_path / "rh_ckpt")
    H = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    spark.createDataFrame([
        Row(ts=H(0, 10), event_type="click", value=1.0, user_id=1),
        Row(ts=H(0, 20), event_type="click", value=2.0, user_id=2),
        Row(ts=H(0, 30), event_type="click", value=2.0, user_id=2),
    ]).write.parquet(src)
    rollup = MemoryStore(
        spark, None, name="rollup_hll", key=["window_start", "event_type"],
        schema="window_start timestamp, window_end timestamp, "
               "event_type string, cnt bigint, total double, "
               "vmin double, vmax double, dsk binary")
    sch = "ts timestamp, event_type string, value double, user_id bigint"
    q = run_continuous_rollup(spark, src, rollup, ckpt, schema=sch,
                              distinct_col="user_id")
    q.awaitTermination(120)
    est = rollup.df.select(rollup_distinct("dsk").alias("d")).collect()
    assert [int(r["d"]) for r in est] == [2]

    # second batch: one repeat user + one new user -> distinct becomes 3
    spark.createDataFrame(
        [Row(ts=H(0, 40), event_type="click", value=1.0, user_id=2),
         Row(ts=H(0, 50), event_type="click", value=1.0, user_id=3)]
    ).write.mode("append").parquet(src)
    q2 = run_continuous_rollup(spark, src, rollup, ckpt, schema=sch,
                               distinct_col="user_id")
    q2.awaitTermination(120)
    row = rollup.df.select("cnt", rollup_distinct("dsk").alias("d")
                           ).collect()[0]
    assert row["cnt"] == 5 and int(row["d"]) == 3


def test_stream_content_dedup_cross_batch(spark, tmp_path):
    """stream_content_dedup: unbounded state catches a duplicate that
    arrives a whole micro-batch later; within-batch dups keep min key;
    normalization (case/whitespace) folds variants to one digest."""
    from pyspark.sql import Row

    from maggma_spark.streaming.stateful import stream_content_dedup

    src = str(tmp_path / "cd_src")
    ckpt = str(tmp_path / "cd_ckpt")
    out = str(tmp_path / "cd_out")
    spark.createDataFrame([
        Row(doc_id=1, text="hello  world"),
        Row(doc_id=2, text="HELLO world"),   # same digest, same batch
        Row(doc_id=3, text="fresh content"),
    ]).coalesce(1).write.parquet(src)
    spark.createDataFrame([
        Row(doc_id=4, text="hello world"),   # dup, one batch LATER
        Row(doc_id=5, text="brand new"),
    ]).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_content_dedup(stream, "doc_id", "text")
         .writeStream.format("parquet")
         .option("checkpointLocation", ckpt).option("path", out)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 5                    # one emission per input row
    hello = {k for k, r in rows.items()
             if r["digest"] == rows[1]["digest"]}
    assert hello == {1, 2, 4}
    kept = {k for k, r in rows.items() if r["keep"]}
    # min-key survivor for the hello group; fresh docs survive
    assert kept == {1, 3, 5}


def test_streaming_view_maintenance(spark, tmp_path):
    """foreachBatch incremental view maintenance: a 2-batch CDC delta
    stream advances a parquet aggregate that must equal the direct
    aggregate of the final snapshot (inserts, updates, group moves,
    deletes across batches)."""
    from pyspark.sql import Row, functions as F

    from maggma_spark.operators.merge import snapshot_delta
    from maggma_spark.streaming.runner import (maintain_aggregate,
                                               run_incremental)

    s0 = spark.createDataFrame(
        [Row(k=i, g="a" if i < 10 else "b", v=float(i))
         for i in range(20)])
    s1 = (s0.filter("k not in (3, 4)")
          .withColumn("v", F.when(F.col("k") == 5, 99.0)
                      .otherwise(F.col("v"))))
    s2 = (s1.withColumn("g", F.when(F.col("k") == 15, "c")
                        .otherwise(F.col("g")))
          .unionByName(spark.createDataFrame([Row(k=50, g="c", v=1.0)])))

    src = str(tmp_path / "deltas")
    d1 = snapshot_delta(s0, s1, "k", include_old=True)
    d2 = snapshot_delta(s1, s2, "k", include_old=True)
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(d1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg_path = str(tmp_path / "agg")
    # seed with the aggregate of s0 so deltas apply on top
    s0.groupBy("g").agg(F.count("*").alias("n"), F.sum("v").alias("v")) \
        .write.parquet(agg_path)
    q = run_incremental(stream, str(tmp_path / "ckpt"),
                        maintain_aggregate(agg_path, "g", ["v"]))
    q.awaitTermination(120)

    got = {r["g"]: (r["n"], r["v"]) for r in
           spark.read.parquet(agg_path).collect()}
    want = {r["g"]: (r["n"], r["v"]) for r in
            s2.groupBy("g").agg(F.count("*").alias("n"),
                                F.sum("v").alias("v")).collect()}
    assert got == want


def test_merge_into_store_idempotent_on_batch_replay(spark, tmp_path):
    """foreachBatch retry semantics: re-delivering the same micro-batch
    (what a recovered stream does after a sink failure) must leave the
    store unchanged — upsert-by-key makes the sink effectively-once."""
    from pyspark.sql import Row

    from maggma_spark.sources.parquet import ParquetStore
    from maggma_spark.streaming.runner import merge_into_store

    store = ParquetStore(spark, str(tmp_path / "s"), key="k")
    store.update([Row(k=1, v="old"), Row(k=2, v="keep")])
    batch = spark.createDataFrame([Row(k=1, v="new"), Row(k=3, v="add")])
    fn = merge_into_store(store)
    fn(batch, 0)
    first = sorted(tuple(r) for r in store.query().collect())
    fn(batch, 0)          # replay the SAME batch
    second = sorted(tuple(r) for r in store.query().collect())
    assert first == second == [(1, "new"), (2, "keep"), (3, "add")]


def test_maintain_aggregate_idempotent_on_batch_replay(spark, tmp_path):
    """foreachBatch at-least-once: re-delivering an already-applied
    micro-batch must NOT double-count — the sidecar batch_id marker
    makes the delta application effectively-once."""
    from pyspark.sql import Row

    from maggma_spark.streaming.runner import maintain_aggregate

    agg_path = str(tmp_path / "agg")
    fn = maintain_aggregate(agg_path, "g", ["v"])
    batch = spark.createDataFrame(
        [("a", 1.0, None, None, "insert"), ("a", 2.0, None, None, "insert")],
        "g string, v double, old_g string, old_v double, change_type string")
    fn(batch, 0)
    first = sorted(tuple(r) for r in spark.read.parquet(agg_path).collect())
    fn(batch, 0)                      # replayed batch — must be skipped
    second = sorted(tuple(r) for r in spark.read.parquet(agg_path).collect())
    assert first == second
    fn(batch, 1)                      # genuinely new batch still applies
    third = {r["g"]: (r["n"], r["v"])
             for r in spark.read.parquet(agg_path).collect()}
    assert third == {"a": (4, 6.0)}


def test_maintain_aggregate_recovers_mid_swap_crash(spark, tmp_path):
    """A crash between 'live -> .old' and '.inprogress -> live' leaves
    no live snapshot; the next batch must promote the fully-written
    .inprogress copy (which already contains the applied batch) and
    then skip the replayed batch."""
    import os

    from pyspark.sql import Row

    from maggma_spark.streaming.runner import maintain_aggregate

    agg_path = str(tmp_path / "agg")
    fn = maintain_aggregate(agg_path, "g", ["v"])
    batch = spark.createDataFrame(
        [("a", 5.0, None, None, "insert")],
        "g string, v double, old_g string, old_v double, change_type string")
    fn(batch, 0)
    want = sorted(tuple(r) for r in spark.read.parquet(agg_path).collect())
    # simulate the crash window: live snapshot gone, .inprogress present
    os.rename(agg_path, agg_path + ".inprogress")
    fn(batch, 0)                      # recovery + replay-skip
    got = sorted(tuple(r) for r in spark.read.parquet(agg_path).collect())
    assert got == want
    assert not os.path.exists(agg_path + ".inprogress")


def test_rollup_sink_idempotent_on_batch_replay(spark, tmp_path):
    """The additive rollup merge must not double-count a replayed
    micro-batch: the row-level __last_batch stamp makes re-delivery a
    no-op, while a genuinely new batch still merges additively."""
    import datetime as dt

    from pyspark.sql import Row

    from maggma_spark.sources.memory import MemoryStore
    from maggma_spark.streaming.rollup import rollup_merge_sink

    rollup = MemoryStore(
        spark, None, name="rollup_rp", key=["window_start", "event_type"],
        schema="window_start timestamp, window_end timestamp, "
               "event_type string, cnt bigint, total double, "
               "vmin double, vmax double, __last_batch bigint")
    sink = rollup_merge_sink(rollup)
    H = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    batch = spark.createDataFrame([
        Row(ts=H(0, 10), event_type="click", value=1.0),
        Row(ts=H(0, 20), event_type="click", value=2.0)])
    sink(batch, 0)
    sink(batch, 0)          # replayed batch — must be a no-op
    got = {r["event_type"]: (r["cnt"], r["total"])
           for r in rollup.df.collect()}
    assert got == {"click": (2, 3.0)}
    sink(batch, 1)          # new batch merges additively
    got = {r["event_type"]: (r["cnt"], r["total"])
           for r in rollup.df.collect()}
    assert got == {"click": (4, 6.0)}


def test_maintain_aggregate_ignores_partial_first_batch(spark, tmp_path):
    """A crash during the very FIRST batch's write leaves a partial
    .inprogress with no batch marker — recovery must treat it as
    garbage, not promote half-written aggregates."""
    import os

    from maggma_spark.streaming.runner import maintain_aggregate

    agg_path = str(tmp_path / "agg")
    # simulate the torn first write: partial dir, no _last_batch_id
    os.makedirs(agg_path + ".inprogress")
    spark.createDataFrame([("a", 1.0)], "g string, v double") \
        .write.parquet(agg_path + ".inprogress/part")  # junk content
    fn = maintain_aggregate(agg_path, "g", ["v"])
    batch = spark.createDataFrame(
        [("a", 5.0, None, None, "insert")],
        "g string, v double, old_g string, old_v double, change_type string")
    fn(batch, 0)
    got = {r["g"]: (r["n"], r["v"])
           for r in spark.read.parquet(agg_path).collect()}
    assert got == {"a": (1, 5.0)}      # batch applied exactly once
    assert not os.path.exists(agg_path + ".inprogress")
