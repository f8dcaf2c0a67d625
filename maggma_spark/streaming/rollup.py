"""Continuous aggregate (hypertable-rollup) maintenance — an incrementally
maintained time-bucketed rollup table over an append-only event stream.

Beyond-reference capability. The TimescaleDB "continuous aggregate" /
hypertable-rollup pattern, Spark-first:

- the source is a file stream (append-only events);
- each micro-batch computes PARTIAL aggregates per (window, keys) for
  ONLY the events in the batch;
- the rollup store merges partials with existing rows by summation
  (count/sum merge algebraically; avg derives at read time as
  sum/count) — so each batch touches only windows it saw events for;
- checkpointing makes maintenance exactly-once per batch; restarts
  resume from the offset, never recompute history.

At 100 TB: the rollup table is small (windows x keys), partitioned by
window date; each batch's merge is partition-scoped. A late event (the
source is append-only files, so "late" = written late) still lands in
its true window — the merge is additive, not last-writer-wins.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


MERGEABLE = {"count", "sum", "min", "max", "hll_distinct"}


def rollup_events(
    batch_df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str],
    value_col: str,
    distinct_col: Optional[str] = None,
) -> DataFrame:
    """Partial rollup of one batch: (window_start, window_end, *keys,
    cnt, total, vmin, vmax[, dsk]).

    `distinct_col` adds a MERGEABLE distinct-count: a binary
    HyperLogLog sketch (`dsk`, Datasketches HLL via hll_sketch_agg).
    COUNT DISTINCT is not algebraic — you cannot add two batch counts —
    but sketch REGISTERS merge losslessly (per-register max), so the
    rollup keeps exactly-mergeable distinct state per window at ~1 KB
    per row instead of a distinct-values set. Estimate at read time
    with `rollup_distinct(col)`."""
    w = F.window(F.col(ts_col), duration)
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ]
    out_cols = ["cnt", "total", "vmin", "vmax"]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("dsk"))
        out_cols.append("dsk")
    return (
        batch_df.groupBy(w.alias("w"), *group_by)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_by,
            *out_cols,
        )
    )


def rollup_distinct(col: str = "dsk") -> Column:
    """Distinct-count estimate from a rollup sketch column."""
    return F.hll_sketch_estimate(col)


def merge_rollup(old: Optional[DataFrame], partial: DataFrame,
                 group_by: Sequence[str]) -> DataFrame:
    """Algebraic merge of partial aggregates into the rollup table:
    counts/sums add, min/max combine — NOT an upsert (both sides'
    contributions survive)."""
    keys = ["window_start", "window_end", *group_by]
    if old is None:
        return partial
    both = old.unionByName(partial)
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if "dsk" in partial.columns:
        aggs.append(F.hll_union_agg("dsk").alias("dsk"))
    return both.groupBy(*keys).agg(*aggs)


def rollup_merge_sink(
    rollup_store,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_by: Sequence[str] = ("event_type",),
    value_col: str = "value",
    distinct_col: Optional[str] = None,
):
    """foreachBatch body maintaining `rollup_store` — replay-safe under
    the at-least-once contract: every upserted row carries the
    `__last_batch` that last contributed to it, and a replayed batch
    (restart after a crash between the store update and the stream
    commit) skips rows already stamped with its batch_id. The stamp
    rides IN the upserted row, so it is atomic with the merge itself —
    no sidecar state to fall out of sync."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = rollup_events(batch_df, ts_col, duration, group_by,
                                value_col, distinct_col=distinct_col)
        old = rollup_store.try_df()
        keys = ["window_start", "window_end", *group_by]
        if old is not None:
            if "__last_batch" not in old.columns:
                old = old.withColumn("__last_batch",
                                     F.lit(-1).cast("long"))
            touched = old.join(
                F.broadcast(partial.select(*keys).distinct()),
                on=keys, how="left_semi")
            # rows whose state already folded THIS batch in: their old
            # row is final — drop both sides so the additive merge
            # cannot double-count on replay
            done = touched.filter(F.col("__last_batch") >= batch_id) \
                .select(*keys)
            old = (touched.filter(F.col("__last_batch") < batch_id)
                   .drop("__last_batch"))
            partial = partial.join(F.broadcast(done), on=keys,
                                   how="left_anti")
            if partial.limit(1).count() == 0:
                return  # fully-replayed batch
        merged = merge_rollup(old, partial, group_by) \
            .withColumn("__last_batch", F.lit(batch_id).cast("long"))
        rollup_store.update(merged, key=["window_start", *group_by])

    return merge


def run_continuous_rollup(
    spark,
    source_path: str,
    rollup_store,
    checkpoint_dir: str,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_by: Sequence[str] = ("event_type",),
    value_col: str = "value",
    schema: Optional[str] = None,
    distinct_col: Optional[str] = None,
) -> StreamingQuery:
    """Maintain `rollup_store` from the parquet stream at source_path;
    Trigger.AvailableNow processes the backlog and stops (cron-friendly,
    effectively-once per batch: the checkpoint resumes from exact
    offsets and `rollup_merge_sink`'s row-level batch stamp makes the
    replayed-batch merge a no-op)."""
    from maggma_spark.streaming.runner import stream_parquet_source

    stream = stream_parquet_source(spark, source_path, schema=schema)
    merge = rollup_merge_sink(rollup_store, ts_col, duration, group_by,
                              value_col, distinct_col=distinct_col)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
