"""Event-time windowed aggregation — tumbling / sliding / session.

The reference has NO streaming engine (SURVEY §2.9): its only temporal
operator is the batch high-watermark diff. These windows are therefore
*new capability*, built on Spark's native `window()` / `session_window()`
so the exact same code runs:

- in batch over a static DataFrame (how the correctness gate runs it);
- in Structured Streaming over `readStream` with `withWatermark` for
  late-data handling (see `streaming.runner`).

Scale notes: `window()` is a narrow projection (each row maps to its
window(s)) followed by a hash aggregate — one shuffle on (window, keys).
`session_window` uses Spark's native session merge; at 100 TB partition
the shuffle by the session key (user) so sessions never cross executors.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _agg_exprs(aggs: Optional[dict]) -> list[Column]:
    """{"out_name": agg Column} -> aliased agg columns; default count(*)."""
    if not aggs:
        return [F.count(F.lit(1)).alias("n_events")]
    return [c.alias(name) for name, c in aggs.items()]


def tumbling_windows(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Optional[dict] = None,
) -> DataFrame:
    """Fixed non-overlapping windows, e.g. duration='1 hour'."""
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("w"), *group_by)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_by,
            *[c for c in (aggs or {"n_events": 1})],
        )
    )


def sliding_windows(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Optional[dict] = None,
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("w"), *group_by)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_by,
            *[c for c in (aggs or {"n_events": 1})],
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Optional[dict] = None,
) -> DataFrame:
    """Gap-based sessions per group: a session extends while events arrive
    within `gap`; window end = last event + gap (Spark semantics)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *group_by)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_by,
            *[c for c in (aggs or {"n_events": 1})],
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str,
    streaming: Optional[bool] = None,
) -> DataFrame:
    """Drop duplicate events per key within the watermark horizon.

    Streaming: Spark's native `dropDuplicatesWithinWatermark` — state for
    a key is held only `watermark` long (bounded state at 100 TB/day
    event rates), deduping at-least-once delivery where retries arrive
    within the horizon.

    Batch (the correctness-gate path): the semantic twin — keep the
    FIRST event per key within each `watermark`-sized horizon: window
    rows by key ordered by time and keep rows at least `watermark` after
    the previously kept one. Batch runs compute the exact greedy form
    via per-key session logic (one shuffle on the key).
    """
    cols = list(keys)
    if streaming is None:
        streaming = df.isStreaming
    if streaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    # batch twin: greedy first-event-per-horizon via applyInPandas —
    # a plain window/lag cannot express "distance from last KEPT row"
    # (it chains off every row); per-key state is a single timestamp.
    parts = watermark.split()
    unit_s = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    horizon_ns = int(float(parts[0]) * unit_s[parts[1]] * 1_000_000_000)

    out_schema = df.schema

    # ONE shuffle (repartition by key + in-partition sort), then a
    # partition-streaming kernel: groups are contiguous, so each Arrow
    # batch handles MANY groups with numpy searchsorted jumps
    # (O(kept * log n) per group). groupBy().applyInPandas was 20x
    # slower here — one pandas frame per tiny group (7500 groups = 12 s
    # of per-group overhead at sf0.1). Carry state bridges a group that
    # spans consecutive Arrow batches of the same sorted partition.
    def mapper(batches):
        import numpy as np

        carry_key = None
        carry_last = None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            key_arrays = [pdf[c].to_numpy() for c in cols]
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for a in key_arrays:
                change[1:] |= (a[1:] != a[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            ts = pdf[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
            keep = np.zeros(n, dtype=bool)
            for s, e in zip(starts, ends):
                start_after = None
                if s == 0 and carry_key is not None and (
                        tuple(a[0] for a in key_arrays) == carry_key):
                    start_after = carry_last
                seg = ts[s:e]
                if start_after is None:
                    i = 0
                else:
                    i = int(np.searchsorted(seg, start_after + horizon_ns,
                                            side="right"))
                last = start_after
                while i < e - s:
                    keep[s + i] = True
                    last = int(seg[i])
                    i = int(np.searchsorted(seg, seg[i] + horizon_ns,
                                            side="right"))
                if e == n:
                    carry_key = tuple(a[n - 1] for a in key_arrays)
                    carry_last = last
            out = pdf[keep]
            if len(out):
                yield out

    return (df.repartition(*cols)
            .sortWithinPartitions(*cols, ts_col)
            .mapInPandas(mapper, schema=out_schema))
