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
    horizon_s = float(parts[0]) * unit_s[parts[1]]

    out_schema = df.schema

    def keep_first(pdf):
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        kept = []
        last_ts = None
        for i, ts in enumerate(pdf[ts_col]):
            if last_ts is None or (ts - last_ts).total_seconds() > horizon_s:
                kept.append(i)
                last_ts = ts
        return pdf.iloc[kept]

    return df.groupBy(*cols).applyInPandas(keep_first, schema=out_schema)
