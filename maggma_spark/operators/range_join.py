"""Interval range join — pair rows whose timestamps fall within a window
of each other, without the quadratic blowup.

Beyond-reference capability (no temporal joins in the reference, SURVEY
§2.3). The naive plan for `l.ts BETWEEN r.ts - w AND r.ts + w` is a
broadcast-nested-loop or a per-key cross join; at 100 TB either dies.

Bucketized band join: quantize both sides' timestamps into buckets of
width >= the window; a qualifying pair is always in the same or an
adjacent bucket, so joining on (keys, bucket) with the right side
replicated into its 3 neighboring buckets turns the range condition into
an equi-join + residual filter. Shuffle cost: 3x the right side's rows
on short keys — linear, not quadratic. (This is the standard
interval-bucketing trick behind Databricks' range-join optimization;
expressed here with plain DataFrame ops.)
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window: str,
    on: Union[str, Sequence[str], None] = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs with |left_ts - right_ts| <= window (e.g. '10 minutes'),
    optionally equi-keyed by `on`. Column-name collisions must be
    resolved by the caller (alias before joining)."""
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    win = F.expr(f"INTERVAL {window}")
    # window length in microseconds (epoch + interval, UTC session)
    win_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01 00:00:00")) + win)

    # cast("timestamp") first: parquet TIMESTAMP_NTZ columns (pyspark 4
    # inferTimestampNTZ) are rejected by unix_micros; the cast is a no-op
    # for TIMESTAMP and wall-clock-preserving under the UTC session tz.
    l = left.withColumn(
        "__bkt",
        (F.unix_micros(F.col(left_ts).cast("timestamp")) / win_us).cast("long"))
    r = right.withColumn(
        "__rbkt",
        (F.unix_micros(F.col(right_ts).cast("timestamp")) / win_us).cast("long"))
    # replicate the right side into its neighborhood
    r = r.withColumn("__bkt", F.explode(F.array(
        F.col("__rbkt") - 1, F.col("__rbkt"), F.col("__rbkt") + 1))).drop("__rbkt")

    joined = l.join(r, on=keys + ["__bkt"], how=how)
    residual = (
        F.col(left_ts) >= F.col(right_ts) - win
    ) & (F.col(left_ts) <= F.col(right_ts) + win)
    return joined.filter(residual).drop("__bkt")
