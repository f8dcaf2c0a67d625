"""Mergeable frequency sketches as plain DataFrames.

Beyond-reference capability (companion of the HLL distinct rollup,
streaming/rollup.py): a count-min sketch built and queried entirely
with declarative plans. The sketch IS a DataFrame of (depth, bucket,
count) rows — mergeable by summation (union + groupBy-sum), shippable
as parquet, and replayable in ANY SQL engine because the bucket
arithmetic is md5-based (no JVM-private hashing, unlike Spark's
built-in `count_min_sketch` whose binary payload only Spark can read).

Guarantee (standard CMS): estimate(item) >= true_count always;
overestimate <= e/width * N with probability 1 - (1/e)^depth.

Scale shape: building shuffles (depth x width) counter rows at most —
the sketch size is a CONSTANT independent of data size; estimating is
a broadcast join of the item set against the sketch. 100 TB of events
compresses into the same depth*width rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(col, d: int, width: int):
    """Deterministic bucket for depth-row d: md5 of (d, value), first
    8 hex chars mod width — identical arithmetic is expressible in any
    SQL dialect (see the catalog oracle)."""
    return (
        F.conv(F.substring(
            F.md5(F.concat_ws("\x1f", F.lit(str(d)),
                              col.cast("string"))), 1, 8), 16, 10)
        .cast("long") % width
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 256,
    weight_col: str | None = None,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Build a count-min sketch of `col` (optionally weighted): returns
    (depth, bucket, count) with exactly one row per non-empty counter.
    Merge two sketches of the SAME shape with
    `a.unionByName(b).groupBy("depth","bucket").agg(sum("count"))`.

    `group_cols` builds ONE SKETCH PER GROUP (e.g. per rollup window):
    output gains the group columns, and coarsening a rollup is the same
    union + groupBy-sum with the coarser keys — frequency rollups
    compose exactly like the HLL distinct rollup
    (streaming/rollup.py::rollup_distinct)."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    groups = list(group_cols or [])
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    c = F.col(col)
    rows = None
    for d in range(depth):
        part = df.select(
            *groups,
            F.lit(d).alias("depth"),
            _bucket(c, d, width).alias("bucket"),
            w.alias("__w"))
        rows = part if rows is None else rows.unionByName(part)
    return rows.groupBy(*groups, "depth", "bucket").agg(
        F.sum("__w").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for `items[col]` against a sketch
    built with the same (depth, width): min over the depth counters.
    Items hashing to empty counters estimate 0. The sketch side is
    depth*width rows at most — broadcast; the item side never
    shuffles more than (item, depth) pairs."""
    c = F.col(col)
    keyed = None
    for d in range(depth):
        part = items.select(
            c.alias(col),
            F.lit(d).alias("depth"),
            _bucket(c, d, width).alias("bucket"))
        keyed = part if keyed is None else keyed.unionByName(part)
    joined = keyed.join(F.broadcast(sketch), on=["depth", "bucket"],
                        how="left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("count"), F.lit(0)))
        .alias("est_count"))
