"""Skew-mitigation operators — salted aggregation and salted joins.

The reference had no notion of skew (Mongo and a ProcessPool just get
slow); at 100 TB a single hot key (one customer with 10^9 rows, one
degenerate dedup digest) turns a shuffle into a straggler. Two standard
remedies, expressed declaratively:

- **salted two-phase aggregation**: groupBy((key, salt)) partial agg ->
  groupBy(key) final agg. The hot key's rows spread over `salt_buckets`
  reducers in phase 1; phase 2 combines `salt_buckets` partial rows per
  key — negligible. Correct for any algebraic aggregate (sum/count/min/
  max and anything with a merge function).
- **salted broadcast-side-replicated join**: big side gets a random salt
  in [0, n); small side replicates each row n times (explode over the
  salt range); join on (key, salt). The hot key's matches spread over n
  tasks. Only needed when AQE's skew-join splitting (enabled in
  session.py) is insufficient — e.g. a single key larger than one
  executor's memory.

AQE note: `spark.sql.adaptive.skewJoin.enabled` already splits skewed
*partitions* at runtime; salting is the stronger tool for skewed *keys*.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F


def salted_groupby(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs: name -> agg Column over raw rows (phase 1).
    final_aggs:   name -> agg Column over the phase-1 partial columns
                  (reference the partial names).

    Example (count + sum):
        salted_groupby(df, "k",
            {"cnt_p": F.count(F.lit(1)), "sum_p": F.sum("v")},
            {"cnt": F.sum("cnt_p"), "sum_v": F.sum("sum_p")})
    """
    if isinstance(keys, str):
        keys = [keys]
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()])
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    across the salt range, join on (keys + salt)."""
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return big_s.join(small_r, on=keys + ["__salt"], how=how).drop("__salt")


def top_skewed_keys(
    df: DataFrame, keys: Union[str, Sequence[str]], n: int = 10
) -> DataFrame:
    """Diagnostic: heaviest keys by row count (run on a sample at scale).
    Key-value tie-break makes the top-n cut deterministic."""
    if isinstance(keys, str):
        keys = [keys]
    return (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.col("rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(n)
    )
