"""Count-min sketch as a DataFrame: guarantees and mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from maggma_spark.operators.sketch import cms_build, cms_estimate


def test_cms_never_underestimates(spark):
    rows = [Row(k=f"item{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows)
    sketch = cms_build(df, "k", depth=4, width=64)
    items = df.select("k").distinct()
    est = {r["k"]: r["est_count"] for r in
           cms_estimate(sketch, items, "k", depth=4, width=64).collect()}
    assert all(v >= 100 for v in est.values())  # exact is 100 each


def test_cms_merge_equals_union_build(spark):
    a = spark.createDataFrame([Row(k=f"a{i % 5}") for i in range(50)])
    b = spark.createDataFrame([Row(k=f"b{i % 3}") for i in range(30)])
    merged = (cms_build(a, "k", 3, 32).unionByName(cms_build(b, "k", 3, 32))
              .groupBy("depth", "bucket").agg(F.sum("count").alias("count")))
    direct = cms_build(a.unionByName(b), "k", 3, 32)
    as_set = lambda df: {(r["depth"], r["bucket"], r["count"])
                         for r in df.collect()}
    assert as_set(merged) == as_set(direct)


def test_cms_weighted_and_validation(spark):
    df = spark.createDataFrame([Row(k="x", w=10), Row(k="x", w=5),
                                Row(k="y", w=1)])
    sketch = cms_build(df, "k", 3, 32, weight_col="w")
    est = {r["k"]: r["est_count"] for r in
           cms_estimate(sketch, df.select("k").distinct(), "k",
                        3, 32).collect()}
    assert est["x"] >= 15 and est["y"] >= 1
    with pytest.raises(ValueError):
        cms_build(df, "k", 0, 32)


def test_cms_grouped_rollup_coarsens_exactly(spark):
    """Per-hour sketches coarsen to the daily sketch by groupBy-sum —
    identical to building daily directly (mergeable-rollup law)."""
    rows = [Row(hour=h, k=f"item{(i + h) % 4}")
            for h in range(3) for i in range(40)]
    df = spark.createDataFrame(rows)
    hourly = cms_build(df, "k", 3, 32, group_cols=["hour"])
    assert hourly.select("hour").distinct().count() == 3
    coarse = (hourly.groupBy("depth", "bucket")
              .agg(F.sum("count").alias("count")))
    direct = cms_build(df, "k", 3, 32)
    as_set = lambda d: {(r["depth"], r["bucket"], r["count"])
                        for r in d.collect()}
    assert as_set(coarse) == as_set(direct)
