"""Table profiler: one-pass per-column statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from maggma_spark.operators.profile import profile_table


def test_profile_basic_stats(spark):
    df = spark.createDataFrame([
        Row(a=1, b="x", c=[1, 2]),
        Row(a=2, b=None, c=[3]),
        Row(a=2, b="y", c=None),
    ])
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"a", "b", "c"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["a"]["n_nulls"] == 0 and out["a"]["n_distinct"] == 2
    assert out["a"]["min_value"] == "1" and out["a"]["max_value"] == "2"
    assert out["b"]["n_nulls"] == 1 and out["b"]["n_distinct"] == 2
    # arrays: counted, but no min/max (no total order)
    assert out["c"]["n_nulls"] == 1 and out["c"]["n_distinct"] == 2
    assert out["c"]["min_value"] is None


def test_profile_approx_and_errors(spark):
    df = spark.createDataFrame([Row(a=i % 10) for i in range(1000)])
    exact = profile_table(df).collect()[0]
    approx = profile_table(df, approx=True).collect()[0]
    assert exact["n_distinct"] == 10
    # HLL at this cardinality is exact too, but only require "close"
    assert abs(approx["n_distinct"] - 10) <= 1
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df, [])


def test_profile_diff_statuses(spark):
    from maggma_spark.operators.profile import profile_diff, profile_table

    old = profile_table(spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b=None)]))
    new = profile_table(spark.createDataFrame(
        [Row(a=1, c=0.5), Row(a=2, c=None), Row(a=2, c=1.0)]))
    out = {r["column"]: r for r in profile_diff(old, new).collect()}
    assert out["b"]["status"] == "removed"
    assert out["c"]["status"] == "added"
    assert out["a"]["status"] == "changed"      # row count grew
    assert out["c"]["null_rate_delta"] == pytest.approx(1 / 3, abs=1e-6)
    same = profile_diff(old, old).collect()
    assert all(r["status"] == "unchanged" for r in same)
    assert all(r["null_rate_delta"] == 0.0 for r in same)


def test_histogram_clamps_and_counts(spark):
    from maggma_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [Row(x=float(v)) for v in [-5, 0, 9, 10, 95, 200]]
        + [Row(x=None)])
    out = {r["bin"]: r for r in
           histogram(df, "x", 0.0, 100.0, nbins=10).collect()}
    assert out[0]["n"] == 3          # -5 clamps in; 0 and 9 inside
    assert out[1]["n"] == 1          # 10
    assert out[9]["n"] == 2          # 95 inside; 200 clamps down
    assert sum(r["n"] for r in out.values()) == 6   # nulls dropped
    assert out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 10.0
    with pytest.raises(ValueError):
        histogram(df, "x", 5.0, 5.0)


def test_histogram_quantiles_interpolation_and_merge(spark):
    from pyspark.sql import functions as F

    from maggma_spark.operators.profile import histogram, histogram_quantiles

    a = spark.createDataFrame([Row(x=float(i)) for i in range(500)])
    b = spark.createDataFrame([Row(x=float(i)) for i in range(500, 1000)])
    ha = histogram(a, "x", 0.0, 1000.0, nbins=10)
    hb = histogram(b, "x", 0.0, 1000.0, nbins=10)
    merged = (ha.unionByName(hb).groupBy("bin", "bin_lo", "bin_hi")
              .agg(F.sum("n").alias("n")))
    qs = {r["q"]: r["est"] for r in
          histogram_quantiles(merged, [0.0, 0.5, 1.0]).collect()}
    assert qs[0.0] == 0.0
    assert qs[0.5] == 500.0
    assert qs[1.0] == 1000.0
    # merged histogram == direct build over the union
    direct = histogram(a.unionByName(b), "x", 0.0, 1000.0, nbins=10)
    as_set = lambda d: {tuple(r) for r in d.collect()}
    assert as_set(merged.select("bin", "bin_lo", "bin_hi", "n")) \
        == as_set(direct)
    with pytest.raises(ValueError):
        histogram_quantiles(ha, [1.5])


def test_histogram_differential_vs_numpy(spark):
    import numpy as np

    from maggma_spark.operators.profile import histogram

    rng = np.random.RandomState(4)
    vals = np.round(rng.uniform(-20, 120, 800), 3)
    df = spark.createDataFrame([Row(x=float(v)) for v in vals])
    got = {r["bin"]: r["n"] for r in
           histogram(df, "x", 0.0, 100.0, nbins=10).collect()}
    clamped = np.clip(np.floor(vals / 10.0).astype(int), 0, 9)
    want = dict(zip(*np.unique(clamped, return_counts=True)))
    assert got == {int(k): int(v) for k, v in want.items()}


def test_winsorize_differential_vs_numpy(spark):
    import numpy as np

    from maggma_spark.operators.features import winsorize

    rng = np.random.RandomState(8)
    vals = np.round(rng.normal(50, 30, 500), 2)
    df = spark.createDataFrame([Row(doc_id=i, v=float(x))
                                for i, x in enumerate(vals)])
    out = {r["doc_id"]: r["v_wins"] for r in
           winsorize(df, "v", None, p_lo=0.05, p_hi=0.95).collect()}
    lo, hi = np.percentile(vals, [5, 95], method="linear")
    for i, x in enumerate(vals):
        assert abs(out[i] - min(max(x, lo), hi)) < 1e-9
