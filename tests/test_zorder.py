"""Z-order clustering: Morton key correctness (hand-computed
interleave), the locality property that motivates it (per-partition
min-max widths shrink on BOTH dims vs a single-column sort), guards,
and the codegen-only plan (no UDF, no extra shuffle beyond the
repartitionByRange)."""

import pytest
from pyspark.sql import functions as F

from maggma_spark.operators.zorder import cluster_by_zorder, zorder_key


def test_zorder_key_interleave_known_values(spark):
    # bits=2, two columns already in [0, 3]: supply stats so the
    # normalization is the identity and the interleave is checkable
    # by hand. Column 0 occupies even bit positions, column 1 odd.
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "a int, b int")
    stats = {"a": (0, 3), "b": (0, 3)}
    out = df.withColumn(
        "z", zorder_key(df, ["a", "b"], bits=2, stats=stats))
    got = {(r["a"], r["b"]): r["z"] for r in out.collect()}
    # a=1 (01b) -> bits at 0; b=2 (10b) -> bit at 3: z = 1 + 8 = 9
    assert got[(0, 0)] == 0
    assert got[(3, 3)] == 15
    assert got[(3, 0)] == 0b0101  # a bits at positions 0 and 2
    assert got[(0, 3)] == 0b1010  # b bits at positions 1 and 3
    assert got[(1, 2)] == 9


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 7), (100, None, 7), (50, None, 7)],
        "a int, b int, c int")
    out = df.withColumn("z", zorder_key(df, ["a", "b", "c"], bits=4))
    rows = out.collect()
    # all-null b and constant c contribute 0 bits; key is still
    # monotone in a's normalized rank
    by_a = {r["a"]: r["z"] for r in rows}
    assert by_a[1] < by_a[50] < by_a[100]


def test_zorder_locality_beats_single_column_sort(spark):
    # 32x32 grid: z-order clustering must tighten per-partition value
    # ranges on BOTH dims; a linear sort on x leaves y's per-partition
    # width at full span. Width(y) under zorder should be far smaller.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x int, y int").repartition(8)

    def avg_widths(frame):
        w = (frame.withColumn("p", F.spark_partition_id())
             .groupBy("p")
             .agg((F.max("x") - F.min("x")).alias("wx"),
                  (F.max("y") - F.min("y")).alias("wy"))
             .agg(F.avg("wx").alias("ax"), F.avg("wy").alias("ay"))
             .first())
        return w["ax"], w["ay"]

    z = cluster_by_zorder(df, ["x", "y"], bits=5, num_partitions=16)
    zx, zy = avg_widths(z)
    lin = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    lx, ly = avg_widths(lin)
    assert "__zorder" not in z.columns
    # linear layout: x is tight but y spans the whole grid
    assert ly >= 30
    # z-order: both dims tight (16 partitions of a 32x32 grid are
    # 8x8 cells; range-partition boundaries may straddle two cells)
    assert zx <= 16 and zy <= 16
    assert zx + zy < lx + ly


def test_zorder_plan_is_codegen_only(spark):
    df = spark.createDataFrame([(i, i * 3 % 7) for i in range(100)],
                               "a int, b int")
    out = cluster_by_zorder(df, ["a", "b"], bits=8, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") == 1  # the rangepartitioning only


def _xy2d(n, x, y):
    """Reference Hilbert xy->d (the classic rotation loop)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_and_is_continuous(spark):
    from maggma_spark.operators.zorder import hilbert_key

    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = df.withColumn("h", hilbert_key(
        df, ["a", "b"], bits=bits,
        stats={"a": (0, n - 1), "b": (0, n - 1)}))
    got = {(r["a"], r["b"]): r["h"] for r in out.collect()}
    assert all(got[(x, y)] == _xy2d(n, x, y) for x, y in rows)
    # the defining Hilbert property: consecutive keys are ADJACENT
    # cells (Morton jumps across the grid at power-of-two boundaries)
    inv = {h: xy for xy, h in got.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0])
        + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(len(rows) - 1))


def test_cluster_by_hilbert_curve(spark):
    from maggma_spark.operators.zorder import cluster_by_zorder

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x int, y int").repartition(8)
    h = cluster_by_zorder(df, ["x", "y"], bits=5, num_partitions=16,
                          curve="hilbert")
    w = (h.withColumn("p", F.spark_partition_id())
         .groupBy("p")
         .agg((F.max("x") - F.min("x")).alias("wx"),
              (F.max("y") - F.min("y")).alias("wy"))
         .agg(F.avg("wx").alias("ax"), F.avg("wy").alias("ay"))
         .first())
    assert w["ax"] <= 16 and w["ay"] <= 16  # both dims tight
    with pytest.raises(ValueError, match="unknown curve"):
        cluster_by_zorder(df, ["x", "y"], curve="peano")
    from maggma_spark.operators.zorder import hilbert_key
    with pytest.raises(ValueError, match="exactly two"):
        hilbert_key(df, ["x"])


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(df, ["a", "b"], bits=32)


def test_optimize_incremental_leaves_clustered_files(spark, tmp_path):
    """Round-8 partition-scoped OPTIMIZE (sources/parquet.py::
    optimize_incremental): partition p=0 is written pre-clustered
    (one sorted file), p=1 as several overlapping-key files. The
    incremental pass must rewrite ONLY p=1 — p=0's files stay
    byte-identical (same names, sizes, mtimes) — report exactly one
    rewritten partition, keep the data intact, and a second pass must
    find nothing left to rewrite."""
    import os

    from maggma_spark.sources.parquet import ParquetStore

    path = str(tmp_path / "t")
    # p=0: one file, sorted on k -> clustered by construction
    spark.createDataFrame(
        [(0, k, f"v{k}") for k in range(100)], "p int, k int, s string"
    ).coalesce(1).sortWithinPartitions("k") \
        .write.partitionBy("p").parquet(path)
    # p=1: three files with interleaved (overlapping) key ranges
    for off in range(3):
        spark.createDataFrame(
            [(1, k, f"w{k}") for k in range(off, 300, 3)],
            "p int, k int, s string"
        ).coalesce(1).write.mode("append").partitionBy("p").parquet(path)

    def files_of(part):
        d = os.path.join(path, f"p={part}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)),
             os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet"))

    before_p0, before_p1 = files_of(0), files_of(1)
    assert len(before_p1) == 3

    st = ParquetStore(spark, path, key="k", partition_by=["p"])
    report = st.optimize_incremental(["k"])
    assert report == {"partitions_total": 2, "partitions_rewritten": 1}
    assert files_of(0) == before_p0          # untouched, byte-identical
    assert files_of(1) != before_p1          # rewritten
    got = st.df.groupBy("p").count().orderBy("p").collect()
    assert [(r["p"], r["count"]) for r in got] == [(0, 100), (1, 300)]

    # now everything is clustered: second pass rewrites nothing
    report2 = st.optimize_incremental(["k"])
    assert report2 == {"partitions_total": 2,
                       "partitions_rewritten": 0}
