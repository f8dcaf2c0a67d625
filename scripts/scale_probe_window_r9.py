"""Round-9 window-family scale probes (local[32], synthetic 10M rows):

1. Global (unpartitioned) $expMovingAvg + running $derivative +
   running $integral through the range scaffold — the affine EMA
   carries, edge-struct carries, and trapezoid pair-sum carries at
   10M rows, with a closed-form spot check on sampled rows.
2. Partitioned APPROXIMATE running $median
   (_partitioned_running_pctl_approx) at 10M rows x 32 groups — the
   O(G)/row path whose exact twin is quadratic per partition.

Prints one JSON line. Run: python scripts/scale_probe_window_r9.py
[n_rows].
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from pyspark.sql import functions as F

    from maggma_spark.functions.agg_pipeline import compile_pipeline
    from maggma_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-probe-window-r9")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": n}

    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 1009 != 3,
               (F.hash(F.col("id")) % 100000).cast("double")).alias("x"),
        F.when((F.col("id") % 4096 == 7) & (F.col("id") < 131072),
               (F.col("id") % 1000).cast("double")).alias("ve"))

    t0 = time.perf_counter()
    gdf = compile_pipeline(base, [{"$setWindowFields": {
        "sortBy": {"k": 1},
        "output": {
            "ema": {"$expMovingAvg": {"input": "$ve", "N": 3}},
            "d_run": {"$derivative": {"input": "$x"},
                      "window": {"documents": ["unbounded",
                                               "current"]}},
            "i_run": {"$integral": {"input": "$x"},
                      "window": {"documents": ["unbounded",
                                               "current"]}},
        }}}])
    gdf.write.format("noop").mode("overwrite").save()
    out["global_ema_deriv_integral_sec"] = round(
        time.perf_counter() - t0, 1)

    # closed-form spot check on the global head and two sampled rows:
    # d_run = (x_k - x_0)/k; i_run telescopes only for non-null runs,
    # so just re-derive it for the sampled prefix via a bounded filter
    rows = {r["k"]: r for r in gdf.filter(
        F.col("k").isin(0, 1000, 99_999)).collect()}
    pre = (base.filter(F.col("k") <= 99_999)
           .orderBy("k").select("k", "x").collect())
    xs = [r["x"] for r in pre]
    ks = [r["k"] for r in pre]
    for probe_k in (1000, 99_999):
        i = ks.index(probe_k)
        acc = 0.0
        for j in range(1, i + 1):
            if xs[j] is not None and xs[j - 1] is not None:
                acc += (xs[j] + xs[j - 1]) / 2 * (ks[j] - ks[j - 1])
        got = rows[probe_k]["i_run"]
        assert abs(got - acc) <= 1e-6 * max(1.0, abs(acc)), \
            (probe_k, got, acc)
        if xs[i] is not None and xs[0] is not None:
            want_d = (xs[i] - xs[0]) / (ks[i] - ks[0])
            assert abs(rows[probe_k]["d_run"] - want_d) < 1e-9, \
                (probe_k, rows[probe_k]["d_run"], want_d)
    out["global_spot_checks"] = "ok"

    pbase = spark.range(n).select(
        (F.col("id") % 32).alias("g"), F.col("id").alias("k"),
        (F.hash(F.col("id")) % 100000).cast("double").alias("v"))
    spark.conf.set("spark.maggma.windowPctl.method", "approximate")
    try:
        t0 = time.perf_counter()
        pdf = compile_pipeline(pbase, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"k": 1},
            "output": {"med": {
                "$median": {"input": "$v", "method": "approximate"},
                "window": {"documents": ["unbounded", "current"]}}}}}])
        pdf.write.format("noop").mode("overwrite").save()
        out["partitioned_approx_median_sec"] = round(
            time.perf_counter() - t0, 1)
    finally:
        spark.conf.unset("spark.maggma.windowPctl.method")

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
