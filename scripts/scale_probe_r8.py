"""Round-8 scale probes.

1. UNPARTITIONED running $median over 10M unique keys — the
   distributed prefix-order-statistics path (_global_running_pctl):
   running median of v=k over k=0..i is exactly i/2, checked for ALL
   rows with one filter-count. Never a single-task sort; the Fenwick
   selection kernel fans out over (value-bucket x g-chunk) groups.
2. Finite [-W, W] range $sum at W=1000 (the round-8
   growing-frame-differencing path) re-timed at 10M for SCALE.md.

Run: python scripts/scale_probe_r8.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, out):
    t0 = time.perf_counter()
    result = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    return result


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import functions as F

    from maggma_spark.functions.agg_pipeline import compile_pipeline
    from maggma_spark.session import get_spark

    spark = get_spark("scale-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"rows": n}

    base = spark.range(n).select(F.col("id").alias("k"),
                                 F.col("id").cast("double").alias("v"),
                                 F.lit(1).alias("one"))

    def running_median():
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {"med": {"$median": {"input": "$v",
                                           "method": "approximate"},
                               "window": {"documents": ["unbounded",
                                                        "current"]}}}}}])
        bad = out.filter(
            F.col("med") != F.col("k").cast("double") / 2.0).count()
        assert bad == 0, bad
        return bad

    timed("swf_global_running_median", running_median, timings)

    def reverse_running_median():
        # suffix median of v=k over k=i..n-1 is exactly (i + n-1)/2
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {"med": {"$median": {"input": "$v",
                                           "method": "approximate"},
                               "window": {"documents": ["current",
                                                        "unbounded"]}}}}}])
        expected = (F.col("k") + F.lit(n - 1)).cast("double") / 2.0
        bad = out.filter(F.col("med") != expected).count()
        assert bad == 0, bad
        return bad

    timed("swf_global_reverse_running_median", reverse_running_median,
          timings)

    def finite_range_band():
        W = 1000
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {"band": {"$sum": "$one",
                                "window": {"range": [-W, W]}}}}}])
        expected = (F.least(F.col("k"), F.lit(W))
                    + F.least(F.lit(n - 1) - F.col("k"), F.lit(W))
                    + F.lit(1))
        bad = out.filter(F.col("band") != expected).count()
        assert bad == 0, bad
        return bad

    timed("swf_global_finite_range_band_w1000", finite_range_band,
          timings)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
