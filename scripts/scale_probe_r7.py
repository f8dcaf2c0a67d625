"""Round-7 scale probe: the accumulator-guard family and the extended
unpartitioned range-frame windows at 10M rows on local[32] — the
measured evidence behind SCALE.md's round-7 claims.

Probes (all invariant-checked, closed-form expectations):
  - $group $topN/$bottomN over 4 groups of 2.5M rows each: the rank
    prefilter must keep the aggregation's collected state at <= n
    elements per group (the pre-round-7 collect_list held the whole
    2.5M-row group per task); invariant: exact top/bottom ids.
  - unpartitioned running range $sum over 10M unique keys (carry
    path): integer values make the invariant exact — the final
    running sum equals n(n-1)/2, the first equals 0.
  - unpartitioned finite [-W, W] range $sum of 1-per-row (replication
    path): every row's band count must equal
    min(k, W) + min(n-1-k, W) + 1 — checked for ALL rows with one
    filter-count, no sampling.
  - unpartitioned $first/$last documents frames: global scalars 0 and
    n-1 on every row.

Run: python scripts/scale_probe_r7.py [n_rows]
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

    spark = get_spark("scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"rows": n}

    def group_topn():
        df = spark.range(n).select(
            (F.col("id") % 4).alias("g"), F.col("id").alias("k"))
        out = compile_pipeline(df, [{"$group": {
            "_id": "$g",
            "top3": {"$topN": {"n": 3, "sortBy": {"k": -1},
                               "output": "$k"}},
            "bot2": {"$bottomN": {"n": 2, "sortBy": {"k": -1},
                                  "output": "$k"}},
            "cnt": {"$count": {}}}}])
        rows = {r["_id"]: r for r in out.collect()}
        for g in range(4):
            top = [x for x in range(n - 1, n - 40, -1) if x % 4 == g][:3]
            bot = [x for x in range(0, 40) if x % 4 == g][:2]
            assert rows[g]["top3"] == top, (g, rows[g]["top3"], top)
            assert rows[g]["bot2"] == bot, (g, rows[g]["bot2"], bot)
            assert rows[g]["cnt"] == n // 4
        return rows

    timed("group_topn_prefiltered_4x2500k", group_topn, timings)

    base = spark.range(n).select(F.col("id").alias("k"),
                                 F.lit(1).alias("one"),
                                 F.col("id").alias("v"))

    def running_range_sum():
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {
                "run": {"$sum": "$v",
                        "window": {"range": ["unbounded", "current"]}},
                "gf": {"$first": "$k",
                       "window": {"documents": ["unbounded",
                                                "current"]}},
                "gl": {"$last": "$k",
                       "window": {"documents": ["current",
                                                "unbounded"]}},
            }}}])
        row = out.agg(F.min("run").alias("mn"), F.max("run").alias("mx"),
                      F.min("gf").alias("gf0"), F.max("gf").alias("gf1"),
                      F.min("gl").alias("gl0"),
                      F.max("gl").alias("gl1")).first()
        assert row["mn"] == 0 and row["mx"] == n * (n - 1) // 2, row
        assert row["gf0"] == row["gf1"] == 0, row
        assert row["gl0"] == row["gl1"] == n - 1, row
        return row

    timed("swf_global_running_range_sum", running_range_sum, timings)

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

    def finite_documents_frame():
        # unique keys: the [-3, 0] documents frame over k = id sums
        # the 4 trailing ids — closed-form for every row
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {"ms": {"$sum": "$v",
                              "window": {"documents": [-3, 0]}}}}}])
        lo = F.greatest(F.col("k") - F.lit(3), F.lit(0))
        expected = (F.col("k") + lo) * (F.col("k") - lo + 1) / 2
        bad = out.filter(F.col("ms") != expected.cast("long")).count()
        assert bad == 0, bad
        return bad

    timed("swf_global_finite_documents_frame", finite_documents_frame,
          timings)

    def running_stddev():
        # running $stdDevPop over k = 0..n-1 has the closed form
        # sqrt(k(k+2)/12) (variance of the uniform integers 0..k);
        # checked for ALL rows at 1e-6 relative tolerance — the
        # sum-of-squares carries hold ~1e-11 relative error at 10M
        # even though sum(v^2) ~ n^3/3 exceeds double's exact range
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {"sd": {"$stdDevPop": "$v",
                              "window": {"documents": ["unbounded",
                                                       "current"]}}}}}])
        expected = F.sqrt(F.col("k").cast("double")
                          * (F.col("k") + 2) / F.lit(12.0))
        bad = out.filter(
            F.abs(F.col("sd") - expected)
            > F.lit(1e-6) * (expected + F.lit(1e-9))).count()
        assert bad == 0, bad
        return bad

    timed("swf_global_running_stddev", running_stddev, timings)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
