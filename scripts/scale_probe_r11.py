"""Round-11 window-percentile scale probe (local[32], synthetic 10M
rows): the group-space kernel rewrite vs the round-9 wide SQL form —
carries the round-9 target "approximate global running percentile
<= 20 s @10M" (r10 verdict next #7). Also probes the EXACT kernel
router and a heavily-tied sortBy (the r10 ADVICE OOM scenario: equal
keys collapse into one scaffold range — the chunked group traversal
must hold memory AND collapse compute to O(groups x V)).

Prints one JSON line. Run: python scripts/scale_probe_r11.py [n_rows].
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
    spark = get_spark("scale-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": n}

    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 1009 != 3,
               (F.hash(F.col("id")) % 100000).cast("double"))
        .alias("x"))
    pipe = [{"$setWindowFields": {
        "sortBy": {"k": 1},
        "output": {
            "med": {"$median": {"input": "$x",
                                "method": "approximate"},
                    "window": {"documents": ["unbounded", "current"]}},
            "qs": {"$percentile": {"input": "$x", "p": [0.25, 0.75],
                                   "method": "approximate"},
                   "window": {"documents": ["unbounded", "current"]}},
        }}}]

    # 1. approximate mode: kernel (round-11 group-space) vs wide
    spark.conf.set("spark.maggma.windowPctl.method", "approximate")
    for asm in ("kernel", "wide"):
        spark.conf.set("spark.maggma.windowPctl.approxAssembly", asm)
        t0 = time.perf_counter()
        compile_pipeline(base, pipe).write.format("noop") \
            .mode("overwrite").save()
        out[f"approx_{asm}_sec"] = round(time.perf_counter() - t0, 1)
    spark.conf.unset("spark.maggma.windowPctl.approxAssembly")

    # 2. heavily-tied RANGE sortBy: n rows over ~40 distinct keys —
    # every key-tie group holds ~n/40 rows and equal keys share one
    # scaffold range (the r10 ADVICE blow-up shape). The group-space
    # kernel does O(groups x V) arithmetic here.
    tied = spark.range(n).select(
        (F.col("id") % 40).cast("double").alias("k"),
        (F.hash(F.col("id")) % 100000).cast("double").alias("x"))
    tpipe = [{"$setWindowFields": {
        "sortBy": {"k": 1},
        "output": {
            "med": {"$median": {"input": "$x",
                                "method": "approximate"},
                    "window": {"range": ["unbounded", "current"]}},
        }}}]
    t0 = time.perf_counter()
    compile_pipeline(tied, tpipe).write.format("noop") \
        .mode("overwrite").save()
    out["approx_tied_range_sec"] = round(time.perf_counter() - t0, 1)
    spark.conf.unset("spark.maggma.windowPctl.method")

    # 3. exact kernel router (the default), same frame
    t0 = time.perf_counter()
    compile_pipeline(base, pipe).write.format("noop") \
        .mode("overwrite").save()
    out["exact_kernel_sec"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
