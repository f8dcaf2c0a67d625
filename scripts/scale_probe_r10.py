"""Round-10 window-percentile scale probes (local[32], synthetic 10M
rows): the two assembly/router changes of the round, re-runnable.

1. GLOBAL approximate running $median/$percentile — the round-10
   numpy-kernel assembly (default at >=1M rows) vs the round-9 wide
   SQL form on the same input. Round-10 measured 43.9 s vs 140-165 s
   (the wide form's V cumulative window sums + interpolation ladders
   blow codegen's field/method budgets at V=64 and run interpreted).
2. EXACT global running $median — the round-10 cogroup kernel router
   vs the SQL cumulative-window router. Round-10 measured 81 vs 96 s
   same-process (kernel ran first/colder).

Prints one JSON line. Run: python scripts/scale_probe_r10.py [n_rows].
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
    spark = get_spark("scale-probe-r10")
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

    # 1. approximate mode: kernel vs wide assembly
    spark.conf.set("spark.maggma.windowPctl.method", "approximate")
    for asm in ("kernel", "wide"):
        spark.conf.set("spark.maggma.windowPctl.approxAssembly", asm)
        t0 = time.perf_counter()
        compile_pipeline(base, pipe).write.format("noop") \
            .mode("overwrite").save()
        out[f"approx_{asm}_sec"] = round(time.perf_counter() - t0, 1)
    spark.conf.unset("spark.maggma.windowPctl.method")
    spark.conf.unset("spark.maggma.windowPctl.approxAssembly")

    # 2. exact mode: cogroup kernel router vs SQL window router
    epipe = [{"$setWindowFields": {
        "sortBy": {"k": 1},
        "output": {
            "med": {"$median": {"input": "$x",
                                "method": "approximate"},
                    "window": {"documents": ["unbounded",
                                             "current"]}}}}}]
    for router in ("kernel", "window"):
        spark.conf.set("spark.maggma.windowPctl.exactRouter", router)
        t0 = time.perf_counter()
        compile_pipeline(base, epipe).write.format("noop") \
            .mode("overwrite").save()
        out[f"exact_{router}_sec"] = round(time.perf_counter() - t0, 1)
    spark.conf.unset("spark.maggma.windowPctl.exactRouter")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
