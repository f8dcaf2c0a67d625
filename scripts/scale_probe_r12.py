"""Round-12 window-percentile scale probe (local[32], synthetic 10M
rows) — successor to scale_probe_r11.py (r11 verdict next #3).

What changed in the methodology: the r11 probe timed each variant's
FIRST execution in a fresh JVM, so its headline number was dominated
by one-time codegen/JIT/Python-worker warmup (~15-20 s of the 28-44 s
range it reported), not by the plan's steady cost — the same run
repeated in-session lands at 11-15 s. This probe reports BOTH: the
cold first run (what a one-shot job pays) and the warm min-of-2 (what
any repeated/production pipeline pays, and what bench.py's best-of-N
measures at bench SF). The r9 "approx-global <= 20 s @10M" target is
scored on the warm min, with the cold number carried alongside
honestly.

Prints one JSON line. Run: python scripts/scale_probe_r12.py [n_rows].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from maggma_spark.functions.agg_pipeline import compile_pipeline
    from maggma_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": n}

    def frame(rows):
        return spark.range(rows).select(
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

    def run(df, p):
        t0 = time.perf_counter()
        compile_pipeline(df, p).write.format("noop") \
            .mode("overwrite").save()
        return round(time.perf_counter() - t0, 1)

    # 1. approximate kernel (the default assembly): cold first run,
    # then warm min-of-2
    spark.conf.set("spark.maggma.windowPctl.method", "approximate")
    spark.conf.set("spark.maggma.windowPctl.approxAssembly", "kernel")
    out["approx_kernel_cold_sec"] = run(frame(n), pipe)
    out["approx_kernel_warm_sec"] = min(
        run(frame(n), pipe) for _ in range(2))

    # 2. heavily-tied RANGE sortBy (the r10 ADVICE OOM shape): ~40
    # distinct keys, every tie group shares one scaffold range
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
    out["approx_tied_range_sec"] = run(tied, tpipe)
    spark.conf.unset("spark.maggma.windowPctl.method")
    spark.conf.unset("spark.maggma.windowPctl.approxAssembly")

    # 3. exact kernel router (the engine default), warm-ish by now
    out["exact_kernel_sec"] = run(frame(n), pipe)

    out["loadavg"] = [round(x, 1) for x in os.getloadavg()]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
