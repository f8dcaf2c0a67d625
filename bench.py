"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results materialize through the no-op sink (format("noop")) so timing
measures scan+compute+shuffle, not driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from maggma_spark.plans.catalog import QUERIES
    from maggma_spark.session import get_spark

    spark = get_spark("maggma_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once with a trivial action
    spark.range(1000).count()

    only = set(sys.argv[1:])
    # best-of-2 by default: report steady-state plan execution, not the
    # first-run JVM/codegen warmup
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "total seconds, all catalog queries, noop sink",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
