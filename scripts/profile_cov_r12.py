"""Round-12 profile harness for the covariance row's INTRINSIC cost
(r11 verdict next #1): the judge's isolated A/B measures
swf_global_covariance_running at ~7.7 s regardless of the round-11
in-context wins, vs the <=3 s target open since r8. This script runs
the row ISOLATED (fresh session, min-of-N) and splits the time into
the two phases the bench conflates:

  compile  — driver-side plan build INCLUDING the <=2 pinned driver
             actions (the fused boundary aggregate and the
             range-boundary percentile sketch);
  execute  — the noop-sink materialization (scan + scaffold shuffle +
             cogroup kernel + join-back).

Usage: python scripts/profile_cov_r12.py [N_REPS] [row ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = sys.argv[2:] or ["swf_global_covariance_running"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    from maggma_spark.plans.catalog import QUERIES
    from maggma_spark.session import get_spark

    spark = get_spark("maggma_spark-prof")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    for row in rows:
        fn = QUERIES[row]
        best = None
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            trip = (t1 - t0, t2 - t1, t2 - t0)
            print(f"{row} rep{i}: compile={trip[0]:.2f}s "
                  f"execute={trip[1]:.2f}s total={trip[2]:.2f}s",
                  flush=True)
            if best is None or trip[2] < best[2]:
                best = trip
        print(f"{row} BEST: compile={best[0]:.2f}s "
              f"execute={best[1]:.2f}s total={best[2]:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
