"""Round-6 scale probe: the distributed global-order window scaffold
at 10M rows on local[32] — the measured evidence behind SCALE.md's
claim that unpartitioned $fill / $setWindowFields / token-budget now
survive data-scale inputs (the pre-round-6 compile was a single-task
global sort; at 10M rows it was the whole frame through one core).

Probes:
  - unpartitioned $fill locf + linear over a 10M-row series with ~3%
    known values (invariants: zero nulls after the first known for
    locf; collinear-series exactness for linear);
  - unpartitioned $setWindowFields documentNumber + running $sum
    (invariants: dn is a permutation 1..n; final running sum equals
    the global sum);
  - select_token_budget at 10M docs (invariant: greedy boundary);
all on the deterministic-range ids (two jobs per op must agree — the
probe itself would produce wrong invariants if they did not).

Run: python scripts/scale_probe_global_windows.py [n_rows]
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

    spark = get_spark("scale-probe-r6")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"rows": n}

    base = (spark.range(n)
            .select(F.col("id").alias("k"),
                    F.when(F.col("id") % 37 == 0,
                           F.col("id").cast("double")).alias("v")))

    def fill_locf():
        out = compile_pipeline(base, [{"$fill": {
            "sortBy": {"k": 1}, "output": {"v": {"method": "locf"}}}}])
        row = out.agg(
            F.sum(F.col("v").isNull().cast("long")).alias("nulls"),
            F.max("v").alias("mx")).first()
        assert row["nulls"] == 0, row  # k=0 is known; carry covers all
        assert row["mx"] == float((n - 1) // 37 * 37)
        return row

    timed("fill_locf_global", fill_locf, timings)

    def fill_linear():
        out = compile_pipeline(base, [{"$fill": {
            "sortBy": {"k": 1}, "output": {"v": {"method": "linear"}}}}])
        # the knowns are collinear (v = k), so interpolation must
        # reproduce k exactly between first and last known
        bad = out.filter(
            (F.col("k") <= (n - 1) // 37 * 37)
            & (F.abs(F.col("v") - F.col("k")) > 1e-9)).count()
        assert bad == 0, bad
        return bad

    timed("fill_linear_global", fill_linear, timings)

    def swf_global():
        out = compile_pipeline(base, [{"$setWindowFields": {
            "sortBy": {"k": 1},
            "output": {
                "dn": {"$documentNumber": {}},
                "run": {"$sum": "$v",
                        "window": {"documents":
                                   ["unbounded", "current"]}}}}}])
        row = out.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("dn").alias("mn"), F.max("dn").alias("mx"),
            F.countDistinct("dn").alias("dnd"),
            F.max("run").alias("maxrun")).first()
        assert (row["mn"], row["mx"], row["dnd"]) == (1, n, n), row
        total = base.agg(F.sum("v")).first()[0]
        assert abs(row["maxrun"] - total) < 1e-3, (row["maxrun"], total)
        return row

    timed("swf_documentnumber_runsum_global", swf_global, timings)

    def token_budget():
        from maggma_spark.operators.corpus import select_token_budget

        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.hash(F.col("id").cast("string")) % 100000)
            .cast("double").alias("score"),
            (F.col("id") % 7 + 10).alias("n_tok"))
        budget = n  # ~ n/13 docs
        kept = select_token_budget(docs, budget, "score", "n_tok")
        row = kept.agg(F.count(F.lit(1)).alias("cnt"),
                       F.max("cum_tokens").alias("mx"),
                       F.min("score").alias("floor")).first()
        assert row["mx"] <= budget
        # greedy: every kept doc's score >= the floor of kept scores,
        # and the budget is nearly exhausted (within one max doc)
        assert budget - row["mx"] <= 16, row
        return row

    timed("select_token_budget", token_budget, timings)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
