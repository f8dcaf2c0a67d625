"""Capture .explain("formatted") for named catalog queries into
plans/r13/<query>_<tag>.txt (round-13 deliverable: the judge checks
plan claims against these files).

Usage: python scripts/capture_plans_r13.py <tag> [query ...]
       (no queries -> the default heavy set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HEAVY = [
    "swf_global_covariance_running",
    "swf_global_frames_suite",
    "swf_global_ema_deriv_integral",
    "stream_dedup_ingest_e2e",
    "fuzzy_entity_resolution",
    "window_pctl_approx_bound",
    "window_operators_wave",
    "window_median_percentile",
    "clustering_keys_orders",
    "mask_repeated_spans_rebuild",
    "embedding_pq_topk",
    "local_clustering_coefficients",
    "search_fuzzy_text",
    "media_perceptual_neardup",
    "pagerank_mass_conservation",
    "semantic_dedup_planted",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rows = sys.argv[2:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from maggma_spark.plans.catalog import QUERIES
    from maggma_spark.session import get_spark

    spark = get_spark("maggma_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    for row in rows:
        spark.sparkContext.setJobDescription(f"plan-capture: {row}")
        try:
            df = QUERIES[row](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # capture the failure, keep going
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{row}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
