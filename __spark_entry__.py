"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query on /root/testdata/sf0.001
queries()       -> {name: (spark, sf_dir) -> DataFrame} per SURVEY §2 op
oracle_sql()    -> {name: DuckDB-runnable ANSI SQL twin}

Implementations live in maggma_spark.plans.catalog; each goes through the
engine's public APIs (SparkStore / criteria compiler / compound stores /
builders / llm-ops), not raw DataFrame code, so the correctness gate
exercises the engine itself.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the full corpus-preparation stack (boilerplate
    removal -> PII redaction -> quality floor -> exact dedup ->
    context-window chunking) — five engine operators in one declarative
    plan, each independently oracle-checked."""
    from maggma_spark.plans.catalog import QUERIES

    return QUERIES["corpus_pipeline_full_stack"](spark, "/root/testdata/sf0.001")


# Round each query's oracle row was LAST hash-matched by the driver's
# correctness gate (CORRECTNESS_r{N}.json). The gate checks a bounded
# (~50) prefix of the dict, so ordering is least-recently-checked
# FIRST: never-checked queries lead, then the stalest green rows — every
# catalog entry gets re-validated every ~2 rounds instead of the same
# prefix pinning forever. Derived automatically from the round-stamped
# CORRECTNESS_r*.json files the driver writes; the static dict below is
# the fallback when none are readable.
def _last_checked_from_files() -> dict[str, int]:
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, was_green)
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, rec in data.items():
                ok = (isinstance(rec, dict)
                      and not rec.get("err")
                      and all(rec.get(k, True) for k in
                              ("rows_match", "schema_match", "hash_match")))
                if name not in latest or rnd > latest[name][0]:
                    latest[name] = (rnd, ok)
    # Failure-first: a query whose LATEST record is red (or errored) is
    # stamped round 0, so after a fix it leads the rotation and
    # re-validates the very next round instead of sorting last as
    # "recently checked".
    return {name: (rnd if ok else 0) for name, (rnd, ok) in latest.items()}


_LAST_CHECKED_ROUND_STATIC = {
    # re-checked in round 3 (also green r1)
    "filter_eq_project": 3, "filter_in_range": 3, "filter_bool_ops": 3,
    "filter_regex_nin": 3, "filter_exists": 3, "filter_expr_arith": 3,
    "sort_skip_topk": 3,
    # last checked rounds 1-2
    "distinct_criteria": 2, "count_with_criteria": 2,
    "agg_customer_by_nation": 2, "store_groupby_docs": 2,
    "q1_pricing_summary": 2, "joint_orders_customer": 2,
    "projection_builder_merge": 2, "concat_union_groupby": 2,
    "star_join_revenue": 2, "upsert_merge": 2, "remove_docs_filter": 2,
    "newer_in_exhaustive": 2, "delete_orphans_semi": 2,
    "latest_order_per_customer": 2, "copy_builder_incremental": 2,
    "tumbling_window_hourly": 2, "sliding_window_counts": 2,
    "session_window_per_user": 2, "text_quality_stats": 2,
    "langid_predict": 2, "doc_fingerprint": 2, "exact_dedup_docs": 2,
    "embedding_topk_bruteforce": 2, "embedding_neardup_exact": 2,
    "minhash_lsh_neardup": 2, "simhash_neardup": 2,
    "embedding_lsh_topk": 2, "nested_json_field": 2,
    "map_builder_transform": 2, "group_builder_agg": 2,
    "distinct_array_unravel": 2, "aliasing_store_view": 2,
    "sandbox_store_rls": 2, "query_one_top1": 2,
    "last_updated_watermark": 2, "concat_distinct": 2,
    "rollup_revenue": 2, "approx_vs_exact_distinct": 2,
    "embedding_ivf_topk": 2, "corpus_cleanup_pipeline": 2,
    "percentile_prices": 2, "repetition_stats": 2,
    "embedding_knn_multi": 2,
    # first checked in round 3
    "asof_join_events_orders": 3, "text_search_ranked": 3,
    "facet_counts": 3, "range_join_event_pairs": 3,
    "ngram_jaccard_block": 3,
    "minhash_planted_recall": 3, "simhash_planted_recall": 3,
    "text_criteria_search": 3, "newer_in_isoformat": 3,
    "newer_in_fast_watermark": 3, "groupby_partial_missing": 3,
    "criteria_mod_all_size": 3, "elem_match_range": 3,
    "arrayelemat_first_last": 3, "keyset_paginate_page": 3,
    "max_lu_greatest": 3, "rest_dynamic_params": 3,
    "json_store_query": 3, "stream_dedup_watermark": 3,
    "file_store_scan": 3, "open_data_query_expr": 3,
    "blob_store_metadata_query": 3, "salted_agg_revenue": 3,
    "validator_quarantine": 3, "topk_orders_per_customer": 3,
    "cube_status_priority": 3, "pivot_status_by_priority": 3,
    "jsonschema_criteria": 3, "rest_page_sorted": 3,
    "iso_ceil_ms_format": 3, "multimodal_feature_extract": 3,
    "hypertable_rollup_merge": 3, "deterministic_sample_docs": 3,
    "pack_sequences_bins": 3, "benchmark_decontaminate": 3,
    "snapshot_diff_cdc": 3, "obj_hash_digest": 3,
    "rest_submission_latest_state": 3, "bucketed_join_orders_customer": 3,
    "map_builder_retry_failed": 3, "rest_meta_total": 3,
    "stratified_sample_mix": 3,
}


_LAST_CHECKED_ROUND = _last_checked_from_files() or _LAST_CHECKED_ROUND_STATIC


def _ordered(names):
    names = list(names)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (_LAST_CHECKED_ROUND.get(n, 0), pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from maggma_spark.plans.catalog import QUERIES

    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    from maggma_spark.plans.catalog import ORACLES

    return {n: ORACLES[n] for n in _ordered(ORACLES)}
