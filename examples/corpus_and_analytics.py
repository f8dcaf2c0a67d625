"""Runnable end-to-end demo over the bundled test tables: corpus
preparation (clean -> dedup -> budget-select -> split) and event
analytics (sessions -> funnel -> retention) in one session.

    python examples/corpus_and_analytics.py [sf_dir]

Every operator used here has a DuckDB oracle row in the correctness
catalog (plans/catalog.py) — this script just strings them together
the way a pipeline would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maggma_spark.functions.text import gopher_quality_flags, token_count  # noqa: E402
from maggma_spark.operators.analytics import (  # noqa: E402
    cohort_retention,
    funnel_steps,
    sessionize,
)
from maggma_spark.operators.corpus import (  # noqa: E402
    assign_splits,
    remove_boilerplate_lines,
    select_token_budget,
)
from maggma_spark.operators.dedup import exact_dedup  # noqa: E402
from maggma_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example")
    spark.sparkContext.setLogLevel("ERROR")

    # --- corpus preparation -------------------------------------------
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cleaned = remove_boilerplate_lines(docs, key_col="doc_id") \
        .withColumnRenamed("key", "doc_id")
    quality = gopher_quality_flags(cleaned).filter("gopher_pass") \
        .select("doc_id")
    kept = cleaned.join(quality, on="doc_id", how="left_semi")
    deduped = exact_dedup(kept, "text", "doc_id")
    budgeted = select_token_budget(
        deduped.withColumn("toks", token_count("text")),
        budget_tokens=20_000, score_col="toks", token_col="toks",
        key_col="doc_id")
    final = assign_splits(budgeted, "doc_id",
                          {"train": 0.98, "val": 0.01, "test": 0.01})
    print("corpus:", docs.count(), "->", final.count(), "docs;",
          "splits:", {r["split"]: r["count"] for r in
                      final.groupBy("split").count().collect()})

    # --- event analytics ----------------------------------------------
    events = spark.read.parquet(f"{sf}/events.parquet")
    sessions = sessionize(events, "user_id", "ts", gap_seconds=1800,
                          order_cols=["event_id"])
    n_sessions = sessions.select("session_id").distinct().count()
    funnel = funnel_steps(events, "user_id", "ts", "event_type",
                          ["view", "click", "purchase"])
    converted = funnel.filter("steps_completed = 3").count()
    users = funnel.count()
    retention = cohort_retention(events, "user_id", "ts", "week")
    print(f"events: {events.count()} rows, {n_sessions} sessions; "
          f"funnel view->click->purchase: {converted}/{users} users; "
          f"retention cells: {retention.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
