"""Custom stateful streaming operators via applyInPandasWithState.

Beyond-reference capability (the reference has no streaming state at
all, SURVEY §2.9): arbitrary per-key state that survives across
micro-batches, checkpoint-backed — the building block for running
aggregates, cross-batch dedup, threshold alerting, and custom
sessionization that `groupBy().agg()` cannot express.

Scale notes: state lives in the executors' state store partitioned by
the grouping key (same shuffle as a streaming aggregate); a key's state
is O(its accumulator), not O(its events). Use GroupStateTimeout to
expire idle keys so state size tracks ACTIVE keys.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    alert_threshold: float | None = None,
) -> DataFrame:
    """Per-key running count/sum maintained across micro-batches; emits
    one row per key per batch with cumulative totals (and an alert flag
    the first time the cumulative sum crosses `alert_threshold`)."""

    out_schema = (f"{key_col} bigint, batch_rows bigint, total_rows bigint, "
                  "total_value double, alert boolean")
    state_schema = "total_rows bigint, total_value double, alerted boolean"

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        rows_before, value_before, alerted = (
            state.get if state.exists else (0, 0.0, False))
        batch_rows = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_rows += len(pdf)
            batch_value += float(pdf[value_col].sum())
        total_rows = rows_before + batch_rows
        total_value = value_before + batch_value
        alert = False
        if (alert_threshold is not None and not alerted
                and total_value >= alert_threshold):
            alert = True
            alerted = True
        state.update((total_rows, total_value, alerted))
        yield pd.DataFrame({
            key_col: [key[0]], "batch_rows": [batch_rows],
            "total_rows": [total_rows], "total_value": [total_value],
            "alert": [alert],
        })

    # "append" operator mode: emissions are final per batch (compatible
    # with append-only sinks like files); state still updates every batch
    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_content_dedup(
    stream: DataFrame,
    key_col: str,
    text_col: str,
    key_type: str = "bigint",
) -> DataFrame:
    """Cross-batch streaming content dedup with UNBOUNDED state: the
    first row EVER seen for a normalized-content digest survives
    (`keep=true`); every later arrival — same micro-batch or any later
    one — is flagged `keep=false`. This is the stateful counterpart of
    batch `exact_dedup` and strictly stronger than
    `dropDuplicatesWithinWatermark` (runner.py::stream_dedup), whose
    state expires with the watermark: here a duplicate arriving DAYS
    after the original is still caught.

    Plan shape: digest = md5(normalized text) computed JVM-side; the
    stream shuffles once on digest (same exchange a streaming aggregate
    would use); per-digest state is ONE boolean, so state size is
    O(distinct content), not O(rows). Within a batch the survivor is
    the minimum key, making emissions deterministic given a batch
    order; the per-digest invariant (exactly one keep=true across the
    whole stream) is batch-order independent.

    Emits (digest, key, keep) per input row.
    """
    from maggma_spark.functions.text import normalized_text

    out_schema = f"digest string, {key_col} {key_type}, keep boolean"
    state_schema = "seen boolean"

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        seen = state.exists
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(key_col, kind="mergesort")
        keep = [False] * len(pdf)
        if not seen and keep:
            keep[0] = True
        state.update((True,))
        yield pd.DataFrame({
            "digest": [key[0]] * len(pdf),
            key_col: pdf[key_col].tolist(),
            "keep": keep,
        })

    withd = stream.withColumn("digest", F.md5(normalized_text(text_col)))
    return withd.groupBy("digest").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
