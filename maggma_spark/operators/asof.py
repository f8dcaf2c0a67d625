"""As-of (backward temporal) join — each left row picks the most recent
right row at-or-before its timestamp, per key.

Beyond-reference capability: the reference has no temporal joins
(SURVEY §2.3 'not present' list); training-data and telemetry pipelines
need them constantly (attach the latest model version / config / price
in effect at event time).

Scale-first formulation (the merge-sorted union trick — ONE shuffle, no
range-condition join blowup):

    1. tag right rows with their payload packed in a struct; left rows
       with a null payload;
    2. union both sides; window over (key) ordered by (ts, side) with
       `last(payload, ignorenulls=True)` up to the current row —
       each left row inherits the latest right payload at-or-before it;
    3. keep left rows, unpack the struct.

Compare: the naive `left.join(right, key AND r.ts <= l.ts)` +
row_number materializes every (left, earlier-right) pair — O(n·m) per
key — before discarding all but one. The union-window form shuffles
each row once. Ties (equal ts): the right row sorts BEFORE the left row
with the same timestamp, so an exact-timestamp match is visible to it
(inclusive as-of, matching DuckDB's `l.ts >= r.ts`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[str] = None,
) -> DataFrame:
    """Left as-of join: most recent right row with right_ts <= left_ts.

    tolerance: optional INTERVAL string (e.g. '30 days'); matches older
    than left_ts - tolerance are dropped (pandas merge_asof semantics).
    Output: all left columns + the requested right columns (null when no
    match).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias(_SIDE),  # right sorts before left on ts ties
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # align schemas: right side carries only keys + window columns
    l_aligned = l
    r_aligned = r
    for c in left.columns:
        if c not in r.columns:
            r_aligned = r_aligned.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_aligned.unionByName(r_aligned.select(*l_aligned.columns))

    w = (
        Window.partitionBy(*keys)
        # right rows (side 0) sort before left rows at equal ts; among
        # equal-ts right rows the greatest payload struct wins (ties are
        # deterministic)
        .orderBy(F.col("__evt_ts").asc(), F.col(_SIDE).asc(),
                 F.col(_PAYLOAD).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    pay = F.col(_PAYLOAD)
    if tolerance is not None:
        in_range = pay["__ts"] >= F.col("__evt_ts") - F.expr(f"INTERVAL {tolerance}")
        pay = F.when(in_range, pay)
        matched = matched.withColumn(_PAYLOAD, pay)

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(_PAYLOAD)[c].alias(c) for c in right_cols]
    return matched.select(*out_cols)
