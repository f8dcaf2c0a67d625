"""Behavioral analytics over event logs — funnels and cohort retention.

Beyond-reference capability: the product-analytics queries an events
table answers at warehouse scale. Both operators are single-shuffle
plans: funnel steps fold into conditional aggregates inside ONE
groupBy(key); retention is one aggregate to find each key's cohort
plus one broadcast-friendly self-join keyed on the entity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the timestamp at which it
    reached each step, where step i counts only if it happens STRICTLY
    AFTER the key's step i-1 time ("view then click then buy" — a buy
    before the view doesn't convert). `ts_<step>` columns are NULL
    from the first unreached step on; `steps_completed` counts the
    prefix reached.

    Semantics are EXACT sequential-funnel: step i's time is the
    earliest step-i event strictly after step i-1's time, so an early
    stray occurrence of a later step doesn't block conversion (user
    buys at t=5 before viewing at t=10, then buys again at t=20 →
    converts at t=20).

    Plan shape: one groupBy(key) collecting each step's sorted
    timestamp array, then the sequential constraint folds JVM-side
    with array filter + array_min on the aggregate row. ONE shuffle
    total, independent of funnel length; per-key memory is that key's
    per-step event timestamps (bounded by per-key activity).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    aggs = [
        F.sort_array(F.collect_list(
            F.when(F.col(event_col) == s, F.col(ts_col))))
        .alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    g = df.groupBy(key_col).agg(*aggs)
    prev = None
    out_cols = [F.col(key_col)]
    step_cols = []
    for i, s in enumerate(steps):
        arr = F.col(f"__ts_{i}")
        if prev is None:
            cur = F.get(arr, 0)
        else:
            after = F.filter(arr, lambda x: x > prev)
            cur = F.when(prev.isNotNull(), F.get(after, 0))
        step_cols.append(cur)
        out_cols.append(cur.alias(f"ts_{s}"))
        prev = cur
    completed = None
    for i in range(len(steps)):
        c = F.when(step_cols[i].isNotNull(), F.lit(1)).otherwise(F.lit(0))
        completed = c if completed is None else completed + c
    # a NULL at step i forces NULL at every later step, so the sum IS
    # the contiguous prefix length
    out_cols.append(completed.cast("long").alias("steps_completed"))
    return g.select(*out_cols)


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention: assign each key to the cohort of its FIRST
    activity period, then count distinct keys active per (cohort,
    period_offset) — the classic retention triangle.

    Plan shape: one aggregate computes each key's cohort period; one
    distinct over (key, period) bounds the join input to active
    key-periods; the cohort frame joins back on the key (shuffle on
    key, the same partitioning the aggregate produced). Offsets are
    date arithmetic — no windows, no driver state.
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day/week/month")
    p = F.date_trunc(period, F.col(ts_col))
    active = df.select(F.col(key_col), p.alias("__period")).distinct()
    cohort = active.groupBy(key_col).agg(
        F.min("__period").alias("__cohort"))
    per_days = {"day": 1, "week": 7, "month": 30}
    joined = active.join(cohort, on=key_col)
    if period == "month":
        offset = (
            (F.year("__period") - F.year("__cohort")) * 12
            + (F.month("__period") - F.month("__cohort")))
    else:
        offset = (
            F.datediff(F.col("__period"), F.col("__cohort"))
            / per_days[period]).cast("long")
    return (
        joined.select(
            F.col("__cohort").alias("cohort"),
            offset.alias("period_offset"),
            F.col(key_col))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(key_col)).alias("n_active"))
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign a batch `session_id` per key with the gap rule: a new
    session starts when an event arrives more than `gap_seconds` after
    the key's previous event (the islands formulation of streaming's
    session_window, but materialized per EVENT so downstream funnels /
    aggregates can group on it).

    session_id is (key, session_seq) with session_seq the 1-based
    running count of session starts — deterministic given the
    (ts, order_cols) sort. Two windows over ONE partitioning by key:
    lag to detect starts, cumulative sum to number them. No extra
    shuffle for the second window (same partition spec).
    """
    from pyspark.sql import Window

    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_start = (prev_us.isNull()
                | ((us - prev_us) > gap_seconds * 1_000_000))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("session_seq",
                      F.sum(is_start.cast("long")).over(wrun))
        .withColumn("session_id",
                    F.concat_ws("#", F.col(key_col).cast("string"),
                                F.col("session_seq").cast("string")))
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order journey transition counts: for each key's
    time-ordered event sequence, count (from_event, to_event) adjacent
    pairs across the whole table, with `share` = fraction among
    transitions leaving `from_event` — the empirical Markov matrix of
    user journeys.

    One lag window per key (single shuffle), then a partial-agg
    groupBy on the (from, to) pair — cardinality is |event types|^2,
    so the final aggregate is tiny at any scale.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("__from", F.lag(event_col).over(w))
        .filter(F.col("__from").isNotNull())
        .select(F.col("__from").alias("from_event"),
                F.col(event_col).alias("to_event"))
    )
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count("*").alias("n"))
    wtot = Window.partitionBy("from_event")
    return counts.withColumn(
        "share", F.round(F.col("n") / F.sum("n").over(wtot), 6))


def cooccurrence(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """Market-basket co-occurrence: for every unordered item pair,
    count the groups (sessions, baskets, docs) containing BOTH, with
    per-item group counts and lift = N*n_ab / (n_a*n_b) — lift > 1
    means the pair co-occurs more than independence predicts.

    Plan shape: distinct (group, item) first — the join input is
    bounded by group_count x items_per_group, not raw events; the
    pair join is an equi-join on the group key; per-group fan-out is
    items_per_group², fine when item vocabularies are small per group
    (event types, tags). Final aggregate cardinality is |items|².
    """
    gi = df.select(F.col(group_col).alias("__g"),
                   F.col(item_col).alias("__i")).distinct()
    n_groups = gi.select("__g").distinct().count()
    item_counts = gi.groupBy("__i").agg(F.count("*").alias("__ni"))
    a = gi.select("__g", F.col("__i").alias("item_a"))
    b = gi.select("__g", F.col("__i").alias("item_b"))
    pairs = (a.join(b, on="__g")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count("*").alias("n_both")))
    ia = item_counts.select(F.col("__i").alias("item_a"),
                            F.col("__ni").alias("n_a"))
    ib = item_counts.select(F.col("__i").alias("item_b"),
                            F.col("__ni").alias("n_b"))
    return (pairs.join(F.broadcast(ia), on="item_a")
            .join(F.broadcast(ib), on="item_b")
            .select("item_a", "item_b", "n_both", "n_a", "n_b",
                    F.round(F.lit(float(n_groups)) * F.col("n_both")
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift")))


def ab_test_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-variant experiment statistics: n, mean, sample variance, and
    (for exactly two variants) Welch's t statistic attached to every
    row — the decision-ready readout of an A/B assignment produced by
    e.g. assign_splits.

    One aggregate computes sums/sumsq (algebraic, partial-agg
    friendly — variance derives as (sumsq - sum²/n)/(n-1) so the twin
    can replay the identical arithmetic, unlike opaque var_samp
    implementations); the Welch join is a 2-row cross."""
    agg = df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("__s"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("__ss"))
    stats = agg.select(
        group_col, "n",
        (F.col("__s") / F.col("n")).alias("mean"),
        F.when(F.col("n") > 1,
               (F.col("__ss") - F.col("__s") * F.col("__s") / F.col("n"))
               / (F.col("n") - 1)).alias("var"))
    return stats


def welch_t(stats: DataFrame, group_col: str) -> float:
    """Welch's t from a 2-row ab_test_stats frame (driver scalar —
    it's the experiment verdict, not data).

    The sign convention is first-variant-minus-second in `group_col`
    order (sorted before collect — a bare collect's row order is
    nondeterministic across runs). A variant with n < 2 has no sample
    variance and is rejected explicitly."""
    rows = stats.orderBy(group_col).collect()
    if len(rows) != 2:
        raise ValueError(f"need exactly 2 variants, got {len(rows)}")
    for r in rows:
        if r["var"] is None:
            raise ValueError(
                f"variant {r[group_col]!r} has n={r['n']} < 2: "
                "sample variance undefined, Welch's t needs >= 2 "
                "observations per variant")
    (n1, m1, v1), (n2, m2, v2) = [(r["n"], r["mean"], r["var"])
                                  for r in rows]
    import math

    return (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: float = 0.0,
) -> DataFrame:
    """Directional association rules from the co-occurrence counts:
    for each ordered pair (antecedent -> consequent):
    support = n_both/N, confidence = n_both/n_antecedent, and the
    symmetric lift. Both directions of every co-occurring pair are
    emitted; `min_support` prunes rare pairs BEFORE the projection.

    Same plan as `cooccurrence` plus a projection — the rule math is
    arithmetic over the pair aggregate, no further shuffles.
    """
    pairs = cooccurrence(df, group_col, item_col)
    n_groups = (df.select(F.col(group_col)).distinct().count())
    if min_support > 0.0:
        pairs = pairs.filter(
            F.col("n_both") / F.lit(float(n_groups)) >= min_support)
    fwd = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_both",
        F.round(F.col("n_both") / F.lit(float(n_groups)), 6)
        .alias("support"),
        F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence"),
        "lift")
    rev = pairs.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "n_both",
        F.round(F.col("n_both") / F.lit(float(n_groups)), 6)
        .alias("support"),
        F.round(F.col("n_both") / F.col("n_b"), 6).alias("confidence"),
        "lift")
    return fwd.unionByName(rev)
