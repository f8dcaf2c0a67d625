"""Funnel and cohort-retention analytics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from maggma_spark.operators.analytics import cohort_retention, funnel_steps


def _e(u, minute, etype):
    return Row(u=u, ts=(dt.datetime(2024, 1, 1)
                        + dt.timedelta(minutes=minute)), e=etype)


def test_funnel_strict_sequence_with_stray_later_step(spark):
    df = spark.createDataFrame([
        # u1: buy BEFORE view must not count; second buy converts
        _e(1, 5, "buy"), _e(1, 10, "view"), _e(1, 20, "buy"),
        # u2: view only
        _e(2, 0, "view"),
        # u3: buy only — never converts step 1
        _e(3, 1, "buy"),
        # u4: same-minute view+buy: strict > means no conversion
        _e(4, 7, "view"), _e(4, 7, "buy"),
    ])
    out = {r["u"]: r for r in funnel_steps(
        df, "u", "ts", "e", ["view", "buy"]).collect()}
    assert out[1]["steps_completed"] == 2
    assert out[1]["ts_buy"].minute == 20
    assert out[2]["steps_completed"] == 1 and out[2]["ts_buy"] is None
    assert out[3]["steps_completed"] == 0 and out[3]["ts_view"] is None
    assert out[4]["steps_completed"] == 1
    with pytest.raises(ValueError):
        funnel_steps(df, "u", "ts", "e", [])


def test_cohort_retention_offsets(spark):
    def at(u, day):
        return Row(u=u, ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=day))

    # 2024-01-01 is a Monday: week buckets are day 0-6, 7-13, 14-20
    df = spark.createDataFrame([
        at(1, 0), at(1, 8), at(1, 15),   # active weeks 0,1,2
        at(2, 1), at(2, 16),             # active weeks 0,2
        at(3, 9),                        # cohort week 1
    ])
    out = {(r["cohort"].day, r["period_offset"]): r["n_active"]
           for r in cohort_retention(df, "u", "ts", "week").collect()}
    assert out[(1, 0)] == 2     # users 1,2 in the Jan-1 cohort
    assert out[(1, 1)] == 1     # only user 1 back in week 1
    assert out[(1, 2)] == 2     # users 1,2 back in week 2
    assert out[(8, 0)] == 1     # user 3's own cohort
    with pytest.raises(ValueError):
        cohort_retention(df, "u", "ts", "quarter")


def test_sessionize_gap_islands(spark):
    from maggma_spark.operators.analytics import sessionize

    df = spark.createDataFrame([
        _e(1, 0, "a"), _e(1, 10, "a"),        # session 1 (10 min gap)
        _e(1, 60, "a"),                        # 50 min gap -> session 2
        _e(2, 0, "a"),                         # own key, session 1
    ])
    base = dt.datetime(2024, 1, 1)

    def mins(ts):
        return int((ts - base).total_seconds() // 60)

    out = {(r["u"], mins(r["ts"])): r["session_seq"]
           for r in sessionize(df, "u", "ts", gap_seconds=1800).collect()}
    assert out[(1, 0)] == 1 and out[(1, 10)] == 1
    assert out[(1, 60)] == 2
    assert out[(2, 0)] == 1
    with pytest.raises(ValueError):
        sessionize(df, "u", "ts", gap_seconds=0)


def test_event_transitions_shares(spark):
    from maggma_spark.operators.analytics import event_transitions

    df = spark.createDataFrame([
        _e(1, 0, "a"), _e(1, 1, "b"), _e(1, 2, "a"), _e(1, 3, "b"),
        _e(2, 0, "a"), _e(2, 1, "c"),
    ])
    out = {(r["from_event"], r["to_event"]): (r["n"], r["share"])
           for r in event_transitions(df, "u", "ts", "e").collect()}
    assert out[("a", "b")] == (2, 0.666667)
    assert out[("a", "c")][0] == 1
    assert out[("b", "a")] == (1, 1.0)
    # transitions never cross keys: no (c, anything) from u2's tail
    assert not any(k[0] == "c" for k in out)


def test_cooccurrence_lift(spark):
    from maggma_spark.operators.analytics import cooccurrence

    df = spark.createDataFrame([
        Row(g=1, i="x"), Row(g=1, i="y"), Row(g=1, i="x"),  # dup row ok
        Row(g=2, i="x"), Row(g=2, i="y"),
        Row(g=3, i="x"), Row(g=4, i="z"),
    ])
    out = {(r["item_a"], r["item_b"]): r for r in
           cooccurrence(df, "g", "i").collect()}
    xy = out[("x", "y")]
    assert xy["n_both"] == 2 and xy["n_a"] == 3 and xy["n_b"] == 2
    # lift = N * n_ab / (n_a * n_b) = 4*2/(3*2)
    assert xy["lift"] == pytest.approx(4 * 2 / 6, abs=1e-6)
    assert ("x", "z") not in out      # never co-occur


def test_ab_test_stats_and_welch(spark):
    from maggma_spark.operators.analytics import ab_test_stats, welch_t

    df = spark.createDataFrame(
        [Row(v="a", x=float(i)) for i in [1, 2, 3, 4]]
        + [Row(v="b", x=float(i)) for i in [10, 12, 14]])
    stats = ab_test_stats(df, "v", "x")
    got = {r["v"]: r for r in stats.collect()}
    assert got["a"]["n"] == 4 and got["a"]["mean"] == 2.5
    assert got["a"]["var"] == pytest.approx(5 / 3, abs=1e-9)
    assert got["b"]["var"] == pytest.approx(4.0, abs=1e-9)
    t = welch_t(stats.orderBy("v"), "v")
    import math

    assert t == pytest.approx((2.5 - 12.0) / math.sqrt(5 / 3 / 4 + 4 / 3),
                              abs=1e-9)
    with pytest.raises(ValueError):
        welch_t(stats.limit(1), "v")


def test_funnel_differential_random(spark):
    """funnel_steps vs a brute-force greedy reference on seeded random
    event streams."""
    import random

    from maggma_spark.operators.analytics import funnel_steps

    rng = random.Random(42)
    steps = ["s0", "s1", "s2"]
    rows = [Row(u=rng.randrange(15),
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(
                    seconds=rng.randrange(100000)),
                e=rng.choice(steps + ["noise"]))
            for _ in range(600)]
    # dedupe exact (u, ts) collisions so the greedy reference's
    # strict-> ordering is unambiguous
    seen, uniq = set(), []
    for r in rows:
        if (r.u, r.ts) not in seen:
            seen.add((r.u, r.ts))
            uniq.append(r)
    df = spark.createDataFrame(uniq)

    def ref(events):
        by_u = {}
        for r in sorted(events, key=lambda r: (r.u, r.ts)):
            by_u.setdefault(r.u, []).append(r)
        out = {}
        for u, evs in by_u.items():
            times = []
            prev = None
            for i, s in enumerate(steps):
                if i > 0 and prev is None:
                    times.append(None)          # earlier step unreached
                    continue
                cand = [r.ts for r in evs if r.e == s
                        and (i == 0 or r.ts > prev)]
                prev = min(cand) if cand else None
                times.append(prev)
            out[u] = times
        return out

    want = ref(uniq)
    got = {r["u"]: [r["ts_s0"], r["ts_s1"], r["ts_s2"]]
           for r in funnel_steps(df, "u", "ts", "e", steps).collect()}
    assert got == want


def test_sessionize_differential_random(spark):
    import random

    from maggma_spark.operators.analytics import sessionize

    rng = random.Random(7)
    rows = [Row(u=rng.randrange(8), k=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(
                    seconds=rng.randrange(50000)))
            for i in range(400)]
    df = spark.createDataFrame(rows)
    gap = 600
    got = {r["k"]: r["session_seq"] for r in sessionize(
        df, "u", "ts", gap_seconds=gap, order_cols=["k"]).collect()}

    by_u = {}
    for r in sorted(rows, key=lambda r: (r.u, r.ts, r.k)):
        by_u.setdefault(r.u, []).append(r)
    want = {}
    for u, evs in by_u.items():
        seq, prev = 0, None
        for r in evs:
            if prev is None or (r.ts - prev).total_seconds() > gap:
                seq += 1
            want[r.k] = seq
            prev = r.ts
    assert got == want


def test_association_rules_directional(spark):
    from maggma_spark.operators.analytics import association_rules

    df = spark.createDataFrame([
        Row(g=1, i="x"), Row(g=1, i="y"),
        Row(g=2, i="x"), Row(g=2, i="y"),
        Row(g=3, i="x"), Row(g=4, i="x"),
    ])
    out = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "g", "i").collect()}
    xy, yx = out[("x", "y")], out[("y", "x")]
    assert xy["confidence"] == 0.5        # 2 of 4 x-baskets have y
    assert yx["confidence"] == 1.0        # every y-basket has x
    assert xy["support"] == yx["support"] == 0.5
    assert xy["lift"] == yx["lift"] == 1.0
    # min_support prunes
    pruned = association_rules(df, "g", "i", min_support=0.6).count()
    assert pruned == 0


def test_cooccurrence_differential_random(spark):
    """cooccurrence vs brute-force set math on seeded random baskets."""
    import itertools
    import random

    from maggma_spark.operators.analytics import cooccurrence

    rng = random.Random(5)
    rows = [Row(g=rng.randrange(25), i=f"it{rng.randrange(8)}")
            for _ in range(400)]
    df = spark.createDataFrame(rows)
    got = {(r["item_a"], r["item_b"]): (r["n_both"], r["n_a"], r["n_b"])
           for r in cooccurrence(df, "g", "i").collect()}

    baskets = {}
    for r in rows:
        baskets.setdefault(r.g, set()).add(r.i)
    item_groups = {}
    for g, items in baskets.items():
        for i in items:
            item_groups.setdefault(i, set()).add(g)
    want = {}
    for a, b in itertools.combinations(sorted(item_groups), 2):
        both = len(item_groups[a] & item_groups[b])
        if both:
            want[(a, b)] = (both, len(item_groups[a]),
                            len(item_groups[b]))
    assert got == want


def test_event_transitions_differential_random(spark):
    import random

    from maggma_spark.operators.analytics import event_transitions

    rng = random.Random(9)
    rows = [Row(u=rng.randrange(10), k=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                e=f"e{rng.randrange(5)}")
            for i in range(300)]
    df = spark.createDataFrame(rows)
    got = {(r["from_event"], r["to_event"]): r["n"] for r in
           event_transitions(df, "u", "ts", "e",
                             order_cols=["k"]).collect()}
    want = {}
    by_u = {}
    for r in sorted(rows, key=lambda r: (r.u, r.ts, r.k)):
        by_u.setdefault(r.u, []).append(r.e)
    for seq in by_u.values():
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
