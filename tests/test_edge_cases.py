"""Degenerate-input robustness: empty frames and null timestamps must
flow through the analytics/profile/CDC operators without crashing and
with sensible (empty or null-propagating) results."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double, "
            "event_type string")


def test_empty_inputs_flow_through(spark):
    from maggma_spark.operators.analytics import (
        cohort_retention, cooccurrence, event_transitions, funnel_steps,
        sessionize)
    from maggma_spark.operators.features import (
        lag_delta_features, rolling_window_features)
    from maggma_spark.operators.merge import (
        scd2_history, snapshot_delta, table_checksums)
    from maggma_spark.operators.profile import histogram, profile_table

    ev = _empty_events(spark)
    assert funnel_steps(ev, "user_id", "ts", "event_type",
                        ["view", "click"]).count() == 0
    assert sessionize(ev, "user_id", "ts").count() == 0
    assert cohort_retention(ev, "user_id", "ts").count() == 0
    assert event_transitions(ev, "user_id", "ts", "event_type").count() == 0
    assert cooccurrence(ev, "user_id", "event_type").count() == 0
    assert rolling_window_features(ev, "user_id", "ts", "value",
                                   {"1h": 3600}).count() == 0
    assert lag_delta_features(ev, "user_id", "ts", "value").count() == 0
    assert scd2_history(ev, "user_id", "ts").count() == 0
    assert histogram(ev, "value", 0.0, 1.0).count() == 0
    assert table_checksums(ev, "event_id").count() == 0
    prof = profile_table(ev, ["value"]).collect()
    assert prof[0]["n_rows"] == 0 and prof[0]["n_distinct"] == 0
    # empty-vs-empty CDC: no changes
    assert snapshot_delta(ev, ev, "event_id").count() == 0


def test_empty_graph_kernels(spark):
    from maggma_spark.operators.graph import (
        connected_components, k_core, pagerank, triangle_count)

    edges = spark.createDataFrame([], "key_a long, key_b long")
    assert connected_components(edges).count() == 0
    assert triangle_count(edges).collect()[0]["n_triangles"] == 0
    assert k_core(edges, 2).count() == 0
    assert pagerank(edges).count() == 0


def test_null_timestamps_dont_crash_session_or_funnel(spark):
    from maggma_spark.operators.analytics import funnel_steps, sessionize

    rows = [
        Row(event_id=1, user_id=1, ts=dt.datetime(2024, 1, 1),
            value=1.0, event_type="view"),
        Row(event_id=2, user_id=1, ts=None, value=2.0, event_type="buy"),
    ]
    df = spark.createDataFrame(rows)
    s = sessionize(df, "user_id", "ts").collect()
    assert len(s) == 2                       # no rows silently dropped
    f = {r["user_id"]: r for r in funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "buy"]).collect()}
    # null-ts buy can't satisfy the strictly-after constraint
    assert f[1]["ts_view"] is not None and f[1]["ts_buy"] is None
