"""Feature-engineering windows and SCD2 history."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from maggma_spark.operators.features import (
    lag_delta_features,
    rolling_window_features,
)
from maggma_spark.operators.merge import scd2_history


def _ev(i, user, minute, value):
    return Row(event_id=i, user_id=user,
               ts=(dt.datetime(2024, 1, 1)
                   + dt.timedelta(minutes=minute)), value=value)


def test_rolling_window_trailing_range(spark):
    df = spark.createDataFrame([
        _ev(0, 1, 0, 10.0), _ev(1, 1, 30, 20.0), _ev(2, 1, 90, 5.0),
        _ev(3, 2, 0, 1.0),
    ])
    out = {r["event_id"]: r for r in rolling_window_features(
        df, "user_id", "ts", "value", {"1h": 3600}).collect()}
    assert out[0]["n_1h"] == 1 and out[0]["sum_1h"] == 10.0
    # minute 30: includes minute 0 (trailing, inclusive)
    assert out[1]["n_1h"] == 2 and out[1]["sum_1h"] == 30.0
    # minute 90: minute-30 row is exactly 3600s back -> included;
    # minute-0 row is out of range
    assert out[2]["n_1h"] == 2 and out[2]["sum_1h"] == 25.0
    # other user unaffected
    assert out[3]["n_1h"] == 1
    with pytest.raises(ValueError):
        rolling_window_features(df, "user_id", "ts", "value", {})


def test_lag_delta_first_row_null(spark):
    df = spark.createDataFrame([
        _ev(0, 1, 0, 10.0), _ev(1, 1, 2, 25.0),
    ])
    out = {r["event_id"]: r for r in lag_delta_features(
        df, "user_id", "ts", "value", order_cols=["event_id"]).collect()}
    assert out[0]["prev_value"] is None and out[0]["gap_seconds"] is None
    assert out[1]["prev_value"] == 10.0
    assert out[1]["delta_value"] == 15.0
    assert out[1]["gap_seconds"] == 120.0


def test_scd2_history_intervals(spark):
    df = spark.createDataFrame([
        _ev(0, 1, 0, 1.0), _ev(1, 1, 10, 2.0), _ev(2, 1, 20, 3.0),
    ])
    out = sorted(scd2_history(df, "user_id", "ts",
                              order_cols=["event_id"]).collect(),
                 key=lambda r: r["version"])
    assert [r["version"] for r in out] == [1, 2, 3]
    # intervals chain: valid_to of v equals valid_from of v+1
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert not out[0]["is_current"] and not out[1]["is_current"]


def test_winsorize_clips_per_group(spark):
    from maggma_spark.operators.features import winsorize

    rows = ([Row(g="a", v=float(i)) for i in range(1, 100)]
            + [Row(g="a", v=10_000.0)]          # outlier in a
            + [Row(g="b", v=float(i)) for i in range(1, 11)]
            + [Row(g="b", v=None)])
    df = spark.createDataFrame(rows)
    out = winsorize(df, "v", "g", p_lo=0.0, p_hi=0.9)
    a_max = out.filter("g = 'a'").agg({"v_wins": "max"}).collect()[0][0]
    assert a_max < 10_000.0                     # outlier clipped
    b_vals = {r["v"]: r["v_wins"] for r in
              out.filter("g = 'b'").collect()}
    assert b_vals[1.0] == 1.0                   # p_lo=0 leaves min alone
    assert b_vals[None] is None                 # nulls pass through
    # group b's p90 threshold unaffected by a's outlier
    assert max(v for v in b_vals.values() if v is not None) <= 10.0
    with pytest.raises(ValueError):
        winsorize(df, "v", "g", p_lo=0.5, p_hi=0.5)


def test_zscore_flags_detect_planted_outlier(spark):
    from maggma_spark.operators.features import zscore_flags

    rows = [_ev(i, 1, i, 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append(_ev(99, 1, 20, 500.0))            # planted outlier
    rows += [_ev(200 + i, 2, i, 5.0) for i in range(10)]  # zero variance
    df = spark.createDataFrame(rows)
    out = {r["event_id"]: r for r in zscore_flags(
        df, "user_id", "ts", "value",
        window_seconds=3600, threshold=3.0).collect()}
    assert out[99]["is_anomaly"]
    # normal points never flag; early points (< min_points) never flag
    assert not any(r["is_anomaly"] for k, r in out.items() if k != 99)
    # zero-variance windows produce NULL z, not inf
    assert all(out[200 + i]["z"] is None for i in range(10))
    import pytest as _pt

    with _pt.raises(ValueError):
        zscore_flags(df, "user_id", "ts", "value", min_points=1)
