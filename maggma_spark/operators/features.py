"""Per-entity feature engineering over event logs — trailing
time-window aggregates and lag/delta features.

Beyond-reference capability: the feature-extraction pass a training
pipeline runs over behavioral/event data (reference analog: none — the
reference's groupby can only bucket whole documents). Every operator
here is a partitioned window over (key, time): one shuffle on the key,
no global sort, no driver state — the same plan at sf0.01 and 100 TB,
bounded by per-key history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_window_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    windows: dict[str, int],
) -> DataFrame:
    """Trailing time-range aggregates per key: for each row, the count
    and sum of `value_col` over the last N seconds of that key's
    history INCLUDING the row ("how active was this user in the hour
    before this event").

    `windows` maps a suffix to a trailing span in seconds, e.g.
    {"1h": 3600, "1d": 86400} adds n_1h/sum_1h/n_1d/sum_1d.

    Time is compared at microsecond precision (`unix_micros`), so rows
    inside the same second still order correctly. RANGE frames (not
    ROWS): simultaneous events are all included regardless of
    tie-order, which keeps results layout-independent.
    """
    if not windows:
        raise ValueError("windows must be non-empty")
    # NTZ-safe: cast to TIMESTAMP first (identity under a UTC
    # session, which the engine pins everywhere)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out = df
    for name, secs in windows.items():
        if secs <= 0:
            raise ValueError(f"window {name!r} must be positive")
        w = (Window.partitionBy(key_col).orderBy(us)
             .rangeBetween(-secs * 1_000_000, 0))
        out = (out.withColumn(f"n_{name}", F.count(value_col).over(w))
               .withColumn(f"sum_{name}",
                           F.round(F.sum(value_col).over(w), 2)))
    return out


def lag_delta_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Previous-event features per key: the prior value, the delta to
    it, and the gap in seconds since the prior event (NULL on each
    key's first row). `order_cols` breaks timestamp ties
    deterministically (defaults to the timestamp alone).

    One partitioned window; lag() is rank-based so the frame never
    buffers more than one prior row per partition slot.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    return (
        df.withColumn("prev_value", prev_v)
        .withColumn("delta_value", F.round(F.col(value_col) - prev_v, 2))
        .withColumn(
            "gap_seconds",
            ((F.unix_micros(F.col(ts_col).cast("timestamp"))
              - F.unix_micros(prev_t.cast("timestamp")))
             / F.lit(1_000_000.0)))
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip a numeric column to its [p_lo, p_hi] exact interpolated
    quantiles, optionally PER GROUP — the standard outlier guard before
    normalizing features or quality scores (a global clip would let one
    heavy-tailed group dominate).

    Plan shape: one aggregate computes the two thresholds per group
    (exact `percentile`; swap in approx_percentile for a mergeable
    single-pass sketch at extreme scale), broadcast-joined back; the
    clip is a pure projection. NULLs pass through unclipped.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    out_col = out_col or f"{value_col}_wins"
    gcols = [group_col] if group_col else []
    th = df.groupBy(*gcols).agg(
        F.percentile(value_col, F.lit(p_lo)).alias("__lo"),
        F.percentile(value_col, F.lit(p_hi)).alias("__hi"))
    joined = (df.join(F.broadcast(th), on=gcols) if gcols
              else df.crossJoin(F.broadcast(th)))
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")),
                      F.col("__hi"))
    # least/greatest SKIP nulls (they'd clip a NULL to the threshold);
    # make the pass-through explicit
    out = F.when(F.col(value_col).isNull(), F.lit(None)).otherwise(clipped)
    return joined.withColumn(out_col, out).drop("__lo", "__hi")


def zscore_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Rolling anomaly detection: flag a value whose z-score against
    its key's trailing window (EXCLUDING the current row — an outlier
    must not mask itself) exceeds `threshold`. Windows with fewer than
    `min_points` prior points or zero variance never flag.

    Variance is derived from explicit windowed sum/sumsq algebra
    ((ss - s²/n)/(n-1)) rather than an opaque stddev aggregate, so any
    SQL engine replays the identical float operations — same policy as
    ab_test_stats. One time-RANGE window per key, single shuffle.
    """
    if window_seconds <= 0 or min_points < 2:
        raise ValueError("window_seconds > 0 and min_points >= 2 required")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(key_col).orderBy(us)
         .rangeBetween(-window_seconds * 1_000_000, -1))
    n = F.count(value_col).over(w)
    s = F.sum(value_col).over(w)
    ss = F.sum(F.col(value_col) * F.col(value_col)).over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    z = (F.col(value_col) - mean) / F.sqrt(var)
    return (
        df.withColumn("n_window", n)
        .withColumn("z", F.when((n >= min_points) & (var > 0),
                                F.round(z, 6)))
        .withColumn("is_anomaly",
                    F.coalesce(F.abs(F.col("z")) > threshold,
                               F.lit(False)))
    )
