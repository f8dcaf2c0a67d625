"""Table profiling — per-column statistics in one aggregate pass.

Beyond-reference capability: the data-quality snapshot a pipeline takes
before/after every big transform (null creep, cardinality collapse,
range drift). The reference has nothing comparable; its validators
check single documents (maggma's JSONSchema validator — see
plans/validate.py), while this profiles the whole table.

Plan shape: ONE aggregate over the table computes every column's
count/nulls/distinct/min/max simultaneously (Catalyst plans the
multi-distinct via a single expand + partial aggs — no per-column
passes, no driver loops); the wide 1-row result is then unpivoted to
one row per column with `stack`, which is a zero-shuffle projection on
a single row. `approx=True` swaps exact distinct counts for HLL
`approx_count_distinct`, removing the expand — the 100 TB default.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max cast to string so
    heterogeneous column types share one schema. Array/map/struct
    columns profile count/nulls/distinct but NULL min/max (no total
    order)."""
    cols = list(columns) if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    orderable = {
        c: not df.schema[c].dataType.typeName() in
        ("array", "map", "struct", "binary")
        for c in cols
    }
    # internal aliases are index-based and column names travel as
    # string LITERALS in the unpivot — never interpolated into SQL
    # text — so a column named "it's `odd`" can't break parsing
    def qcol(name: str):  # exact-name resolution, dots/backticks inert
        return F.col("`" + name.replace("`", "``") + "`")

    distinct = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(qcol(c)).alias(f"__cnt_{i}"))
        aggs.append(distinct(qcol(c)).cast("long").alias(f"__nd_{i}"))
        if orderable[c]:
            aggs.append(F.min(qcol(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(qcol(c)).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)

    null_str = F.lit(None).cast("string")
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            (F.col("__n") - F.col(f"__cnt_{i}")).alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            (F.col(f"__min_{i}") if orderable[c] else null_str)
            .alias("min_value"),
            (F.col(f"__max_{i}") if orderable[c] else null_str)
            .alias("max_value"))
        for i, c in enumerate(cols)]
    stacked = wide.select(F.col("__n").alias("n_rows"),
                          F.explode(F.array(*entries)).alias("__p"))
    return stacked.select("__p.column", "n_rows", "__p.n_nulls",
                          "__p.n_distinct", "__p.min_value",
                          "__p.max_value")


def profile_diff(
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Drift report between two profile_table outputs (same engine
    snapshot at two times, or pre/post a big transform): full outer
    join on column name with a `status` of added / removed / changed /
    unchanged, plus the null-rate delta — the signal that catches
    schema drift and null creep between pipeline runs.

    Inputs are profiler outputs (one row per column), so this is a
    tiny-frame join — driver-light, broadcast-size by construction.
    """
    o = old.select(
        F.col("column"),
        F.col("n_rows").alias("old_rows"),
        F.col("n_nulls").alias("old_nulls"),
        F.col("n_distinct").alias("old_distinct"))
    n = new.select(
        F.col("column"),
        F.col("n_rows").alias("new_rows"),
        F.col("n_nulls").alias("new_nulls"),
        F.col("n_distinct").alias("new_distinct"))
    j = o.join(n, on="column", how="full_outer")
    old_rate = F.col("old_nulls") / F.col("old_rows")
    new_rate = F.col("new_nulls") / F.col("new_rows")
    status = (
        F.when(F.col("old_rows").isNull(), F.lit("added"))
        .when(F.col("new_rows").isNull(), F.lit("removed"))
        .when((F.col("old_nulls") != F.col("new_nulls"))
              | (F.col("old_distinct") != F.col("new_distinct"))
              | (F.col("old_rows") != F.col("new_rows")),
              F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    return j.select(
        "column", status.alias("status"),
        "old_rows", "new_rows", "old_nulls", "new_nulls",
        "old_distinct", "new_distinct",
        F.round(F.coalesce(new_rate, F.lit(0.0))
                - F.coalesce(old_rate, F.lit(0.0)), 6)
        .alias("null_rate_delta"))


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
) -> DataFrame:
    """Equal-width histogram of a numeric column over [lo, hi): one
    row per non-empty bin with (bin, bin_lo, bin_hi, n). Values below
    lo clamp into bin 0, values at/above hi into the last bin, NULLs
    are dropped — so the counts always sum to the non-null count.

    Pure projection + one partial aggregate on the bin id (cardinality
    = nbins): the scan dominates at any scale, the shuffle carries at
    most nbins rows per partition.
    """
    if not (hi > lo) or nbins <= 0:
        raise ValueError("need hi > lo and nbins > 0")
    width = (hi - lo) / nbins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))
    return (
        df.filter(F.col(col).isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin").agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6)
            .alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6)
            .alias("bin_hi"),
            "n")
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: "list[float]",
) -> DataFrame:
    """Approximate quantiles from a `histogram` output — the mergeable
    quantile path: histograms merge by summing bin counts (union +
    groupBy-sum, same law as the CMS/HLL sketches), then quantiles
    derive from the merged bins with error bounded by one bin width.

    Linear interpolation inside the winning bin:
    est(q) = bin_lo + (q*N - cum_before) / n_bin * bin_width.

    The cumulative window runs over nbins rows (a sketch, not data) —
    the single-partition window is on a constant-size frame, which is
    exactly where one is acceptable.
    """
    from pyspark.sql import Window

    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty, each in [0, 1]")
    w = (Window.orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (hist.withColumn("__cum", F.sum("n").over(w))
           .withColumn("__before", F.col("__cum") - F.col("n")))
    total = hist.agg(F.sum("n").alias("__total"))
    c = cum.crossJoin(F.broadcast(total))
    out = None
    for q in qs:
        target = F.lit(float(q)) * F.col("__total")
        # cum is nondecreasing and only non-empty bins exist, so the
        # FIRST bin with cum >= target always has before < target
        # (and q=0 resolves to the first bin's lower edge)
        hit = (
            c.filter(F.col("__cum") >= target)
            .orderBy("bin").limit(1)
            .select(
                F.lit(float(q)).alias("q"),
                F.round(
                    F.col("bin_lo")
                    + (target - F.col("__before")) / F.col("n")
                    * (F.col("bin_hi") - F.col("bin_lo")), 6)
                .alias("est"))
        )
        out = hit if out is None else out.unionByName(hit)
    return out
