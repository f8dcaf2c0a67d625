"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scan pruning works off per-file / per-row-group min-max
statistics, so it is only effective on columns the data is physically
clustered by. Linear sorting clusters ONE column; interleaving the
bits of several columns into one Morton key and range-partitioning +
sorting by it gives every participating column locality, so range
filters on ANY of them skip most files (Delta `OPTIMIZE ZORDER BY` /
Iceberg sort-order territory — the reference has no physical-layout
story at all; its stores delegate layout to MongoDB's B-trees,
reference:src/maggma/stores/mongolike.py:236 ensure_index).

Everything is JVM Column expressions (shift/mask/or chains unroll
into whole-stage codegen — no UDF): one stats action computes the
per-column min/max (driver-folded literals), normalization maps each
value to a `bits`-wide integer rank, and the interleave is
sum-of-shifts. At 100 TB the cost is the one repartitionByRange
shuffle any clustering rewrite pays; AQE coalesces the output
partitions to target file sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "hilbert_key", "cluster_by_zorder"]

_MAX_TOTAL_BITS = 63  # stay inside a signed long


def _normalize(col: Column, lo, hi, bits: int) -> Column:
    """Map a numeric value into [0, 2^bits) by min-max scaling.

    Equal-width scaling is one stats action and fully codegen-able;
    heavily skewed columns cluster less evenly than a rank-based
    normalization would, but stay CORRECT (the key is only a layout
    hint). Nulls map to 0 — they cluster together at the low end.
    """
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    if span <= 0:  # constant column: every row in one cell
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span)
        * F.lit(float(top)))
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(top)),
        F.lit(0)).cast("long")


def _quantile_bucket(df: DataFrame, c: str, bits: int) -> Column:
    """Rank a column into 2^bits quantile buckets: numeric columns via
    approxQuantile boundaries (≤ 2^bits driver scalars — bounded, not
    data-sized; skew-robust where min-max scaling collapses), other
    types via xxhash64 modulo (equal values co-locate; range scans on
    hashed strings won't prune)."""
    from pyspark.sql.types import NumericType

    buckets = 1 << bits
    dtype = {f.name: f.dataType for f in df.schema.fields}.get(c)
    if not isinstance(dtype, NumericType):
        return F.pmod(F.xxhash64(F.col(c)), F.lit(buckets)).cast("long")
    qs = df.stat.approxQuantile(
        c, [i / buckets for i in range(1, buckets)], 0.001)
    bounds: list[float] = []
    for q in qs:  # strictly increasing (constant regions collapse)
        if not bounds or q > bounds[-1]:
            bounds.append(q)
    expr = F.lit(len(bounds))
    for i, b in enumerate(reversed(bounds)):
        expr = F.when(F.col(c) <= F.lit(b),
                      F.lit(len(bounds) - 1 - i)).otherwise(expr)
    return F.coalesce(expr, F.lit(0)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    stats: Optional[dict] = None,
    normalization: str = "minmax",
) -> Column:
    """Morton key Column for `cols` — bit-interleaved normalized ranks.

    normalization="minmax" (default): equal-width scaling from one
    min/max stats action; `stats` may pre-supply {col: (min, max)} to
    skip it (e.g. when the caller already profiled the table).
    normalization="quantile": 2^bits quantile buckets per column
    (approxQuantile; skew-robust, strings supported via hash buckets
    — what ParquetStore.optimize uses).

    The interleave places column 0's bit i at position i*n, column
    1's at i*n+1, …, so every column contributes to every prefix of
    the key — the property that makes prefix ranges of the key
    correspond to small hyper-rectangles in value space.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if normalization not in ("minmax", "quantile"):
        raise ValueError(f"unknown normalization {normalization!r}")
    if bits * len(cols) > _MAX_TOTAL_BITS:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds "
            f"{_MAX_TOTAL_BITS} (signed long): lower bits= or cluster "
            "fewer columns")
    if normalization == "quantile":
        ranks = [_quantile_bucket(df, c, bits) for c in cols]
    else:
        if stats is None:
            aggs = []
            for c in cols:
                aggs += [F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                         F.max(F.col(c).cast("double")).alias(f"hi_{c}")]
            row = df.agg(*aggs).first()  # ONE action for all columns
            stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
        missing = [c for c in cols if stats[c][0] is None]
        if missing:  # all-null column: contributes constant 0 bits
            stats = {**stats, **{c: (0.0, 0.0) for c in missing}}
        ranks = [_normalize(F.col(c), stats[c][0], stats[c][1], bits)
                 for c in cols]
    n = len(cols)
    key = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for j, v in enumerate(ranks):
        for i in range(bits):
            key = key.bitwiseOR(F.shiftleft(
                F.shiftright(v, i).bitwiseAND(one), i * n + j))
    return key


def hilbert_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    stats: Optional[dict] = None,
) -> Column:
    """2-D Hilbert curve key — strictly better locality than Morton.

    Adjacent Hilbert cells are ALWAYS adjacent in value space (the
    Morton curve jumps across the grid at power-of-two boundaries),
    so range-partition cuts of the key never glue together far-apart
    regions — tighter per-file min-max stats for the same shuffle.

    The classic per-bit rotation state machine (quadrant index +
    flip/swap, the xy2d loop) runs as ONE runtime fold per row:
    `F.aggregate` over the descending bit sequence with a struct
    accumulator — a JVM higher-order function, so the expression tree
    stays O(1) per row regardless of `bits` (a Python-unrolled loop
    would square the tree each level through the rotation branches).
    Bit extraction uses exact double div/mod (values < 2^bits, far
    inside the 2^53 mantissa). Exactly two columns (the classic
    curve); for 3+ dims use zorder_key.
    """
    cols = list(cols)
    if len(cols) != 2:
        raise ValueError("hilbert_key takes exactly two columns "
                         "(use zorder_key for other arities)")
    if not 1 <= bits <= 20:
        raise ValueError("hilbert_key bits must be in [1, 20]")
    if stats is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"hi_{c}")]
        row = df.agg(*aggs).first()
        stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    stats = {c: ((0.0, 0.0) if stats[c][0] is None else stats[c])
             for c in cols}
    x0 = _normalize(F.col(cols[0]), *stats[cols[0]], bits)
    y0 = _normalize(F.col(cols[1]), *stats[cols[1]], bits)
    n1 = F.lit((1 << bits) - 1).cast("long")

    def step(acc, i):
        p = F.pow(F.lit(2.0), i.cast("double"))
        rx = (acc["x"].cast("double") / p).cast("long") % 2
        ry = (acc["y"].cast("double") / p).cast("long") % 2
        quad = (rx * 3).bitwiseXOR(ry)
        d2 = acc["d"] + (p * p).cast("long") * quad
        xf = F.when(rx == 1, n1 - acc["x"]).otherwise(acc["x"])
        yf = F.when(rx == 1, n1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, yf).otherwise(acc["x"])
        ny = F.when(ry == 0, xf).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)),
        F.struct(x0.alias("x"), y0.alias("y"),
                 F.lit(0).cast("long").alias("d")),
        step)["d"]


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: Optional[int] = None,
    key_column: str = "__zorder",
    curve: str = "zorder",
) -> DataFrame:
    """Physically cluster `df` by the Morton key of `cols`.

    repartitionByRange on the key puts neighboring cells in the same
    output partition (→ the same parquet file), sortWithinPartitions
    tightens per-row-group statistics inside each file. The key
    column is dropped from the result — it is layout, not data.
    Write the result with any store/sink; subsequent scans filtering
    on any of `cols` prune on the parquet min-max stats.
    `curve="hilbert"` uses the Hilbert key (exactly two columns,
    better boundary locality); default is the Morton key.
    """
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r} (zorder|hilbert)")
    key_fn = hilbert_key if curve == "hilbert" else zorder_key
    key = key_fn(df, cols, bits=bits)
    staged = df.withColumn(key_column, key)
    parts = num_partitions or staged.rdd.getNumPartitions()
    return (staged.repartitionByRange(parts, F.col(key_column))
            .sortWithinPartitions(key_column)
            .drop(key_column))
