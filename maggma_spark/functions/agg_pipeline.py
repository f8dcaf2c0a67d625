"""Mongo aggregation-pipeline compiler — `[{"$match": ...}, {"$group":
...}, ...]` -> one declarative DataFrame chain.

Reference parity: AggregationResource executes a pipeline supplied by
its query operator verbatim against Mongo
(reference:src/maggma/api/resource/aggregation.py:65-88); builders and
users also hand stores raw pipelines. Here every stage compiles onto
the running DataFrame, so the WHOLE pipeline is one Catalyst plan —
$match participates in pushdown, $project in column pruning, $group in
partial aggregation, and stage order is preserved exactly (a $match
after a $group filters groups, before it filters rows — same as Mongo).

Supported stages: $match, $project, $addFields/$set, $unset, $group,
$sort, $skip, $limit, $count, $unwind, $lookup, $sortByCount,
$replaceRoot. Accumulators: $sum, $avg, $min, $max, $push, $addToSet,
$first, $last, $stdDevPop, $stdDevSamp, $count, $median, $percentile,
$top, $bottom, $topN, $bottomN, $firstN, $lastN, $mergeObjects.
Values/expressions reuse the criteria compiler's $expr subset, so the
two dialects stay consistent.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from pyspark.sql import Column, DataFrame, functions as F

from maggma_spark.functions.criteria import (
    _lit,
    compile_criteria,
    compile_expr,
    default_resolver,
)

_ACCUMULATORS = {
    "$sum": F.sum,
    "$avg": F.avg,
    "$min": F.min,
    "$max": F.max,
    "$push": F.collect_list,
    "$addToSet": F.collect_set,
    "$first": F.first,
    "$last": F.last,
    "$stdDevPop": F.stddev_pop,
    "$stdDevSamp": F.stddev_samp,
}

_TOPN_OPS = ("$top", "$bottom", "$topN", "$bottomN")

# Hard cap on elements any single group may COLLECT through the
# list-materializing accumulators ($push/$addToSet/$firstN/$lastN/
# $mergeObjects). These hold a whole group in one task (exactly Mongo's
# memory shape); past this cap the query raises inside the task instead
# of letting the executor OOM — the same house guard as GroupBuilder's
# max_group_rows. $top/$bottom/$topN/$bottomN are NOT capped: they are
# pre-filtered with a per-group rank window so at most n elements per
# group are ever collected, regardless of group size.
MAX_GROUP_ELEMENTS = 500_000


def _guard_group_array(arr: Column, op: str) -> Column:
    """Raise inside the task when a collected group exceeds
    MAX_GROUP_ELEMENTS (task-OOM guard, house style: raise, never
    silently bottleneck)."""
    return F.when(
        F.size(arr) > F.lit(MAX_GROUP_ELEMENTS),
        F.raise_error(F.concat(
            F.lit(f"{op}: group of "), F.size(arr).cast("string"),
            F.lit(f" elements exceeds MAX_GROUP_ELEMENTS="
                  f"{MAX_GROUP_ELEMENTS}; a collected group must fit "
                  "one task. Use $topN/$bottomN (rank-prefiltered) or "
                  "the window top-k plan for data-scale groups, or "
                  "raise maggma_spark.functions.agg_pipeline."
                  "MAX_GROUP_ELEMENTS.")))
    ).otherwise(arr)


def _topn_order_cols(df: DataFrame, sort_doc: dict, bottom: bool) -> list:
    """Sort columns for the $top/$bottom rank-prefilter window. Spark's
    default null placement (asc = nulls first, desc = nulls last) agrees
    with struct_comparator's null-is-smallest rule in BOTH directions,
    so the prefilter keeps exactly the rows the comparator would rank
    first."""
    cols = []
    for f, d in sort_doc.items():
        asc = (d > 0) != bottom
        c = _value(df, f"${f}")
        cols.append(c.asc() if asc else c.desc())
    return cols


def _compile_accumulator(df: DataFrame, op: str, arg: Any,
                         prefilter: Optional[str] = None) -> Column:
    """One $group/$bucket accumulator -> an aggregate Column. Simple
    accumulators map straight to JVM aggregates; the structured ones
    ($count, $median, $percentile, $top/$bottom/$topN/$bottomN,
    $firstN/$lastN, $mergeObjects) compile to compositions of
    collect_list / array_sort(comparator) / min-max slicing — all
    JVM-side, no UDFs.

    Scale shape: $top/$bottom/$topN/$bottomN take `prefilter` — a
    boolean marker column produced by a per-group rank window
    (_compile_group_aggs) — and collect ONLY marked rows
    (collect_list skips the nulls the F.when produces), so at most n
    elements per group ever materialize. The remaining list-collecting
    accumulators cap at MAX_GROUP_ELEMENTS and raise past it."""
    from maggma_spark.functions.criteria import struct_comparator

    if op in ("$push", "$addToSet"):
        return _guard_group_array(_ACCUMULATORS[op](_value(df, arg)), op)
    if op in _ACCUMULATORS:
        return _ACCUMULATORS[op](_value(df, arg))
    if op == "$count":
        if arg not in ({},):
            raise ValueError("$count accumulator takes {}")
        return F.count(F.lit(1))
    if op == "$median":
        return F.median(_value(df, arg["input"] if isinstance(arg, dict)
                               else arg))
    if op == "$percentile":
        ps = arg["p"]
        return F.percentile(_value(df, arg["input"]),
                            F.array(*[F.lit(float(p)) for p in ps]))
    if op in _TOPN_OPS:
        sort_doc = dict(arg["sortBy"])
        n = int(arg["n"]) if op in ("$topN", "$bottomN") else 1
        if n < 1:
            raise ValueError(f"{op} n must be >= 1")
        keys = list(sort_doc)
        elem = F.struct(*[_value(df, f"${f}").alias(f) for f in keys],
                        _value(df, arg["output"]).alias("__out"))
        if prefilter is not None:
            # collect_list skips nulls -> <= n elements per group
            elem = F.when(F.col(prefilter), elem)
        ordered = F.array_sort(F.collect_list(elem),
                               struct_comparator(sort_doc))
        if op in ("$bottom", "$bottomN"):
            ordered = F.reverse(ordered)
        picked = F.slice(ordered, 1, n)
        vals = F.transform(picked, lambda e: e["__out"])
        return vals if op in ("$topN", "$bottomN") else \
            F.element_at(vals, 1)
    if op in ("$firstN", "$lastN"):
        n = int(arg["n"])
        if n < 1:
            raise ValueError(f"{op} n must be >= 1")
        all_vals = _guard_group_array(
            F.collect_list(_value(df, arg["input"])), op)
        if op == "$firstN":
            return F.slice(all_vals, 1, n)
        # last n: negative start clamped at -size (short groups)
        return F.when(F.size(all_vals) <= n, all_vals).otherwise(
            F.slice(all_vals, -n, n))
    if op == "$mergeObjects":
        # MapType documents, later-wins like Mongo: fold the collected
        # entry lists key-by-key, keeping each key's LAST value
        v = _value(df, arg)
        entries = F.flatten(F.transform(
            _guard_group_array(F.collect_list(v), op), F.map_entries))
        rev = F.reverse(entries)  # last occurrence first
        ks = F.array_distinct(F.transform(rev, lambda e: e["key"]))
        return F.map_from_arrays(
            ks,
            F.transform(ks, lambda k: F.element_at(
                F.filter(rev, lambda e: e["key"] == k), 1)["value"]))
    raise ValueError(f"unsupported accumulator {op}")


def _compile_group_aggs(df: DataFrame, out_spec: dict,
                        part_exprs: Optional[list]) -> tuple:
    """Compile a $group/$bucket output spec to (prepared_df, agg_cols).

    $top/$bottom/$topN/$bottomN get a rank-window prefilter: a boolean
    marker (row_number() <= n per group, ordered by the accumulator's
    sortBy — reversed for bottom) stamped BEFORE the aggregation, so
    the collect never holds more than n elements of any group. The
    window partitions on the same expressions the groupBy uses, so
    Catalyst reuses ONE hash exchange for the window sort and the
    aggregation. `part_exprs=None` (global group) skips the marker —
    _group handles that case with TakeOrdered subplans instead."""
    from pyspark.sql import Window

    aggs = []
    for i, (out, accdoc) in enumerate(out_spec.items()):
        if not (isinstance(accdoc, dict) and len(accdoc) == 1):
            raise ValueError(
                f"$group accumulator must be one-op doc: {accdoc}")
        op, arg = next(iter(accdoc.items()))
        prefilter = None
        if op in _TOPN_OPS and part_exprs is not None:
            sort_doc = dict(arg["sortBy"])
            n = int(arg["n"]) if op in ("$topN", "$bottomN") else 1
            if n < 1:
                raise ValueError(f"{op} n must be >= 1")
            order = _topn_order_cols(df, sort_doc,
                                     op in ("$bottom", "$bottomN"))
            marker = f"__topn_{i}"
            w = Window.partitionBy(*part_exprs).orderBy(*order)
            df = df.withColumn(marker, F.row_number().over(w) <= n)
            prefilter = marker
        aggs.append((out, op, arg, prefilter))
    return df, [_compile_accumulator(df, op, arg, pf).alias(out)
                for out, op, arg, pf in aggs]


def _value(df: DataFrame, v: Any) -> Column:
    """A pipeline value: "$field" ref, operator doc, or literal."""
    return compile_expr(v, default_resolver(df.schema))


def _project(df: DataFrame, spec: dict) -> DataFrame:
    flags = {k: v for k, v in spec.items() if isinstance(v, (int, bool))}
    exprs = {k: v for k, v in spec.items() if k not in flags}
    inc = [k for k, v in flags.items() if v]
    exc = {k for k, v in flags.items() if not v}
    if (inc or exprs) and (exc - {"_id"}):
        raise ValueError("cannot mix inclusion and exclusion in $project")
    if inc or exprs:
        # Mongo: any inclusion/expression makes the projection exclusive
        cols: list[Column] = [F.col(k).alias(k) for k in inc]
        cols += [_value(df, v).alias(k) for k, v in exprs.items()]
        return df.select(*cols)
    return df.select(*[F.col(c) for c in df.columns if c not in exc])


def _group(df: DataFrame, spec: dict) -> DataFrame:
    spec = dict(spec)
    if "_id" not in spec:
        raise ValueError("$group requires _id")
    gid = spec.pop("_id")
    if gid is None:
        # global group: $top/$bottom family compiles to a TakeOrdered
        # subplan (orderBy+limit n -> per-partition heaps, driver
        # merges n rows — never a single-task whole-data collect);
        # each single-row subframe cross-joins back onto the main
        # single-row aggregate
        rest, tops = {}, {}
        for out, accdoc in spec.items():
            if not (isinstance(accdoc, dict) and len(accdoc) == 1):
                raise ValueError(
                    f"$group accumulator must be one-op doc: {accdoc}")
            op, arg = next(iter(accdoc.items()))
            (tops if op in _TOPN_OPS else rest)[out] = accdoc
        frames = []
        if rest:
            _, aggs = _compile_group_aggs(df, rest, None)
            frames.append(df.agg(*aggs))
        for out, accdoc in tops.items():
            op, arg = next(iter(accdoc.items()))
            sort_doc = dict(arg["sortBy"])
            n = int(arg["n"]) if op in ("$topN", "$bottomN") else 1
            if n < 1:
                raise ValueError(f"{op} n must be >= 1")
            sub = df.orderBy(*_topn_order_cols(
                df, sort_doc, op in ("$bottom", "$bottomN"))).limit(n)
            frames.append(sub.agg(
                _compile_accumulator(sub, op, arg).alias(out)))
        if not frames:
            raise ValueError("$group with _id: null needs at least "
                             "one accumulator")
        out_df = frames[0]
        for fr in frames[1:]:
            out_df = out_df.crossJoin(fr)  # all single-row frames
        return out_df.select(*spec)
    if isinstance(gid, dict) and not any(k.startswith("$") for k in gid):
        # compound _id document {k: expr, ...} -> struct key
        prepped, aggs = _compile_group_aggs(
            df, spec, [_value(df, v) for v in gid.values()])
        key_cols = [_value(prepped, v).alias(k) for k, v in gid.items()]
        grouped = prepped.groupBy(*key_cols).agg(*aggs)
        return grouped.select(
            F.struct(*[F.col(k) for k in gid]).alias("_id"),
            *[F.col(a) for a in spec])
    # "$field" ref or operator-doc expression ({"$toLower": "$g"}, ...)
    prepped, aggs = _compile_group_aggs(df, spec, [_value(df, gid)])
    return (prepped.groupBy(_value(prepped, gid).alias("_id")).agg(*aggs))


def _unwind(df: DataFrame, spec: Union[str, dict]) -> DataFrame:
    """$unwind: explode/explode_outer; `includeArrayIndex` emits the
    element's position via posexplode (null index on preserved
    null/empty docs, like Mongo). A dotted path unwinds a nested
    array and rewrites the struct LEAF in place (withField) — Mongo
    replaces the nested field, not a new top-level column. Preserved
    null/empty docs leave the leaf null (the columnar
    missing==null convention, DEVIATIONS §1)."""
    if isinstance(spec, str):
        path, preserve, idx = spec, False, None
    else:
        path = spec["path"]
        preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
        idx = spec.get("includeArrayIndex")
    field = path.lstrip("$")
    if "." in field:
        top, rest = field.split(".", 1)
        if top not in df.columns:
            raise ValueError(f"$unwind path {path!r}: no column {top!r}")
        ex = (F.posexplode_outer if preserve else F.posexplode)(
            F.col(field)) if idx else \
            (F.explode_outer if preserve else F.explode)(F.col(field))
        if idx:
            df = df.select("*", ex.alias("__uw_i", "__uw_v"))
        else:
            df = df.select("*", ex.alias("__uw_v"))
        df = df.withColumn(
            top, F.col(top).withField(rest, F.col("__uw_v")))
        if idx:
            df = df.withColumn(idx, F.col("__uw_i").cast("long"))
        return df.drop("__uw_i", "__uw_v")
    others = [c for c in df.columns if c != field]
    if idx:
        exploded = (F.posexplode_outer(field) if preserve
                    else F.posexplode(field))
        return df.select(
            *others, exploded.alias(idx, field)
        ).withColumn(idx, F.col(idx).cast("long")) \
            .select(*others, field, idx)
    exploded = F.explode_outer(field) if preserve else F.explode(field)
    return df.select(*others, exploded.alias(field))


def _lookup_let(df: DataFrame, fdf: DataFrame, spec: dict) -> DataFrame:
    """$lookup with `let` + correlated `pipeline` (Mongo 3.6 form).

    Set-based compile: the first pipeline stage must be a correlated
    `{"$match": {"$expr": ...}}`; its conjuncts split into (a) at
    least one `{"$eq": ["$foreignField", "$$var"]}` equality — the
    JOIN KEYS (Mongo evaluates the pipeline per local doc; without an
    equality the set-based equivalent is a cross join, so that shape
    raises), and (b) residual var-referencing conditions — post-join
    filters. Optional `$project` (inclusion flags; pushes into the
    foreign scan as column pruning, sort keys retained internally and
    stripped after the slice), `$sort` and `$limit` stages apply to
    each local doc's matched set via array_sort(comparator) + slice on
    the collected array. Other post-$match stages raise (shape the
    foreign side with an uncorrelated `pipeline` + plain $lookup
    instead).

    Row identity: local rows are stamped with
    monotonically_increasing_id and localCheckpoint-ed ONCE (the same
    pinning $graphLookup uses — mono ids are NOT stable across plan
    re-evaluations, and the collected arrays join back to the stamped
    frame). Cost: one materialization of the local side; the join
    itself is a plain equi-join on the correlation keys."""
    let = dict(spec["let"])
    pipeline = list(spec.get("pipeline") or [])
    as_name = spec["as"]
    if not pipeline or "$match" not in pipeline[0] \
            or set(pipeline[0]["$match"]) != {"$expr"}:
        raise ValueError(
            "$lookup with let: first pipeline stage must be "
            '{"$match": {"$expr": ...}}')
    expr = pipeline[0]["$match"]["$expr"]
    conjuncts = expr["$and"] if isinstance(expr, dict) \
        and set(expr) == {"$and"} else [expr]

    def is_var(x):
        return isinstance(x, str) and x.startswith("$$")

    def is_field(x):
        return isinstance(x, str) and x.startswith("$") \
            and not x.startswith("$$")

    eq_pairs, extra = [], []
    for c in conjuncts:
        if isinstance(c, dict) and set(c) == {"$eq"}:
            a, b = c["$eq"]
            if is_field(a) and is_var(b):
                eq_pairs.append((a[1:], b[2:]))
                continue
            if is_var(a) and is_field(b):
                eq_pairs.append((b[1:], a[2:]))
                continue
        extra.append(c)
    if not eq_pairs:
        raise ValueError(
            "$lookup with let needs at least one "
            '{"$eq": ["$foreignField", "$$var"]} conjunct — arbitrary '
            "correlation would compile to a cross join")
    for f, v in eq_pairs:
        if v not in let:
            raise ValueError(f"$lookup let: unknown variable $${v}")

    post = pipeline[1:]
    sort_doc, limit_n, proj_fields = None, None, None
    for st in post:
        if "$project" in st and proj_fields is None and limit_n is None:
            # inclusion-flag projection of foreign fields; it pushes
            # into the foreign side pre-join (column pruning) — sort
            # keys stay available internally and are stripped from the
            # output structs after the slice
            pj = dict(st["$project"])
            pj.pop("_id", None)
            if not pj or not all(
                    isinstance(v, (int, bool)) and v for v in pj.values()):
                raise ValueError(
                    "$lookup with let: $project inside the pipeline "
                    "supports inclusion flags of foreign fields only")
            missing = [k for k in pj if k not in fdf.columns]
            if missing:
                raise ValueError(
                    f"$lookup with let: $project fields {missing} not "
                    "in the foreign collection")
            proj_fields = list(pj)
        elif "$sort" in st and sort_doc is None and limit_n is None:
            sort_doc = dict(st["$sort"])
        elif "$limit" in st and limit_n is None:
            limit_n = int(st["$limit"])
        else:
            raise ValueError(
                "$lookup with let supports only $project/$sort/$limit "
                "after the correlated $match; shape the foreign side "
                "with an uncorrelated pipeline + plain $lookup instead")

    src = df.withColumn(
        "__lk_id", F.monotonically_increasing_id()).localCheckpoint(
        eager=True)
    for v, local_expr in let.items():
        src = src.withColumn(f"__lkv_{v}", _value(src, local_expr))
    fcols = fdf.columns
    fp = fdf.select(*[F.col(c).alias(f"__lkf_{c}") for c in fcols])

    def resolver(name: str):
        if name.startswith("$"):  # "$$var" arrived as "$var"
            v = name[1:]
            if v not in let:
                raise ValueError(f"$lookup let: unknown variable $${v}")
            return F.col(f"__lkv_{v}")
        head, *rest = name.split(".")
        col = F.col(f"__lkf_{head}")
        for p in rest:
            col = col[p]
        return col

    cond = None
    for f, v in eq_pairs:
        c = F.col(f"__lkf_{f}").eqNullSafe(F.col(f"__lkv_{v}"))
        cond = c if cond is None else (cond & c)
    matched = src.join(fp, cond, "inner")
    for c in extra:
        matched = matched.filter(
            compile_expr(c, resolver).cast("boolean"))
    # the collected struct carries the projected fields plus any sort
    # keys the comparator needs; Catalyst prunes the foreign scan to
    # exactly this set (the $project pushes down for free)
    keep = proj_fields if proj_fields is not None else fcols
    elem_fields = list(dict.fromkeys(
        list(keep) + (list(sort_doc) if sort_doc else [])))
    elem = F.struct(*[F.col(f"__lkf_{c}").alias(c) for c in elem_fields])
    arr = F.collect_list(elem)
    if sort_doc is not None:
        from maggma_spark.functions.criteria import struct_comparator

        arr = F.array_sort(arr, struct_comparator(sort_doc))
    if limit_n is not None:
        arr = F.slice(arr, 1, limit_n)
    if proj_fields is not None and set(elem_fields) != set(proj_fields):
        # strip the internal sort keys back out of the output structs
        arr = F.transform(arr, lambda e: F.struct(
            *[e[c].alias(c) for c in proj_fields]))
    grouped = matched.groupBy("__lk_id").agg(arr.alias(as_name))
    joined = src.join(grouped, on="__lk_id", how="left")
    elem_t = dict(zip(joined.columns,
                      (f.dataType for f in joined.schema.fields)))[as_name]
    return (joined.withColumn(
        as_name, F.coalesce(F.col(as_name),
                            F.array().cast(elem_t.simpleString())))
        .drop("__lk_id", *[f"__lkv_{v}" for v in let]))


def _lookup(df: DataFrame, spec: dict,
            stores: Optional[dict] = None) -> DataFrame:
    frm = spec["from"]
    if isinstance(frm, str):
        if not stores or frm not in stores:
            raise ValueError(f"$lookup from {frm!r}: pass stores={{name: "
                             f"store_or_df}} to resolve it")
        frm = stores[frm]
    fdf = frm if isinstance(frm, DataFrame) else frm.df
    if spec.get("let"):
        return _lookup_let(df, fdf, spec)
    if spec.get("pipeline"):
        # Mongo 8 concise form: pre-filter/shape the foreign side with
        # an uncorrelated pipeline, then equi-join as usual
        fdf = compile_pipeline(fdf, spec["pipeline"])
    local, foreign, as_name = (spec["localField"], spec["foreignField"],
                               spec["as"])
    gathered = (fdf.groupBy(F.col(foreign).alias("__lk"))
                .agg(F.collect_list(F.struct(*fdf.columns)).alias(as_name)))
    joined = df.join(F.broadcast(gathered) if spec.get("broadcast") else
                     gathered,
                     df[local] == gathered["__lk"], "left").drop("__lk")
    elem_t = dict(zip(joined.columns,
                      (f.dataType for f in joined.schema.fields)))[as_name]
    return joined.withColumn(
        as_name, F.coalesce(F.col(as_name),
                            F.array().cast(elem_t.simpleString())))


def _bucket(df: DataFrame, spec: dict) -> DataFrame:
    """$bucket: range bucketing on explicit boundaries; docs outside the
    boundaries go to `default` (error without one, as in Mongo)."""
    group_by = _value(df, spec["groupBy"])
    bounds = spec["boundaries"]
    if sorted(bounds) != list(bounds) or len(bounds) < 2:
        raise ValueError("$bucket boundaries must be sorted, len >= 2")
    # Mongo buckets can mix a numeric boundary _id with a string
    # default; a Column needs ONE type, so heterogeneous ids stringify
    ids = list(bounds[:-1]) + ([spec["default"]] if "default" in spec else [])
    hetero = len({isinstance(v, str) for v in ids}) > 1
    mk = (lambda v: F.lit(str(v))) if hetero else F.lit
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (group_by >= F.lit(lo)) & (group_by < F.lit(hi))
        bucket = F.when(cond, mk(lo)) if bucket is None else \
            bucket.when(cond, mk(lo))
    if "default" in spec:
        bucket = bucket.otherwise(mk(spec["default"]))
    out_spec = dict(spec.get("output") or {"count": {"$sum": 1}})
    out_spec.pop("_id", None)  # keys come from the bucket expression
    grouped = df.withColumn("_id", bucket)
    if "default" not in spec:
        # Mongo errors on out-of-range docs; set-based engines can't
        # raise per-row — dropping with no default would silently lose
        # data, so require an explicit default instead
        missing = grouped.filter(F.col("_id").isNull()).limit(1).count()
        if missing:
            raise ValueError(
                "$bucket: document outside boundaries and no default given")
    prepped, aggs = _compile_group_aggs(grouped, out_spec,
                                        [F.col("_id")])
    return prepped.groupBy("_id").agg(*aggs)


# ISO 3 Renard and IEC 60063 E-series preferred numbers (public
# standards data; also Mongo's $bucketAuto granularity series). E48/
# E96/E192 are exactly 10^(k/N) rounded to 3 significant figures, so
# they are generated; the smaller series have historical exceptions
# (e.g. R10's 3.15) and are tabulated.
_GRANULARITY_SERIES = {
    "R5": [1.0, 1.6, 2.5, 4.0, 6.3],
    "R10": [1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0],
    "R20": [1.0, 1.12, 1.25, 1.4, 1.6, 1.8, 2.0, 2.24, 2.5, 2.8, 3.15,
            3.55, 4.0, 4.5, 5.0, 5.6, 6.3, 7.1, 8.0, 9.0],
    "R40": [1.0, 1.06, 1.12, 1.18, 1.25, 1.32, 1.4, 1.5, 1.6, 1.7, 1.8,
            1.9, 2.0, 2.12, 2.24, 2.36, 2.5, 2.65, 2.8, 3.0, 3.15, 3.35,
            3.55, 3.75, 4.0, 4.25, 4.5, 4.75, 5.0, 5.3, 5.6, 6.0, 6.3,
            6.7, 7.1, 7.5, 8.0, 8.5, 9.0, 9.5],
    "1-2-5": [1.0, 2.0, 5.0],
    "E6": [1.0, 1.5, 2.2, 3.3, 4.7, 6.8],
    "E12": [1.0, 1.2, 1.5, 1.8, 2.2, 2.7, 3.3, 3.9, 4.7, 5.6, 6.8, 8.2],
    "E24": [1.0, 1.1, 1.2, 1.3, 1.5, 1.6, 1.8, 2.0, 2.2, 2.4, 2.7, 3.0,
            3.3, 3.6, 3.9, 4.3, 4.7, 5.1, 5.6, 6.2, 6.8, 7.5, 8.2, 9.1],
}
for _n in (48, 96, 192):
    _GRANULARITY_SERIES[f"E{_n}"] = [
        round(10.0 ** (_k / _n), 2) for _k in range(_n)]
# IEC 60063's one tabulated anomaly: E192 publishes 9.20 where the
# formula yields 9.19 (10^(185/192) = 9.1896...) — patch to the
# published series so $bucketAuto boundaries match Mongo's tables
_GRANULARITY_SERIES["E192"] = [
    9.2 if _v == 9.19 else _v for _v in _GRANULARITY_SERIES["E192"]]


def _granularity_round(v: float, granularity: str, up: bool) -> float:
    """Round `v` to the preferred-number series: up = smallest series
    value STRICTLY greater than v (bucket maxes stay exclusive), down =
    largest series value <= v. v must be > 0 (0 rounds down to 0)."""
    import math

    if v == 0:
        if not up:
            return 0.0
        raise ValueError(
            "$bucketAuto granularity: cannot round 0 upward — all "
            "groupBy values are 0")
    if granularity == "POWERSOF2":
        e = math.floor(math.log2(v))
        while 2.0 ** e > v:
            e -= 1
        while 2.0 ** (e + 1) <= v:
            e += 1
        return 2.0 ** (e + 1) if up else 2.0 ** e
    series = _GRANULARITY_SERIES[granularity]
    e = math.floor(math.log10(v))
    while series[0] * 10.0 ** e > v:
        e -= 1
    while series[0] * 10.0 ** (e + 1) <= v:
        e += 1
    cands = [s * 10.0 ** e for s in series] + [series[0] * 10.0 ** (e + 1)]
    if up:
        return min(c for c in cands if c > v)
    return max(c for c in cands if c <= v)


def _bucket_auto(df: DataFrame, spec: dict) -> DataFrame:
    """$bucketAuto: split into `buckets` groups of ~equal document
    count with data-derived boundaries; `_id` is a {min, max} struct
    (max exclusive except the last bucket, as in Mongo). Ties stay in
    one bucket (boundary rule: a distinct value lands in bucket
    floor(docs_before * buckets / total)). Nulls sort lowest and fold
    into the first bucket with `_id.min` null, matching BSON order.

    `granularity` rounds boundaries to a preferred-number series
    (Renard R5-R40, 1-2-5, E6-E192, POWERSOF2 — ISO 3 / IEC 60063):
    the first min rounds DOWN from the global min, every max rounds UP
    strictly past its bucket's largest value, and buckets whose rounded
    boundaries collide merge (so fewer than `buckets` may come back, as
    in Mongo). Granularity requires non-null, non-negative numeric
    groupBy values.

    Plan shape: one count-per-distinct-value aggregate whose stats row
    (total/cardinality/max) is the ONLY driver action on the default
    path, a cumulative window over the DISTINCT-VALUE frame
    (cardinality-bounded — not the data; the single global-order window
    runs on |distinct values| rows), then a null-safe equi-join
    assigning each row its bucket. The granularity path adds one more
    bounded action (<= `buckets` per-bucket maxes) and assigns buckets
    with a literal CASE — no join at all. At 100 TB prefer a $bucket
    with precomputed approx-quantile boundaries when value cardinality
    itself is data-scale."""
    from pyspark.sql import Window

    granularity = spec.get("granularity")
    if granularity and granularity != "POWERSOF2" \
            and granularity not in _GRANULARITY_SERIES:
        raise ValueError(
            f"$bucketAuto granularity {granularity!r} not supported; "
            f"one of {sorted(_GRANULARITY_SERIES)} or POWERSOF2")
    n_buckets = int(spec["buckets"])
    if n_buckets < 1:
        raise ValueError("$bucketAuto buckets must be >= 1")
    tagged = df.withColumn("__ba_val", _value(df, spec["groupBy"]))
    vals = tagged.groupBy("__ba_val").agg(F.count(F.lit(1)).alias("__c"))
    # total / cardinality / extrema / null presence in ONE driver
    # action over the distinct-value frame (F.min/F.max skip nulls,
    # matching a scan of the raw data)
    stats = vals.agg(
        F.sum("__c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.min("__ba_val").alias("gmin"),
        F.max("__ba_val").alias("gmax"),
        F.max(F.col("__ba_val").isNull().cast("int")).alias("has_null"),
    ).first()
    total, n_distinct, gmax = (int(stats["total"] or 0),
                               stats["n_distinct"], stats["gmax"])
    if total == 0:
        raise ValueError("$bucketAuto on an empty input")
    max_distinct = int(spec.get("maxDistinct", 1_000_000))
    if n_distinct > max_distinct:
        # the boundary window is a single global-order pass over the
        # distinct-value frame; past ~1M distinct values precompute
        # approx-quantile boundaries and use $bucket instead of letting
        # one task sort a data-scale frame (house guard style: raise,
        # never silently bottleneck)
        raise ValueError(
            f"$bucketAuto: {n_distinct} distinct groupBy values exceeds "
            f"maxDistinct={max_distinct}; use $bucket with "
            "approx-quantile boundaries at this cardinality")
    w = (Window.orderBy(F.col("__ba_val").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, -1))
    bkt = F.least(
        F.floor(F.coalesce(F.sum("__c").over(w), F.lit(0))
                * n_buckets / F.lit(total)),
        F.lit(n_buckets - 1)).cast("int")
    out_spec = dict(spec.get("output") or {"count": {"$sum": 1}})

    if granularity:
        if stats["has_null"] or (stats["gmin"] is not None
                                 and float(stats["gmin"]) < 0):
            raise ValueError(
                "$bucketAuto granularity requires non-null, "
                "non-negative numeric groupBy values")
        # <= `buckets` rows: the preliminary buckets' largest values
        pre_max = sorted(
            (r["__bkt"], float(r["__mx"]))
            for r in vals.select(bkt.alias("__bkt"), "__ba_val")
            .groupBy("__bkt").agg(F.max("__ba_val").alias("__mx"))
            .collect())
        first_min = _granularity_round(float(stats["gmin"]), granularity,
                                       up=False)
        uppers: list[float] = []
        for _, mx in pre_max:
            ub = _granularity_round(mx, granularity, up=True)
            if not uppers or ub > uppers[-1]:
                uppers.append(ub)
        val = F.col("__ba_val").cast("double")
        lowers = [first_min] + uppers[:-1]
        id_col = None
        for lo, hi in zip(lowers, uppers):
            branch = F.struct(F.lit(lo).alias("min"), F.lit(hi).alias("max"))
            id_col = F.when(val < hi, branch) if id_col is None \
                else id_col.when(val < hi, branch)
        grouped = tagged.withColumn("_id", id_col)
        prepped, aggs = _compile_group_aggs(grouped, out_spec,
                                            [F.col("_id")])
        return prepped.groupBy("_id").agg(*aggs)

    # inner join must be NULL-SAFE: plain equi-join drops every row
    # whose groupBy value is null, losing the first-bucket null fold
    vdf = vals.select(F.col("__ba_val").alias("__ba_vv"),
                      bkt.alias("__bkt"))
    assigned = (tagged.join(
        vdf, tagged["__ba_val"].eqNullSafe(vdf["__ba_vv"]))
        .drop("__ba_vv"))
    wb = Window.orderBy("__bkt")
    bounds = (assigned.groupBy("__bkt").agg(
        F.min("__ba_val").alias("__min_nn"),
        F.max(F.col("__ba_val").isNull().cast("int")).alias("__has_null"))
        .withColumn("min", F.when(F.col("__has_null") == 1, F.lit(None))
                    .otherwise(F.col("__min_nn")))
        .withColumn("max", F.coalesce(F.lead("min").over(wb), F.lit(gmax)))
        .select("__bkt", "min", "max"))
    assigned, aggs = _compile_group_aggs(assigned, out_spec,
                                         [F.col("__bkt")])
    grouped = assigned.groupBy("__bkt").agg(*aggs)
    return (grouped.join(bounds, on="__bkt")
            .select(F.struct("min", "max").alias("_id"),
                    *[o for o in out_spec]))


def _vector_search(df: DataFrame, spec: dict) -> DataFrame:
    """$vectorSearch (Atlas vector-search stage) over an embedding
    column.

    `exact: true` (ENN) scores every row with the JVM zip_with cosine
    kernel and takes the top `limit` — Catalyst plans the sort+limit
    as TakeOrderedAndProject (per-partition heaps + driver merge of
    limit rows, never a global sort). The approximate path prefilters
    with multi-table random-hyperplane signatures (the LSH ANN index's
    kernel): only rows whose signature matches the query's in some
    table are scored, trading recall for candidate count exactly like
    the IVF/LSH operators (operators/similarity.py — use those for
    persistent indexes). `numCandidates` sizes the signature width:
    fewer candidates wanted => more bits => smaller buckets.
    `filter` is an MQL criteria document applied BEFORE scoring (it
    participates in parquet pushdown). The score is exposed to later
    stages via {"$meta": "vectorSearchScore"}, as in Mongo, and uses
    Atlas's published normalization per the index `similarity`:
    cosine -> (1 + cos)/2, dotProduct -> (1 + dot)/2, euclidean ->
    1/(1 + d^2) — all in [0, 1], higher = closer."""
    from maggma_spark.operators.similarity import cosine, lsh_signature

    path, qv = spec["path"], list(spec["queryVector"])
    k = int(spec["limit"])
    if k < 1:
        raise ValueError("$vectorSearch limit must be >= 1")
    sim = spec.get("similarity", "cosine")
    if sim not in ("cosine", "dotProduct", "euclidean"):
        raise ValueError(f"$vectorSearch similarity {sim!r} not "
                         "supported (cosine/dotProduct/euclidean)")
    if spec.get("filter"):
        df = df.filter(compile_criteria(spec["filter"], schema=df.schema))
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    if not spec.get("exact", False):
        dim = len(qv)
        ncand = int(spec.get("numCandidates", 10 * k))
        if ncand < k:
            raise ValueError("numCandidates must be >= limit")
        # Atlas semantics: HIGHER numCandidates = broader search. Each
        # signature bit roughly halves a table's bucket population, so
        # candidate count ~ N * tables / 2^bits — make bits INVERSELY
        # related to numCandidates (more candidates wanted => fewer
        # bits => bigger buckets), bounded to a sane range
        import math as _m

        bits = max(4, min(16, 16 - int(_m.log2(max(2, ncand)))))
        tables = 4
        from maggma_spark.operators.similarity import (
            _hyperplane,
            lsh_signature_tables,
        )

        # the query's signatures are CONSTANTS — fold them driver-side
        # with the same plane/sum/threshold sequence the row-side
        # kernel uses (identical IEEE op order => identical bits)
        qsigs = []
        for t in range(tables):
            qsig = 0
            for b in range(bits):
                plane = _hyperplane(dim, t * bits + b)
                proj = 0.0
                for x, p in zip(qv, plane):
                    proj += float(x) * p
                if proj >= 0:
                    qsig |= 1 << b
            qsigs.append(qsig)
        # round-8: ONE packed-bits expression for all tables (plan
        # construction was ~1-3 s with per-bit per-table chains —
        # SCALE.md), matched positionally against the folded constants
        rsigs = lsh_signature_tables(F.col(path), dim, bits, tables)
        qarr = F.array(*[F.lit(q).cast("long") for q in qsigs])
        df = df.filter(F.exists(
            F.zip_with(rsigs, qarr, lambda r, q: r == q),
            lambda hit: hit))
    # score in DOUBLE: float32 embeddings would quantize the cosine to
    # ~1e-7, which both loses ranking resolution and disagrees with
    # any double-precision reference
    v = F.col(path).cast("array<double>")
    if sim == "cosine":
        score = (F.lit(1.0) + cosine(v, qlit)) / F.lit(2.0)
    elif sim == "dotProduct":
        dot = F.aggregate(F.zip_with(v, qlit, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        score = (F.lit(1.0) + dot) / F.lit(2.0)
    else:  # euclidean: 1 / (1 + d^2) — d^2 needs no sqrt
        d2 = F.aggregate(
            F.zip_with(v, qlit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        score = F.lit(1.0) / (F.lit(1.0) + d2)
    scored = df.withColumn("__vector_search_score", score)
    return (scored.orderBy(F.col("__vector_search_score").desc())
            .limit(k))


def _compile_search(df: DataFrame, spec: dict, materialize: bool = False):
    """Shared $search/$searchMeta compiler: returns (predicate, score),
    plus two helper-column dicts when ``materialize`` is set.

    ``materialize`` (round-13, guide §1.2 per-task work): the scoring
    expressions reference the tokenized text and each term's fuzzy
    tf count SEVERAL times (tf twice inside every bm25 term, the
    token array once per term plus once for dl, the padded text once
    per autocomplete token), and the higher-order filter/exists calls
    are CodegenFallback — Catalyst neither fuses nor CSEs them, so
    every reference re-tokenizes (and re-runs the per-token
    levenshtein) per row. With ``materialize`` the compiler registers
    those subtrees as named helper columns and references the
    columns instead; callers stack them with two ``withColumns``
    calls (level 2 references level 1) and drop them after the
    filter/score projection. Measured ×1.4 on the fuzzy-scoring scan
    fragment; values are bit-identical (same trees, evaluated once).

    Atlas lexical search (the reference compiles $text into Atlas
    $search pipelines, reference:src/maggma/api/resource/utils.py:69-115)
    re-expressed as the bm25_rank two-job shape (functions/text.py):
    ONE corpus-stats aggregate (N, per-path length sums, per-term and
    per-phrase document frequencies — scalar row, folded into literals)
    and a pure-JVM scoring scan. No join, no shuffle; at 100 TB the
    stats pass is one scan and scoring pipelines into whatever follows.

    Operators: `text` (BM25 sum over query terms; `path` may be a
    string or list — list scores sum, predicate ORs), `phrase`
    (contiguous token sequence as one pseudo-term, slop unsupported),
    `equals`, `range` (gt/gte/lt/lte), `exists`, `in`, `wildcard` /
    `regex` (keyword semantics: whole-value LIKE / anchored rlike),
    `autocomplete` (token-prefix, tokenOrder any|sequential), `near`
    (Atlas pivot decay pivot/(pivot+dist); numeric or date origin,
    geo raises), and `compound` with must/mustNot/should/filter +
    minimumShouldMatch (defaults to 1 when only should clauses
    constrain, as in Atlas). Non-scoring clauses (equals/range/exists/
    in/wildcard/regex/autocomplete/filter) contribute Atlas's constant
    score 1 / 0; every clause accepts `score: {boost: {value}}` /
    `{constant: {value}}`. Phrase tf counts non-overlapping padded
    occurrences in the normalized text — self-overlapping phrases
    ("a a" in "a a a") undercount vs Lucene's sloppy counter."""
    import math as _m

    from maggma_spark.functions.text import normalized_text, tokens

    K1, B = 1.2, 0.75
    spec = dict(spec)
    spec.pop("index", None)
    spec.pop("sort", None)  # consumed by _search
    if len(spec) != 1:
        raise ValueError(
            "$search takes exactly one operator (plus optional "
            "index/sort)")
    ((op0, args0),) = spec.items()

    def _paths(args):
        p = args["path"]
        return p if isinstance(p, list) else [p]

    def _terms(args):
        qs = args["query"]
        qs = qs if isinstance(qs, list) else [qs]
        out: list[str] = []
        for q in qs:
            for t in q.lower().split():
                if t and t not in out:
                    out.append(t)
        return out

    def _fuzzy_key(args):
        """Normalized (maxEdits, prefixLength) for a text clause's
        `fuzzy` option, or None. Atlas fuzzy: maxEdits 1|2 (default
        2), prefixLength exact-prefix chars (default 0). maxExpansions
        caps the INDEX's candidate-term expansion — with no index we
        match every in-document token within the edit budget, a
        superset of any capped expansion (DEVIATIONS §21). Lucene
        measures Damerau-Levenshtein (transposition = 1 edit); Spark's
        levenshtein counts it as 2 — documented there too."""
        fz = args.get("fuzzy")
        if fz is None:
            return None
        extra = set(fz) - {"maxEdits", "prefixLength", "maxExpansions"}
        if extra:
            raise ValueError(
                f"$search text fuzzy options {sorted(extra)} are not "
                "supported")
        me = int(fz.get("maxEdits", 2))
        if me not in (1, 2):
            raise ValueError("fuzzy maxEdits must be 1 or 2")
        return me, int(fz.get("prefixLength", 0))

    def _fuzzy_tok(x, t, fzkey):
        me, pl = fzkey
        # threshold form short-circuits: -1 past the edit budget
        cond = F.levenshtein(x, F.lit(t), me) != F.lit(-1)
        if pl:
            cond = cond & x.startswith(t[:pl])
        return cond

    def _tok_match(t, fzkey):
        """One-arg element predicate for F.filter/F.exists. A real
        closure, NOT a defaulted lambda: pyspark's higher-order
        functions count the callable's parameters (defaults included)
        and would pass the element INDEX into a default arg."""
        if fzkey is None:
            def m(x):
                return x == F.lit(t)
        else:
            def m(x):
                return _fuzzy_tok(x, t, fzkey)
        return m

    # ---- phase 1: walk the tree, register every stats requirement
    term_reqs: list[tuple] = []              # (path, term, fuzzy_key)
    phrase_reqs: list[tuple[str, str]] = []  # (path, normalized phrase)
    len_paths: list[str] = []

    def walk(op, args):
        if op == "compound":
            for key in ("must", "mustNot", "should", "filter"):
                for sub in args.get(key, ()):
                    ((o, a),) = sub.items()
                    walk(o, a)
            return
        if op in ("text", "phrase"):
            for p in _paths(args):
                if p not in len_paths:
                    len_paths.append(p)
                if op == "text":
                    fzkey = _fuzzy_key(args)
                    for t in _terms(args):
                        if (p, t, fzkey) not in term_reqs:
                            term_reqs.append((p, t, fzkey))
                else:
                    ph = " ".join(args["query"].lower().split())
                    if not ph:
                        raise ValueError("phrase query must be non-empty")
                    if (p, ph) not in phrase_reqs:
                        phrase_reqs.append((p, ph))

    walk(op0, args0)

    def toks_of(p):
        return tokens(normalized_text(_value(df, f"${p}")))

    def padded_of(p):
        return F.concat(F.lit(" "),
                        normalized_text(_value(df, f"${p}")), F.lit(" "))

    # helper-column registries (materialize mode). Level 1 holds the
    # tokenized / padded text per path; level 2 holds per-(path, term,
    # fuzzy) tf counts, whose exprs reference level-1 COLUMNS — the
    # caller must apply them as two consecutive withColumns calls.
    # The stats aggregate below deliberately keeps the inline trees:
    # it is ONE pass either way.
    base_cols: dict = {}
    tf_cols: dict = {}
    _toks_names: dict = {}
    _pad_names: dict = {}
    _tf_names: dict = {}

    def toks_ref(p):
        if not materialize:
            return toks_of(p)
        nm = _toks_names.get(p)
        if nm is None:
            nm = f"__srch_toks_{len(_toks_names)}"
            _toks_names[p] = nm
            base_cols[nm] = toks_of(p)
        return F.col(nm)

    def pad_ref(p):
        if not materialize:
            return padded_of(p)
        nm = _pad_names.get(p)
        if nm is None:
            nm = f"__srch_pad_{len(_pad_names)}"
            _pad_names[p] = nm
            base_cols[nm] = padded_of(p)
        return F.col(nm)

    def tf_ref(p, t, fzkey):
        expr = F.size(F.filter(toks_ref(p), _tok_match(t, fzkey)))
        if not materialize:
            return expr
        key = (p, t, fzkey)
        nm = _tf_names.get(key)
        if nm is None:
            nm = f"__srch_tf_{len(_tf_names)}"
            _tf_names[key] = nm
            tf_cols[nm] = expr
        return F.col(nm)

    stats = None
    if len_paths:  # ONE driver action for every scoring constant
        aggs = [F.count(F.lit(1)).alias("n")]
        for i, p in enumerate(len_paths):
            aggs.append(F.sum(F.size(toks_of(p))).alias(f"len__{i}"))
        for i, (p, t, fzkey) in enumerate(term_reqs):
            if fzkey is None:
                hit = F.array_contains(toks_of(p), t)
            else:
                hit = F.exists(toks_of(p), _tok_match(t, fzkey))
            aggs.append(F.sum(hit.cast("long")).alias(f"df__{i}"))
        for i, (p, ph) in enumerate(phrase_reqs):
            aggs.append(F.sum(F.contains(padded_of(p),
                                         F.lit(f" {ph} "))
                              .cast("long")).alias(f"pdf__{i}"))
        stats = df.agg(*aggs).first()

    def bm25(path, tf, df_count):
        n = stats["n"]
        avgdl = (stats[f"len__{len_paths.index(path)}"] / n) if n else 1.0
        idf = _m.log(1.0 + (n - df_count + 0.5) / (df_count + 0.5))
        dl = F.size(toks_ref(path))
        return F.lit(idf) * (
            tf * (K1 + 1.0)
            / (tf + K1 * (1.0 - B + B * dl / F.lit(avgdl))))

    # options that would silently change semantics if ignored raise
    _ALLOWED = {"text": {"query", "path", "score", "fuzzy"},
                "phrase": {"query", "path", "slop", "score"},
                "equals": {"path", "value", "score"},
                "range": {"path", "gt", "gte", "lt", "lte", "score"},
                "exists": {"path", "score"},
                "in": {"path", "value", "score"},
                "wildcard": {"query", "path", "allowAnalyzedField",
                             "score"},
                "regex": {"query", "path", "allowAnalyzedField", "score"},
                "autocomplete": {"query", "path", "tokenOrder", "score"},
                "near": {"path", "origin", "pivot", "score"},
                "compound": {"must", "mustNot", "should", "filter",
                             "minimumShouldMatch"}}

    def _score_opt(score, args):
        """Atlas per-clause `score` option: {boost: {value}} multiplies,
        {constant: {value}} replaces. `boost.path`/`function` score
        expressions are not modeled (raise)."""
        opt = args.get("score")
        if opt is None:
            return score
        if not isinstance(opt, dict) or len(opt) != 1:
            raise ValueError("$search score takes exactly one of "
                             "boost/constant")
        ((kind, body),) = opt.items()
        if kind == "boost" and set(body) == {"value"}:
            return score * F.lit(float(body["value"]))
        if kind == "constant" and set(body) == {"value"}:
            return F.lit(float(body["value"]))
        raise ValueError(
            f"$search score option {kind!r} with keys "
            f"{sorted(body)} is not supported (boost.value / "
            "constant.value only)")

    def _wildcard_like(q: str) -> str:
        """Translate Atlas/Lucene wildcard (* ? with \\ escapes) to a
        SQL LIKE pattern, escaping LIKE's own metacharacters."""
        out, i = [], 0
        while i < len(q):
            c = q[i]
            if c == "\\" and i + 1 < len(q):
                nxt = q[i + 1]
                out.append("\\" + nxt if nxt in "%_\\" else nxt)
                i += 2
                continue
            if c == "*":
                out.append("%")
            elif c == "?":
                out.append("_")
            elif c in "%_":
                out.append("\\" + c)
            elif c == "\\":  # trailing lone backslash: match literally
                out.append("\\\\")
            else:
                out.append(c)
            i += 1
        return "".join(out)

    # ---- phase 2: compile each clause to (predicate, score)
    def clause(op, args):
        if op in _ALLOWED:
            extra = set(args) - _ALLOWED[op]
            if extra:
                raise ValueError(
                    f"$search {op} options {sorted(extra)} are not "
                    "supported")
        if op == "text":
            fzkey = _fuzzy_key(args)
            score = F.lit(0.0)
            for p in _paths(args):
                for t in _terms(args):
                    tf = tf_ref(p, t, fzkey)
                    score = score + bm25(p, tf, stats[
                        f"df__{term_reqs.index((p, t, fzkey))}"])
            return score > 0, _score_opt(score, args)
        if op == "phrase":
            if args.get("slop"):
                raise ValueError("$search phrase slop is not supported")
            ph = " ".join(args["query"].lower().split())
            pad = f" {ph} "
            score = F.lit(0.0)
            for p in _paths(args):
                padded = pad_ref(p)
                tf = ((F.length(padded)
                       - F.length(F.replace(padded, F.lit(pad))))
                      / F.lit(len(pad))).cast("int")
                score = score + bm25(p, tf, stats[
                    f"pdf__{phrase_reqs.index((p, ph))}"])
            return score > 0, _score_opt(score, args)
        if op in ("equals", "range", "exists", "in"):
            col = _value(df, "$" + args["path"])
            if op == "equals":
                pred = col == _lit(args["value"])
            elif op == "exists":
                pred = col.isNotNull()
            elif op == "in":
                pred = col.isin(list(args["value"]))
            else:
                pred = F.lit(True)
                for key, cmp in (("gt", col.__gt__), ("gte", col.__ge__),
                                 ("lt", col.__lt__), ("lte", col.__le__)):
                    if key in args:
                        pred = pred & cmp(_lit(args[key]))
            return pred, F.when(
                pred, _score_opt(F.lit(1.0), args)).otherwise(0.0)
        if op in ("wildcard", "regex"):
            # keyword semantics: the pattern matches the WHOLE raw
            # field value (Atlas keyword-analyzer behavior);
            # allowAnalyzedField's per-token matching against analyzer
            # output is an index-internals behavior not modeled here
            # (DEVIATIONS §21).
            q = args["query"]
            pred = F.lit(False)
            for p in _paths(args):
                col = _value(df, "$" + p).cast("string")
                if op == "wildcard":
                    pred = pred | col.like(_wildcard_like(q))
                else:
                    pred = pred | col.rlike(f"^(?:{q})$")
            return pred, F.when(
                pred, _score_opt(F.lit(1.0), args)).otherwise(0.0)
        if op == "autocomplete":
            # token-prefix match over the normalized text: " t" in the
            # space-padded text <=> some token starts with t.
            # tokenOrder "any" (default): every query token is a token
            # prefix somewhere; "sequential": the tokens appear
            # contiguously in order, last one as a prefix. Constant
            # score (Atlas edgeGram scoring is index-internal).
            ts = _terms(args)
            if not ts:
                raise ValueError("autocomplete query must be non-empty")
            order = args.get("tokenOrder", "any")
            if order not in ("any", "sequential"):
                raise ValueError(f"autocomplete tokenOrder {order!r}")
            pred = F.lit(False)
            for p in _paths(args):
                padded = pad_ref(p)
                if order == "sequential":
                    sub = F.contains(padded, F.lit(" " + " ".join(ts)))
                else:
                    sub = F.lit(True)
                    for t in ts:
                        sub = sub & F.contains(padded, F.lit(" " + t))
                pred = pred | sub
            return pred, F.when(
                pred, _score_opt(F.lit(1.0), args)).otherwise(0.0)
        if op == "near":
            # Atlas's published decay: score = pivot / (pivot + dist).
            # Numeric origin -> |x - origin|; date origin -> millisecond
            # distance (pivot in ms). Geo points unsupported (raise;
            # $geoNear disposition, DEVIATIONS §15).
            origin, pivot = args["origin"], args["pivot"]
            if isinstance(origin, dict):
                raise ValueError("$search near geo origins are not "
                                 "supported (DEVIATIONS §15)")
            if not float(pivot) > 0:
                raise ValueError("$search near pivot must be > 0")
            score = F.lit(0.0)
            pred = F.lit(False)
            for p in _paths(args):
                col = _value(df, "$" + p)
                if isinstance(origin, str):  # ISO date string
                    dist = F.abs(
                        F.unix_millis(col.cast("timestamp"))
                        - F.unix_millis(F.lit(origin).cast("timestamp")))
                else:
                    dist = F.abs(col - F.lit(origin))
                here = col.isNotNull()
                score = score + F.when(
                    here,
                    F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)
                ).otherwise(0.0)
                pred = pred | here
            return pred, _score_opt(score, args)
        if op == "compound":
            groups = {k: [clause(*next(iter(s.items())))
                          for s in args.get(k, ())]
                      for k in ("must", "mustNot", "should", "filter")}
            pred = F.lit(True)
            for p, _ in groups["must"] + groups["filter"]:
                pred = pred & p
            for p, _ in groups["mustNot"]:
                pred = pred & ~F.coalesce(p, F.lit(False))
            msm = args.get(
                "minimumShouldMatch",
                0 if (groups["must"] or groups["filter"]) else
                (1 if groups["should"] else 0))
            if groups["should"] and msm:
                matched = sum(
                    (F.coalesce(p, F.lit(False)).cast("int")
                     for p, _ in groups["should"]), F.lit(0))
                pred = pred & (matched >= msm)
            score = F.lit(0.0)
            for _, s in groups["must"]:
                score = score + s
            for p, s in groups["should"]:
                score = score + F.when(
                    F.coalesce(p, F.lit(False)), s).otherwise(0.0)
            return pred, score
        raise ValueError(f"unsupported $search operator {op!r}")

    pred0, score0 = clause(op0, args0)
    if materialize:
        return pred0, score0, base_cols, tf_cols
    return pred0, score0


def _search(df: DataFrame, spec: dict) -> DataFrame:
    """$search: filter to matching docs, rank by relevance score
    descending (Mongo returns $search results score-ordered). The
    declared global sort folds into TakeOrderedAndProject whenever a
    $limit follows — the common Atlas idiom and the 100 TB plan; an
    unlimited ranked scan is what the user asked for otherwise. The
    score surfaces via {"$meta": "searchScore"} and the internal
    column is dropped at pipeline end unless projected. An Atlas
    `sort` option replaces the score ordering with a field sort
    (score ties broken Atlas-style is index-internal; here the field
    sort is total if the caller makes it so)."""
    pred, score, p1, p2 = _compile_search(df, spec, materialize=True)
    base = df
    if p1:
        base = base.withColumns(p1)
    if p2:
        base = base.withColumns(p2)
    out = (base.filter(pred).withColumn("__search_score", score)
           .drop(*p1, *p2))
    sort = spec.get("sort") if isinstance(spec, dict) else None
    if sort:
        order = [F.col(k).asc() if d > 0 else F.col(k).desc()
                 for k, d in sort.items()]
        return out.orderBy(*order)
    return out.orderBy(F.col("__search_score").desc())


def _search_meta(df: DataFrame, spec: dict) -> DataFrame:
    """$searchMeta: search metadata without materializing results.

    Count form: a single aggregate row {count: {lowerBound, total}}
    (both exact here: a columnar count IS exact, Atlas's lowerBound
    distinction is an index-internals artifact).

    Facet form ({"facet": {"operator": ..., "facets": {...}}}):
    string facets group-count the path and keep the top `numBuckets`
    (default 10) by count desc, _id asc — a bounded collect; number
    facets bucket by the `boundaries` ladder (+ optional `default`)
    in boundary order. Facet bucket ids are STRINGS (a columnar
    struct cannot mix the number boundaries with a string default
    bucket id). Each facet is one groupBy; single-row results
    crossJoin together — the same shape as $facet. Date facets and
    Atlas's 1000-bucket cap beyond numBuckets are unsupported
    (raise)."""
    if isinstance(spec, dict) and set(spec) - {"index"} == {"facet"}:
        fs = dict(spec["facet"])
        unknown = set(fs) - {"operator", "facets"}
        if unknown:
            raise ValueError(
                f"$searchMeta facet options {sorted(unknown)}")
        if fs.get("operator"):
            pred, _sc, p1, p2 = _compile_search(
                df, fs["operator"], materialize=True)
            base = df
            if p1:
                base = base.withColumns(p1)
            if p2:
                base = base.withColumns(p2)
            base = base.filter(pred).drop(*p1, *p2)
        else:
            base = df.filter(F.lit(True))
        out = base.agg(F.count(F.lit(1)).alias("__total"))
        facet_cols = []
        for name, fd in fs["facets"].items():
            ftype, path = fd.get("type"), fd["path"]
            if ftype == "string":
                nb = int(fd.get("numBuckets", 10))
                counts = (base.groupBy(
                    F.col(path).cast("string").alias("_id"))
                    .agg(F.count(F.lit(1)).alias("count"))
                    .orderBy(F.col("count").desc(), F.col("_id").asc())
                    .limit(nb))
                item = F.struct(
                    (-F.col("count")).alias("__neg"),
                    F.col("_id").alias("_id"),
                    F.col("count").alias("count"))
                arr = F.sort_array(F.collect_list(item))
                one = counts.agg(F.transform(
                    arr, lambda s: F.struct(
                        s["_id"].alias("_id"),
                        s["count"].alias("count"))).alias(name))
            elif ftype == "number":
                bounds = list(fd["boundaries"])
                if sorted(bounds) != bounds or len(bounds) < 2:
                    raise ValueError(
                        f"facet {name!r}: boundaries must be an "
                        "ascending list of >= 2 values")
                col = F.col(path)
                bucket = None
                for lo, hi in zip(bounds, bounds[1:]):
                    cond = (col >= F.lit(lo)) & (col < F.lit(hi))
                    lbl = F.lit(str(lo))
                    bucket = (F.when(cond, lbl) if bucket is None
                              else bucket.when(cond, lbl))
                if "default" in fd:
                    bucket = bucket.otherwise(F.lit(str(fd["default"])))
                order = {str(lo): i for i, lo in enumerate(bounds[:-1])}
                order[str(fd.get("default"))] = len(bounds)
                counts = (base.withColumn("__fb", bucket)
                          .filter(F.col("__fb").isNotNull())
                          .groupBy(F.col("__fb").alias("_id"))
                          .agg(F.count(F.lit(1)).alias("count")))
                pos = None
                for lbl, i in order.items():
                    pos = (F.when(F.col("_id") == lbl, F.lit(i))
                           if pos is None
                           else pos.when(F.col("_id") == lbl, F.lit(i)))
                item = F.struct(pos.alias("__pos"),
                                F.col("_id").alias("_id"),
                                F.col("count").alias("count"))
                one = counts.agg(F.transform(
                    F.sort_array(F.collect_list(item)),
                    lambda s: F.struct(
                        s["_id"].alias("_id"),
                        s["count"].alias("count"))).alias(name))
            else:
                raise ValueError(
                    f"facet {name!r}: type must be string|number, "
                    f"got {ftype!r}")
            out = out.crossJoin(one)
            facet_cols.append(name)
        return out.select(
            F.struct(F.col("__total").alias("lowerBound"),
                     F.col("__total").alias("total")).alias("count"),
            F.struct(*[
                F.struct(F.coalesce(
                    F.col(n),
                    F.array().cast(
                        "array<struct<_id:string,count:bigint>>"))
                    .alias("buckets")).alias(n)
                for n in facet_cols]).alias("facet"))
    pred, _sc, p1, p2 = _compile_search(df, spec, materialize=True)
    base = df
    if p1:
        base = base.withColumns(p1)
    if p2:
        base = base.withColumns(p2)
    cnt = F.count(F.lit(1))
    return base.filter(pred).agg(
        F.struct(F.struct(cnt.alias("lowerBound"),
                          cnt.alias("total")).alias("count")).alias("meta")
    ).select(F.col("meta.count").alias("count"))


def _graph_lookup(df: DataFrame, spec: dict,
                  stores: Optional[dict]) -> DataFrame:
    """$graphLookup: bounded-depth BFS over the `from` collection.

    Node identity is the `connectToField` value (the usual org-chart /
    graph-table shape; Mongo uses _id identity, which a set-based
    engine has no access to — DEVIATIONS.md §14). Each BFS round is one
    equi-join on the node id with lineage truncation; `maxDepth` bounds
    the rounds (default 20 — Mongo's unbounded default would be an
    unbounded iterative job at 100 TB, so the bound is explicit here).
    """
    frm = spec["from"]
    if isinstance(frm, str):
        frm = _resolve_store(frm, stores)
    fdf = frm if isinstance(frm, DataFrame) else frm.df
    ct, cf, as_name = (spec["connectToField"], spec["connectFromField"],
                       spec["as"])
    max_depth = int(spec.get("maxDepth", 20))
    depth_field = spec.get("depthField")

    # pin the row ids: monotonically_increasing_id is nondeterministic
    # across re-evaluations (partition layout can shift between the BFS
    # rounds and the final join-back), so materialize src ONCE — the
    # checkpointed ids are what every BFS frame and the final join see
    src = df.withColumn(
        "__gl_id", F.monotonically_increasing_id()).localCheckpoint(
        eager=True)
    nodes = fdf.select(F.col(ct).alias("__node"),
                       F.col(cf).alias("__next")).distinct()
    frontier = src.select(
        "__gl_id", _value(df, spec["startWith"]).alias("__node")).distinct()
    reached = None
    live: list = []  # previous round's checkpoint handles
    # ONE driver action per BFS round (round-13, guide §5): both
    # round checkpoints are LAZY, and the emptiness probe is a FULL
    # count of the frontier — the one action that materializes the
    # frontier blocks deterministically (limit(1) would early-exit
    # and leave later partitions to compute under a different job)
    # and, through the anti-join's read of `reached`, the reached
    # blocks too. The eager form paid three driver actions per round
    # (two checkpoint jobs + the probe), each with a fixed job floor.
    for depth in range(max_depth + 1):
        step = frontier.join(nodes, on="__node")
        found = (step.select("__gl_id", "__node")
                 .withColumn("__depth", F.lit(depth)))
        reached = found if reached is None else reached.unionByName(found)
        reached = reached.localCheckpoint(eager=False)
        frontier = (step.select("__gl_id",
                                F.col("__next").alias("__node"))
                    .distinct()
                    .join(reached.select("__gl_id", "__node"),
                          on=["__gl_id", "__node"], how="left_anti")
                    .localCheckpoint(eager=False))
        n_frontier = frontier.count()
        # both this round's frames are materialized by the count —
        # the previous round's checkpoint blocks are unreachable;
        # free them for real (graph._free_blocks) so BFS storage
        # doesn't grow with depth
        from maggma_spark.operators.graph import _free_blocks

        for h in live:
            _free_blocks(h)
        live = [reached, frontier]
        if n_frontier == 0:
            break
    reached = (reached.groupBy("__gl_id", "__node")
               .agg(F.min("__depth").alias("__depth")))
    docs = reached.join(fdf, reached["__node"] == fdf[ct])
    member = F.struct(*fdf.columns, *(
        [F.col("__depth").alias(depth_field)] if depth_field else []))
    arrays = (docs.groupBy("__gl_id")
              .agg(F.collect_list(member).alias(as_name)))
    joined = src.join(arrays, on="__gl_id", how="left")
    elem_t = dict(zip(joined.columns,
                      (f.dataType for f in joined.schema.fields)))[as_name]
    return (joined.withColumn(
        as_name, F.coalesce(F.col(as_name),
                            F.array().cast(elem_t.simpleString())))
        .drop("__gl_id"))


# Mongo $setWindowFields range-`unit` offsets in milliseconds; the
# calendar units (year/quarter/month) have no fixed width and raise
_RANGE_UNIT_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
                  "hour": 3_600_000, "day": 86_400_000,
                  "week": 7 * 86_400_000}


def _order_cols(sort: dict) -> list:
    return [F.col(k).asc() if v > 0 else F.col(k).desc()
            for k, v in sort.items()]


def _min_rows_per_range(spark) -> int:
    """Target minimum rows per scaffold range (round-9): every
    per-range stage schedules one task per range, so at small data
    fewer/wider ranges beat the default shuffle-partition count —
    measured 25-35% off the global-window bench rows at sf0.1. Large
    inputs hit the shuffle-partition cap and keep full parallelism.
    Conf: spark.maggma.globalWindow.minRowsPerRange (0 disables)."""
    return int(spark.conf.get(
        "spark.maggma.globalWindow.minRowsPerRange", "20000"))


def _global_scaffold(df: DataFrame, sort: dict, bs: list = None):
    """Shared scale shape for UNPARTITIONED global-order windows: the
    naive compile is a single-task sort of the whole dataset
    (Exchange SinglePartition + Window), a non-starter at 100 TB.
    Instead: stamp a DETERMINISTIC range id on the first sort key
    (boundaries computed once and baked in as literals — see
    functions/partitioning.py for why spark_partition_id over
    repartitionByRange silently mis-stitches carries across jobs),
    window per range id, and let callers fold a one-row-per-range
    boundary aggregate driver-side and broadcast it back. Equal sort
    keys always share a range id, which the rank offsets and carry
    folds rely on. The only driver materialization is the boundary
    scalars plus N carry rows, so the plan is identical at sf0.01 and
    at 100 TB."""
    from pyspark.sql import Window

    from maggma_spark.functions.partitioning import (
        range_boundaries,
        range_pid,
    )

    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (first_key, first_dir), = list(sort.items())[:1] or [(None, 1)]
    total = None
    if bs is None:
        # callers running SEVERAL passes over one sortBy (fills +
        # shifts + the scaffold pass of a single $setWindowFields)
        # precompute the boundaries once — the split values depend
        # only on the sort field, and each pass re-running this
        # percentile action over ever-heavier lineage was ~1/3 of the
        # multi-pass build cost at bench SF (SCALE.md round-9).
        # The probe's row count rides along (round-13): callers use
        # it to bound join-back broadcasts without a second action.
        bs, total = range_boundaries(
            df, first_key, n,
            min_rows_per_range=_min_rows_per_range(df.sparkSession),
            with_total=True)
    ranged = df.withColumn(
        "__gw_pid", range_pid(df, first_key, bs,
                              descending=first_dir < 0))
    wloc = Window.partitionBy("__gw_pid").orderBy(*_order_cols(sort))
    ranged = ranged.withColumn("__gw_rn", F.row_number().over(wloc))
    return ranged, wloc, bs, total


def _carry_df(spark, rows: list[dict], fields: list):
    """Broadcast-able carry frame (__gw_pid + per-partition carry
    scalars); `fields` are (name, DataType) pairs."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        [StructField("__gw_pid", IntegerType(), False)]
        + [StructField(nm, dt, True) for nm, dt in fields])
    return F.broadcast(spark.createDataFrame(
        [tuple(r[f] for f in ["__gw_pid"] + [nm for nm, _ in fields])
         for r in rows], schema))


# max copies of a row the finite-range replication path may fan out
# to neighboring ranges: the factor is ~ frame_width / range_span, so
# past this the frame is too wide for the current range count — raise
# and ask for partitionBy (or fewer, wider ranges) instead of silently
# multiplying the shuffle volume
MAX_RANGE_REPLICATION = 32

# one kernel task of the global running-percentile selection holds one
# value-bucket's (g, v) element pairs (~16 B each in Arrow) — 50M
# elements ~= 800 MB, past which the job should have been decomposed
MAX_PCTL_BUCKET_ELEMENTS = 50_000_000

# a global $shift folds |by| edge rows per scaffold range driver-side;
# a frame-sized shift belongs under partitionBy, not in a broadcast
MAX_SHIFT_CARRY = 1024

# logical-plan markers that make re-executing the upstream lineage per
# driver action expensive: shuffles (Join/Aggregate/Deduplicate/
# Expand), per-range windows, lateral generators, and Python stages.
# A plan with none of these is scan/filter/project, where a re-scan
# with pushdown is cheaper than writing a full checkpoint.
_HEAVY_PLAN_MARKERS = ("Join", "Aggregate", "Window", "Generate",
                       "InPandas", "CoGroup", "Expand", "Deduplicate",
                       "InPython")


def _maybe_checkpoint_global_input(df: DataFrame) -> DataFrame:
    """Materialize the input of an unpartitioned global-order pass ONCE
    when its lineage is non-trivial. The scaffold family (_swf_global /
    _fill_global / _shift_global) runs 2-5 driver actions each (range
    boundaries, boundary/carry aggregates, slim checkpoints), and each
    action re-analyzes and re-executes the full upstream plan — in a
    multi-stage $setWindowFields pipeline the later stage's actions
    re-ran the earlier stage's windows and joins 3-5x (round-8: ~95% of
    swf_global_frames_suite's 11 s bench cost was exactly this, SCALE.md
    round-9). One localCheckpoint turns those re-executions into
    in-memory block reads. LAZY (eager=False, round-10): the scaffold's
    own first action (the range-boundary percentile) materializes the
    blocks as a side effect, so the checkpoint costs zero dedicated
    driver actions — the measured ~1 s/action fixed floor (Python
    worker startup + codegen per job) was the single biggest bench
    line item of the global-window family.

    `spark.maggma.globalWindow.checkpoint`: `auto` (default) checkpoints
    only when the optimized plan contains a shuffle/window/Python stage
    — a bare scan+filter+project re-executes cheaper than it writes, and
    an already-checkpointed frame (LogicalRDD) is skipped by the same
    test; `always` / `never` override both directions. `never` is the
    escape hatch for clusters where executor churn makes localCheckpoint
    blocks (non-reconstructible lineage) too risky to hold."""
    mode = df.sparkSession.conf.get(
        "spark.maggma.globalWindow.checkpoint", "auto")
    if mode == "never":
        return df
    if mode != "always":
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if not any(m in plan for m in _HEAVY_PLAN_MARKERS):
            return df
    return df.localCheckpoint(eager=False)

# Window accumulators whose finite-frame value decomposes through
# subtractable cumulative moments (sum/count/sum-of-squares/
# cross-moment). $min/$max/$percentile are NOT here: min has no
# inverse, percentile no partial.
_INVERTIBLE_WINDOW_OPS = {"$sum", "$avg", "$stdDevPop", "$stdDevSamp",
                          "$covariancePop", "$covarianceSamp"}


def _agg_type(df: DataFrame, col: Column):
    """Resolved data type of an expression against df (analysis only,
    nothing executes) — used to pin the differenced finite-frame
    result to the exact type the direct sliding aggregate would have
    had (decimal sums widen by 1 digit under subtraction)."""
    return df.select(col.alias("__t")).schema[0].dataType


def _growing_cum_rows(ordered, lo: int, hi: int):
    """Finite ROWS frame [lo, hi] as the difference of two GROWING
    frames: cum(ub, hi) - cum(ub, lo-1). Spark evaluates a growing
    frame (UnboundedPrecedingWindowFunctionFrame) in O(1) amortized
    per row — rows are only ever ADDED to the buffer — while the
    direct sliding compile (SlidingWindowFunctionFrame) re-aggregates
    the whole buffer every time the lower bound moves: O(width)/row,
    the measured 38-89 s at 10M rows / W=1000 in SCALE.md round-7.
    Both cumulatives share one (partition, order) spec, so they run
    in ONE WindowExec over one sort — tied-key traversal is
    identical for both terms and the difference is exact."""
    from pyspark.sql import Window

    g_hi = ordered.rowsBetween(Window.unboundedPreceding, hi)
    g_lo = ordered.rowsBetween(Window.unboundedPreceding, lo - 1)

    def cum(fn, expr):
        z = F.lit(0)
        return (F.coalesce(fn(expr).over(g_hi), z)
                - F.coalesce(fn(expr).over(g_lo), z))
    return cum


def _growing_cum_axis(wpart, axis: Column, lo: int, hi: int):
    """Finite frame [lo, hi] over a UNIQUE non-null integer axis
    (the global scaffold's row number): same two-growing-frames
    difference as _growing_cum_rows, expressed as range frames on
    the axis so it works on the replicated-destination partitions."""
    from pyspark.sql import Window

    asc = wpart.orderBy(axis.asc())
    g_hi = asc.rangeBetween(Window.unboundedPreceding, hi)
    g_lo = asc.rangeBetween(Window.unboundedPreceding, lo - 1)

    def cum(fn, expr):
        z = F.lit(0)
        return (F.coalesce(fn(expr).over(g_hi), z)
                - F.coalesce(fn(expr).over(g_lo), z))
    return cum


def _growing_cum_range(wpart, axis: Column, alo: int, ahi: int):
    """Finite VALUE-RANGE frame [alo, ahi] on a continuous axis via
    three inclusion-exclusion terms, all O(1)-amortized per row:

        frame(x) = {y : x+alo <= y <= x+ahi}
                 = cum_asc(y <= x+ahi) + cum_desc(y >= x+alo) - total

    (every value is <= x+ahi or >= x+alo since alo <= ahi, so the
    union is the whole partition and the overlap is exactly the
    frame). cum_desc is a growing frame over the DESCENDING axis —
    a continuous axis has no "alo - 1" exclusive bound, hence the
    complement form instead of _growing_cum_rows' two-term one.
    Null-axis rows (Mongo sorts them together; a range frame over
    them is their null-peer group) are masked out of the three
    difference terms and answered from a null-peer aggregate carried
    on the whole-partition frame, so null ordering conventions never
    leak into the arithmetic. Costs two sorts of the partition
    (asc + desc) instead of one — still O(n log n), vs O(n*width)."""
    from pyspark.sql import Window

    asc = wpart.orderBy(axis.asc_nulls_first())
    g_hi = asc.rangeBetween(Window.unboundedPreceding, ahi)
    # descending order: Spark's range offset is SUBTRACTED from the
    # current value, so bound -alo means "values >= x + alo"
    g_lo = (wpart.orderBy(axis.desc_nulls_last())
            .rangeBetween(Window.unboundedPreceding, -alo))
    tot = asc.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)

    def cum(fn, expr):
        nn = F.when(axis.isNotNull(), expr)
        z = F.lit(0)
        diff = (F.coalesce(fn(nn).over(g_hi), z)
                + F.coalesce(fn(nn).over(g_lo), z)
                - F.coalesce(fn(nn).over(tot), z))
        npeer = F.coalesce(
            fn(F.when(axis.isNull(), expr)).over(tot), z)
        return F.when(axis.isNull(), npeer).otherwise(diff)
    return cum


def _frame_from_cum(op: str, v: Column, cum) -> Column:
    """Express an invertible window accumulator through `cum(fn,
    expr)` — the frame-restricted aggregate built from growing-frame
    cumulatives. For $covariance* `v` is the pair struct (x, y),
    null unless BOTH sides are non-null, matching covar_* skip
    semantics. Moment recombination carries the same cancellation
    caveat as the carry folds (~log10(mean^2/var) digits)."""
    if op == "$sum":
        return cum(F.sum, v)
    if op == "$avg":
        n = cum(F.count, v)
        return F.when(n > 0, cum(F.sum, v.cast("double")) / n)
    if op in ("$stdDevPop", "$stdDevSamp"):
        vd = v.cast("double")
        n = cum(F.count, vd).cast("double")
        s = cum(F.sum, vd)
        q = cum(F.sum, vd * vd)
        if op == "$stdDevPop":
            var = F.when(n > 0, F.greatest(
                q / n - (s / n) * (s / n), F.lit(0.0)))
        else:
            var = F.when(n > 1, F.greatest(
                (q - s * s / n) / (n - 1), F.lit(0.0)))
        return F.sqrt(var)
    n = cum(F.count, v).cast("double")
    sx = cum(F.sum, v["x"])
    sy = cum(F.sum, v["y"])
    sxy = cum(F.sum, v["x"] * v["y"])
    if op == "$covariancePop":
        return F.when(n > 0, sxy / n - (sx / n) * (sy / n))
    return F.when(n > 1, (sxy - sx * sy / n) / (n - 1))


# group-chunk size for the percentile kernels' cumulative traversal:
# bounds every per-chunk matrix to CHUNK x V (64k x 64 x 8 B = 32 MB)
# regardless of how many rows one scaffold range holds — see
# _pctl_group_traversal
_PCTL_KERNEL_CHUNK_GROUPS = 65_536


def _pctl_group_traversal(g, ax, mode: str, dir_: str, axn=None):
    """Frame traversal for the global running-percentile kernels:
    returns (order, gid, starts) where `order` sorts the rows into
    the (possibly mirrored) axis traversal, `gid` is the per-SORTED-
    row key-tie group index and `starts` the first sorted index of
    each group (int64, len = #groups).

    Null sort keys form their OWN peer group via an explicit null
    flag as the primary sort key — nulls first on the ascending
    range axis, nulls last on the mirrored one, exactly the SQL
    assemblies' 'asc nulls first' / 'desc nulls last' (round-11; the
    former -inf/+inf SENTINELS merged a genuine IEEE infinity axis
    value into the null peer group, silently diverging from the SQL
    window form on data containing infinite sort keys — r10 ADVICE).
    `axn` is the Spark-side is-null mask for the axis (round-12, r11
    ADVICE): the Arrow transfer erases nullity (double + null ->
    float64 NaN), so without it a genuine IEEE NaN sort key is
    indistinguishable from SQL NULL — but Spark's ordering puts NaN
    in its own peer group AFTER +inf (asc) / FIRST on the mirrored
    axis, not with the nulls. With the mask, NaN keys get their own
    flag level matching the SQL forms; axn=None keeps the legacy
    NaN==null reading for callers that cannot supply a mask.
    rows-mode frames traverse the unique global row number, so every
    tie group degenerates to one row.

    The group decomposition is also the kernels' memory guard (r10
    ADVICE, medium): equal sort keys always share a scaffold range,
    so a heavily-tied sortBy can collapse millions of rows into ONE
    cogroup task — the former whole-range (rows x V) one-hot + cumsum
    materialization was O(range mass x buckets) and could OOM the
    Python worker. The kernels now walk `starts` in
    _PCTL_KERNEL_CHUNK_GROUPS-group chunks (per-chunk histograms via
    bincount + a carried running base vector), so peak memory is
    O(CHUNK x V + rows) however skewed the key distribution — and in
    the heavy-tie case the per-group arithmetic collapses the compute
    from O(rows x V) to O(groups x V)."""
    import numpy as np

    n = len(g)
    if mode == "rows":
        order = np.argsort(g if dir_ == "fwd" else -g, kind="stable")
        gid = np.arange(n, dtype=np.int64)
        return order, gid, gid
    nanv = np.isnan(ax)
    isn = nanv if axn is None else np.asarray(axn, dtype=bool)
    nank = nanv & ~isn              # genuine IEEE NaN sort keys
    filled = np.where(nanv, 0.0, ax)
    if dir_ == "fwd":
        # asc nulls first: [nulls, -inf..+inf, NaN] — Spark orders
        # NaN greater than +inf, and NaN keys tie each other
        flag = np.where(isn, 0, np.where(nank, 2, 1)).astype(np.int8)
        order = np.lexsort((g, filled, flag))
    else:
        # desc nulls last mirrored: [NaN, +inf..-inf, nulls]
        flag = np.where(nank, 0, np.where(isn, 2, 1)).astype(np.int8)
        order = np.lexsort((g, -filled, flag))
    fs = flag[order]
    ks = filled[order]
    new = np.empty(n, dtype=bool)
    if n:
        new[0] = True
        # same group <=> same flag AND same (filled) key: all nulls —
        # and separately all NaNs — share filled 0.0 within their own
        # flag level, and a real 0.0 key differs from both by flag
        new[1:] = (fs[1:] != fs[:-1]) | (ks[1:] != ks[:-1])
    gid = np.cumsum(new, dtype=np.int64) - 1
    starts = np.flatnonzero(new).astype(np.int64)
    return order, gid, starts


def _approx_bucket_prep(df: DataFrame, specs: list, srcs: list,
                        vmode: list, vdir: list, vsketch: list,
                        V: int):
    """Shared head of the two approximate global running-percentile
    assemblies (wide / kernel): thin each input's piggybacked value
    sketch to <=V-1 bucket splits (outer edges from the boundary
    aggregate's min/max), stamp a per-input integer bucket index on
    the frame, and derive the per-range cumulative bucket offsets
    (distributed groupBy histogram -> O(ranges x V) single-partition
    numpy fold -> broadcast-able one-row-per-range frame). Everything
    lazy — no driver action."""
    import pandas as pd

    nv = len(srcs)

    def dlit(x):
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    sp0_by_vi = {vi: next(sp for sp in specs if sp["vi"] == vi)
                 for vi in range(nv)}
    # round-12: all-or-nothing probe precomputation (see _swf_global)
    pre_offsets = all(sp0_by_vi[vi].get("histcounts") is not None
                      for vi in range(nv)) and nv > 0

    nb: list = []
    edges_by_vi: dict = {}
    out_df = df
    for vi in range(nv):
        sp0 = sp0_by_vi[vi]
        if sp0.get("vbs") is not None:
            vbs = list(sp0["vbs"])
        else:
            sk = vsketch[vi]
            vbs = sorted({sk[(len(sk) * i) // V]
                          for i in range(1, V)}) if sk else []
        nb.append(len(vbs) + 1)
        lo = sp0.get("lo")
        hi = sp0.get("hi")
        edges_by_vi[vi] = [lo if lo is not None else 0.0] + vbs \
            + [hi if hi is not None else 0.0]
        if sp0.get("bcol") is not None:
            # bucket index already materialized upstream (round-12
            # probe path) — reuse it instead of re-evaluating the
            # comparison ladder
            out_df = out_df.withColumn(f"__pq_b{vi}",
                                       F.col(sp0["bcol"]))
            continue
        ladder = " + ".join(
            f"cast(`{srcs[vi]}` > {dlit(x)} as int)" for x in vbs) \
            or "0"
        out_df = out_df.withColumn(
            f"__pq_b{vi}",
            F.expr(f"case when `{srcs[vi]}` is not null "
                   f"then {ladder} end"))

    if pre_offsets:
        # per-range bucket counts rode the caller's boundary
        # aggregate — fold to cumulative offsets driver-side and ship
        # them as a zero-job LocalRelation (drops the hist groupBy +
        # coalesce(1) mapInPandas fold from the critical path)
        import numpy as np

        spark = df.sparkSession
        pids = [int(p) for p, _ in sp0_by_vi[0]["histcounts"]]
        off_by_vi = []
        for vi in range(nv):
            c = np.asarray(
                [cnts for _, cnts in sp0_by_vi[vi]["histcounts"]],
                dtype=np.int64).reshape(len(pids), nb[vi])
            sc = c.cumsum(axis=1)
            if vdir[vi] == "fwd":
                off = sc.cumsum(axis=0) - sc
            else:
                off = sc[::-1].cumsum(axis=0)[::-1] - sc
            off_by_vi.append(off)
        odf = spark.createDataFrame(
            [tuple([pids[i]] + [[int(x) for x in off_by_vi[vi][i]]
                                for vi in range(nv)])
             for i in range(len(pids))],
            "__gw_pid int, " + ", ".join(
                f"__pq_off{vi} array<bigint>" for vi in range(nv)))
        return out_df, nb, edges_by_vi, odf

    # one parsed F.expr per bucket count, not ~7 Column-API py4j
    # roundtrips each: at nv x V = 128 columns the Column form cost
    # ~0.5 s of pure driver chatter per compile (round-12)
    hist = out_df.groupBy("__gw_pid").agg(*[
        F.expr(f"sum(case when __pq_b{vi} = {b} then 1L else 0L end) "
               f"as `__pq_c_{vi}_{b}`")
        for vi in range(nv) for b in range(nb[vi])])
    nb_l, vdir_l = list(nb), list(vdir)

    def fold_offsets(batches):
        import numpy as np

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) \
            .sort_values("__gw_pid").reset_index(drop=True)
        out = {"__gw_pid": pdf["__gw_pid"].to_numpy()}
        for vi in range(len(nb_l)):
            c = np.stack([pdf[f"__pq_c_{vi}_{b}"].to_numpy()
                          for b in range(nb_l[vi])], axis=1)
            sc = c.cumsum(axis=1)
            if vdir_l[vi] == "fwd":
                off = sc.cumsum(axis=0) - sc
            else:
                off = sc[::-1].cumsum(axis=0)[::-1] - sc
            out[f"__pq_off{vi}"] = list(off)
        yield pd.DataFrame(out)

    # coalesce, not repartition (round-12): the histogram's own
    # exchange already exists; coalesce(1) folds the final agg +
    # mapInPandas into ONE post-shuffle task instead of paying a
    # second full exchange round just to get a single partition
    odf = hist.coalesce(1).mapInPandas(
        fold_offsets,
        "__gw_pid int, " + ", ".join(
            f"__pq_off{vi} array<bigint>" for vi in range(nv)))
    return out_df, nb, edges_by_vi, odf


def _global_running_pctl_approx_kernel(
        df: DataFrame, total_rows: int, specs: list, srcs: list,
        vmode: list, vdir: list, vsketch: list, V: int) -> DataFrame:
    """Approximate global running $median/$percentile via ONE
    vectorized numpy kernel per scaffold range (round-10 — the
    default assembly, conf spark.maggma.windowPctl.approxAssembly).

    The wide-frame SQL form's cost center was V cumulative window
    sums + a V-term interpolation ladder per target: at V=64 the
    stage blows past whole-stage codegen's field budget and janino's
    method limit, so WindowExec + the ladder projection evaluate
    interpreted — measured 140-165 s at 10M rows vs ~36 s for this
    kernel on the same machine (SCALE.md round-10). Here the slim
    (pid, g, [ax], bucket-index) projection cogroups with the
    broadcast per-range offsets; one applyInPandas kernel per range
    computes the per-row cumulative bucket vector as a numpy onehot
    cumsum (SIMD, not per-row-per-bucket aggregate updates), locates
    the target rank's bucket vectorized, and interpolates within the
    bucket's value edges — identical arithmetic and rank-error bound
    (largest bucket's mass + sketch error) to the wide form, pinned
    by the same oracle row and property test.

    A FUSED form (one applyInPandas over the FULL frame grouped by
    range id, offsets riding the __gw_rn == 1 rows, no cogroup and no
    join-back) was built and MEASURED AND REJECTED in round-11: the
    Arrow round-trip of the whole frame through the Python worker
    costs more than the JVM-side join-back shuffle it saves — 50 s vs
    28 s at 10M, 36.8 s vs 20.9 s on the tied-range shape, a wash
    below 200k (scripts/scale_probe_r11.py). The slim-projection
    cogroup + join-back stays.

    Forward/reverse and documents/range frames unify in the kernel:
    one _pctl_group_traversal per input (explicit null-flag sort —
    null keys are their own peer group, distinct from genuine IEEE
    infinities; round-11), cumulative taken at each key-tie group
    (range frames: ties by sort value enter each other's prefix;
    rows frames: every group is one row). The traversal walks tie
    groups in bounded chunks (bincount histogram + carried base
    vector), so worker memory is O(chunk x V + rows) even when a
    heavily-tied sortBy collapses millions of rows into one scaffold
    range — see _pctl_group_traversal."""
    import pandas as pd

    nv = len(srcs)
    out_df, nb, edges_by_vi, odf = _approx_bucket_prep(
        df, specs, srcs, vmode, vdir, vsketch, V)
    out_df = out_df.withColumn(
        "__pq_g",
        (F.col("__gw_rn") + F.col("__gw_off_rows")).cast("long"))
    any_range = "range" in vmode
    slim = out_df.select(
        "__gw_pid", "__pq_g",
        *([F.col("__gw_ax"),
           F.col("__gw_ax").isNull().alias("__gw_axn")]
          if any_range else []),
        *[f"__pq_b{vi}" for vi in range(nv)])

    nb_l = list(nb)
    vmode_l, vdir_l = list(vmode), list(vdir)
    edges_l = [list(map(float, edges_by_vi[vi])) for vi in range(nv)]
    spec_l = [(sp["vi"], [float(p) for p in sp["ps"]])
              for sp in specs]
    out_fields = [f"__pq_r{si}_{pi}"
                  for si, (_vi, ps) in enumerate(spec_l)
                  for pi in range(len(ps))]
    schema = "__pq_g long, " + ", ".join(
        f"`{f}` double" for f in out_fields)

    # chunk size captured at PLAN time (driver) so tests can shrink it
    # and force multi-chunk traversals on small frames — read inside
    # the kernel it would resolve against the WORKER's unpatched module
    CH = _PCTL_KERNEL_CHUNK_GROUPS

    def _answers(pdf, off_for_vi):
        """Shared per-range arithmetic of both kernel forms: the
        chunked group-space traversal -> one Float64 answer column
        per (spec, p). `off_for_vi(vi, nbv)` supplies the incoming
        bucket-cumulative offset vector."""
        import numpy as np

        n_rows = len(pdf)
        g = pdf["__pq_g"].to_numpy(dtype="int64")
        ax = (pd.to_numeric(pdf["__gw_ax"], errors="coerce")
              .to_numpy(dtype="float64") if any_range else None)
        axn = (pdf["__gw_axn"].to_numpy(dtype=bool)
               if any_range else None)
        cols = {}
        for vi in range(nv):
            nbv = nb_l[vi]
            j = pd.to_numeric(pdf[f"__pq_b{vi}"],
                              errors="coerce").to_numpy(dtype="float64")
            order, gid, starts = _pctl_group_traversal(
                g, ax, vmode_l[vi], vdir_l[vi], axn)
            js = j[order]
            G = len(starts)
            off = off_for_vi(vi, nbv)
            valid = ~np.isnan(js)
            jsi = np.where(valid, js, 0).astype(np.int64)
            e = np.asarray(edges_l[vi], dtype="float64")
            myspecs = [(si, ps) for si, (svi, ps) in enumerate(spec_l)
                       if svi == vi]
            bufs = {(si, pi): np.empty(n_rows, dtype="float64")
                    for si, ps in myspecs for pi in range(len(ps))}
            mrow = np.empty(n_rows, dtype=np.int64)
            base = np.zeros(nbv, dtype=np.int64)  # raw counts so far
            for g0 in range(0, G, CH):
                g1 = min(g0 + CH, G)
                r0 = int(starts[g0])
                r1 = int(starts[g1]) if g1 < G else n_rows
                K = g1 - g0
                sl = slice(r0, r1)
                gl = gid[sl] - g0
                vm = valid[sl]
                H = np.bincount(gl[vm] * nbv + jsi[sl][vm],
                                minlength=K * nbv).reshape(K, nbv)
                Cg = H.cumsum(axis=0) + base
                base = Cg[-1].copy()
                # a row's prefix runs to the END of its key-tie
                # group; incoming offset is bucket-cumulative already
                ce = Cg.cumsum(axis=1) + off
                m = ce[:, -1].astype("float64")
                kk = np.arange(K)
                for si, ps in myspecs:
                    for pi, p in enumerate(ps):
                        q = p * (m - 1.0) + 1.0
                        b = (ce < q[:, None]).sum(axis=1)
                        np.minimum(b, nbv - 1, out=b)
                        prior = np.where(
                            b > 0, ce[kk, np.maximum(b - 1, 0)],
                            0).astype("float64")
                        cnt = ce[kk, b].astype("float64") - prior
                        frac = np.where(
                            cnt > 0,
                            (q - prior) / np.maximum(cnt, 1.0), 1.0)
                        vals = e[b] + frac * (e[b + 1] - e[b])
                        bufs[(si, pi)][sl] = vals[gl]
                mrow[sl] = ce[gl, -1]
            inv = np.empty(n_rows, dtype=np.int64)
            inv[order] = np.arange(n_rows)
            empt = mrow[inv] <= 0
            for (si, pi), buf in bufs.items():
                out = pd.array(buf[inv], dtype="Float64")
                out[empt] = pd.NA  # empty non-null prefix -> null
                cols[f"__pq_r{si}_{pi}"] = out
        return cols

    def kernel(left, right):
        import numpy as np

        def off_for_vi(vi, nbv):
            if len(right):
                return np.asarray(right[f"__pq_off{vi}"].iloc[0],
                                  dtype=np.int64)
            return np.zeros(nbv, dtype=np.int64)

        cols = {"__pq_g": left["__pq_g"].to_numpy(dtype="int64")}
        cols.update(_answers(left, off_for_vi))
        return pd.DataFrame(cols)

    ans = (slim.groupBy("__gw_pid")
           .cogroup(odf.groupBy("__gw_pid"))
           .applyInPandas(kernel, schema))
    # the bucket-index columns exist only to feed the kernel — drop
    # them BEFORE the join-back so the wide side of the shuffle does
    # not carry nv dead ints per row (round-11). Joining on (pid, g)
    # to reuse the cogroup's pid partitioning was tried and does not
    # help: FlatMapCoGroupsInPandas reports unknown outputPartitioning,
    # so EnsureRequirements re-shuffles both sides either way.
    # Round-12: bounded broadcast of the answer side instead — drops
    # the wide side's exchange+sort entirely at bench scale, withheld
    # past the driver-safety cap (see _bounded_broadcast).
    ans = _bounded_broadcast(
        ans, total_rows, sum(len(sp["ps"]) for sp in specs))
    res = out_df.drop(*[f"__pq_b{vi}" for vi in range(nv)]) \
        .join(ans, on="__pq_g")
    for si, sp in enumerate(specs):
        outs = [F.col(f"__pq_r{si}_{pi}")
                for pi in range(len(sp["ps"]))]
        res = res.withColumn(
            sp["out"], outs[0] if sp["scalar"] else F.array(*outs))
    return res.drop(*[c for c in res.columns
                      if c.startswith("__pq_")])


def _global_running_pctl_approx_wide(
        df: DataFrame, total_rows: int, specs: list, srcs: list,
        vmode: list, vdir: list, vsketch: list, V: int) -> DataFrame:
    """Approximate global running $median/$percentile as ONE lazy
    plan over the (checkpointed) wide frame — see the dispatch note
    in _global_running_pctl. Rank error is bounded by the largest
    value-bucket's whole-dataset mass (+ sketch error): the answer
    interpolates the target rank within its equi-depth bucket between
    the bucket's value edges."""
    nv = len(srcs)

    def dlit(x):
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    out_df, nb, edges_by_vi, odf = _approx_bucket_prep(
        df, specs, srcs, vmode, vdir, vsketch, V)
    out_df = (out_df.join(F.broadcast(odf), on="__gw_pid")
              .withColumn("__pq_g",
                          (F.col("__gw_rn") + F.col("__gw_off_rows"))
                          .cast("long")))
    if "range" in vmode:
        out_df = out_df.withColumn("__pq_ax", F.col("__gw_ax"))
    # explicit partition count for the cum-window stage: AQE's
    # byte-based coalesce collapses this tiny-by-bytes but
    # compute-heavy-per-byte stage into too few tasks (the exact
    # path's sl.repartition carries the same note); an explicit
    # numPartitions is exempt from AQE coalescing
    npid = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out_df = out_df.repartition(int(npid), F.col("__gw_pid"))

    over_by = {
        ("rows", "fwd"): ("over (partition by __gw_pid order by "
                          "__pq_g rows between unbounded preceding "
                          "and current row)"),
        ("rows", "bwd"): ("over (partition by __gw_pid order by "
                          "__pq_g desc rows between unbounded "
                          "preceding and current row)"),
        ("range", "fwd"): ("over (partition by __gw_pid order by "
                           "__pq_ax asc nulls first range between "
                           "unbounded preceding and current row)"),
        ("range", "bwd"): ("over (partition by __gw_pid order by "
                           "__pq_ax desc nulls last range between "
                           "unbounded preceding and current row)"),
    }
    for vi in range(nv):
        over = over_by[(vmode[vi], vdir[vi])]
        out_df = out_df.select(
            "*", *[F.expr(
                f"(coalesce(sum(cast(__pq_b{vi} <= {b} as bigint)) "
                f"{over}, 0L) + element_at(__pq_off{vi}, {b + 1})) "
                f"as __pq_cum{vi}_{b}")
                for b in range(nb[vi])])
        # one array attribute per input for the dynamic bucket
        # lookups (element_at on an attribute is plain codegen)
        out_df = out_df.withColumn(
            f"__pq_ca{vi}",
            F.array(*[F.col(f"__pq_cum{vi}_{b}")
                      for b in range(nb[vi])]))

    # each target's bucket index materializes as its OWN column: b is
    # a V-term comparison ladder referenced ~6x in the interpolation,
    # and inlined it re-evaluates per reference once the tree falls
    # out of codegen (no CSE interpreted). This took the PARTITIONED
    # form from ~80 us/row to ~17 (round-11); here it measured
    # neutral at 2M (the wide form's cost center is the V window sums
    # themselves) but keeps the multiply-referenced ladder out of the
    # interpreted-eval trap as V grows — CollapseProject cannot
    # inline a non-cheap multiply-referenced alias
    bcols: dict = {}
    for si, sp in enumerate(specs):
        vi = sp["vi"]
        nvb = nb[vi]
        m = F.col(f"__pq_cum{vi}_{nvb - 1}").cast("double")
        for pi, pv in enumerate(sp["ps"]):
            q = F.lit(float(pv)) * (m - 1) + F.lit(1.0)
            bcols[f"__pq_bx{si}_{pi}"] = F.least(
                sum((F.col(f"__pq_cum{vi}_{b_}").cast("double") < q)
                    .cast("int") for b_ in range(nvb)),
                F.lit(nvb - 1))
    out_df = out_df.withColumns(bcols)
    for si, sp in enumerate(specs):
        vi = sp["vi"]
        nvb = nb[vi]
        e = edges_by_vi[vi]
        earr = F.array(*[F.expr(dlit(x)) for x in e])
        ca = F.col(f"__pq_ca{vi}")
        m = F.col(f"__pq_cum{vi}_{nvb - 1}").cast("double")
        outs = []
        for pi, pv in enumerate(sp["ps"]):
            q = F.lit(float(pv)) * (m - 1) + F.lit(1.0)
            b = F.col(f"__pq_bx{si}_{pi}")
            prior = F.when(b > 0,
                           F.element_at(ca, b).cast("double")) \
                .otherwise(F.lit(0.0))
            cnt = F.element_at(ca, b + 1).cast("double") - prior
            frac = F.when(cnt > 0,
                          (q - prior) / F.greatest(cnt, F.lit(1.0))) \
                .otherwise(F.lit(1.0))
            e_lo = F.element_at(earr, b + 1)
            e_hi = F.element_at(earr, b + 2)
            outs.append(F.when(m > 0, e_lo + frac * (e_hi - e_lo)))
        out_df = out_df.withColumn(
            sp["out"], outs[0] if sp["scalar"] else F.array(*outs))
    return out_df.drop(*[c for c in out_df.columns
                         if c.startswith("__pq_")])


def _global_running_pctl(df: DataFrame, total_rows: int,
                         specs: list, n_ranges: int = 1,
                         approx: bool = False) -> DataFrame:
    """UNPARTITIONED running $median/$percentile (frame
    ["unbounded", "current"]) as distributed prefix order statistics
    — the last _swf_global raise (r7 verdict next #6). Exact
    continuous interpolation, never a single-task sort and never the
    O(prefix)/row sliding re-scan:

    1. Bucket the VALUE domain into equi-depth ranges (thinned from
       the 63-quantile sketch the scaffold's boundary aggregate
       already collected — zero extra actions; boundaries baked as
       literals).
    2. Per-bucket RUNNING counts over the global document order: a
       per-range value histogram folded to cumulative prefix offsets
       — computed DISTRIBUTED (groupBy histogram -> O(ranges x
       buckets) single-partition numpy fold -> broadcast join;
       round-9, was a collect + driver fold, i.e. one extra driver
       action per pass) + one WindowExec of per-bucket running sums.
    3. Each row turns its target ranks (floor/ceil of p*(m-1) per
       requested p) into (bucket, residual-rank) queries via the
       cumulative bucket counts — a vectorized Arrow mapInPandas
       router (see the in-body note for why not SQL expressions).
    4. A merge-sort-tree applyInPandas kernel per (value-bucket,
       g-chunk) group selects the residual rank among that bucket's
       elements with g <= query g. Elements replicate only to LATER
       g-chunks (~S/2 copies), so a query-heavy quantile bucket
       splits across S tasks instead of funneling the whole query
       stream through one; per-task work is
       O((n/V + q/S) log^2(n/V)).
    5. Results join back by the unique global row number and
       interpolate lo/hi in-expression.

    ALL pctl_run/pctl_rrun outputs of the $setWindowFields resolve in
    THIS ONE pass (`specs` = [{out, ps, scalar, mode, argkey}, ...]);
    outputs that share an input expression and frame mode share
    buckets, histogram counts, and kernel elements. mode="rows" is
    the documents frame (prefix by document order); mode="range" is
    the running VALUE-RANGE frame — same machinery with RANGE-framed
    cumulative counts and the last tie's g as the query row number,
    so ties by sort value enter each other's prefix. The sketch actions, the histogram, the query
    window pass, and the kernel's element stream all read a slim
    (pid, g, values) localCheckpoint — lineage truncation, 16-24
    B/row — instead of re-analyzing and re-executing the full
    upstream plan per action: the unfused, uncheckpointed form spent
    ~25 s of DRIVER plan time per output on a 15k-row frame
    (SCALE.md round-8). The wide frame is touched exactly once, in
    the final join.

    Nulls contribute nothing (Mongo/DuckDB quantile semantics); rows
    with an empty non-null prefix emit null. Ties in the sort key
    follow the scaffold's deterministic rn, like every documents
    frame (DEVIATIONS §16)."""
    import pandas as pd
    from pyspark.sql import Window

    spark = df.sparkSession
    # bucket count scales with input size (exact: >= ~10k elements per
    # bucket — plan size is O(V) window functions and the kernel wants
    # V x S groups of real work, so tiny inputs should not pay a
    # 64-bucket window tree). The APPROXIMATE mode's answer is an
    # interpolation within one bucket, so its rank error is bounded by
    # the largest bucket's mass (~n/V x sketch skew) — it buys
    # accuracy with more buckets instead of a selection kernel, and is
    # not gated on shuffle.partitions (no kernel tasks to feed).
    if approx:
        # default: ~1k rows/bucket up to 64 buckets (rank error
        # <= max bucket mass ~ total/V x sketch skew); overridable,
        # but HARD-capped at 64: the V-term cumulative-array
        # projection crosses janino's 64 KB method limit past ~64 and
        # drops to InterpretedUnsafeProjection (measured 12 s -> 43 s
        # at 4M rows going 64 -> 128, round-9)
        V = int(spark.conf.get(
            "spark.maggma.windowPctl.approxBuckets", "0")) \
            or max(2, min(64, total_rows // 1024 + 2))
        V = max(2, min(64, V))
    else:
        # V floored by DATA MASS only (round-13, r12 verdict next #2):
        # the old `min(..., shuffle.partitions, ...)` term tied bucket
        # count to session parallelism, so an 8-core session collapsed
        # V to 8, made every bucket 4x heavier, and the selection
        # kernel's per-bucket O((n/V + q/S) log^2(n/V)) work blew up
        # super-linearly (window_median_percentile 91.4 s @8 cores vs
        # 2.2 s @32, BENCH_r12_c8). Task parallelism is set by the
        # V x S group fan-out, not V alone, and exact results are
        # V-independent — only per-bucket mass matters.
        V = max(2, min(64, total_rows // 10_000 + 2))
    # query-chunk fan: elements replicate to ~S/2 later g-chunks so a
    # query-heavy bucket splits across S tasks instead of funneling
    # through one. S=1 was measured SLOWER at bench SF (round-10:
    # V x S groups also set the selection stage's parallelism — 17
    # groups left half the cores idle), so the constant stays
    S = 4

    # canonical value columns: outputs sharing an input expression
    # AND a frame mode share buckets, histogram counts, and kernel
    # elements
    vidx: dict = {}
    srcs: list = []
    vmode: list = []
    vdir: list = []
    vsketch: list = []
    vvbs: list = []       # round-12: probe-derived splits (or None)
    vhist: list = []      # round-12: per-range bucket counts (or None)
    vbcol: list = []      # round-12: precomputed bucket-index column
    for sp in specs:
        vi = vidx.setdefault(sp["argkey"], len(srcs))
        if vi == len(srcs):
            srcs.append(f"__gw_v_{sp['out']}")
            vmode.append(sp["mode"])
            vdir.append(sp["dir"])
            vsketch.append(sp.get("sketch"))
            vvbs.append(sp.get("vbs"))
            vhist.append(sp.get("histcounts"))
            vbcol.append(sp.get("bcol"))
        sp["vi"] = vi
    nv = len(srcs)
    any_range = "range" in vmode
    # all-or-nothing: the caller attaches probe-derived splits and
    # boundary-aggregate histograms to every spec or to none
    pre_offsets = all(h is not None for h in vhist) and nv > 0

    if approx:
        # APPROXIMATE fast path (Mongo's window $median/$percentile
        # only OFFER method:"approximate"). Assembly choice: the
        # vectorized numpy kernel — the wide SQL form's V cumulative
        # window sums + V-term interpolation ladders blow codegen's
        # field/method budgets as V grows and run interpreted
        # (140-165 s at 10M V=64 vs ~36 s for the kernel; SCALE.md
        # round-10). Round-10's auto picked wide below ~1M rows
        # because the kernel's fixed Python-stage costs dominated
        # there; after the round-11 group-space rewrite the kernel
        # wins at EVERY probed size (5k: 2.6 vs 3.1 s; 100k: 5.3 vs
        # 10.7; 2M: 8.2 vs 13.6 — same-session best-of-2), so `auto`
        # now always picks it. approxAssembly=wide remains the
        # explicit escape for user frames so wide that the kernel's
        # join-back shuffle of the full frame would dominate, and is
        # pinned bit-equal by test_global_pctl_approx_assemblies_agree.
        assembly = spark.conf.get(
            "spark.maggma.windowPctl.approxAssembly", "auto")
        if assembly == "auto":
            assembly = "kernel"
        if assembly == "wide":
            return _global_running_pctl_approx_wide(
                df, total_rows, specs, srcs, vmode, vdir, vsketch, V)
        return _global_running_pctl_approx_kernel(
            df, total_rows, specs, srcs, vmode, vdir, vsketch, V)

    slim = df.select(
        "__gw_pid",
        (F.col("__gw_rn") + F.col("__gw_off_rows")).cast("long")
        .alias("__pq_g"),
        *([F.col("__gw_ax").alias("__pq_ax"),
           F.col("__gw_ax").isNull().alias("__pq_axn")]
          if any_range else []),
        *[F.col(src).cast("double").alias(f"__pq_v{vi}")
          for vi, src in enumerate(srcs)],
        # precomputed bucket indices (round-12 probe path) ride the
        # slim checkpoint so the ladder is evaluated once per row
        # total, not once per consumer
        *[F.col(vbcol[vi]).alias(f"__pq_b{vi}")
          for vi in range(nv) if vbcol[vi] is not None]) \
        .localCheckpoint(eager=False)
    # ^ lineage truncation for the histogram/window/element branches:
    # measured round-9 against skipping it when the caller already
    # checkpointed the scaffolded frame — re-running the (cheap)
    # block-read + ladder projection per branch still lost ~0.4 s at
    # bench SF to the one slim materialization, so it stays. LAZY
    # (round-10): the first downstream sub-job (the broadcast-offsets
    # exchange) materializes the blocks — no dedicated action.

    # every compound expression below is ONE parsed F.expr string:
    # building them per-term through the Column API cost ~27k py4j
    # roundtrips = 14 s of driver time for a two-output spec at V=32
    # (SCALE.md round-8). Float literals go through
    # CAST('repr' AS DOUBLE) so they round-trip bit-exact.
    def dlit(x):
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    # bucket boundaries: probe-derived splits when the caller ran the
    # round-12 combined probe (spec["vbs"]), else thinned from the
    # boundary aggregate's piggybacked 63-quantile sketch — either
    # way balance is approximate, the histogram offsets stay exact
    nb: list = []
    vbs_all: list = []
    slb = slim
    for vi in range(nv):
        if vvbs[vi] is not None:
            vbs = list(vvbs[vi])
        else:
            sk = vsketch[vi]
            vbs = sorted({sk[(len(sk) * i) // V]
                          for i in range(1, V)}) if sk else []
        vbs_all.append(vbs)
        nb.append(len(vbs) + 1)
        if vbcol[vi] is not None:
            continue  # __pq_b{vi} already rides the slim projection
        ladder = " + ".join(
            f"cast(__pq_v{vi} > {dlit(x)} as int)" for x in vbs) or "0"
        slb = slb.withColumn(
            f"__pq_b{vi}",
            F.expr(f"case when __pq_v{vi} is not null "
                   f"then {ladder} end"))

    if pre_offsets:
        # Round-12: the per-range bucket histograms rode the boundary
        # aggregate; fold them to cumulative offsets HERE (same
        # arithmetic as fold_offsets below) and ship the result as a
        # zero-job LocalRelation — the dedicated hist groupBy +
        # coalesce(1) mapInPandas fold stages disappear from the
        # critical path. Same worker-OOM guard, now driver-side.
        import numpy as np

        pids = [int(p) for p, _ in vhist[0]]
        off_by_vi = []
        for vi in range(nv):
            c = np.asarray([cnts for _, cnts in vhist[vi]],
                           dtype=np.int64).reshape(len(pids), nb[vi])
            biggest = int(c.sum(axis=0).max(initial=0))
            if biggest > MAX_PCTL_BUCKET_ELEMENTS:
                raise ValueError(
                    f"unpartitioned running $median/$percentile: a "
                    f"value bucket holds {biggest} elements (> "
                    f"MAX_PCTL_BUCKET_ELEMENTS="
                    f"{MAX_PCTL_BUCKET_ELEMENTS}); the selection "
                    "kernel materializes one bucket per task. Add "
                    "partitionBy, or pre-aggregate the value domain.")
            sc = c.cumsum(axis=1)
            if vdir[vi] == "fwd":
                off = sc.cumsum(axis=0) - sc
            else:
                off = sc[::-1].cumsum(axis=0)[::-1] - sc
            off_by_vi.append(off)
        odf = spark.createDataFrame(
            [tuple([pids[i]] + [[int(x) for x in off_by_vi[vi][i]]
                                for vi in range(nv)])
             for i in range(len(pids))],
            "__gw_pid int, " + ", ".join(
                f"__pq_off{vi} array<bigint>" for vi in range(nv)))

    # per-range value histograms -> per-range CUMULATIVE prefix
    # offsets, computed DISTRIBUTED and broadcast-joined (round-9:
    # this was a collect + Python fold + createDataFrame — a whole
    # extra driver action whose job latency dwarfed the histogram's
    # compute). The offset frame is O(ranges) rows, so the
    # single-partition windows over it are scale-safe by
    # construction. Cumulative across BOTH the range axis (exclusive
    # running sum over pid order — fwd accumulates EARLIER pids, bwd
    # LATER pids) and the bucket axis, so cum_at[b] below stays a
    # single one-term window sum.
    # parsed-expr form — same py4j-chatter cut as the approximate
    # prep's histogram (round-12). Only built when the round-12
    # probe/boundary-aggregate precomputation above did not run.
    hist = None if pre_offsets else slb.groupBy("__gw_pid").agg(*[
        F.expr(f"sum(case when __pq_b{vi} = {b} then 1L else 0L end) "
               f"as `__pq_c_{vi}_{b}`")
        for vi in range(nv) for b in range(nb[vi])])
    nb_l, vdir_l = list(nb), list(vdir)

    def fold_offsets(batches):
        # numpy double-cumsum over the O(ranges x buckets) histogram
        # (single-partition input, a few KB at any data scale). NOT
        # SQL expressions: the nb overlapping prefix-sum ADD chains
        # sent Catalyst's subexpression-elimination codegen into
        # gigabyte string recursion at nb >= ~33 (measured JVM OOM
        # building the generated source, round-9).
        import numpy as np

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) \
            .sort_values("__gw_pid").reset_index(drop=True)
        out = {"__gw_pid": pdf["__gw_pid"].to_numpy()}
        for vi in range(len(nb_l)):
            c = np.stack([pdf[f"__pq_c_{vi}_{b}"].to_numpy()
                          for b in range(nb_l[vi])], axis=1)
            tot = c.sum(axis=0)
            biggest = int(tot.max(initial=0))
            if biggest > MAX_PCTL_BUCKET_ELEMENTS:
                # task-OOM guard (house style: raise, never
                # truncate): one kernel group holds one value-
                # bucket's elements; past ~64 x the cap a GLOBAL
                # running percentile needs a hierarchical second
                # bucketing level this operator does not implement
                raise ValueError(
                    f"unpartitioned running $median/$percentile: a "
                    f"value bucket holds {biggest} elements (> "
                    f"MAX_PCTL_BUCKET_ELEMENTS="
                    f"{MAX_PCTL_BUCKET_ELEMENTS}); the selection "
                    "kernel materializes one bucket per task. Add "
                    "partitionBy, or pre-aggregate the value domain.")
            sc = c.cumsum(axis=1)  # bucket-cumulative within a range
            if vdir_l[vi] == "fwd":
                off = sc.cumsum(axis=0) - sc        # earlier pids
            else:
                off = sc[::-1].cumsum(axis=0)[::-1] - sc  # later pids
            out[f"__pq_off{vi}"] = list(off)
        yield pd.DataFrame(out)

    if not pre_offsets:
        # coalesce, not repartition — same one-exchange shape as the
        # approximate prep (round-12)
        odf = F.broadcast(hist.coalesce(1).mapInPandas(
            fold_offsets,
            "__gw_pid int, " + ", ".join(
                f"__pq_off{vi} array<bigint>" for vi in range(nv))))

    plist = [(si, sp["vi"], pi, float(pv))
             for si, sp in enumerate(specs)
             for pi, pv in enumerate(sp["ps"])]
    vmodes = list(vmode)
    T1 = total_rows + 1
    qschema = ("vi int, b int, c int, g long, rank long, qid long, "
               "si int, pi int, side int, m long")

    def _emit_queries(g, gcmp_by_vi, cums_by_vi):
        """Shared rank->(bucket, residual) routing: numpy primitives
        over NONDECREASING cumulative bucket vectors; emits only the
        surviving queries (m > 0, hi != lo dedup)."""
        import numpy as np

        out = []
        for si, vi, pi, pv in plist:
            cums = cums_by_vi[vi]
            gc = gcmp_by_vi[vi]
            c_all = ((gc - 1) * S // total_rows).astype("int32")
            m = cums[:, -1]
            r = pv * (m - 1).astype("float64")
            lo = np.floor(r).astype("int64")
            hi = np.ceil(r).astype("int64")
            for side, q in ((0, lo + 1), (1, hi + 1)):
                mask = m > 0
                if side == 1:
                    # the hi rank only differs when p*(m-1) is
                    # fractional — skipping the duplicate halves
                    # query volume for on-grid percentiles (the
                    # assembly coalesces hi->lo)
                    mask &= hi != lo
                if not mask.any():
                    continue
                qv = q[mask]
                b = (cums[mask] < qv[:, None]).sum(
                    axis=1).astype("int64")
                prior = np.where(
                    b > 0,
                    np.take_along_axis(
                        cums[mask],
                        np.maximum(b - 1, 0)[:, None],
                        axis=1)[:, 0],
                    0)
                out.append(pd.DataFrame({
                    "vi": np.int32(vi), "b": b.astype("int32"),
                    "c": c_all[mask],
                    "g": gc[mask], "rank": qv - prior,
                    "qid": g[mask],
                    "si": np.int32(si), "pi": np.int32(pi),
                    "side": np.int32(side),
                    "m": m[mask]}))
        return out

    router = spark.conf.get("spark.maggma.windowPctl.exactRouter",
                            "kernel")
    if router == "kernel":
        # Round-10 DEFAULT router: ONE cogroup numpy kernel per
        # scaffold range computes the cumulative bucket vectors AND
        # routes the target ranks, replacing the V x nv cumulative
        # window sums, the gc windows, the offsets broadcast join,
        # and the separate Arrow router pass. Those window stages
        # were the codegen cliff the in-code notes below document
        # (field budget + janino method cap -> interpreted eval).
        # Round-11: the kernel works in key-tie GROUP space through
        # _pctl_group_traversal (explicit null-flag sort — null keys
        # distinct from genuine infinities; chunked bincount
        # histograms — O(chunk x V + rows) memory however tied the
        # sortBy; per-group rank routing expanded to per-row queries
        # at the end). exactRouter=window keeps the one-plan SQL
        # form.
        nbl2, vdl2, vml2 = list(nb), list(vdir), list(vmodes)
        # plan-time capture — see the approx kernel's CH note
        CH2 = _PCTL_KERNEL_CHUNK_GROUPS
        q_empty = pd.DataFrame({
            "vi": pd.Series(dtype="int32"),
            "b": pd.Series(dtype="int32"),
            "c": pd.Series(dtype="int32"),
            "g": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "qid": pd.Series(dtype="int64"),
            "si": pd.Series(dtype="int32"),
            "pi": pd.Series(dtype="int32"),
            "side": pd.Series(dtype="int32"),
            "m": pd.Series(dtype="int64")})

        def route_kernel(left, right):
            import numpy as np

            n_rows = len(left)
            if not n_rows:
                return q_empty
            g = left["__pq_g"].to_numpy(dtype="int64")
            ax = (pd.to_numeric(left["__pq_ax"], errors="coerce")
                  .to_numpy(dtype="float64")
                  if "range" in vml2 else None)
            axn = (left["__pq_axn"].to_numpy(dtype=bool)
                   if "range" in vml2 else None)
            out = []
            for vi in range(len(nbl2)):
                nbv = nbl2[vi]
                j = pd.to_numeric(left[f"__pq_b{vi}"],
                                  errors="coerce") \
                    .to_numpy(dtype="float64")
                order, gid, starts = _pctl_group_traversal(
                    g, ax, vml2[vi], vdl2[vi], axn)
                js = j[order]
                gs = g[order]
                G = len(starts)
                off = (np.asarray(right[f"__pq_off{vi}"].iloc[0],
                                  dtype=np.int64)
                       if len(right) else
                       np.zeros(nbv, dtype=np.int64))
                valid = ~np.isnan(js)
                jsi = np.where(valid, js, 0).astype(np.int64)
                myps = [(si, pi, pv) for si, pvi, pi, pv in plist
                        if pvi == vi]
                base = np.zeros(nbv, dtype=np.int64)
                for g0 in range(0, G, CH2):
                    g1 = min(g0 + CH2, G)
                    r0 = int(starts[g0])
                    r1 = int(starts[g1]) if g1 < G else n_rows
                    K = g1 - g0
                    sl_ = slice(r0, r1)
                    gl = gid[sl_] - g0
                    vm = valid[sl_]
                    H = np.bincount(gl[vm] * nbv + jsi[sl_][vm],
                                    minlength=K * nbv).reshape(K, nbv)
                    Cg = H.cumsum(axis=0) + base
                    base = Cg[-1].copy()
                    # frame runs to the END of each key-tie group;
                    # incoming offset is bucket-cumulative already
                    ce = Cg.cumsum(axis=1) + off
                    m_g = ce[:, -1]
                    # the comparison row number the selection kernel
                    # sees: g is increasing within every tie group,
                    # so max g over the frame = g at the tie end and
                    # min g over the mirrored frame = g at the tie
                    # start
                    ends = np.empty(K, dtype=np.int64)
                    ends[:-1] = starts[g0 + 1:g1] - 1
                    ends[-1] = r1 - 1
                    if vml2[vi] == "rows":
                        gc_g = (gs[sl_] if vdl2[vi] == "fwd"
                                else T1 - gs[sl_])
                    elif vdl2[vi] == "fwd":
                        gc_g = gs[ends]
                    else:
                        gc_g = T1 - gs[starts[g0:g1]]
                    c_g = ((gc_g - 1) * S // total_rows) \
                        .astype("int32")
                    qid_rows = gs[sl_]
                    for si, pi, pv in myps:
                        r = pv * (m_g - 1).astype("float64")
                        lo = np.floor(r).astype("int64")
                        hi = np.ceil(r).astype("int64")
                        for side, qarr in ((0, lo + 1), (1, hi + 1)):
                            gm = m_g > 0
                            if side == 1:
                                # hi only differs when p*(m-1) is
                                # fractional — skipping the duplicate
                                # halves query volume (the assembly
                                # coalesces hi->lo)
                                gm &= hi != lo
                            if not gm.any():
                                continue
                            qv = qarr[gm]
                            b = (ce[gm] < qv[:, None]).sum(
                                axis=1).astype("int64")
                            prior = np.where(
                                b > 0,
                                np.take_along_axis(
                                    ce[gm],
                                    np.maximum(b - 1, 0)[:, None],
                                    axis=1)[:, 0],
                                0)
                            # group-level results -> per-row queries
                            bf = np.zeros(K, dtype=np.int64)
                            bf[gm] = b
                            rk = np.zeros(K, dtype=np.int64)
                            rk[gm] = qv - prior
                            rm = gm[gl]
                            gi = gl[rm]
                            out.append(pd.DataFrame({
                                "vi": np.int32(vi),
                                "b": bf[gi].astype("int32"),
                                "c": c_g[gi],
                                "g": gc_g[gi],
                                "rank": rk[gi],
                                "qid": qid_rows[rm],
                                "si": np.int32(si),
                                "pi": np.int32(pi),
                                "side": np.int32(side),
                                "m": m_g[gi]}))
            return (pd.concat(out, ignore_index=True)
                    if out else q_empty)

        queries = (slb.select(
            "__gw_pid", "__pq_g",
            *(["__pq_ax", "__pq_axn"] if "range" in vmodes else []),
            *[f"__pq_b{vi}" for vi in range(nv)])
            .groupBy("__gw_pid")
            .cogroup(odf.groupBy("__gw_pid"))
            .applyInPandas(route_kernel, qschema))
    if router != "kernel":
        sl = slb.join(odf, on="__gw_pid")
        # pin the cumulative-count window + router stage at the scaffold's
        # range count: the checkpointed slim frame loses its partitioning
        # metadata, so the window re-shuffles, and AQE's byte-based
        # coalesce collapsed the tiny-by-bytes but compute-heavy-per-byte
        # stage (V window sums per row + the numpy router) into ONE task
        # (measured: a 2.9 s single-task stage inside a 6.6 s query at
        # bench SF). An explicit numPartitions is exempt from AQE
        # coalescing; at scale n_ranges == shuffle.partitions anyway.
        sl = sl.repartition(max(1, n_ranges), F.col("__gw_pid"))
        # cumulative bucket counts and the rank routing are PLAIN
        # expressions over the window attributes — every higher-order
        # function here (array fold, filter-count, element_at routing) is
        # CodegenFallback in Spark, which drops the WHOLE projection to
        # interpreted eval (~180 us/row, 1794 s of executor time at 10M —
        # SCALE.md round-8). cum_at[b] = # rows with bucket <= b and
        # g' <= g globally: one `bucket <= b` window sum plus the
        # bucket-cumulative range offset — no chained-add trees. Each cum
        # array materializes ONCE per input; routing references it
        # through element_at on the ATTRIBUTE (CollapseProject cannot
        # inline a non-cheap multiply-referenced alias, and
        # element_at(attr, literal) is plain codegen).
        # rows-mode frames count by global document order; range-mode
        # frames count by sort VALUE (RANGE frame: ties ahead of the row
        # enter its prefix — Mongo/SQL running-range semantics). The
        # reverse ('bwd', ['current','unbounded']) forms run the SAME
        # machinery over the reversed traversal: DESC windows, reverse
        # pid offsets, and kernel row numbers T+1-g, so "suffix" is just
        # a prefix of the mirrored axis. Null range keys keep SQL
        # framing in both directions (asc nulls first <-> desc nulls
        # last: a null row's forward frame is its null peer group, its
        # backward frame the whole partition). Prior/later pids hold
        # strictly smaller/larger keys (the scaffold's range partitioner
        # co-locates ties), so cumulative pid offsets stitch every mode.
        over_by = {
            ("rows", "fwd"): ("over (partition by __gw_pid order by "
                              "__pq_g rows between unbounded preceding "
                              "and current row)"),
            ("rows", "bwd"): ("over (partition by __gw_pid order by "
                              "__pq_g desc rows between unbounded "
                              "preceding and current row)"),
            ("range", "fwd"): ("over (partition by __gw_pid order by "
                               "__pq_ax asc nulls first range between "
                               "unbounded preceding and current row)"),
            ("range", "bwd"): ("over (partition by __gw_pid order by "
                               "__pq_ax desc nulls last range between "
                               "unbounded preceding and current row)"),
        }
        for vi in range(nv):
            over = over_by[(vmode[vi], vdir[vi])]
            # one LONG column per bucket, not one array column: the
            # routers rebuild the (rows x V) matrix with np.stack over
            # plain int64 columns at C speed — np.vstack over a per-row
            # LIST column was a Python-loop copy that dominated the
            # router at 10M rows (round-9), and UnsafeArrayData added an
            # extra per-row copy JVM-side
            sl = sl.select(
                "*", *[F.expr(
                    f"(coalesce(sum(cast(__pq_b{vi} <= {b} as bigint)) "
                    f"{over}, 0L) + element_at(__pq_off{vi}, {b + 1})) "
                    f"as __pq_cum{vi}_{b}")
                    for b in range(nb[vi])])
            # the comparison row number the kernel sees: raw g on the
            # (possibly mirrored) axis for rows frames; for range frames
            # the LAST tie's mirrored g (max over the same frame), so the
            # kernel admits every element the value frame contains
            if vmode[vi] == "range":
                gexp = ("max(__pq_g)" if vdir[vi] == "fwd"
                        else f"max({T1} - __pq_g)")
                gc = f"{gexp} {over}"
            else:
                gc = "__pq_g" if vdir[vi] == "fwd" else f"{T1} - __pq_g"
            sl = sl.withColumn(f"__pq_gc{vi}", F.expr(gc))

        # target ranks -> (bucket, residual rank) queries: an Arrow
        # mapInPandas ROUTER, not SQL expressions. Two generated-code
        # shapes were tried and measured first (SCALE.md round-8): ~2V
        # element_at comparisons per query struct inlined into one
        # projection blew janino's 64 KB method cap — whole-stage codegen
        # for Window->Project->Generate->Filter fuses into a single
        # processNext(), and so did the per-operator fallback, landing on
        # InterpretedUnsafeProjection at ~60 us/row (568-653 s at 10M);
        # higher-order array functions are CodegenFallback and measured
        # ~180 us/row. The router is three numpy primitives per
        # (p, side): cums is NONDECREASING along the bucket axis, so
        # bucket = (cums < q).sum(axis=1) and prior = cums[bucket-1] —
        # O(rows x V) in C, no 64 KB cliff, and it emits only the
        # surviving queries (m > 0, hi != lo dedup) instead of
        # explode-then-filter.
        def route(batches):
            import numpy as np

            for pdf in batches:
                if not len(pdf):
                    continue
                g = pdf["__pq_g"].to_numpy()
                gcmp_by_vi = {
                    vi: pdf[f"__pq_gc{vi}"].to_numpy()
                    for vi in sorted({v for _, v, _, _ in plist})}
                cums_by_vi = {
                    vi: np.stack([pdf[f"__pq_cum{vi}_{b}"].to_numpy()
                                  for b in range(nb_l[vi])], axis=1)
                    for vi in gcmp_by_vi}
                out = _emit_queries(g, gcmp_by_vi, cums_by_vi)
                if out:
                    yield pd.concat(out, ignore_index=True)

        queries = sl.select(
            "__pq_g", *[f"__pq_cum{vi}_{b}" for vi in range(nv)
                        for b in range(nb[vi])],
            *[f"__pq_gc{vi}" for vi in range(nv)]
        ).mapInPandas(
            route,
            "vi int, b int, c int, g long, rank long, qid long, "
            "si int, pi int, side int, m long")
    # ONE scan + inline() instead of an nv-branch union (round-12):
    # the union form re-scanned the slim blocks once per input and
    # doubled the plan's branch count; inline(array(named_struct...))
    # emits every input's (vi, b, eg, ev) element row from a single
    # pass. bwd inputs mirror the element row number — the kernel is
    # direction-blind, it only needs element g <= query g on a
    # consistent axis. The chunk explode replays chunk_of's exact
    # arithmetic ((eg-1)*S / total is a fractional SQL division under
    # floor, identical to the Column form it replaced).
    structs = ", ".join(
        f"named_struct('vi', {vi}, 'b', __pq_b{vi}, "
        + ("'eg', cast(__pq_g as bigint), "
           if vdir[vi] == "fwd"
           else f"'eg', cast({T1} - __pq_g as bigint), ")
        + f"'ev', __pq_v{vi})"
        for vi in range(nv))
    elems = (slb.select(F.expr(f"inline(array({structs}))"))
             .filter(F.col("ev").isNotNull())
             .select("vi", "b",
                     F.expr(f"explode(sequence(cast(floor((eg - 1) * "
                            f"{S} / {total_rows}) as int), {S - 1})) "
                            "as c"),
                     F.col("eg").alias("g"),
                     F.col("ev").alias("v")))

    empty = pd.DataFrame({"qid": pd.Series(dtype="int64"),
                          "si": pd.Series(dtype="int32"),
                          "pi": pd.Series(dtype="int32"),
                          "side": pd.Series(dtype="int32"),
                          "val": pd.Series(dtype="float64"),
                          "m": pd.Series(dtype="int64")})

    def kernel(el, qr):
        # Vectorized offline prefix selection (merge-sort tree over
        # the value order, batched wavelet-style descent): answer(q) =
        # the rank-th smallest value among elements with g <= q.g.
        # Each level stores, per node, the SORTED g's of its left
        # half; a query's left-count is one searchsorted. Queries
        # descend all levels in numpy batches — per-unique-node
        # searchsorted at shallow levels (few nodes), gather+compare
        # at deep levels (blocks <= 32 wide). O((n + q) log^2 n) in C,
        # ~25x the throughput of the per-query Python Fenwick this
        # replaced (SCALE.md round-8).
        import numpy as np

        if not len(qr):
            return empty
        vals = el["v"].to_numpy()
        n = len(vals)
        order = np.argsort(vals, kind="stable")
        svals = vals[order]
        g_by_value = el["g"].to_numpy()[order]
        P = 1 << max(1, (n - 1).bit_length() if n > 1 else 1)
        gpad = np.full(P, np.iinfo(np.int64).max)
        gpad[:n] = g_by_value
        L = P.bit_length() - 1
        left_sorted = []
        for lvl in range(L):
            block = P >> lvl
            lh = gpad.reshape(-1, block)[:, : block // 2]
            left_sorted.append(np.sort(lh, axis=1))

        qg = qr["g"].to_numpy()
        rank = qr["rank"].to_numpy().astype(np.int64)
        node = np.zeros(len(qr), dtype=np.int64)
        for lvl in range(L):
            ls = left_sorted[lvl]
            half = ls.shape[1]
            cnt = np.empty(len(qr), dtype=np.int64)
            if half <= 32:
                cnt[:] = (ls[node] <= qg[:, None]).sum(axis=1)
            else:
                srt = np.argsort(node, kind="stable")
                uniq, starts = np.unique(node[srt], return_index=True)
                bounds = np.append(starts[1:], len(qr))
                for u, st, en in zip(uniq, starts, bounds):
                    idx = srt[st:en]
                    cnt[idx] = np.searchsorted(ls[u], qg[idx],
                                               side="right")
            goleft = rank <= cnt
            node = node * 2 + np.where(goleft, 0, 1)
            rank = np.where(goleft, rank, rank - cnt)
        return pd.DataFrame({
            "qid": qr["qid"].to_numpy().astype(np.int64),
            "si": qr["si"].to_numpy().astype(np.int32),
            "pi": qr["pi"].to_numpy().astype(np.int32),
            "side": qr["side"].to_numpy().astype(np.int32),
            "val": svals[np.minimum(node, n - 1)],
            "m": qr["m"].to_numpy().astype(np.int64)})

    kout = (elems.groupby("vi", "b", "c")
            .cogroup(queries.groupby("vi", "b", "c"))
            .applyInPandas(
                kernel,
                "qid long, si int, pi int, side int, val double, "
                "m long"))
    return _pctl_assemble(df, specs, kout, total_rows)


def _bounded_broadcast(ans: DataFrame, total_rows: int,
                       n_cols: int) -> DataFrame:
    """Broadcast-hint the percentile answer frame for its join-back
    onto the wide frame when its estimated size is driver-safe
    (round-12): the answer side has exactly one row per input row, so
    a sort-merge join would EXCHANGE + SORT the full-width wide frame
    on the global row number — the single biggest data movement of
    the assembly at bench SF. Hinted broadcast turns it into a BHJ
    that preserves the wide side's partitioning and drops its
    exchange+sort. Bounded: past the cap (default 64 MB estimated as
    rows x (16 + 8 x answer-cols)) the hint is withheld and the join
    stays a shuffle — at 100 TB the answer frame is ~terabytes and
    must never reach the driver."""
    spark = ans.sparkSession
    cap = int(spark.conf.get(
        "spark.maggma.windowPctl.broadcastJoinBackBytes",
        str(64 << 20)))
    est = total_rows * (16 + 8 * n_cols)
    return F.broadcast(ans) if cap > 0 and est <= cap else ans


def _pctl_assemble(df: DataFrame, specs: list,
                   kout: DataFrame, total_rows: int) -> DataFrame:
    """Shared tail of the exact and approximate running-percentile
    paths: pivot the per-(spec, p, side) answer rows to one row per
    global row number, left-join onto the PRE-WINDOW wide frame, and
    interpolate lo/hi in-expression. Rows whose prefix is all-null
    for an input generate no queries for that spec, so the joined
    per-spec m is null and they emit null. The approximate path emits
    side=0 only with the already-interpolated value — the hi->lo
    coalesce below makes the frac interpolation a no-op there."""
    # parsed-expr forms throughout (round-12 py4j-chatter cut): the
    # SQL strings replay the exact Column trees they replaced — same
    # IEEE op order (r - floor(r), lo + frac * (hi - lo)), double
    # literals through CAST('repr' AS DOUBLE) so they round-trip
    # bit-exact
    aggs = []
    for si, sp in enumerate(specs):
        aggs.append(F.expr(
            f"min(case when si = {si} then m end) as __pq_m{si}"))
        aggs.extend(
            F.expr(f"min(case when si = {si} and pi = {pi} and "
                   f"side = {sd} then val end) as __pq_r{si}_{pi}_{sd}")
            for pi in range(len(sp["ps"])) for sd in (0, 1))
    piv = _bounded_broadcast(
        kout.groupBy("qid").agg(*aggs), total_rows,
        sum(1 + 2 * len(sp["ps"]) for sp in specs))
    wide = df.withColumn(
        "__pq_g",
        (F.col("__gw_rn") + F.col("__gw_off_rows")).cast("long"))
    res = (wide.join(piv, wide["__pq_g"] == piv["qid"], "left")
           .drop("qid"))
    outcols: dict = {}
    for si, sp in enumerate(specs):
        terms = []
        for pi, pv in enumerate(sp["ps"]):
            p = f"CAST('{float(pv)!r}' AS DOUBLE)"
            r = f"({p} * cast(__pq_m{si} - 1 as double))"
            frac = f"({r} - floor({r}))"
            lo = f"__pq_r{si}_{pi}_0"
            hi = f"coalesce(__pq_r{si}_{pi}_1, {lo})"
            terms.append(f"case when __pq_m{si} > 0 then "
                         f"{lo} + {frac} * ({hi} - {lo}) end")
        outcols[sp["out"]] = F.expr(
            terms[0] if sp["scalar"]
            else f"array({', '.join(terms)})")
    res = res.withColumns(outcols)
    return res.drop(*[c for c in res.columns
                      if c.startswith("__pq_")])


def _fin_deriv_integ(op: str, vm, w_fin, w_lag, chain_key):
    """$derivative/$integral over a REPLICATED finite frame (the
    rfin/dfin machinery of _swf_global): within an output's exact
    frame every copy is unmasked and the copy sequence is globally
    contiguous, so first/last over the frame and the lag-based
    trapezoid pairs are the true global ones. The frame's first row's
    pair (whose lag may cross into rows absent from this destination)
    is excluded exactly as in the partitioned compile — but NOT via
    first(pair) over the ax-ordered frame: with tied sort keys at the
    frame's lower edge, first() may resolve to a zero-width tie pair
    (the ax-only sort is not stable wrt the lag chain), silently
    leaving the pre-frame crossing term inside the sum. Instead
    subtract the pair of the frame row that is minimal in the SAME
    (ax, rn) order the lag chain uses (`chain_key`): exactly one
    frame row's lag crosses the boundary — the chain-first one (null
    lag → the sum never saw it and the coalesce subtracts 0)."""
    if op == "$deriv":
        dv = (F.last(vm["x"], ignorenulls=False).over(w_fin)
              - F.first(vm["x"], ignorenulls=False).over(w_fin))
        dt = (F.last(vm["t"], ignorenulls=False).over(w_fin)
              - F.first(vm["t"], ignorenulls=False).over(w_fin))
        return F.when(dt != F.lit(0), dv / dt)
    lx = F.lag(vm["x"]).over(w_lag)
    lt = F.lag(vm["t"]).over(w_lag)
    pair = (vm["x"] + lx) / 2 * (vm["t"] - lt)
    total = (F.sum(pair).over(w_fin)
             - F.coalesce(F.min_by(pair, chain_key).over(w_fin),
                          F.lit(0.0)))
    return F.coalesce(total, F.lit(0.0))


def _swf_global(df: DataFrame, spec: dict, sort: dict,
                bs: list = None, total: int = None) -> DataFrame:
    """Unpartitioned $setWindowFields WITHOUT the single-task global
    window: per-partition windows over the range-partition scaffold,
    stitched by driver-folded broadcast carries.

    Distributed here: $rank/$denseRank/$documentNumber (per-partition
    rank + prior-partition row/distinct offsets — sound because the
    range partitioner co-locates equal sort keys); $sum/$avg/$min/
    $max over documents frames ["unbounded","current"] (forward
    carry), ["current","unbounded"] (reverse-order running frame +
    backward carry — never Spark's O(n^2) unbounded-following frame),
    ["unbounded","unbounded"] (fold the boundary rows to one scalar
    literal), ["current","current"] (purely local); $first/$last over
    any documents frame (an unbounded end is the GLOBAL first/last row
    — one min_by/max_by scalar in the boundary aggregate, folded
    driver-side; a current end is the row's own value); and $sum/$avg/
    $min/$max over VALUE-RANGE frames on a numeric (or date-`unit`
    timestamp) sortBy: running ranges (["unbounded","current"] /
    ["current","unbounded"]) carry exactly like the documents frames
    because equal sort keys share a range id, and finite [lo, hi]
    frames replicate each row into the neighboring ranges whose spans
    overlap [key-hi, key-lo] (boundaries are literals, so the
    destination set is a pure row function; contributor copies carry a
    masked value so they can never corrupt a foreign frame; fan-out is
    guarded by MAX_RANGE_REPLICATION). Round 9 adds $expMovingAvg
    (per-range pandas-ewm kernel + affine (1-α)^k state carries),
    $derivative and $integral (finite frames via replication; running
    frames via first/last edge structs and trapezoid pair-sum
    carries; whole frames fold to literals). Order-dependent
    accumulators ($push/$addToSet) still raise and ask for
    partitionBy rather than silently funneling 100 TB through one
    task (house guard style)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    ranks = {"$rank", "$denseRank", "$documentNumber"}
    plans: dict[str, dict] = {}
    for out, odoc in spec["output"].items():
        odoc = dict(odoc)
        win = odoc.pop("window", {})
        (op, arg), = odoc.items()
        if op in ranks:
            if not sort:
                raise ValueError(f"{op} requires sortBy")
            plans[out] = {"kind": "rank", "op": op}
            continue
        if op == "$count":  # Mongo window $count == $sum of 1
            op, arg = "$sum", 1
        if op in ("$median", "$percentile"):
            # Mongo 7.0 window forms. No per-range partial recombines
            # into a percentile, so: whole frame -> ONE dedicated
            # exact-percentile action folded to a literal; finite
            # range/documents frames -> the replication machinery
            # (the percentile runs over the replicated frame
            # directly); running frames raise.
            a = dict(arg)
            ps = [0.5] if op == "$median" else \
                [float(x) for x in a["p"]]
            inp = a["input"]
            scalar = op == "$median"
            if "range" in win:
                rlo, rhi = win["range"]
                unit = win.get("unit")
                if unit is not None and unit not in _RANGE_UNIT_MS:
                    raise ValueError(
                        f"range unit {unit!r} has no fixed width")
                if isinstance(rlo, (int, float)) \
                        and isinstance(rhi, (int, float)):
                    plans[out] = {"kind": "rfin", "op": "$pctl",
                                  "arg": inp, "unit": unit,
                                  "range": (rlo, rhi), "ps": ps,
                                  "scalar": scalar}
                    continue
                if (rlo, rhi) in (("unbounded", "current"),
                                  ("current", "unbounded")):
                    # round-8: the prefix/suffix order-statistics path
                    # with RANGE-framed cumulative counts (ties by
                    # sort VALUE enter the frame) — see
                    # _global_running_pctl; the reverse form runs the
                    # same machinery over the DESC axis
                    plans[out] = {"kind": "pctl_rrun", "op": "$pctl",
                                  "arg": inp, "unit": unit, "ps": ps,
                                  "dir": ("fwd" if rlo == "unbounded"
                                          else "bwd"),
                                  "scalar": scalar}
                    continue
                raise ValueError(
                    f"unpartitioned {op} supports finite and running "
                    "(['unbounded','current'] / "
                    "['current','unbounded']) range frames only — "
                    "add partitionBy")
            frame = list(win.get("documents",
                                 ["unbounded", "unbounded"]))
            if tuple(frame) == ("unbounded", "unbounded"):
                plans[out] = {"kind": "pctl_whole", "op": "$pctl",
                              "arg": inp, "ps": ps, "scalar": scalar}
                continue
            if tuple(frame) in (("unbounded", "current"),
                                ("current", "unbounded")):
                # round-8: distributed prefix/suffix order statistics
                # — see _global_running_pctl
                if not sort:
                    raise ValueError(
                        f"documents frame {frame} requires sortBy")
                plans[out] = {"kind": "pctl_run", "op": "$pctl",
                              "arg": inp, "ps": ps, "scalar": scalar,
                              "dir": ("fwd" if frame[0] == "unbounded"
                                      else "bwd")}
                continue
            norm = [0 if b == "current" else b for b in frame]
            if all(isinstance(b, int) for b in norm) \
                    and norm[0] <= norm[1]:
                if not sort:
                    raise ValueError(
                        f"documents frame {frame} requires sortBy")
                plans[out] = {"kind": "dfin", "op": "$pctl",
                              "arg": inp, "ps": ps, "scalar": scalar,
                              "frame": (int(norm[0]), int(norm[1]))}
                continue
            raise ValueError(
                f"unpartitioned {op} supports whole-frame, running "
                "(['unbounded','current'] / ['current','unbounded']) "
                "or finite documents frames only — add partitionBy")
        if op == "$expMovingAvg":
            # round-9: EMA is an AFFINE recurrence (e' = a·e + b), so
            # a partition folds to one (a, b) = ((1-α)^k, local EMA
            # terms) pair composed driver-side exactly like the sum
            # carries: per-range pandas-ewm kernel computes the
            # no-incoming-state series e0, then each row is fixed up
            # by e = e0 + (1-α)^c · (s - v_first) where s is the
            # carried state entering the range and c the running
            # non-null count — algebraically the exact recurrence
            a = dict(arg) if isinstance(arg, dict) else {}
            if "alpha" in a:
                alpha = float(a["alpha"])
            elif "N" in a:
                alpha = 2.0 / (float(a["N"]) + 1.0)
            else:
                raise ValueError("$expMovingAvg needs alpha or N")
            if not 0 < alpha < 1:
                raise ValueError("$expMovingAvg alpha must be in (0, 1)")
            if not sort:
                raise ValueError("$expMovingAvg requires sortBy")
            plans[out] = {"kind": "ema", "op": op, "arg": a["input"],
                          "alpha": alpha}
            continue
        if op in ("$derivative", "$integral"):
            # round-9: finite frames ride the replication machinery
            # (first/last resp. trapezoid pairs over the replicated
            # frame); running frames decompose through per-range
            # first/last edge structs and trapezoid-pair-sum carries;
            # whole frames fold to literals from the same partials
            a = dict(arg)
            tunit = a.get("unit")
            if tunit is not None and tunit not in _RANGE_UNIT_MS:
                raise ValueError(
                    f"{op} unit {tunit!r} has no fixed width "
                    "(supported: millisecond..week)")
            if not sort or len(sort) != 1:
                raise ValueError(
                    f"{op} requires exactly one sortBy field")
            (_sfield, _sdir), = sort.items()
            if _sdir <= 0:
                raise ValueError(f"{op} requires an ascending sortBy")
            if "range" not in win and "documents" not in win:
                raise ValueError(f"{op} requires a window")
            short = "$deriv" if op == "$derivative" else "$integ"
            stem = short[1:]
            if "range" in win:
                rlo, rhi = win["range"]
                runit = win.get("unit")
                if runit is not None and runit not in _RANGE_UNIT_MS:
                    raise ValueError(
                        f"range unit {runit!r} has no fixed width")
                if isinstance(rlo, (int, float)) \
                        and isinstance(rhi, (int, float)):
                    plans[out] = {"kind": "rfin", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "unit": runit, "range": (rlo, rhi)}
                elif (rlo, rhi) == ("unbounded", "current"):
                    plans[out] = {"kind": f"{stem}_rrun", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "unit": runit, "dir": "fwd"}
                elif (rlo, rhi) == ("current", "unbounded"):
                    plans[out] = {"kind": f"{stem}_rrun", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "unit": runit, "dir": "bwd"}
                elif (rlo, rhi) == ("unbounded", "unbounded"):
                    plans[out] = {"kind": f"{stem}_whole", "op": short,
                                  "arg": a["input"], "tunit": tunit}
                else:
                    raise ValueError(
                        f"unpartitioned {op} range frames support "
                        "finite [lo, hi], running and unbounded "
                        "bounds only — add partitionBy")
            else:
                frame = list(win["documents"])
                norm = [0 if b == "current" else b for b in frame]
                if tuple(frame) == ("unbounded", "unbounded"):
                    plans[out] = {"kind": f"{stem}_whole", "op": short,
                                  "arg": a["input"], "tunit": tunit}
                elif tuple(frame) == ("unbounded", "current"):
                    plans[out] = {"kind": f"{stem}_run", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "dir": "fwd"}
                elif tuple(frame) == ("current", "unbounded"):
                    plans[out] = {"kind": f"{stem}_run", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "dir": "bwd"}
                elif all(isinstance(b, int) for b in norm) \
                        and norm[0] <= norm[1]:
                    plans[out] = {"kind": "dfin", "op": short,
                                  "arg": a["input"], "tunit": tunit,
                                  "frame": (int(norm[0]),
                                            int(norm[1]))}
                else:
                    raise ValueError(
                        f"unsupported documents frame {frame}")
            continue
        if op not in _ACCUMULATORS and \
                op not in ("$covariancePop", "$covarianceSamp"):
            raise ValueError(
                f"unsupported unpartitioned window operator {op} — "
                "add partitionBy")
        if op in ("$first", "$last"):
            if not sort:
                raise ValueError(f"{op} requires sortBy")
            if "range" in win:
                raise ValueError(
                    f"unpartitioned {op} over a range frame is not "
                    "supported; add partitionBy")
            frame = list(win.get("documents",
                                 ["unbounded", "unbounded"]))
            for end in frame:
                if end not in ("unbounded", "current"):
                    raise ValueError(
                        f"unpartitioned {op} supports only unbounded/"
                        f"current documents bounds, got {frame}")
            plans[out] = {"kind": "firstlast", "op": op, "arg": arg,
                          "frame": tuple(frame)}
            continue
        if op not in ("$sum", "$avg", "$min", "$max",
                      "$stdDevPop", "$stdDevSamp",
                      "$covariancePop", "$covarianceSamp"):
            raise ValueError(
                f"unpartitioned {op} window is order-dependent and "
                "not distributable; add partitionBy")
        if "range" in win:
            rlo, rhi = win["range"]
            unit = win.get("unit")
            if unit is not None and unit not in _RANGE_UNIT_MS:
                raise ValueError(
                    f"range unit {unit!r} has no fixed width "
                    "(supported: millisecond..week)")
            if rlo == "unbounded" and rhi in ("current", 0):
                kind = "rfwd"
            elif rhi == "unbounded" and rlo in ("current", 0):
                kind = "rbwd"
            elif isinstance(rlo, (int, float)) \
                    and isinstance(rhi, (int, float)):
                kind = "rfin"
            else:
                raise ValueError(
                    "unpartitioned range frames support "
                    '["unbounded","current"], ["current","unbounded"] '
                    "and finite [lo, hi] bounds; an unbounded end "
                    "paired with a nonzero offset has no bounded "
                    "carry decomposition — add partitionBy")
            plans[out] = {"kind": kind, "op": op, "arg": arg,
                          "unit": unit, "range": (rlo, rhi)}
            continue
        frame = list(win.get("documents", ["unbounded", "unbounded"]))
        kind = {("unbounded", "current"): "fwd",
                ("current", "unbounded"): "bwd",
                ("unbounded", "unbounded"): "whole",
                ("current", "current"): "self"}.get(tuple(frame))
        if kind is None:
            # finite row-offset frames ([-3, 0], [0, 5], ...) run
            # through the same replication machinery as finite range
            # frames, on the GLOBAL row-number axis (rn + carried
            # prior-range row offsets)
            norm = [0 if b == "current" else b for b in frame]
            if all(isinstance(b, int) for b in norm) \
                    and norm[0] <= norm[1]:
                plans[out] = {"kind": "dfin", "op": op, "arg": arg,
                              "frame": (int(norm[0]), int(norm[1]))}
                if not sort:
                    raise ValueError(
                        f"documents frame {frame} requires sortBy")
                continue
            raise ValueError(f"unsupported documents frame {frame}")
        if kind in ("fwd", "bwd", "self") and not sort:
            raise ValueError(f"documents frame {frame} requires sortBy")
        plans[out] = {"kind": kind, "op": op, "arg": arg}
    range_kinds = {"rfwd", "rbwd", "rfin", "pctl_rrun",
                   "deriv_rrun", "integ_rrun"}
    if any(p["kind"] in range_kinds for p in plans.values()):
        if len(sort) != 1:
            raise ValueError("range windows require exactly one "
                             "sortBy field")
        (rf_field, rf_dir), = sort.items()
        if rf_dir <= 0:
            raise ValueError("range windows require an ascending "
                             "sortBy")

    # Mongo's window $median/$percentile only OFFER method:
    # "approximate" — the default here is still the exact order-
    # statistics path (oracle bit-matchable); flipping the engine conf
    # licenses the sketch-interpolation fast path (rank error bounded
    # by the largest value-bucket's mass — see _global_running_pctl)
    pctl_approx = spark.conf.get(
        "spark.maggma.windowPctl.method", "exact") == "approximate"

    need_sort = any(p["kind"] not in ("whole", "pctl_whole")
                    for p in plans.values())

    # Round-12 (guide §2.4, remove shuffles outright): when this call
    # owns the range-boundary action anyway, fold the running-
    # percentile VALUE sketches into that ONE probe instead of
    # piggybacking them on the boundary aggregate. Knowing the bucket
    # splits BEFORE the boundary aggregate lets per-range bucket
    # histograms ride it too, so the driver computes the cumulative
    # bucket offsets from partials it already collects — the
    # percentile paths' hist groupBy -> coalesce(1) mapInPandas fold
    # -> broadcast chain (3 execution stages on the critical path of
    # every exact/approximate running percentile) collapses into a
    # zero-job LocalRelation. Driver actions stay exactly 2 (probe +
    # boundary aggregate; the ≤2-action pin still holds). Falls back
    # to the legacy piggyback when the caller precomputed boundaries
    # (multi-pass pipelines) or the sortBy is not numeric-keyed.
    pruns_pre = {o: p for o, p in plans.items()
                 if p["kind"] in ("pctl_run", "pctl_rrun")}
    presketch = None
    if pruns_pre and need_sort and bs is None and sort:
        from maggma_spark.functions.partitioning import _numeric_key

        first_key = next(iter(sort))
        nkey = _numeric_key(df, first_key)
        if nkey is not None:
            n_tgt = int(spark.conf.get("spark.sql.shuffle.partitions"))
            G = 128 if pctl_approx else 64
            ak_rep: dict = {}  # argkey -> representative output
            for o, p in pruns_pre.items():
                ak = (p["kind"], p["dir"], repr(p["arg"]))
                ak_rep.setdefault(ak, o)
            probe_aggs = [
                F.percentile_approx(
                    nkey,
                    F.array(*[F.lit(i / n_tgt)
                              for i in range(1, n_tgt)]),
                    F.lit(10_000)).alias("__bs"),
                F.count(F.lit(1)).alias("__n")]
            for ak, o in ak_rep.items():
                v = _value(df, pruns_pre[o]["arg"]).cast("double")
                probe_aggs.append(F.percentile_approx(
                    v, F.array(*[F.lit(i / G) for i in range(1, G)]),
                    F.lit(10_000)).alias(f"__sk_{o}"))
                if pctl_approx:
                    probe_aggs += [F.min(v).alias(f"__lo_{o}"),
                                   F.max(v).alias(f"__hi_{o}")]
            prow = df.agg(*probe_aggs).first()
            total_pre = prow["__n"]
            # boundary thinning — same rule as range_boundaries
            bvals = sorted({x for x in (prow["__bs"] or [])
                            if x is not None})
            mrr = _min_rows_per_range(spark)
            if mrr and bvals:
                want = max(8, min(n_tgt, total_pre // mrr))
                if want < len(bvals) + 1:
                    bvals = sorted({
                        bvals[min(len(bvals) - 1,
                                  round(j * (len(bvals) + 1) / want)
                                  - 1)]
                        for j in range(1, want)})
            bs = bvals
            if pctl_approx:
                V = int(spark.conf.get(
                    "spark.maggma.windowPctl.approxBuckets", "0")) \
                    or max(2, min(64, total_pre // 1024 + 2))
                V = max(2, min(64, V))
            else:
                # data-mass floor only — same round-13 decoupling
                # from shuffle.partitions as _global_running_pctl
                V = max(2, min(64, total_pre // 10_000 + 2))
            vbs_by_ak = {}
            for ak, o in ak_rep.items():
                sk = sorted(x for x in (prow[f"__sk_{o}"] or [])
                            if x is not None)
                vbs_by_ak[ak] = sorted(
                    {sk[(len(sk) * i) // V] for i in range(1, V)}) \
                    if sk else []
            presketch = {"V": V, "ak_rep": ak_rep,
                         "vbs": vbs_by_ak, "row": prow}

    if need_sort:
        ranged, wloc, bs, scaffold_total = _global_scaffold(
            df, sort, bs)
    else:
        ranged = df.withColumn("__gw_pid", F.spark_partition_id())
        wloc, bs, scaffold_total = None, [], None
    if presketch is not None:
        # the combined probe already counted the rows exactly
        scaffold_total = presketch["row"]["__n"]
    if scaffold_total is None:
        scaffold_total = total  # caller-precomputed (multi-pass)

    accs = {o: p for o, p in plans.items() if p["kind"] != "rank"}
    sort_field = next(iter(sort)) if sort else None
    # ONE withColumns per batch of independent columns (round-11):
    # chained withColumn stacks one Project per output, and the
    # analyzer walks the whole chain once per driver action — for the
    # 9-output covariance bench shape that plan-depth tax was part of
    # the ~1.5 s fixed plan-construction cost (SCALE.md round-10
    # residual accounting)
    vcols: dict = {}
    for out, p in accs.items():
        if p["op"] in ("$deriv", "$integ"):
            # (value, time) pair: t is the sortBy axis scaled to the
            # operator's own `unit` (independent of any range-frame
            # unit) — the same sort_time rule as the partitioned path
            x = _value(ranged, p["arg"]).cast("double")
            scol = F.col(sort_field)
            tu = p.get("tunit")
            t = (F.unix_millis(scol.cast("timestamp")).cast("double")
                 / F.lit(_RANGE_UNIT_MS[tu])) if tu \
                else scol.cast("double")
            vcols[f"__gw_v_{out}"] = F.struct(x.alias("x"),
                                              t.alias("t"))
            continue
        if p["kind"] == "ema":
            vcols[f"__gw_v_{out}"] = \
                _value(ranged, p["arg"]).cast("double")
            continue
        if p["op"] in ("$covariancePop", "$covarianceSamp"):
            # pair value: null unless BOTH sides are non-null, so
            # counts/partials align with covar_* skip semantics
            a, b = p["arg"]
            xa = _value(ranged, a).cast("double")
            xb = _value(ranged, b).cast("double")
            vcols[f"__gw_v_{out}"] = \
                F.when(xa.isNotNull() & xb.isNotNull(),
                       F.struct(xa.alias("x"), xb.alias("y")))
            continue
        vcols[f"__gw_v_{out}"] = _value(ranged, p["arg"])
    if vcols:
        ranged = ranged.withColumns(vcols)

    if presketch is not None:
        # materialize each percentile input's bucket index ONCE as a
        # column (round-12): the boundary aggregate's histogram sums
        # and the percentile paths' slim projections all reuse it. An
        # earlier form inlined the 63-term comparison ladder into
        # every per-bucket sum — O(V^2) expression evaluations per row
        # that doubled the 10M probe; this is the same
        # multiply-referenced-alias fix as the round-11 ladder work.
        hbcols: dict = {}
        for ak, rep in presketch["ak_rep"].items():
            vd = f"cast(`__gw_v_{rep}` as double)"
            ladder = " + ".join(
                f"cast({vd} > CAST('{float(x)!r}' AS DOUBLE) as int)"
                for x in presketch["vbs"][ak]) or "0"
            hbcols[f"__gw_hb_{rep}"] = F.expr(
                f"case when {vd} is not null then {ladder} end")
        ranged = ranged.withColumns(hbcols)

    range_plans = {o: p for o, p in plans.items()
                   if p["kind"] in range_kinds}
    if range_plans:
        has_unit = {p["unit"] is not None for p in range_plans.values()}
        if len(has_unit) > 1:
            raise ValueError("cannot mix `unit` and plain numeric "
                             "range windows over one sortBy")
        if has_unit.pop():
            # exact integer epoch-ms axis (a double epoch loses
            # sub-ms bits); per-plan offsets scale by the unit width
            axis = F.unix_millis(F.col(rf_field).cast("timestamp"))
        else:
            axis = F.col(rf_field).cast("double")
        ranged = ranged.withColumn("__gw_ax", axis)

    # Trapezoid pair term per row for $integral decompositions: the
    # pair covering (t_{i-1}, t_i] belongs to row i; within a range
    # the lag is the true global predecessor (the head row's pair is
    # null — its true value is the driver-computed boundary-crossing
    # term folded into the carry)
    integ_kinds = ("integ_run", "integ_rrun", "integ_whole")
    integs = {o: p for o, p in plans.items()
              if p["kind"] in integ_kinds}
    if integs:
        w_rn = Window.partitionBy("__gw_pid").orderBy("__gw_rn")
        prcols: dict = {}
        for out in integs:
            v = F.col(f"__gw_v_{out}")
            lx = F.lag(v["x"]).over(w_rn)
            lt = F.lag(v["t"]).over(w_rn)
            prcols[f"__gw_pr_{out}"] = (v["x"] + lx) / 2 \
                * (v["t"] - lt)
        ranged = ranged.withColumns(prcols)

    # Global $expMovingAvg: per-range pandas-ewm kernel over a SLIM
    # (pid, rn, value) projection — e0 is the EMA assuming no incoming
    # state, ct the running non-null count; joined back on the
    # deterministic (pid, rn) pair. The affine fix-up to the true
    # global recurrence happens in the final column expression.
    emas = {o: p for o, p in plans.items() if p["kind"] == "ema"}
    if emas:
        import pandas as pd

        keys = ["__gw_pid", "__gw_rn"]
        vcols = {o: f"__gw_v_{o}" for o in emas}
        alphas = {o: p["alpha"] for o, p in emas.items()}
        slim = ranged.select(*keys, *vcols.values())
        fields = ", ".join(
            ["`__gw_pid` int", "`__gw_rn` int"]
            + [f"`__gw_e0_{o}` double, `__gw_ct_{o}` bigint"
               for o in emas])

        def _ema_kernel(pdf):
            pdf = pdf.sort_values("__gw_rn", kind="mergesort")
            cols = {"__gw_pid": pdf["__gw_pid"],
                    "__gw_rn": pdf["__gw_rn"]}
            for o, vc in vcols.items():
                v = pdf[vc]
                # pandas' C ewm kernel IS the Mongo recurrence
                # (adjust=False, ignore_na=True — same contract as the
                # partitioned _exp_moving_avg kernel)
                cols[f"__gw_e0_{o}"] = v.ewm(
                    alpha=alphas[o], adjust=False,
                    ignore_na=True).mean()
                cols[f"__gw_ct_{o}"] = v.notna().cumsum().astype(
                    "int64")
            return pd.DataFrame(cols)

        ema_out = slim.groupBy("__gw_pid").applyInPandas(_ema_kernel,
                                                         fields)
        if scaffold_total is not None:
            # Round-13 (r12 verdict next #3, guide §3.1): the kernel
            # output is one slim row per input row, and its join-back
            # onto the full-width frame was a SortMergeJoin that
            # exchanged + sorted the wide side on (pid, rn) — the
            # same shape the percentile join-back fixed in round-12.
            # The scaffold's range probe already counted the rows, so
            # the same bounded broadcast applies: hinted BHJ below
            # the 64 MB estimate, shuffle past it (at 100 TB the
            # kernel output is ~terabytes and must never broadcast).
            ema_out = _bounded_broadcast(ema_out, scaffold_total,
                                         2 * len(emas))
        ranged = ranged.join(ema_out, on=keys)

    # Multi-action passes (percentile selection, finite-frame
    # replication, whole-frame percentile) re-execute the scaffold's
    # WindowExec once per action AND once in the caller's final job —
    # materialize the scaffolded frame ONCE so every later action and
    # the final job read blocks (round-9; the plain running-sum pass
    # stays uncheckpointed: its only extra action is the boundary
    # aggregate, and a materialization write would cost what it
    # saves). LAZY (round-10): the boundary aggregate collected just
    # below is the materializing action, so the checkpoint no longer
    # pays its own ~1 s dedicated job. Same conf escape hatch as the
    # entry checkpoint.
    multi_action = any(p["kind"] in ("pctl_run", "pctl_rrun",
                                     "pctl_whole", "rfin", "dfin",
                                     "ema")
                       for p in plans.values())
    ranged_ckpted = (need_sort and multi_action and spark.conf.get(
        "spark.maggma.globalWindow.checkpoint", "auto") != "never")
    if ranged_ckpted:
        ranged = ranged.localCheckpoint(eager=False)

    # ONE boundary aggregate: a single row per partition
    aggs = [F.count(F.lit(1)).alias("__rows")]
    if any(p.get("op") == "$denseRank" for p in plans.values()):
        aggs.append(F.countDistinct(
            F.struct(*[F.col(k) for k in sort])).alias("__dr"))
    for out, p in accs.items():
        v = F.col(f"__gw_v_{out}")
        if p["kind"] in ("pctl_run", "pctl_rrun"):
            if presketch is not None:
                # round-12: splits are already known (the probe above
                # sketched the value domain), so per-range BUCKET
                # HISTOGRAMS ride this aggregate — the driver folds
                # them into the cumulative offsets the percentile
                # kernels need, and the dedicated hist/fold/broadcast
                # stages disappear. One histogram per unique input
                # (representative output), parsed-expr form. The
                # ladder replays the slim projection's arithmetic
                # (cast to double, > on CAST('repr') literals) so the
                # bucket index is bit-identical to __pq_b downstream.
                ak = (p["kind"], p["dir"], repr(p["arg"]))
                if presketch["ak_rep"][ak] == out:
                    nbv = len(presketch["vbs"][ak]) + 1
                    aggs += [F.expr(
                        f"sum(case when `__gw_hb_{out}` = {b} "
                        f"then 1L else 0L end) as "
                        f"`__ph_{out}_{b}`") for b in range(nbv)]
                continue
            # legacy piggyback (caller precomputed the boundaries, or
            # non-numeric sortBy): the equi-depth VALUE sketch rides
            # this one aggregate (fixed quantile grid, thinned to the
            # bucket count later) so _global_running_pctl never pays
            # its own boundary action — balance is all that matters,
            # the histogram offsets stay exact. The approximate engine
            # mode uses a finer grid (more buckets = tighter rank
            # bound) and also needs the value extremes as outer
            # bucket edges for interpolation.
            G = 128 if pctl_approx else 64
            aggs.append(F.percentile_approx(
                v.cast("double"),
                F.array(*[F.lit(i / G) for i in range(1, G)]),
                F.lit(10_000)).alias(f"__pqsk_{out}"))
            if pctl_approx:
                aggs += [F.min(v.cast("double")).alias(f"__pqlo_{out}"),
                         F.max(v.cast("double")).alias(f"__pqhi_{out}")]
            continue
        if p["kind"] in ("rfin", "dfin", "pctl_whole"):
            # finite frames resolve by replication, whole-frame
            # percentiles by a dedicated action — no partials here
            continue
        if p["kind"] == "ema":
            # per-range EMA partials: non-null count k, first non-null
            # value (the no-state kernel's seed), and the kernel's
            # end-of-range state — the driver composes the affine
            # (1-α)^k carries from exactly these three scalars
            aggs += [
                F.count(v).alias(f"__emk_{out}"),
                F.min_by(v, F.when(v.isNotNull(),
                                   F.col("__gw_rn")))
                .alias(f"__emv1_{out}"),
                F.max_by(F.col(f"__gw_e0_{out}"),
                         F.col("__gw_rn")).alias(f"__eml_{out}")]
            continue
        if p["kind"].startswith("deriv_") or \
                p["kind"].startswith("integ_"):
            # first/last (value, time) edge structs per range; the
            # integral also carries the range's trapezoid pair sum
            aggs += [F.min_by(v, F.col("__gw_rn")).alias(f"__ef_{out}"),
                     F.max_by(v, F.col("__gw_rn")).alias(f"__el_{out}")]
            if p["kind"].startswith("integ_"):
                aggs.append(F.sum(F.col(f"__gw_pr_{out}"))
                            .alias(f"__ps_{out}"))
            continue
        if p["kind"] == "firstlast":
            pick = F.min_by if p["op"] == "$first" else F.max_by
            aggs.append(pick(v, F.col("__gw_rn")).alias(f"__s_{out}"))
        elif p["op"] in ("$sum", "$avg"):
            aggs += [F.sum(v).alias(f"__s_{out}"),
                     F.count(v).alias(f"__c_{out}")]
        elif p["op"] in ("$stdDevPop", "$stdDevSamp"):
            # decomposes through (count, sum, sum-of-squares)
            # partials; the naive recombination loses ~log10(mean^2/
            # var) digits to cancellation — fine for data-scale
            # magnitudes, same caveat as any sum-of-squares variance
            vd = v.cast("double")
            aggs += [F.sum(vd).alias(f"__s_{out}"),
                     F.sum(vd * vd).alias(f"__q_{out}"),
                     F.count(v).alias(f"__c_{out}")]
        elif p["op"] in ("$covariancePop", "$covarianceSamp"):
            # (n, Σx, Σy, Σxy) partials — the cross-moment analog of
            # the stddev carries, same cancellation caveat
            aggs += [F.sum(v["x"]).alias(f"__s_{out}"),
                     F.sum(v["y"]).alias(f"__y_{out}"),
                     F.sum(v["x"] * v["y"]).alias(f"__q_{out}"),
                     F.count(v).alias(f"__c_{out}")]
        elif p["op"] == "$min":
            aggs.append(F.min(v).alias(f"__s_{out}"))
        else:
            aggs.append(F.max(v).alias(f"__s_{out}"))
    bdf = ranged.groupBy("__gw_pid").agg(*aggs)
    parts = sorted(bdf.collect(), key=lambda r: r["__gw_pid"])
    btypes = {f.name: f.dataType for f in bdf.schema.fields}

    def fold(values, op):
        """Combine partition partials driver-side (skipping nulls)."""
        vals = [v for v in values if v is not None]
        if not vals:
            return None
        if op in ("$sum", "$avg", "count"):
            return sum(vals)
        return min(vals) if op == "$min" else max(vals)

    import math as _math

    def _nn(x):
        """None-for-NaN: kernel floats use NaN as the missing value."""
        return None if x is None or (
            isinstance(x, float) and _math.isnan(x)) else x

    # EMA: sequential driver fold of the per-range affine partials —
    # state entering range i+1 = e_out0_i when no prior state, else
    # e_out0_i + (1-α)^k_i · (s_i - v1_i) (the same fix-up each row
    # applies; one float op pair per range, N_ranges total)
    ema_states: dict[str, list] = {}
    ema_v1s: dict[str, list] = {}
    for out, p in plans.items():
        if p["kind"] != "ema":
            continue
        beta = 1.0 - p["alpha"]
        s, states, v1s = None, [], []
        for r in parts:
            states.append(s)
            v1 = _nn(r[f"__emv1_{out}"])
            v1s.append(v1)
            k = r[f"__emk_{out}"] or 0
            if k > 0:
                el = _nn(r[f"__eml_{out}"])
                s = el if s is None else el + beta ** k * (s - v1)
        ema_states[out] = states
        ema_v1s[out] = v1s

    # $integral running carries: prefix/suffix sums of per-range pair
    # sums plus the boundary-crossing trapezoid terms the in-range
    # lag cannot see (the pair between range q's last and range q+1's
    # first row)
    def _cross(a, b):
        if a is None or b is None:
            return None
        ax, at, bx, bt = a["x"], a["t"], b["x"], b["t"]
        if None in (ax, at, bx, bt):
            return None
        return (bx + ax) / 2.0 * (bt - at)

    integ_carries: dict[str, list] = {}
    for out, p in plans.items():
        if p["kind"] not in ("integ_run", "integ_rrun"):
            continue
        ps = [r[f"__ps_{out}"] for r in parts]
        efs = [r[f"__ef_{out}"] for r in parts]
        els = [r[f"__el_{out}"] for r in parts]
        crossings = [None] + [_cross(els[i - 1], efs[i])
                              for i in range(1, len(parts))]
        carries = []
        if p["dir"] == "fwd":
            acc = 0.0
            for i in range(len(parts)):
                if i > 0:
                    acc += (ps[i - 1] or 0.0) + (crossings[i] or 0.0)
                carries.append(acc)
        else:
            acc, rev_c = 0.0, []
            for i in range(len(parts) - 1, -1, -1):
                rev_c.append(acc)
                if i > 0:
                    acc += (ps[i] or 0.0) + (crossings[i] or 0.0)
            carries = rev_c[::-1]
        integ_carries[out] = carries

    carry_rows, carry_fields, done = [], [], set()
    for i, r in enumerate(parts):
        row = {"__gw_pid": r["__gw_pid"]}
        before, after = parts[:i], parts[i + 1:]
        row["__gw_off_rows"] = sum(p["__rows"] for p in before)
        if "__dr" in btypes:
            row["__gw_off_dr"] = sum(p["__dr"] for p in before)
        for out, p in accs.items():
            if p["kind"] not in ("fwd", "bwd", "rfwd", "rbwd"):
                continue
            # rfwd/rbwd carry whole-partition partials exactly like the
            # documents running frames: equal sort keys share a range
            # id, so every row of a PRIOR range has key < x (frame
            # boundary is the row's own key) — the partials are always
            # fully inside the frame
            side = before if p["kind"] in ("fwd", "rfwd") else after
            moment_ops = ("$stdDevPop", "$stdDevSamp",
                          "$covariancePop", "$covarianceSamp")
            fold_op = "$sum" if p["op"] in moment_ops else p["op"]
            row[f"__gw_cs_{out}"] = fold(
                [q[f"__s_{out}"] for q in side], fold_op)
            if p["op"] in ("$sum", "$avg") + moment_ops:
                row[f"__gw_cc_{out}"] = fold(
                    [q[f"__c_{out}"] for q in side], "count") or 0
            if p["op"] in moment_ops:
                row[f"__gw_cq_{out}"] = fold(
                    [q[f"__q_{out}"] for q in side], "$sum")
            if p["op"] in ("$covariancePop", "$covarianceSamp"):
                row[f"__gw_cy_{out}"] = fold(
                    [q[f"__y_{out}"] for q in side], "$sum")
        for out in ema_states:
            row[f"__gw_es_{out}"] = ema_states[out][i]
            row[f"__gw_e1_{out}"] = ema_v1s[out][i]
        for out in integ_carries:
            row[f"__gw_ci_{out}"] = integ_carries[out][i]
        carry_rows.append(row)
    from pyspark.sql.types import LongType

    carry_fields.append(("__gw_off_rows", LongType()))
    if "__dr" in btypes:
        carry_fields.append(("__gw_off_dr", LongType()))
    for out, p in accs.items():
        if p["kind"] in ("fwd", "bwd", "rfwd", "rbwd"):
            moment_ops = ("$stdDevPop", "$stdDevSamp",
                          "$covariancePop", "$covarianceSamp")
            carry_fields.append((f"__gw_cs_{out}", btypes[f"__s_{out}"]))
            if p["op"] in ("$sum", "$avg") + moment_ops:
                carry_fields.append((f"__gw_cc_{out}", LongType()))
            if p["op"] in moment_ops:
                carry_fields.append((f"__gw_cq_{out}",
                                     btypes[f"__q_{out}"]))
            if p["op"] in ("$covariancePop", "$covarianceSamp"):
                carry_fields.append((f"__gw_cy_{out}",
                                     btypes[f"__y_{out}"]))
    from pyspark.sql.types import DoubleType

    for out in ema_states:
        carry_fields += [(f"__gw_es_{out}", DoubleType()),
                         (f"__gw_e1_{out}", DoubleType())]
    for out in integ_carries:
        carry_fields.append((f"__gw_ci_{out}", DoubleType()))
    # whole-frame-only specs fold to literals and need no carry join —
    # and without the sort scaffold the pid is the NATURAL partition id,
    # which is not stable across jobs (the deterministic-range guarantee
    # only holds when the id is derived from the sort key), so an inner
    # join on it could silently drop rows
    if any(p["kind"] in ("rank", "fwd", "bwd", "rfwd", "rbwd", "self",
                         "dfin", "pctl_run", "pctl_rrun", "ema",
                         "integ_run", "integ_rrun")
           for p in plans.values()):
        ranged = ranged.join(_carry_df(spark, carry_rows, carry_fields),
                             on="__gw_pid")

    rank_fns = {"$rank": F.rank, "$denseRank": F.dense_rank,
                "$documentNumber": F.row_number}
    # Running frames order by the UNIQUE __gw_rn, not the raw sort
    # keys: separate Window execs may traverse tied keys in different
    # orders (a later pass re-sorts already-reordered rows with a
    # stable sort), silently mismatching the row numbers assigned in
    # the first pass. rank/denseRank keep the raw keys — they must
    # see ties as ties, and their VALUES are traversal-independent.
    back = (Window.partitionBy("__gw_pid").orderBy("__gw_rn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            if need_sort else None)
    rev = (Window.partitionBy("__gw_pid")
           .orderBy(F.col("__gw_rn").desc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow)
           if need_sort else None)
    # every output column below is INDEPENDENT (each reads only
    # scaffold/value/carry columns), so they accumulate into ONE
    # withColumns projection applied after the loop (round-11) —
    # 18 chained Projects collapsed to one, shrinking the plan the
    # analyzer re-walks on every downstream action
    pending: dict = {}
    for out, p in plans.items():
        if p["kind"] == "rank":
            off = F.col("__gw_off_dr" if p["op"] == "$denseRank"
                        else "__gw_off_rows")
            # documentNumber reuses the scaffold's row number instead
            # of re-evaluating row_number() in a later pass, whose tie
            # traversal could differ from the first pass's
            base = (F.col("__gw_rn") if p["op"] == "$documentNumber"
                    else rank_fns[p["op"]]().over(wloc))
            pending[out] = (base + off).cast("long")
            continue
        v = F.col(f"__gw_v_{out}")
        if p["kind"] in ("rfin", "dfin", "pctl_run",
                         "pctl_rrun"):
            continue  # handled below (replication / two-pass select)
        if p["kind"] == "ema":
            # affine fix-up of the no-state kernel series: rows before
            # the range's first non-null carry the incoming state
            e0 = F.col(f"__gw_e0_{out}")
            c = F.col(f"__gw_ct_{out}")
            s = F.col(f"__gw_es_{out}")
            v1 = F.col(f"__gw_e1_{out}")
            beta = F.lit(1.0 - p["alpha"])
            fixed = F.when(
                s.isNotNull(),
                e0 + F.pow(beta, c.cast("double")) * (s - v1)
            ).otherwise(e0)
            pending[out] = F.when(c > 0, fixed).otherwise(s)
            continue
        if p["kind"] in ("deriv_whole", "integ_whole"):
            if p["kind"] == "deriv_whole":
                f0 = parts[0][f"__ef_{out}"] if parts else None
                l0 = parts[-1][f"__el_{out}"] if parts else None
                val = None
                if (f0 is not None and l0 is not None
                        and f0["t"] is not None and l0["t"] is not None
                        and l0["t"] != f0["t"]
                        and f0["x"] is not None
                        and l0["x"] is not None):
                    val = (l0["x"] - f0["x"]) / (l0["t"] - f0["t"])
            else:
                ps_tot = sum(r[f"__ps_{out}"] or 0.0 for r in parts)
                for i in range(1, len(parts)):
                    ps_tot += _cross(parts[i - 1][f"__el_{out}"],
                                     parts[i][f"__ef_{out}"]) or 0.0
                val = ps_tot if parts else 0.0
            pending[out] = F.lit(val).cast("double")
            continue
        if p["kind"] in ("deriv_run", "deriv_rrun"):
            # running derivative: one frame end is the GLOBAL first
            # (fwd) / last (bwd) row's (value, time) — a folded
            # literal; the other end is the current row (documents
            # frame) or its sort-key tie group's last/first row
            # (value-range frame, RANGE BETWEEN CURRENT AND CURRENT)
            edge = (parts[0][f"__ef_{out}"] if p["dir"] == "fwd"
                    else parts[-1][f"__el_{out}"]) if parts else None
            ex = F.lit(None if edge is None else edge["x"]) \
                .cast("double")
            et = F.lit(None if edge is None else edge["t"]) \
                .cast("double")
            if p["kind"] == "deriv_rrun":
                tie = (Window.partitionBy("__gw_pid")
                       .orderBy(F.col("__gw_ax").asc())
                       .rangeBetween(0, 0))
                if p["dir"] == "fwd":
                    cx = F.last(v["x"], ignorenulls=False).over(tie)
                    ct_ = F.last(v["t"], ignorenulls=False).over(tie)
                else:
                    cx = F.first(v["x"], ignorenulls=False).over(tie)
                    ct_ = F.first(v["t"], ignorenulls=False).over(tie)
            else:
                cx, ct_ = v["x"], v["t"]
            dv = (cx - ex) if p["dir"] == "fwd" else (ex - cx)
            dt = (ct_ - et) if p["dir"] == "fwd" else (et - ct_)
            pending[out] = F.when(dt != F.lit(0), dv / dt)
            continue
        if p["kind"] in ("integ_run", "integ_rrun"):
            pr = F.col(f"__gw_pr_{out}")
            ci = F.coalesce(F.col(f"__gw_ci_{out}"), F.lit(0.0))
            if p["kind"] == "integ_run":
                if p["dir"] == "fwd":
                    local = F.coalesce(F.sum(pr).over(back), F.lit(0.0))
                else:
                    # suffix pairs j > i: the reverse running sum
                    # includes the row's own pair (which covers the
                    # span BEFORE it — outside the frame), subtract it
                    local = (F.coalesce(F.sum(pr).over(rev), F.lit(0.0))
                             - F.coalesce(pr, F.lit(0.0)))
            else:
                if p["dir"] == "fwd":
                    wr = (Window.partitionBy("__gw_pid")
                          .orderBy(F.col("__gw_ax").asc())
                          .rangeBetween(Window.unboundedPreceding, 0))
                    local = F.coalesce(F.sum(pr).over(wr), F.lit(0.0))
                else:
                    wrd = (Window.partitionBy("__gw_pid")
                           .orderBy(F.col("__gw_ax").desc())
                           .rangeBetween(Window.unboundedPreceding, 0))
                    tie = (Window.partitionBy("__gw_pid")
                           .orderBy(F.col("__gw_ax").asc())
                           .rangeBetween(0, 0))
                    # frame starts at the tie group's CHAIN-first row
                    # (min rn — the lag chain's order); its pair
                    # covers the span before the frame — subtract it.
                    # first() over the ax-only ordering is ambiguous
                    # under ties and could pick a zero-width tie pair
                    fp = F.min_by(pr, F.col("__gw_rn")).over(tie)
                    local = (F.coalesce(F.sum(pr).over(wrd), F.lit(0.0))
                             - F.coalesce(fp, F.lit(0.0)))
            pending[out] = local + ci
            continue
        if p["kind"] == "pctl_whole":
            # ONE dedicated action: percentile has no per-range
            # partial decomposition, so the whole frame is a single
            # percentile aggregate folded to a literal (exact by
            # default; the approximate engine mode uses the mergeable
            # percentile_approx sketch — same one-action shape)
            pfn = (F.percentile_approx if pctl_approx else F.percentile)
            qrow = ranged.agg(pfn(
                v.cast("double"),
                F.array(*[F.lit(x) for x in p["ps"]])).alias("q")
            ).first()
            vals = qrow["q"]
            if p["scalar"]:
                col = F.lit(vals[0] if vals else None).cast("double")
            elif vals is None:
                col = F.lit(None).cast("array<double>")
            else:
                col = F.array(*[F.lit(float(x)).cast("double")
                                for x in vals])
            pending[out] = col
            continue
        if p["kind"] == "firstlast":
            lo_b, hi_b = p["frame"]
            if (p["op"] == "$first" and lo_b == "current") or \
                    (p["op"] == "$last" and hi_b == "current"):
                # frame starts (ends) at the current row -> own value
                pending[out] = v
            else:
                # unbounded end -> the GLOBAL first/last row's value,
                # folded driver-side from the per-range min_by/max_by
                val = None
                if parts:
                    val = (parts[0] if p["op"] == "$first"
                           else parts[-1])[f"__s_{out}"]
                pending[out] = F.lit(val).cast(btypes[f"__s_{out}"])
            continue
        if p["kind"] == "whole":
            if p["op"] in ("$covariancePop", "$covarianceSamp"):
                sx = fold([r[f"__s_{out}"] for r in parts], "$sum") or 0.0
                sy = fold([r[f"__y_{out}"] for r in parts], "$sum") or 0.0
                sxy = fold([r[f"__q_{out}"] for r in parts], "$sum") or 0.0
                c = fold([r[f"__c_{out}"] for r in parts], "count") or 0
                if p["op"] == "$covariancePop":
                    val = (sxy / c - (sx / c) * (sy / c)) if c > 0 \
                        else None
                else:
                    val = ((sxy - sx * sy / c) / (c - 1)) if c > 1 \
                        else None
                pending[out] = F.lit(val).cast("double")
                continue
            if p["op"] in ("$stdDevPop", "$stdDevSamp"):
                s = fold([r[f"__s_{out}"] for r in parts], "$sum") or 0.0
                q = fold([r[f"__q_{out}"] for r in parts], "$sum") or 0.0
                c = fold([r[f"__c_{out}"] for r in parts], "count") or 0
                if p["op"] == "$stdDevPop":
                    val = (max(q / c - (s / c) ** 2, 0.0) ** 0.5
                           if c > 0 else None)
                else:
                    val = (max((q - s * s / c) / (c - 1), 0.0) ** 0.5
                           if c > 1 else None)
                pending[out] = F.lit(val).cast("double")
                continue
            tot = fold([r[f"__s_{out}"] for r in parts], p["op"])
            if p["op"] == "$avg":
                cnt = fold([r[f"__c_{out}"] for r in parts], "count") or 0
                tot = (float(tot) / cnt) if cnt else None
                col = F.lit(tot).cast("double")
            else:
                if p["op"] == "$sum" and tot is None:
                    tot = 0  # Mongo: $sum over an all-null frame is 0
                col = F.lit(tot).cast(btypes[f"__s_{out}"])
            pending[out] = col
            continue
        if p["kind"] == "self":
            frame_w = wloc.rowsBetween(Window.currentRow, Window.currentRow)
            if p["op"] in ("$covariancePop", "$covarianceSamp"):
                fn = (F.covar_pop if p["op"] == "$covariancePop"
                      else F.covar_samp)
                pending[out] = fn(v["x"], v["y"]).over(frame_w)
            else:
                pending[out] = _ACCUMULATORS[p["op"]](v).over(frame_w)
            continue
        if p["kind"] == "rfwd":
            loc_w = (Window.partitionBy("__gw_pid")
                     .orderBy(F.col("__gw_ax").asc())
                     .rangeBetween(Window.unboundedPreceding, 0))
        elif p["kind"] == "rbwd":
            # reverse axis order: the frame "keys >= x" becomes a
            # running range over the descending traversal
            loc_w = (Window.partitionBy("__gw_pid")
                     .orderBy(F.col("__gw_ax").desc())
                     .rangeBetween(Window.unboundedPreceding, 0))
        else:
            loc_w = back if p["kind"] == "fwd" else rev
        cs = F.col(f"__gw_cs_{out}")
        if p["op"] in ("$min", "$max"):
            comb = F.least if p["op"] == "$min" else F.greatest
            local = (F.min if p["op"] == "$min" else F.max)(v).over(loc_w)
            pending[out] = comb(local, cs)
            continue
        if p["op"] in ("$covariancePop", "$covarianceSamp"):
            n = (F.count(v).over(loc_w)
                 + F.col(f"__gw_cc_{out}")).cast("double")
            sx = (F.coalesce(F.sum(v["x"]).over(loc_w), F.lit(0.0))
                  + F.coalesce(F.col(f"__gw_cs_{out}"), F.lit(0.0)))
            sy = (F.coalesce(F.sum(v["y"]).over(loc_w), F.lit(0.0))
                  + F.coalesce(F.col(f"__gw_cy_{out}"), F.lit(0.0)))
            sxy = (F.coalesce(F.sum(v["x"] * v["y"]).over(loc_w),
                              F.lit(0.0))
                   + F.coalesce(F.col(f"__gw_cq_{out}"), F.lit(0.0)))
            if p["op"] == "$covariancePop":
                cov = F.when(n > 0, sxy / n - (sx / n) * (sy / n))
            else:
                cov = F.when(n > 1, (sxy - sx * sy / n) / (n - 1))
            pending[out] = cov
            continue
        if p["op"] in ("$stdDevPop", "$stdDevSamp"):
            vd = v.cast("double")
            n = (F.count(v).over(loc_w)
                 + F.col(f"__gw_cc_{out}")).cast("double")
            s = (F.coalesce(F.sum(vd).over(loc_w), F.lit(0.0))
                 + F.coalesce(cs, F.lit(0.0)))
            q = (F.coalesce(F.sum(vd * vd).over(loc_w), F.lit(0.0))
                 + F.coalesce(F.col(f"__gw_cq_{out}"), F.lit(0.0)))
            if p["op"] == "$stdDevPop":
                var = F.when(n > 0, F.greatest(
                    q / n - (s / n) * (s / n), F.lit(0.0)))
            else:
                var = F.when(n > 1, F.greatest(
                    (q - s * s / n) / (n - 1), F.lit(0.0)))
            pending[out] = F.sqrt(var)
            continue
        local_s = F.sum(v).over(loc_w)
        cnt_tot = F.count(v).over(loc_w) + F.col(f"__gw_cc_{out}")
        sum_tot = F.coalesce(local_s, F.lit(0)) + F.coalesce(cs, F.lit(0))
        if p["op"] == "$avg":
            pending[out] = F.when(cnt_tot > 0, sum_tot / cnt_tot)
        else:
            # Mongo window $sum: 0 over empty/all-null frames (sum_tot
            # is already 0 there — no empty-frame null gate)
            pending[out] = sum_tot.cast(btypes[f"__s_{out}"])
    if pending:
        ranged = ranged.withColumns(pending)

    rfins = {o: p for o, p in plans.items() if p["kind"] == "rfin"}
    if rfins:
        # Finite [lo, hi] value-range frames by boundary-overlap
        # replication: a row with key x contributes to the frames of
        # rows y in [x-hi, x-lo], so it is copied into every range
        # whose span overlaps that interval (the boundary list is
        # literals — the destination set is a pure row function, the
        # same soundness rule as the carry scaffold). Copies outside an
        # output's own contributor interval carry a MASKED (null)
        # value, so they occupy axis positions harmlessly and can
        # never corrupt a foreign frame. Fan-out ~ frame_width /
        # range_span, guarded by MAX_RANGE_REPLICATION; results join
        # back on the deterministic (range id, row number) pair.
        from maggma_spark.functions.partitioning import _numeric_key

        span = ((float(bs[-1]) - float(bs[0])) / (len(bs) - 1)
                if len(bs) >= 2 else None)
        bkey = _numeric_key(ranged, rf_field)
        if bkey is None:
            bkey = F.col(rf_field)

        def pid_ladder(col):
            pid = F.lit(0)
            for b in bs:
                pid = pid + (col > F.lit(b)).cast("int")
            # null sort keys have no numeric frame: keep them in their
            # own range (their frame only ever matches other nulls)
            return F.when(F.col(rf_field).isNull(),
                          F.col("__gw_pid")).otherwise(pid.cast("int"))

        rep = ranged
        offsets = {}
        lo_cols, hi_cols = [F.col("__gw_pid")], [F.col("__gw_pid")]
        for out, p in rfins.items():
            rlo, rhi = (float(x) for x in p["range"])
            unit = p["unit"]
            # window-axis offsets (ms for unit frames, raw otherwise)
            # must land on integers: rangeBetween takes long bounds
            alo, ahi = rlo * (_RANGE_UNIT_MS[unit] if unit else 1), \
                rhi * (_RANGE_UNIT_MS[unit] if unit else 1)
            if alo != int(alo) or ahi != int(ahi):
                raise ValueError(
                    f"range frame offsets {p['range']} must scale to "
                    "integers on the window axis")
            offsets[out] = (int(alo), int(ahi))
            # boundary-unit offsets (micros for timestamps)
            bscale = (_RANGE_UNIT_MS[unit] * 1000.0) if unit else 1.0
            width = (rhi - rlo) * bscale
            if span and span > 0 and width / span > MAX_RANGE_REPLICATION:
                raise ValueError(
                    f"range frame {p['range']} spans ~{width / span:.0f}"
                    f" ranges (> MAX_RANGE_REPLICATION="
                    f"{MAX_RANGE_REPLICATION}): the replication fan-out "
                    "would multiply shuffle volume — add partitionBy, "
                    "or use fewer/wider ranges")
            rep = (rep
                   .withColumn(f"__gw_plo_{out}",
                               pid_ladder(bkey - F.lit(rhi * bscale)))
                   .withColumn(f"__gw_phi_{out}",
                               pid_ladder(bkey - F.lit(rlo * bscale))))
            lo_cols.append(F.col(f"__gw_plo_{out}"))
            hi_cols.append(F.col(f"__gw_phi_{out}"))
        rep = rep.withColumn(
            "__gw_dest",
            F.explode(F.sequence(F.least(*lo_cols),
                                 F.greatest(*hi_cols))))
        from pyspark.sql.types import DecimalType

        wdest = Window.partitionBy("__gw_dest")
        for out, p in rfins.items():
            alo, ahi = offsets[out]
            vm = F.when(
                F.col("__gw_dest").between(F.col(f"__gw_plo_{out}"),
                                           F.col(f"__gw_phi_{out}")),
                F.col(f"__gw_v_{out}"))
            if p["op"] in _INVERTIBLE_WINDOW_OPS and not (
                    p["op"] == "$avg" and isinstance(
                        _agg_type(rep, vm), DecimalType)):
                # growing-frame differencing instead of the O(width)/
                # row sliding frame; decimal $avg keeps the sliding
                # path so Spark's own decimal-average precision rules
                # apply unchanged
                cum = _growing_cum_range(wdest, F.col("__gw_ax"),
                                         alo, ahi)
                col = _frame_from_cum(p["op"], vm, cum)
                if p["op"] == "$sum":
                    col = col.cast(_agg_type(rep, F.sum(vm)))
                rep = rep.withColumn(out, col)
                continue
            w_fin = (wdest.orderBy(F.col("__gw_ax").asc())
                     .rangeBetween(alo, ahi))
            if p["op"] in ("$deriv", "$integ"):
                rep = rep.withColumn(out, _fin_deriv_integ(
                    p["op"], vm, w_fin,
                    wdest.orderBy(F.col("__gw_ax").asc(),
                                  F.col("__gw_rn").asc()),
                    F.struct(F.col("__gw_ax"), F.col("__gw_rn"))))
                continue
            if p["op"] == "$pctl":
                pc = F.percentile(
                    vm.cast("double"),
                    F.array(*[F.lit(x) for x in p["ps"]])).over(w_fin)
                col = F.element_at(pc, 1) if p["scalar"] else pc
            elif p["op"] in ("$covariancePop", "$covarianceSamp"):
                fn = (F.covar_pop if p["op"] == "$covariancePop"
                      else F.covar_samp)
                col = fn(vm["x"], vm["y"]).over(w_fin)
            else:
                col = _ACCUMULATORS[p["op"]](vm).over(w_fin)
            if p["op"] == "$sum":
                col = F.coalesce(col, F.lit(0))
            # the window must run BEFORE the owner filter — filtering
            # first would drop the contributor copies from the frame
            rep = rep.withColumn(out, col)
        # owner copies carry every earlier column 1:1 (the explode
        # duplicates rows, dest==pid restores exactly the original
        # set), so the result IS the filtered frame — no join-back
        ranged = rep.filter(F.col("__gw_dest") == F.col("__gw_pid"))

    dfins = {o: p for o, p in plans.items() if p["kind"] == "dfin"}
    if dfins:
        # Finite ROW-OFFSET documents frames ([-3, 0], [0, 5], ...)
        # by the same replication trick, on the GLOBAL row-number axis
        # g = per-range rn + carried prior-range row offset. The
        # per-range cumulative row counts are driver scalars, so "which
        # range holds global row g+k" is a literal comparison ladder;
        # rangeBetween over the UNIQUE integer g equals the row-offset
        # frame exactly. Ties in the sort key follow the scaffold's
        # deterministic rn (Mongo's tie traversal is likewise
        # unspecified — DEVIATIONS §16).
        cums, acc = [], 0
        for r in parts:
            acc += r["__rows"]
            cums.append(acc)
        total_rows, nparts = acc, len(parts)
        avg_rows = total_rows / max(1, nparts)

        def idx_ladder(col):
            idx = F.lit(0)
            for c in cums[:-1]:
                idx = idx + (col > F.lit(int(c))).cast("int")
            return idx

        rep = ranged.withColumn(
            "__gw_g", F.col("__gw_rn") + F.col("__gw_off_rows"))
        rep = rep.withColumn("__gw_oidx", idx_ladder(F.col("__gw_g")))
        lo_cols, hi_cols = [F.col("__gw_oidx")], [F.col("__gw_oidx")]
        for out, p in dfins.items():
            dlo, dhi = p["frame"]
            width = dhi - dlo + 1
            if avg_rows > 0 and width / avg_rows > MAX_RANGE_REPLICATION:
                raise ValueError(
                    f"documents frame {list(p['frame'])} spans "
                    f"~{width / avg_rows:.0f} ranges (> "
                    f"MAX_RANGE_REPLICATION={MAX_RANGE_REPLICATION}): "
                    "the replication fan-out would multiply shuffle "
                    "volume — add partitionBy, or use fewer/wider "
                    "ranges")
            rep = (rep
                   .withColumn(f"__gw_dlo_{out}",
                               idx_ladder(F.col("__gw_g") - F.lit(dhi)))
                   .withColumn(f"__gw_dhi_{out}",
                               idx_ladder(F.col("__gw_g") - F.lit(dlo))))
            lo_cols.append(F.col(f"__gw_dlo_{out}"))
            hi_cols.append(F.col(f"__gw_dhi_{out}"))
        rep = rep.withColumn(
            "__gw_gdest",
            F.explode(F.sequence(F.least(*lo_cols),
                                 F.greatest(*hi_cols))))
        from pyspark.sql.types import DecimalType

        wgdest = Window.partitionBy("__gw_gdest")
        for out, p in dfins.items():
            dlo, dhi = p["frame"]
            vm = F.when(
                F.col("__gw_gdest").between(F.col(f"__gw_dlo_{out}"),
                                            F.col(f"__gw_dhi_{out}")),
                F.col(f"__gw_v_{out}"))
            if p["op"] in _INVERTIBLE_WINDOW_OPS and not (
                    p["op"] == "$avg" and isinstance(
                        _agg_type(rep, vm), DecimalType)):
                # __gw_g is a unique non-null integer axis: two-term
                # growing-frame differencing, one ordering, one sort
                cum = _growing_cum_axis(wgdest, F.col("__gw_g"),
                                        dlo, dhi)
                col = _frame_from_cum(p["op"], vm, cum)
                if p["op"] == "$sum":
                    col = col.cast(_agg_type(rep, F.sum(vm)))
                rep = rep.withColumn(out, col)
                continue
            w_fin = (wgdest.orderBy(F.col("__gw_g").asc())
                     .rangeBetween(dlo, dhi))
            if p["op"] in ("$deriv", "$integ"):
                rep = rep.withColumn(out, _fin_deriv_integ(
                    p["op"], vm, w_fin,
                    wgdest.orderBy(F.col("__gw_g").asc()),
                    F.col("__gw_g")))
                continue
            if p["op"] == "$pctl":
                pc = F.percentile(
                    vm.cast("double"),
                    F.array(*[F.lit(x) for x in p["ps"]])).over(w_fin)
                col = F.element_at(pc, 1) if p["scalar"] else pc
            elif p["op"] in ("$covariancePop", "$covarianceSamp"):
                fn = (F.covar_pop if p["op"] == "$covariancePop"
                      else F.covar_samp)
                col = fn(vm["x"], vm["y"]).over(w_fin)
            else:
                col = _ACCUMULATORS[p["op"]](vm).over(w_fin)
            if p["op"] == "$sum":
                col = F.coalesce(col, F.lit(0))
            rep = rep.withColumn(out, col)
        ranged = rep.filter(F.col("__gw_gdest") == F.col("__gw_oidx"))

    pruns = {o: p for o, p in plans.items()
             if p["kind"] in ("pctl_run", "pctl_rrun")}
    if pruns:
        total_rows = sum(r["__rows"] for r in parts)
        specs = []
        for o, p in pruns.items():
            ak = (p["kind"], p["dir"], repr(p["arg"]))
            sp = {"out": o, "ps": p["ps"], "scalar": p["scalar"],
                  "mode": ("range" if p["kind"] == "pctl_rrun"
                           else "rows"),
                  "dir": p["dir"], "argkey": ak}
            if presketch is not None:
                # round-12: splits came from the probe; the per-range
                # bucket counts rode the boundary aggregate — attach
                # both so _global_running_pctl skips its hist/fold/
                # broadcast stages (offsets become a LocalRelation)
                rep = presketch["ak_rep"][ak]
                vbs = presketch["vbs"][ak]
                sp["vbs"] = vbs
                sp["bcol"] = f"__gw_hb_{rep}"
                sp["histcounts"] = [
                    (r["__gw_pid"],
                     [r[f"__ph_{rep}_{b}"] or 0
                      for b in range(len(vbs) + 1)])
                    for r in parts]
                if pctl_approx:
                    sp["lo"] = presketch["row"][f"__lo_{rep}"]
                    sp["hi"] = presketch["row"][f"__hi_{rep}"]
                specs.append(sp)
                continue
            sk: list = []
            for r in parts:
                sk.extend(x for x in (r[f"__pqsk_{o}"] or [])
                          if x is not None)
            sk.sort()
            sp["sketch"] = sk
            if pctl_approx:
                los = [r[f"__pqlo_{o}"] for r in parts
                       if r[f"__pqlo_{o}"] is not None]
                his = [r[f"__pqhi_{o}"] for r in parts
                       if r[f"__pqhi_{o}"] is not None]
                sp["lo"] = min(los) if los else None
                sp["hi"] = max(his) if his else None
            specs.append(sp)
        ranged = _global_running_pctl(ranged, total_rows, specs,
                                      n_ranges=len(parts),
                                      approx=pctl_approx)
    return ranged.drop(*[c for c in ranged.columns
                         if c.startswith("__gw_")])


def _set_window_fields(df: DataFrame, spec: dict) -> DataFrame:
    """$setWindowFields (Mongo 5.0 window functions) -> Spark Window.

    Supported output operators: $rank, $denseRank, $documentNumber, and
    the accumulator family ($sum/$avg/$min/$max/$push) over a
    `documents` frame of ["unbounded", "current"] (running) or
    ["unbounded", "unbounded"] (whole partition, the default), or a
    value-based `range` frame over the single sortBy field — numeric
    offsets, "unbounded"/"current", and Mongo's date `unit` ranges
    (millisecond..week compile to rangeBetween over the epoch-ms of a
    timestamp sortBy; calendar units year/quarter/month have no fixed
    width and raise).

    WITHOUT partitionBy the naive compile would be a single-task
    global sort; that path routes through _swf_global's distributed
    scaffold instead (see its docstring for the support matrix)."""
    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType

    sort = spec.get("sortBy") or {}
    if "partitionBy" not in spec:
        # $shift / $locf / $linearFill are positional, not framed —
        # they split off into their own distributed passes ($shift:
        # address-shift join on the global row number; $locf /
        # $linearFill: _fill_global's carry machinery) and the rest
        # routes through _swf_global's scaffold. Mongo forbids these
        # outputs referencing each other, so sequential application
        # over the input frame is exact.
        fills: dict = {}
        shifts: dict = {}
        rest: dict = {}
        for o, d in spec["output"].items():
            dd = dict(d)
            win = dd.pop("window", None)
            (op, arg), = dd.items()
            if op in ("$locf", "$linearFill", "$shift"):
                if win is not None:
                    raise ValueError(f"{op} takes no window bounds")
                if op == "$shift":
                    shifts[o] = arg
                else:
                    fills[o] = (op, arg)
            else:
                rest[o] = d
        # pass order is by DESCENDING driver-action count: a later
        # pass's actions re-execute every earlier pass's lineage, so
        # the scaffold pass (3-5 actions) must not sit downstream of
        # the single-action fill/shift joins; a non-trivial INPUT
        # lineage is materialized once so those actions read blocks,
        # not re-run upstream windows/joins (round-9)
        out_df = _maybe_checkpoint_global_input(df)
        # all passes of one $setWindowFields share the sortBy, so the
        # range-split values are computed ONCE here (on the slimmest
        # lineage) instead of once per pass
        bs = None
        if sort and (len([x for x in (rest, fills, shifts) if x])
                     > 1 or fills or shifts):
            from maggma_spark.functions.partitioning import (
                range_boundaries,
            )

            n = int(out_df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
            bs, pre_total = range_boundaries(
                out_df, next(iter(sort)), n,
                min_rows_per_range=_min_rows_per_range(
                    out_df.sparkSession),
                with_total=True)
        else:
            pre_total = None
        if rest:
            out_df = _swf_global(out_df, {**spec, "output": rest},
                                 sort, bs=bs, total=pre_total)
        if fills and not sort:
            raise ValueError("$locf/$linearFill require sortBy")
        if fills:
            for o, (_op, arg) in fills.items():
                out_df = out_df.withColumn(o, _value(out_df, arg))
            fspec = {"output": {
                o: {"method": ("locf" if op == "$locf" else "linear")}
                for o, (op, _arg) in fills.items()}}
        if fills and shifts and not _shift_reads_fill_outputs(
                shifts, fills):
            # fused path (round-12): one scaffold + one boundary
            # aggregate for both families instead of two of each —
            # the sequential form re-range-partitions the full-width
            # fill output just to scaffold the shift pass
            out_df = _fill_shift_global(out_df, fspec, shifts, sort,
                                        bs=bs)
        else:
            if fills:
                out_df = _fill_global(out_df, fspec, sort, bs=bs)
            if shifts:
                out_df = _shift_global(out_df, shifts, sort, bs=bs)
        return out_df
    w = Window.partitionBy(_value(df, spec["partitionBy"]))
    ordered = w.orderBy(*_order_cols(sort))
    ranks = {"$rank": F.rank, "$denseRank": F.dense_rank,
             "$documentNumber": F.row_number}

    def sort_time(unit):
        """The sortBy field as a numeric axis: exact epoch-ms scaled
        to `unit` for timestamps, the raw value for numerics."""
        if len(sort) != 1:
            raise ValueError("requires exactly one sortBy field")
        (sf_field, sdir), = sort.items()
        if sdir <= 0:
            raise ValueError("requires an ascending sortBy")
        if unit:
            if unit not in _RANGE_UNIT_MS:
                raise ValueError(
                    f"unit {unit!r} has no fixed width "
                    "(supported: millisecond..week)")
            return (F.unix_millis(F.col(sf_field).cast("timestamp"))
                    .cast("double") / F.lit(_RANGE_UNIT_MS[unit]))
        return F.col(sf_field).cast("double")

    def build_frame(win, frame):
        if "range" in win:
            if len(sort) != 1:
                raise ValueError(
                    "range window requires exactly one sortBy field")
            (sf_field, sdir), = sort.items()
            if sdir <= 0:
                # Mongo's own rule — and Spark's rangeBetween offsets
                # would silently flip meaning under a descending order
                raise ValueError(
                    "range windows require an ascending sortBy")
            unit = win.get("unit")
            rlo, rhi = win["range"]
            scale = 1
            base = ordered
            if unit:
                if unit not in _RANGE_UNIT_MS:
                    raise ValueError(
                        f"range unit {unit!r} has no fixed width "
                        "(supported: millisecond..week)")
                scale = _RANGE_UNIT_MS[unit]
                # unix_millis is exact integer milliseconds — going
                # through a double epoch loses sub-ms bits at 2024-era
                # magnitudes and shifts range boundaries by 1 ms
                epoch_ms = F.unix_millis(F.col(sf_field)
                                         .cast("timestamp"))
                base = w.orderBy(epoch_ms.asc())
            lo = Window.unboundedPreceding if rlo == "unbounded" else \
                Window.currentRow if rlo == "current" else rlo * scale
            hi = Window.unboundedFollowing if rhi == "unbounded" else \
                Window.currentRow if rhi == "current" else rhi * scale
            return base.rangeBetween(lo, hi), rlo == "unbounded"
        # Mongo documents bounds: "unbounded", "current", or integer
        # row offsets (negative = preceding)
        lo = Window.unboundedPreceding if frame[0] == "unbounded" \
            else Window.currentRow if frame[0] == "current" \
            else int(frame[0])
        hi = Window.unboundedFollowing if frame[1] == "unbounded" \
            else Window.currentRow if frame[1] == "current" \
            else int(frame[1])
        if (lo, hi) != (Window.unboundedPreceding,
                        Window.unboundedFollowing) and not sort:
            raise ValueError("a bounded documents window requires "
                             "sortBy")
        return ((ordered if sort else w).rowsBetween(lo, hi),
                frame[0] == "unbounded")

    def finite_desc(win, frame):
        """(kind, lo, hi, axis) when the frame is finite with integral
        bounds — the shape the growing-frame differencing handles —
        else None (the caller keeps the direct sliding compile).
        Callers run build_frame FIRST so its validation/raises stay
        the single source of frame-shape errors."""
        if "range" in win:
            rlo, rhi = win["range"]
            if not (isinstance(rlo, (int, float))
                    and isinstance(rhi, (int, float))):
                return None
            unit = win.get("unit")
            scale = _RANGE_UNIT_MS[unit] if unit else 1
            alo, ahi = rlo * scale, rhi * scale
            if float(alo) != int(alo) or float(ahi) != int(ahi):
                return None  # non-integral offsets: sliding path
            (sf_field, _), = sort.items()
            axis = (F.unix_millis(F.col(sf_field).cast("timestamp"))
                    if unit else F.col(sf_field))
            return ("range", int(alo), int(ahi), axis)
        norm = [0 if b == "current" else b for b in frame]
        if all(isinstance(b, int) and not isinstance(b, bool)
               for b in norm):
            return ("rows", int(norm[0]), int(norm[1]), None)
        return None

    def finite_cum(fin):
        if fin[0] == "rows":
            return _growing_cum_rows(ordered, fin[1], fin[2])
        return _growing_cum_range(w, fin[3], fin[1], fin[2])

    running = ordered.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
    for out, odoc in spec["output"].items():
        odoc = dict(odoc)
        win = odoc.pop("window", {})
        frame = win.get("documents", ["unbounded", "unbounded"])
        (op, arg), = odoc.items()
        if op in ranks:
            if not sort:
                raise ValueError(f"{op} requires sortBy")
            df = df.withColumn(out, ranks[op]().over(ordered))
            continue
        if op == "$shift":
            if not sort:
                raise ValueError("$shift requires sortBy")
            by = int(arg["by"])
            v = _value(df, arg["output"])
            dflt = arg.get("default")
            fn = F.lead(v, by, dflt) if by >= 0 else F.lag(v, -by, dflt)
            df = df.withColumn(out, fn.over(ordered))
            continue
        if op == "$locf":
            if not sort:
                raise ValueError("$locf requires sortBy")
            df = df.withColumn(out, F.last(
                _value(df, arg), ignorenulls=True).over(running))
            continue
        if op == "$linearFill":
            try:
                x = sort_time(None)
            except ValueError as ex:
                raise ValueError(f"$linearFill {ex}") from None
            v = _value(df, arg).cast("double")
            # sort_time validated a single ascending sortBy, so the
            # reverse scan is simply that field descending
            (lf_field, _), = sort.items()
            rev_run = (w.orderBy(F.col(lf_field).desc())
                       .rowsBetween(Window.unboundedPreceding,
                                    Window.currentRow))
            known_x = F.when(v.isNotNull(), x)
            pv = F.last(v, ignorenulls=True).over(running)
            px = F.last(known_x, ignorenulls=True).over(running)
            nv = F.last(v, ignorenulls=True).over(rev_run)
            nx = F.last(known_x, ignorenulls=True).over(rev_run)
            interp = pv + F.when(nx != px,
                                 (nv - pv) * (x - px) / (nx - px))
            df = df.withColumn(out, F.coalesce(v, interp))
            continue
        if op == "$expMovingAvg":
            df = _exp_moving_avg(df, spec["partitionBy"], sort, out, arg)
            continue
        if op == "$derivative":
            if "range" not in win and "documents" not in win:
                raise ValueError("$derivative requires a window")
            try:
                t = sort_time(arg.get("unit"))
            except ValueError as ex:
                raise ValueError(f"$derivative {ex}") from None
            spec_w, _ = build_frame(win, frame)
            v = _value(df, arg["input"]).cast("double")
            dv = F.last(v, ignorenulls=False).over(spec_w) \
                - F.first(v, ignorenulls=False).over(spec_w)
            dt = F.last(t).over(spec_w) - F.first(t).over(spec_w)
            df = df.withColumn(out, F.when(dt != 0, dv / dt))
            continue
        if op == "$integral":
            if "range" not in win and "documents" not in win:
                raise ValueError("$integral requires a window")
            try:
                t = sort_time(arg.get("unit"))
            except ValueError as ex:
                raise ValueError(f"$integral {ex}") from None
            spec_w, from_start = build_frame(win, frame)
            v = _value(df, arg["input"]).cast("double")
            # trapezoid term covering (t_{i-1}, t_i]; the frame's own
            # first row's term spans OUTSIDE the window, so subtract it
            # unless the frame starts unbounded (where it is null at
            # the partition head and sum already skips it)
            pair = ((v + F.lag(v).over(ordered)) / 2
                    * (t - F.lag(t).over(ordered)))
            total = F.sum(pair).over(spec_w)
            if not from_start:
                total = total - F.coalesce(
                    F.first(pair, ignorenulls=False).over(spec_w),
                    F.lit(0.0))
            # a single-point (or head-of-partition) window integrates
            # to 0, as in Mongo — the null sum means "no pair terms"
            df = df.withColumn(out, F.coalesce(total, F.lit(0.0)))
            continue
        if op in ("$covariancePop", "$covarianceSamp"):
            a, b = arg
            fn = F.covar_pop if op == "$covariancePop" else F.covar_samp
            spec_w, _ = build_frame(win, frame)
            fin = finite_desc(win, frame)
            if fin is not None:
                xa = _value(df, a).cast("double")
                xb = _value(df, b).cast("double")
                pair = F.when(xa.isNotNull() & xb.isNotNull(),
                              F.struct(xa.alias("x"), xb.alias("y")))
                df = df.withColumn(out, _frame_from_cum(
                    op, pair, finite_cum(fin)))
                continue
            df = df.withColumn(out, fn(
                _value(df, a).cast("double"),
                _value(df, b).cast("double")).over(spec_w))
            continue
        if op == "$count":  # Mongo window $count == $sum of 1
            op, arg = "$sum", 1
        if op in ("$median", "$percentile"):
            # Mongo 7.0 window forms: exact continuous interpolation
            # (the expression-form deviation, DEVIATIONS §20d) over
            # the partitioned frame; $percentile returns the array of
            # requested quantiles like Mongo. Cost note: Spark
            # re-scans the frame per row for percentile windows
            # (O(w)/row), so an unbounded running frame is quadratic
            # per partition at the EXACT default — the approximate
            # engine mode below is the O(G)/row scale path for
            # running frames (Mongo only offers method:"approximate")
            runf = list(win.get("documents") or win.get("range") or [])
            if runf in (["unbounded", "current"],
                        ["current", "unbounded"]) and sort and \
                    df.sparkSession.conf.get(
                        "spark.maggma.windowPctl.method",
                        "exact") == "approximate":
                ps = [0.5] if op == "$median" else \
                    [float(x) for x in arg["p"]]
                df = _partitioned_running_pctl_approx(
                    df, spec["partitionBy"], sort, out,
                    arg["input"], ps, win, scalar=op == "$median")
                continue
            spec_w, _ = build_frame(win, frame)
            v = _value(df, arg["input"]).cast("double")
            ps = [0.5] if op == "$median" else \
                [float(x) for x in arg["p"]]
            pc = F.percentile(
                v, F.array(*[F.lit(x) for x in ps])).over(spec_w)
            df = df.withColumn(
                out, F.element_at(pc, 1) if op == "$median" else pc)
            continue
        if op not in _ACCUMULATORS:
            raise ValueError(f"unsupported window operator {op}")
        spec_w, _ = build_frame(win, frame)
        v = _value(df, arg)
        fin = (finite_desc(win, frame)
               if op in _INVERTIBLE_WINDOW_OPS else None)
        if fin is not None and not (op == "$avg" and isinstance(
                _agg_type(df, v), DecimalType)):
            # growing-frame differencing (see _growing_cum_rows);
            # decimal $avg keeps the sliding path so Spark's decimal
            # average precision rules apply unchanged
            col = _frame_from_cum(op, v, finite_cum(fin))
            if op == "$sum":
                # exact subtraction widens decimal sums by one digit;
                # pin back to the direct aggregate's type
                col = col.cast(_agg_type(df, F.sum(v)))
            df = df.withColumn(out, col)
            continue
        col = _ACCUMULATORS[op](v).over(spec_w)
        if op == "$sum":
            # Mongo's window $sum is 0 over an empty/all-null frame;
            # Spark's SUM is null — coalesce to the Mongo value
            col = F.coalesce(col, F.lit(0))
        df = df.withColumn(out, col)
    return df


def _partitioned_running_pctl_approx(
        df: DataFrame, partition_by, sort: dict, out: str,
        inp, ps: list, win: dict, scalar: bool) -> DataFrame:
    """PARTITIONED running $median/$percentile in the approximate
    engine mode (spark.maggma.windowPctl.method=approximate — Mongo's
    window forms only OFFER method:"approximate"): the exact compile
    is Spark's O(frame)/row percentile window, quadratic per partition
    over a running frame — the same scale cliff the global path's
    order-statistics pass removed. Here each GROUP gets its own
    equi-depth value buckets (one groupBy percentile_approx sketch,
    joined back), per-bucket RUNNING counts are G window sums sharing
    one frame spec, and the answer interpolates the target rank within
    its bucket between the bucket's value edges — identical
    interpolation (and rank-error bound: the group's largest bucket
    mass + sketch error) to the global approximate path, but bounded
    per group. O(G)/row, one extra shuffle (the sketch join), no
    Python in the per-row path.

    Supports running frames only (['unbounded','current'] /
    ['current','unbounded'], documents or single-sortBy value range);
    reverse frames run mirrored running windows, never Spark's
    unbounded-following frame."""
    from pyspark.sql import Window

    spark = df.sparkSession
    G = int(spark.conf.get(
        "spark.maggma.windowPctl.approxBuckets", "0")) or 32
    G = max(2, min(64, G))
    pexpr = _value(df, partition_by)
    v = _value(df, inp).cast("double")
    tag = f"__pp_{out}"
    df = df.withColumn(f"{tag}_p", pexpr).withColumn(f"{tag}_v", v)
    grid = [i / G for i in range(1, G)]
    sk = (df.groupBy(f"{tag}_p")
          .agg(F.percentile_approx(
                   F.col(f"{tag}_v"),
                   F.array(*[F.lit(q) for q in grid]),
                   F.lit(10_000)).alias(f"{tag}_sk"),
               F.min(f"{tag}_v").alias(f"{tag}_lo"),
               F.max(f"{tag}_v").alias(f"{tag}_hi")))
    # ONE broadcast-able edges frame; join it TWICE — before the
    # window to stamp the int bucket index, and again after it for
    # the interpolation — so only the 4-byte index (never the
    # (G+1)-double arrays) rides the window's shuffle+sort. Dragging
    # the sketch arrays through the sort cost ~90 s of the 10M probe.
    edges_df = F.broadcast(sk.select(
        F.col(f"{tag}_p").alias(f"{tag}_pp"),
        F.col(f"{tag}_sk").alias(f"{tag}_ske"),
        F.concat(F.array(F.col(f"{tag}_lo")), F.col(f"{tag}_sk"),
                 F.array(F.col(f"{tag}_hi"))).alias(f"{tag}_e")))
    # both edges joins must be NULL-SAFE: Window.partitionBy (the
    # exact path) and Mongo both treat a null/missing partition key
    # as a valid partition, so a plain equi-join here would silently
    # drop every null-key row when the engine mode flips
    df = df.join(
        edges_df.select(f"{tag}_pp", f"{tag}_ske"),
        F.col(f"{tag}_p").eqNullSafe(F.col(f"{tag}_pp"))
    ).drop(f"{tag}_pp")

    frame = list(win.get("documents") or win.get("range"))
    fwd = frame == ["unbounded", "current"]
    if "range" in win:
        if len(sort) != 1:
            raise ValueError(
                "range window requires exactly one sortBy field")
        (sf_field, sdir), = sort.items()
        if sdir <= 0:
            raise ValueError("range windows require an ascending "
                             "sortBy")
        unit = win.get("unit")
        axis = (F.unix_millis(F.col(sf_field).cast("timestamp"))
                if unit else F.col(sf_field))
        w = (Window.partitionBy(f"{tag}_p")
             .orderBy(axis.asc() if fwd else axis.desc())
             .rangeBetween(Window.unboundedPreceding, 0))
    else:
        # reverse frame = the same running window over the MIRRORED
        # traversal (every sort direction flipped), never Spark's
        # O(n^2) unbounded-following frame
        cols = _order_cols(sort if fwd
                           else {k: -d for k, d in sort.items()})
        w = (Window.partitionBy(f"{tag}_p").orderBy(*cols)
             .rowsBetween(Window.unboundedPreceding, 0))
    vc = F.col(f"{tag}_v")
    # bucket index ONCE per row (O(G) array filter), so each of the G
    # running-count window terms is a plain integer compare — value
    # comparisons against the edge array inside the window terms
    # evaluated interpreted per row per bucket (measured 203 s at 10M;
    # this form: see SCALE.md round-9)
    jladder = sum(
        (F.element_at(F.col(f"{tag}_ske"), b) < vc).cast("int")
        for b in range(1, G))
    df = (df.withColumn(f"{tag}_j",
                        F.when(vc.isNotNull(), jladder))
          .drop(f"{tag}_ske"))
    jx = F.col(f"{tag}_j")
    cums = F.array(*[
        F.coalesce(
            F.sum(F.when(jx <= b, 1).otherwise(0).cast("long"))
            .over(w), F.lit(0))
        for b in range(G)])
    # m as its own window count: q = p(m-1)+1 is inlined into every
    # ladder term below, so it must be a trivial tree (a column ref),
    # not an element_at re-evaluated G times per row
    df = (df.withColumn(f"{tag}_c", cums)
          .withColumn(f"{tag}_m", F.count(vc).over(w)))
    # second (broadcast) edges join AFTER the window, for the
    # interpolation only — null-safe for the same reason as above
    df = df.join(
        edges_df.select(f"{tag}_pp", f"{tag}_e"),
        F.col(f"{tag}_p").eqNullSafe(F.col(f"{tag}_pp"))
    ).drop(f"{tag}_pp")
    edges = F.col(f"{tag}_e")
    ca = F.col(f"{tag}_c")
    m = F.col(f"{tag}_m").cast("double")
    # materialize each target's bucket index as its OWN column first:
    # b is a G-term comparison ladder referenced ~6x in the
    # interpolation below, and inlined it re-evaluates per reference
    # (the whole tree overflows the codegen budget, so there is no
    # CSE to rescue it — measured ~80 us/row at G=16, round-11);
    # CollapseProject cannot inline a non-cheap multiply-referenced
    # alias, so the attribute form evaluates the ladder once per
    # (row, p) — the same house trick as the exact router's cum
    # arrays
    bcols = {}
    for pi, pv in enumerate(ps):
        q = F.lit(float(pv)) * (m - 1) + F.lit(1.0)
        # comparison ladder, not an array-filter HOF: higher-order
        # lambdas evaluate interpreted per row (CodegenFallback) and
        # dominated the 10M probe; the same reason the jladder above
        # is a sum of plain compares
        bcols[f"{tag}_b{pi}"] = F.least(
            sum((F.element_at(ca, i + 1).cast("double") < q)
                .cast("int") for i in range(G)),
            F.lit(G - 1))
    df = df.withColumns(bcols)
    outs = []
    for pi, pv in enumerate(ps):
        q = F.lit(float(pv)) * (m - 1) + F.lit(1.0)
        b = F.col(f"{tag}_b{pi}")
        prior = F.when(b > 0, F.element_at(ca, b).cast("double")) \
            .otherwise(F.lit(0.0))
        cnt = F.element_at(ca, b + 1).cast("double") - prior
        frac = F.when(cnt > 0, (q - prior) / F.greatest(cnt, F.lit(1.0))) \
            .otherwise(F.lit(1.0))
        e_lo = F.element_at(edges, b + 1)
        e_hi = F.element_at(edges, b + 2)
        outs.append(F.when(m > 0, e_lo + frac * (e_hi - e_lo)))
    col = outs[0] if scalar else F.array(*outs)
    return df.withColumn(out, col).drop(
        f"{tag}_p", f"{tag}_v", f"{tag}_e", f"{tag}_j", f"{tag}_c",
        f"{tag}_m", *bcols)


def _exp_moving_avg(df: DataFrame, partition_by, sort: dict,
                    out: str, arg: dict) -> DataFrame:
    """$expMovingAvg: sequentially-dependent (ewma_i depends on
    ewma_{i-1}), so no window aggregate expresses it — an Arrow
    applyInPandas kernel runs the recurrence per partition, sorted.
    The closed-form alternative (powers of 1/(1-alpha)) overflows for
    long series, so the sequential kernel is the robust shape; per-key
    history bounds each group exactly like the window operators."""
    if not sort:
        raise ValueError("$expMovingAvg requires sortBy")
    if "alpha" in arg:
        alpha = float(arg["alpha"])
    elif "N" in arg:
        alpha = 2.0 / (float(arg["N"]) + 1.0)
    else:
        raise ValueError("$expMovingAvg needs alpha or N")
    if not 0 < alpha < 1:
        raise ValueError("$expMovingAvg alpha must be in (0, 1)")
    tagged = (df.withColumn("__ew_p", _value(df, partition_by))
              .withColumn("__ew_v", _value(df, arg["input"])
                          .cast("double")))
    sort_items = list(sort.items())
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in tagged.schema.fields] + [f"`{out}` double"])

    def kernel(pdf):
        pdf = pdf.sort_values(
            [k for k, _ in sort_items],
            ascending=[d > 0 for _, d in sort_items],
            kind="mergesort")
        # pandas' C ewm kernel IS the Mongo recurrence: adjust=False
        # gives e0 = v0, e_i = alpha*v_i + (1-alpha)*e_{i-1};
        # ignore_na=True skips nulls in the recurrence and emits the
        # carried state at null positions — exactly the "null carries
        # state" rule the old per-row Python loop implemented
        pdf[out] = pdf["__ew_v"].ewm(
            alpha=alpha, adjust=False, ignore_na=True).mean()
        return pdf

    return (tagged.groupBy("__ew_p").applyInPandas(kernel, out_schema)
            .drop("__ew_p", "__ew_v"))


_DENSIFY_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                  "week": 7 * 86400}
_DENSIFY_MONTH_UNITS = {"month": 1, "quarter": 3, "year": 12}


def _densify_calendar(df: DataFrame, spec: dict) -> DataFrame:
    """$densify with a CALENDAR unit (month/quarter/year): steps are
    lower_bound + k * step months — always added to the ORIGINAL
    bound (Mongo's rule), never cumulatively, so month-end clamping
    cannot drift. Grid generation mirrors the numeric path's scale
    shape: known scalar bounds use a distributed spark.range over the
    step count; partition bounds expand a per-partition index sequence
    (parallel across partitions)."""
    field = spec["field"]
    rng = spec["range"]
    step = int(rng["step"])
    mstep = step * _DENSIFY_MONTH_UNITS[rng["unit"]]
    bounds = rng.get("bounds", "full")
    parts = spec.get("partitionByFields", [])
    spark = df.sparkSession
    col = F.col(field).cast("timestamp")

    def months_span(lo, hi):
        m = (hi.year - lo.year) * 12 + (hi.month - lo.month)
        return max(0, m)

    def scalar_grid(lo, hi):
        if lo is None or hi is None or hi < lo:
            return spark.range(0).select(
                F.col("id").cast("timestamp").alias("__g"))
        n = months_span(lo, hi) // mstep + 2  # overshoot, filter below
        return (spark.range(n).select(
            F.timestamp_add("MONTH", (F.col("id") * mstep).cast("int"),
                            F.lit(lo).cast("timestamp")).alias("__g"))
            .filter(F.col("__g") <= F.lit(hi)))

    if bounds == "full":
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        vals = scalar_grid(row["lo"], row["hi"])
        grid = (df.select(*parts).distinct().crossJoin(vals)
                if parts else vals)
    elif bounds == "partition":
        if not parts:
            raise ValueError("bounds='partition' needs partitionByFields")
        span = df.groupBy(*parts).agg(F.min(col).alias("__lo"),
                                      F.max(col).alias("__hi"))
        n = F.floor(F.months_between("__hi", "__lo") / mstep).cast("int")
        grid = (span.select(
            *parts, "__lo", "__hi",
            F.explode(F.sequence(F.lit(0), n + 1)).alias("__k"))
            .select(*parts, "__hi", F.timestamp_add(
                "MONTH", F.col("__k") * mstep, F.col("__lo"))
                .alias("__g"))
            .filter(F.col("__g") <= F.col("__hi"))
            .select(*parts, "__g"))
    else:
        lo, hi = bounds
        vals = scalar_grid(lo, hi)
        grid = (df.select(*parts).distinct().crossJoin(vals)
                if parts else vals)
    grid = grid.select(*parts, F.col("__g").alias(field))
    on = parts + [field]
    missing = grid.join(df.select(*on).distinct(), on=on, how="left_anti")
    return df.unionByName(missing, allowMissingColumns=True)


def _densify(df: DataFrame, spec: dict) -> DataFrame:
    """$densify: materialize missing steps of a numeric/timestamp field.

    bounds="full" (and explicit [lo, hi] bounds) span known scalars, so
    the grid is a DISTRIBUTED spark.range over the step count — never a
    single-task explode of the whole global sequence (at 100 TB a
    second-granularity multi-year grid is billions of rows; one
    sequence() row would generate all of them in one task).
    bounds="partition" spans each partition's own min/max via
    sequence+explode of that partition's row — parallel across
    partitions, with the caveat that one partition's span is generated
    by one task (inherent to per-partition bounds; pick partition
    fields whose spans are sane). Gap rows carry nulls for every other
    field ($fill completes them).
    """
    field = spec["field"]
    rng = spec["range"]
    step, unit = rng["step"], rng.get("unit")
    if unit in _DENSIFY_MONTH_UNITS:
        return _densify_calendar(df, spec)
    if unit is not None and unit not in _DENSIFY_UNITS:
        raise ValueError(f"$densify unit {unit!r} not supported")
    bounds = rng.get("bounds", "full")
    parts = spec.get("partitionByFields", [])
    is_ts = unit is not None
    col = F.col(field).cast("long") if not is_ts else \
        F.unix_timestamp(F.col(field))
    stride = int(step) * (_DENSIFY_UNITS[unit] if is_ts else 1)
    spark = df.sparkSession

    def scalar_grid(lo, hi):
        """Distributed grid frame for driver-known [lo, hi]."""
        if lo is None or hi is None or hi < lo:  # empty input
            return spark.range(0).select(F.col("id").alias("__g"))
        n_steps = (int(hi) - int(lo)) // stride + 1
        return spark.range(n_steps).select(
            (F.lit(int(lo)) + F.col("id") * stride).alias("__g"))

    if bounds == "full":
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        vals = scalar_grid(row["lo"], row["hi"])
        grid = (df.select(*parts).distinct().crossJoin(vals)
                if parts else vals)
    elif bounds == "partition":
        if not parts:
            raise ValueError("bounds='partition' needs partitionByFields")
        span = df.groupBy(*parts).agg(F.min(col).alias("__lo"),
                                      F.max(col).alias("__hi"))
        grid = span.select(
            *parts,
            F.explode(F.sequence("__lo", "__hi",
                                 F.lit(stride))).alias("__g"))
    else:
        lo, hi = bounds
        import datetime as _dt

        # explicit timestamp bounds arrive as datetimes; the grid is
        # epoch seconds (session is pinned UTC)
        lo = int(lo.timestamp()) if isinstance(lo, _dt.datetime) else lo
        hi = int(hi.timestamp()) if isinstance(hi, _dt.datetime) else hi
        vals = scalar_grid(lo, hi)
        grid = (df.select(*parts).distinct().crossJoin(vals)
                if parts else vals)
    if is_ts:
        grid = grid.select(*parts,
                           F.timestamp_seconds("__g").alias(field))
    else:
        grid = grid.select(*parts, F.col("__g").alias(field))
    on = parts + [field]
    # Mongo keeps EVERY original doc and only ADDS the missing steps —
    # off-grid originals must survive, so this is original ∪ (grid
    # points with no exact-match original), not a grid-left-join
    missing = grid.join(df.select(*on).distinct(), on=on, how="left_anti")
    return df.unionByName(missing, allowMissingColumns=True)


def _shift_reads_fill_outputs(shifts: dict, fills: dict) -> bool:
    """Fused-path guard (round-12): if a $shift output expression
    might reference a column that a $locf/$linearFill OUTPUT
    (over)writes, the sequential order is semantically load-bearing
    (shift must see the FILLED values) and fusion is skipped.
    Conservative by construction — a false positive only falls back
    to the sequential two-scaffold path."""
    import re

    refs = repr([a.get("output") for a in shifts.values()])
    return any(re.search(r"\$" + re.escape(o) + r"\b", refs)
               for o in fills)


def _shift_prep(ranged: DataFrame, shifts: dict):
    """Shared head of the $shift machinery: the work frame
    (+ __sh_v_* value columns, + the reverse row number __sh_rnd) and
    the boundary-aggregate expressions. Split out (round-12) so the
    fused fill+shift path can ride ONE boundary aggregate and ONE
    scaffold for both operator families."""
    from pyspark.sql import Window

    max_by = max(abs(int(a["by"])) for a in shifts.values())
    if max_by > MAX_SHIFT_CARRY:
        raise ValueError(
            f"$shift by {max_by} exceeds MAX_SHIFT_CARRY="
            f"{MAX_SHIFT_CARRY}: the driver folds |by| edge rows per "
            "range — add partitionBy for frame-sized shifts")
    work = ranged
    for o, a in shifts.items():
        work = work.withColumn(f"__sh_v_{o}", _value(work, a["output"]))
    work = work.withColumn(
        "__sh_rnd",
        F.row_number().over(Window.partitionBy("__gw_pid")
                            .orderBy(F.col("__gw_rn").desc())))
    edge = F.struct(F.col("__gw_rn").alias("rn"),
                    *[F.col(f"__sh_v_{o}").alias(o) for o in shifts])
    aggs = [
        F.count(F.lit(1)).alias("__rows"),
        F.collect_list(F.when(F.col("__gw_rn") <= max_by, edge))
        .alias("__heads"),
        F.collect_list(F.when(F.col("__sh_rnd") <= max_by, edge))
        .alias("__tails")]
    return work, aggs


def _shift_global(df: DataFrame, shifts: dict, sort: dict,
                  bs: list = None, _work: DataFrame = None,
                  _parts: list = None) -> DataFrame:
    """UNPARTITIONED $shift without the single-task global window AND
    without a full-width self-join: lead/lag run per scaffold range,
    and only the addresses that CROSS a range boundary — at most |by|
    rows per range edge — resolve through a driver-folded broadcast
    of edge values (O(|by| x ranges) scalars, MAX_SHIFT_CARRY guard).
    All patching is POSITIONAL: `default` fills only addresses
    outside the global frame, an in-frame null value stays null, and
    a cross-range address always hits the edge broadcast because any
    row |by|-reachable from another range sits within |by| of its own
    range's boundary. One boundary aggregate action (per-range count
    + head/tail edge structs), zero data-sized shuffles beyond the
    scaffold's own range partitioning.

    ``_work``/``_parts`` (round-12, the fused fill+shift path): the
    caller already built the work frame via _shift_prep (possibly
    with fill outputs applied on top — fill outputs cannot be
    referenced by shift expressions, so __sh_v_* are unaffected) and
    collected the combined boundary aggregate; skip both here."""
    from pyspark.sql import Window

    if not sort:
        raise ValueError("$shift requires sortBy")
    spark = df.sparkSession
    wasc = Window.partitionBy("__gw_pid").orderBy("__gw_rn")
    if _work is None:
        ranged, _wloc, _bs, _tot = _global_scaffold(df, sort, bs)
        work, aggs = _shift_prep(ranged, shifts)
        parts = sorted(work.groupBy("__gw_pid").agg(*aggs).collect(),
                       key=lambda r: r["__gw_pid"])
    else:
        work, parts = _work, _parts
    offs, run = {}, 0
    for r in parts:
        offs[r["__gw_pid"]] = run
        run += r["__rows"]
    total = run
    edge_rows = {}
    for r in parts:
        for e in list(r["__heads"]) + list(r["__tails"]):
            g = offs[r["__gw_pid"]] + e["rn"]
            edge_rows[g] = tuple(e[o] for o in shifts)
    vtypes = {f.name: f.dataType for f in work.schema.fields}
    from pyspark.sql.types import LongType, StructField, StructType

    eschema = StructType([StructField("__sh_eg", LongType(), False)]
                         + [StructField(f"__sh_e_{o}",
                                        vtypes[f"__sh_v_{o}"], True)
                            for o in shifts])
    edf = spark.createDataFrame(
        [(g, *vs) for g, vs in sorted(edge_rows.items())], eschema)

    off_expr = F.lit(0)
    for pid, off in offs.items():
        off_expr = F.when(F.col("__gw_pid") == pid, F.lit(off)) \
            .otherwise(off_expr)
    cnt_expr = F.lit(0)
    for r in parts:
        cnt_expr = F.when(F.col("__gw_pid") == r["__gw_pid"],
                          F.lit(r["__rows"])).otherwise(cnt_expr)
    res = work.withColumn(
        "__sh_g", (off_expr + F.col("__gw_rn")).cast("long"))
    by_groups: dict = {}
    for o, a in shifts.items():
        by_groups.setdefault(int(a["by"]), []).append(o)
    for bi, (by, outs) in enumerate(by_groups.items()):
        src = F.broadcast(edf.select(
            (F.col("__sh_eg") - F.lit(by)).cast("long")
            .alias(f"__sh_d{bi}"),
            *[F.col(f"__sh_e_{o}") for o in outs]))
        res = res.join(src, res["__sh_g"] == src[f"__sh_d{bi}"],
                       "left").drop(f"__sh_d{bi}")
        for o in outs:
            fn = (F.lead(F.col(f"__sh_v_{o}"), by) if by >= 0
                  else F.lag(F.col(f"__sh_v_{o}"), -by))
            pos = F.col("__gw_rn") + F.lit(by)
            gpos = F.col("__sh_g") + F.lit(by)
            col = (F.when((pos >= 1) & (pos <= cnt_expr),
                          fn.over(wasc))
                   .when((gpos >= 1) & (gpos <= total),
                         F.col(f"__sh_e_{o}")))
            dflt = shifts[o].get("default")
            if dflt is not None:
                col = F.when((gpos >= 1) & (gpos <= total), col) \
                    .otherwise(F.lit(dflt))
            res = res.withColumn(o, col).drop(f"__sh_e_{o}")
    return res.drop(*[c for c in res.columns
                      if c.startswith(("__sh_", "__gw_"))])


def _fill_boundary_aggs(methods: dict, xc) -> list:
    """Boundary-observation aggregate expressions of _fill_global —
    split out (round-12) so the fused fill+shift path can ride one
    combined boundary aggregate."""
    aggs = []
    for out, odoc in methods.items():
        known = F.when(F.col(out).isNotNull(), F.col("__gw_rn"))
        if odoc["method"] == "locf":
            aggs.append(F.max_by(F.col(out), known).alias(f"__l_{out}"))
        else:
            v = F.col(out).cast("double")
            aggs += [F.max_by(v, known).alias(f"__l_{out}"),
                     F.max_by(xc, known).alias(f"__lx_{out}"),
                     F.min_by(v, known).alias(f"__f_{out}"),
                     F.min_by(xc, known).alias(f"__fx_{out}")]
    return aggs


def _fill_global(df: DataFrame, spec: dict, sort: dict,
                 bs: list = None, _work: DataFrame = None,
                 _parts: list = None, _keep: bool = False) -> DataFrame:
    """UNPARTITIONED $fill (locf/linear) without the single-task
    global-order window: per-partition fills over the range-partition
    scaffold, with each partition's boundary observations (last known
    value looking forward, first known looking backward) folded
    driver-side into per-partition carry scalars and broadcast back.
    One boundary aggregate -> one collect of N partition rows -> one
    broadcast join; the heavy windows all run per range partition, so
    the plan survives a 100x scale-up unchanged.

    ``_work``/``_parts``/``_keep`` (round-12, the fused fill+shift
    path): the caller supplies the already-scaffolded frame and the
    collected combined boundary aggregate, and asks for the scaffold
    columns to be KEPT so the shift pass can run on the result."""
    from pyspark.sql import Window

    spark = df.sparkSession
    methods = {out: odoc for out, odoc in spec["output"].items()
               if odoc.get("method") in ("locf", "linear")}
    for out, odoc in methods.items():
        if not sort:
            raise ValueError(f"{odoc['method']} fill requires sortBy")
        if odoc["method"] == "linear" and len(sort) != 1:
            raise ValueError(
                "linear fill requires exactly one numeric sortBy field")
    if _work is not None:
        ranged = _work
    else:
        ranged, wloc, _bs, _tot = _global_scaffold(df, sort, bs)
    # order the fill windows by the UNIQUE __gw_rn so every pass
    # traverses tied sort keys identically to the boundary aggregate's
    # rn-based max_by/min_by (raw keys would re-sort ties arbitrarily)
    back = (Window.partitionBy("__gw_pid").orderBy("__gw_rn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rev = (Window.partitionBy("__gw_pid")
           .orderBy(F.col("__gw_rn").desc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    xfield = next(iter(sort)) if sort else None
    xc = F.col(xfield).cast("double") if xfield else None

    # boundary observations, one row per partition (schema built
    # unconditionally — it is a driver-only py4j call; only the
    # collect is skipped on the fused path)
    bdf = ranged.groupBy("__gw_pid").agg(
        *_fill_boundary_aggs(methods, xc))
    parts = (_parts if _parts is not None
             else sorted(bdf.collect(), key=lambda r: r["__gw_pid"]))
    btypes = {f.name: f.dataType for f in bdf.schema.fields}

    def scan(rows, field):
        """Last non-null `field` seen so far, per position."""
        acc, out = None, []
        for r in rows:
            out.append(acc)
            if r[field] is not None:
                acc = r[field]
        return out

    carry_rows = [{"__gw_pid": r["__gw_pid"]} for r in parts]
    carry_fields = []
    for out, odoc in methods.items():
        prev_v = scan(parts, f"__l_{out}")
        carry_fields.append((f"__gw_pv_{out}", btypes[f"__l_{out}"]))
        for row, pv in zip(carry_rows, prev_v):
            row[f"__gw_pv_{out}"] = pv
        if odoc["method"] == "linear":
            prev_x = scan(parts, f"__lx_{out}")
            next_v = scan(parts[::-1], f"__f_{out}")[::-1]
            next_x = scan(parts[::-1], f"__fx_{out}")[::-1]
            carry_fields += [(f"__gw_px_{out}", btypes[f"__lx_{out}"]),
                             (f"__gw_nv_{out}", btypes[f"__f_{out}"]),
                             (f"__gw_nx_{out}", btypes[f"__fx_{out}"])]
            for row, px, nv, nx in zip(carry_rows, prev_x, next_v, next_x):
                row[f"__gw_px_{out}"] = px
                row[f"__gw_nv_{out}"] = nv
                row[f"__gw_nx_{out}"] = nx
    if carry_fields:
        ranged = ranged.join(_carry_df(spark, carry_rows, carry_fields),
                             on="__gw_pid")

    for out, odoc in spec["output"].items():
        if "value" in odoc:
            ranged = ranged.withColumn(
                out, F.coalesce(F.col(out), F.lit(odoc["value"])))
        elif odoc.get("method") == "locf":
            ranged = ranged.withColumn(out, F.coalesce(
                F.last(out, ignorenulls=True).over(back),
                F.col(f"__gw_pv_{out}")))
        elif odoc.get("method") == "linear":
            known_x = F.when(F.col(out).isNotNull(), xc)
            pv = F.coalesce(
                F.last(out, ignorenulls=True).over(back).cast("double"),
                F.col(f"__gw_pv_{out}"))
            px = F.coalesce(F.last(known_x, ignorenulls=True).over(back),
                            F.col(f"__gw_px_{out}"))
            nv = F.coalesce(
                F.last(out, ignorenulls=True).over(rev).cast("double"),
                F.col(f"__gw_nv_{out}"))
            nx = F.coalesce(F.last(known_x, ignorenulls=True).over(rev),
                            F.col(f"__gw_nx_{out}"))
            # nx == px only at already-known rows (coalesce discards
            # interp there), but ANSI mode still raises DIVIDE_BY_ZERO
            # when codegen evaluates the branch — guard explicitly,
            # keeping the SQL-twin left-associated (a*b)/c rounding
            interp = pv + F.when(
                nx != px, (nv - pv) * (xc - px) / (nx - px))
            ranged = ranged.withColumn(
                out, F.coalesce(F.col(out).cast("double"), interp))
        else:
            raise ValueError(f"unsupported fill spec {odoc}")
    if _keep:
        # fused path: the shift pass still needs the scaffold columns;
        # the carry columns are dropped here (they collide with a
        # later join's __gw_pv re-use otherwise)
        return ranged.drop(*[c for c in ranged.columns
                             if c.startswith(("__gw_pv_", "__gw_px_",
                                              "__gw_nv_", "__gw_nx_"))])
    return ranged.drop(*[c for c in ranged.columns
                         if c.startswith("__gw_")])


def _fill_shift_global(df: DataFrame, spec: dict, shifts: dict,
                       sort: dict, bs: list = None) -> DataFrame:
    """Fused unpartitioned $fill + $shift (round-12): both families
    ride ONE scaffold and ONE boundary-aggregate driver action.

    The sequential dispatch scaffolds the frame twice (the shift pass
    re-range-partitions the fill pass's full-width output — a second
    data-sized exchange at scale) and collects two boundary
    aggregates. Mongo forbids window outputs referencing each other,
    and the caller guards against a fill output shadowing a column a
    shift expression reads, so the shift's value columns computed on
    the PRE-fill frame are identical to the sequential form's, and
    both families' boundary observations can be taken from the same
    per-range pass. Applies fill first, shift second — the same
    order, same expressions, same carry arithmetic as the sequential
    path (pinned by the oracle rows and the differential test)."""
    if not sort:
        raise ValueError("$shift requires sortBy")
    ranged, _wloc, _bs, _tot = _global_scaffold(df, sort, bs)
    work, sh_aggs = _shift_prep(ranged, shifts)
    methods = {out: odoc for out, odoc in spec["output"].items()
               if odoc.get("method") in ("locf", "linear")}
    xfield = next(iter(sort)) if sort else None
    xc = F.col(xfield).cast("double") if xfield else None
    parts = sorted(
        work.groupBy("__gw_pid")
        .agg(*sh_aggs, *_fill_boundary_aggs(methods, xc)).collect(),
        key=lambda r: r["__gw_pid"])
    filled = _fill_global(df, spec, sort, bs=bs, _work=work,
                          _parts=parts, _keep=True)
    return _shift_global(df, shifts, sort, bs=bs, _work=filled,
                         _parts=parts)


def _fill(df: DataFrame, spec: dict) -> DataFrame:
    """$fill: complete null values — method "locf" (last observation
    carried forward in sortBy order, per partition), method "linear"
    (interpolate between the surrounding non-nulls along the single
    numeric sortBy field; nulls before the first / after the last known
    value stay null, as in Mongo), or a constant {"value": v}.

    Without partitionBy the locf/linear compile would be a single-task
    global-order window; that path routes through _fill_global's
    range-partition + broadcast-carry scaffold instead."""
    from pyspark.sql import Window

    sort_spec = spec.get("sortBy") or {}
    if "partitionBy" not in spec and any(
            odoc.get("method") in ("locf", "linear")
            for odoc in spec["output"].values()):
        return _fill_global(_maybe_checkpoint_global_input(df),
                            spec, sort_spec)
    parts = [_value(df, spec["partitionBy"])] if "partitionBy" in spec \
        else []
    w = Window.partitionBy(*parts)
    sort = spec.get("sortBy") or {}
    if sort:
        w = w.orderBy(*[F.col(k).asc() if v > 0 else F.col(k).desc()
                        for k, v in sort.items()])
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # "next known value" via a REVERSED running frame, never
    # (currentRow, unboundedFollowing): Spark's unbounded-FOLLOWING
    # frame re-scans the partition tail for EVERY row — O(n²) per
    # partition (measured: 250 s for one 100k-row global fill). The
    # last-non-null over the reverse order is the same value in O(n).
    rev = Window.partitionBy(*parts).orderBy(*[
        F.col(k).desc() if v > 0 else F.col(k).asc()
        for k, v in sort.items()]) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for out, odoc in spec["output"].items():
        if "value" in odoc:
            df = df.withColumn(out, F.coalesce(F.col(out),
                                               F.lit(odoc["value"])))
        elif odoc.get("method") == "locf":
            if not sort:
                raise ValueError("locf fill requires sortBy")
            df = df.withColumn(out, F.last(out, ignorenulls=True).over(back))
        elif odoc.get("method") == "linear":
            if len(sort) != 1:
                raise ValueError(
                    "linear fill requires exactly one numeric sortBy field")
            x = F.col(next(iter(sort))).cast("double")
            known_x = F.when(F.col(out).isNotNull(), x)
            pv = F.last(out, ignorenulls=True).over(back).cast("double")
            px = F.last(known_x, ignorenulls=True).over(back)
            nv = F.last(out, ignorenulls=True).over(rev).cast("double")
            nx = F.last(known_x, ignorenulls=True).over(rev)
            # guard as in _fill_global: ANSI codegen may evaluate the
            # discarded interp branch at known rows where nx == px
            interp = pv + F.when(
                nx != px, (nv - pv) * (x - px) / (nx - px))
            df = df.withColumn(
                out, F.coalesce(F.col(out).cast("double"), interp))
        else:
            raise ValueError(f"unsupported fill spec {odoc}")
    return df


def _resolve_store(name: Any, stores: Optional[dict]):
    if not isinstance(name, str):
        return name  # already a store object
    if not stores or name not in stores:
        raise ValueError(f"write stage target {name!r}: pass "
                         f"stores={{name: store}} to resolve it")
    return stores[name]


def _merge_matched_pipeline(df: DataFrame, store, keys: list[str],
                            pipeline: list[dict],
                            let: Optional[dict]) -> DataFrame:
    """$merge whenMatched as an update PIPELINE (Mongo 4.2 form).

    Matched target docs flow through $set/$addFields/$unset stages
    whose expressions see the EXISTING doc as `$field` and the
    incoming doc as `$$new.field` (or custom `let` variables —
    expressions over the incoming doc). Set-based compile: ONE inner
    equi-join target x batch on the merge keys, every stage folds into
    Column expressions over that join — no per-row evaluation, no
    second shuffle; unmatched batch rows (the whenNotMatched=insert
    side) anti-join and union back unchanged. Dotted output fields and
    $project/$replaceWith inside the update pipeline raise (reshape
    with a plain pipeline stage before $merge instead)."""
    old = store.df
    n, o = df.alias("__mg_n"), old.alias("__mg_o")
    joined = o.join(n, on=keys, how="inner")
    doc: dict[str, Column] = {
        c: F.col(f"__mg_o.{c}") for c in old.columns if c not in keys}

    def n_resolve(path: str) -> Column:
        parts = path.split(".")
        if parts[0] not in df.columns:
            return F.lit(None)
        col = F.col(f"__mg_n.{parts[0]}")
        for p in parts[1:]:
            col = col[p]
        return col

    variables: dict[str, Column] = {}
    if let is not None:
        for name, vexpr in dict(let).items():
            variables[name] = compile_expr(vexpr, n_resolve)

    def resolve(path: str) -> Column:
        if path.startswith("$"):  # a $$variable
            parts = path[1:].split(".")
            head = parts[0]
            if head in variables:
                col = variables[head]
            elif head == "new" and let is None:
                if len(parts) == 1:
                    raise ValueError(
                        "$merge whenMatched pipeline: bare $$new is "
                        "unsupported — reference $$new.<field>")
                return n_resolve(".".join(parts[1:]))
            else:
                raise ValueError(
                    f"$merge whenMatched pipeline: unknown variable "
                    f"$${head}")
            for p in parts[1:]:
                col = col[p]
            return col
        parts = path.split(".")
        if parts[0] in keys:
            col = F.col(parts[0])
        elif parts[0] in doc:
            col = doc[parts[0]]
        else:
            return F.lit(None)
        for p in parts[1:]:
            col = col[p]
        return col

    for st in pipeline:
        if not (isinstance(st, dict) and len(st) == 1):
            raise ValueError(f"update pipeline stage must be a "
                             f"one-key dict: {st}")
        sop, sspec = next(iter(st.items()))
        if sop in ("$set", "$addFields"):
            for fld, e in sspec.items():
                if "." in fld:
                    raise ValueError(
                        "$merge whenMatched pipeline: dotted output "
                        f"field {fld!r} is unsupported")
                if fld in keys:
                    raise ValueError(
                        f"$merge whenMatched pipeline: cannot $set "
                        f"merge key {fld!r}")
                doc[fld] = compile_expr(e, resolve)
        elif sop == "$unset":
            flds = [sspec] if isinstance(sspec, str) else list(sspec)
            for fld in flds:
                if fld in keys:
                    raise ValueError(
                        f"$merge whenMatched pipeline: cannot $unset "
                        f"merge key {fld!r}")
                doc.pop(fld, None)
        else:
            raise ValueError(
                f"$merge whenMatched pipeline supports $set/"
                f"$addFields/$unset stages only, got {sop!r}")

    folded = joined.select(
        *keys, *[c.alias(f) for f, c in doc.items()])
    fresh = df.join(old.select(*keys), on=keys, how="left_anti")
    return folded.unionByName(fresh, allowMissingColumns=True)


def _write_stage(df: DataFrame, op: str, spec: Any,
                 stores: Optional[dict]) -> DataFrame:
    """$out (replace the target) / $merge (upsert into the target).

    Mongo $merge options supported: whenMatched in
    {"replace" (default HERE), "merge", "keepExisting", "fail"} or an
    update PIPELINE (list of $set/$addFields/$unset stages with $$new
    / custom `let` variables — _merge_matched_pipeline);
    whenNotMatched in {"insert", "discard", "fail"}. Mongo's own
    default is "merge" (field-wise), but a columnar engine conflates
    missing with null (DEVIATIONS §1): when the batch carries the full
    schema with non-null values — the normal pipeline shape — merge
    and replace coincide, and "replace" is the cheaper plan (no
    pre-join with the target), so it stays the default; pass
    whenMatched="merge" for the field-wise fold (new non-null wins,
    otherwise the existing value survives; target-only columns always
    survive). The upsert IS the engine's key-merge plan, so at scale
    this is the same one-shuffle merge update() runs."""
    if op == "$out":
        store = _resolve_store(spec, stores)
        try:
            has_data = store.count() > 0
        except ValueError:  # e.g. an empty MemoryStore with no df yet
            has_data = False
        if has_data:
            store.remove_docs({})  # Mongo {}: match everything
        store.update(df)
        return store.df
    spec = dict(spec) if isinstance(spec, dict) else {"into": spec}
    store = _resolve_store(spec["into"], stores)
    on = spec.get("on", store.key)
    keys = [on] if isinstance(on, str) else list(on)
    matched = spec.get("whenMatched", "replace")
    not_matched = spec.get("whenNotMatched", "insert")
    if not isinstance(matched, list) and \
            matched not in ("replace", "merge", "keepExisting", "fail"):
        raise ValueError(f"unsupported whenMatched={matched!r}")
    if not_matched not in ("insert", "discard", "fail"):
        raise ValueError(f"unsupported whenNotMatched={not_matched!r}")
    if not_matched in ("discard", "fail"):
        new_keys = df.join(store.df.select(*keys), on=keys, how="left_anti")
        if not_matched == "fail" and new_keys.limit(1).count():
            raise ValueError("$merge whenNotMatched=fail: unmatched key")
        df = df.join(store.df.select(*keys), on=keys, how="left_semi")
    if matched in ("keepExisting", "fail"):
        clash = df.join(store.df.select(*keys), on=keys, how="left_semi")
        if matched == "fail" and clash.limit(1).count():
            raise ValueError("$merge whenMatched=fail: key already exists")
        df = df.join(store.df.select(*keys), on=keys, how="left_anti")
    if isinstance(matched, list):
        df = _merge_matched_pipeline(df, store, keys, matched,
                                     spec.get("let"))
    elif matched == "merge":
        # field-wise fold (Mongo's default semantics): one equi-join
        # with the target — batch non-null wins, existing value
        # otherwise, target-only columns carried through
        old = store.df
        n, o = df.alias("__mg_n"), old.alias("__mg_o")
        common = [c for c in df.columns
                  if c in old.columns and c not in keys]
        new_only = [c for c in df.columns
                    if c not in old.columns and c not in keys]
        old_only = [c for c in old.columns
                    if c not in df.columns and c not in keys]
        folded = n.join(o, on=keys, how="inner").select(
            *keys,
            *[F.coalesce(F.col(f"__mg_n.{c}"),
                         F.col(f"__mg_o.{c}")).alias(c)
              for c in common],
            *[F.col(f"__mg_n.{c}").alias(c) for c in new_only],
            *[F.col(f"__mg_o.{c}").alias(c) for c in old_only])
        fresh = df.join(old.select(*keys), on=keys, how="left_anti")
        df = folded.unionByName(fresh, allowMissingColumns=True)
    store.update(df, key=on)
    return store.df


def compile_pipeline(
    df: DataFrame,
    pipeline: list[dict],
    stores: Optional[dict] = None,
) -> DataFrame:
    """Compile a Mongo aggregation pipeline onto `df`, stage by stage."""
    for stage in pipeline:
        if not (isinstance(stage, dict) and len(stage) == 1):
            raise ValueError(f"each pipeline stage is a one-key dict: {stage}")
        op, spec = next(iter(stage.items()))
        if op == "$match":
            df = df.filter(compile_criteria(spec, schema=df.schema))
        elif op == "$project":
            df = _project(df, spec)
        elif op in ("$addFields", "$set"):
            for k, v in spec.items():
                df = df.withColumn(k, _value(df, v))
        elif op == "$unset":
            df = df.drop(*([spec] if isinstance(spec, str) else list(spec)))
        elif op == "$group":
            df = _group(df, spec)
        elif op == "$sort":
            df = df.orderBy(*[
                F.col(k).asc() if v > 0 else F.col(k).desc()
                for k, v in spec.items()])
        elif op == "$skip":
            df = df.offset(int(spec))
        elif op == "$limit":
            df = df.limit(int(spec))
        elif op == "$count":
            df = df.agg(F.count(F.lit(1)).alias(spec))
        elif op == "$unwind":
            df = _unwind(df, spec)
        elif op == "$lookup":
            df = _lookup(df, spec, stores)
        elif op == "$graphLookup":
            df = _graph_lookup(df, spec, stores)
        elif op == "$unionWith":
            if isinstance(spec, (str, DataFrame)) or not isinstance(spec, dict):
                other, sub = spec, None
            else:
                other, sub = spec["coll"], spec.get("pipeline")
            other = _resolve_store(other, stores)
            odf = other if isinstance(other, DataFrame) else other.df
            if sub:
                odf = compile_pipeline(odf, sub, stores=stores)
            df = df.unionByName(odf, allowMissingColumns=True)
        elif op == "$sample":
            # Mongo samples RANDOMLY; a reproducible engine uses the
            # content-addressed md5 rule sized from an exact count —
            # deterministic membership, same expected size
            from maggma_spark.operators.corpus import md5_bucket

            size = int(spec["size"])
            total = df.count()
            if total > size:
                buckets = 1 << 20
                keep = int(round(size / total * buckets))
                first = df.columns[0]
                df = df.filter(md5_bucket(F.col(first).cast("string"),
                                          buckets) < keep)
        elif op == "$setWindowFields":
            df = _set_window_fields(df, spec)
        elif op == "$densify":
            df = _densify(df, spec)
        elif op == "$fill":
            df = _fill(df, spec)
        elif op == "$sortByCount":
            df = (df.groupBy(_value(df, spec).alias("_id"))
                  .agg(F.count(F.lit(1)).alias("count"))
                  .orderBy(F.col("count").desc(), F.col("_id").asc()))
        elif op in ("$replaceRoot", "$replaceWith"):
            # $replaceWith <expr> is shorthand for $replaceRoot {newRoot}
            root = (spec["newRoot"] if op == "$replaceRoot" else spec) \
                .lstrip("$")
            df = df.select(f"{root}.*")
        elif op == "$documents":
            # literal-documents source (Mongo requires it first; same
            # rule here — it REPLACES the input frame)
            if stage is not pipeline[0]:
                raise ValueError("$documents must be the first stage")
            df = df.sparkSession.createDataFrame(spec)
        elif op == "$vectorSearch":
            if stage is not pipeline[0]:
                raise ValueError("$vectorSearch must be the first stage")
            df = _vector_search(df, spec)
        elif op == "$collStats":
            # collection statistics (Mongo requires it first). `count`
            # is exact (one aggregate — the columnar count IS cheap,
            # unlike Mongo's collscan fallback); `storageStats`
            # reports Catalyst's sizeInBytes estimate (for parquet
            # scans this is the real file footprint; post-transform
            # frames carry the optimizer estimate) — named
            # size_bytes_estimate to be honest about it. latencyStats/
            # queryExecStats are server diagnostics with no engine
            # analog: raise.
            if stage is not pipeline[0]:
                raise ValueError("$collStats must be the first stage")
            unknown = set(spec) - {"count", "storageStats"}
            if unknown:
                raise ValueError(
                    f"$collStats options {sorted(unknown)} are not "
                    "supported (count/storageStats only)")
            cols = []
            if "count" in spec:
                cols.append(F.count(F.lit(1)).alias("count"))
            if not cols and "storageStats" not in spec:
                raise ValueError(
                    "$collStats needs count and/or storageStats")
            size = None
            if "storageStats" in spec:
                size = int(df._jdf.queryExecution().optimizedPlan()
                           .stats().sizeInBytes())
            out = df.agg(*cols) if cols else (
                df.sparkSession.range(1).select())
            if size is not None:
                out = out.withColumn("size_bytes_estimate",
                                     F.lit(size).cast("long"))
            df = out
        elif op in ("$search", "$searchMeta"):
            if stage is not pipeline[0]:
                raise ValueError(f"{op} must be the first stage")
            df = (_search if op == "$search" else _search_meta)(df, spec)
        elif op == "$bucket":
            df = _bucket(df, spec)
        elif op == "$bucketAuto":
            df = _bucket_auto(df, spec)
        elif op == "$facet":
            # each sub-pipeline collapses to ONE array column; facets
            # combine with crossJoins of single-row aggregates. The
            # collect is guarded: Mongo's own $facet output is bounded
            # by the 16 MB document limit — a sub-pipeline that does
            # not aggregate/limit down would OOM one task here, so it
            # raises past MAX_GROUP_ELEMENTS (house guard style)
            if not spec:
                raise ValueError("$facet requires at least one facet")
            out = None
            for name, sub in spec.items():
                sub_df = compile_pipeline(df, sub, stores=stores)
                one = sub_df.agg(_guard_group_array(
                    F.collect_list(F.struct(*sub_df.columns)),
                    f"$facet {name!r}").alias(name))
                out = one if out is None else out.crossJoin(one)
            df = out
        elif op in ("$out", "$merge"):
            if stage is not pipeline[-1]:
                raise ValueError(f"{op} must be the final pipeline stage")
            df = _write_stage(df, op, spec, stores)
        else:
            raise ValueError(f"unsupported pipeline stage {op}")
    # the $vectorSearch score is internal plumbing: as in Mongo it only
    # surfaces through a {"$meta": "vectorSearchScore"} projection —
    # without one the dunder column must not leak into the result
    if "__vector_search_score" in df.columns:
        df = df.drop("__vector_search_score")
    if "__search_score" in df.columns:
        df = df.drop("__search_score")
    return df


def serve_aggregation(store, pipeline: list[dict], max_rows: int = 10_000,
                      stores: Optional[dict] = None) -> dict:
    """AggregationResource analog (reference:src/maggma/api/resource/
    aggregation.py:65-101): run the pipeline, return
    {data, meta: {total_doc}} — framework-free, a FastAPI route
    delegates here like serve_query."""
    out = compile_pipeline(store.df, pipeline, stores=stores)
    rows = [r.asDict(recursive=True) for r in out.limit(max_rows).collect()]
    return {"data": rows, "meta": {"total_doc": len(rows)}}
