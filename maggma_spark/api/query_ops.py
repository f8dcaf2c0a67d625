"""REST-style query operators: typed URL parameters -> STORE_PARAMS ->
DataFrame chain.

Reference parity: the QueryOperator design is kept nearly verbatim
because it is backend-agnostic (reference:src/maggma/api/query_operator/
core.py:8-38): each operator consumes a group of request parameters and
emits a STORE_PARAMS fragment (criteria / properties / skip / limit /
sort, reference:src/maggma/api/utils.py:19-34); fragments merge with
$and-composition of criteria (merge_queries, reference:src/maggma/api/
utils.py:37-52); the merged params compile onto a SparkStore exactly like
§3.1 library queries — replacing the reference's Mongo aggregation
pipeline compilation (reference:src/maggma/api/resource/utils.py:34-66).

Parameter dialects mirrored from the dynamic model operators
(reference:src/maggma/api/query_operator/dynamic.py:108-248):
  numeric:  f=, f_not_eq=, f_min=, f_max=, f_eq_any=, f_neq_any=
  string:   f=, f_not_eq=, f_eq_any=, f_neq_any=
  paging:   _page/_per_page or _skip/_limit, max_limit guard
            (reference:src/maggma/api/query_operator/pagination.py:19-76)
  sorting:  _sort_fields=f1,-f2 (reference:.../sorting.py:25-54)
  sparse:   _fields=a,b,c | _all_fields=true (reference:.../sparse_fields.py)
  submission: state == latest element of the state array
            (reference:.../submission.py:17-39, $arrayElemAt -1)

The FastAPI wiring lives in maggma_spark.api.app behind an import guard
(fastapi is optional); these operators are pure functions and fully
testable without it.
"""

from __future__ import annotations

from typing import Any, Optional

STORE_PARAMS = dict  # {"criteria": dict, "properties": list, "skip": int,
#                       "limit": int, "sort": dict}


class QueryOperator:
    """Base: consume keyword params, emit a STORE_PARAMS fragment."""

    def query(self, **params: Any) -> dict:
        raise NotImplementedError

    def post_process(self, df, params: dict):
        """Optional DataFrame transform applied after the store query."""
        return df


class NumericQuery(QueryOperator):
    def __init__(self, fields: list[str]):
        self.fields = list(fields)

    def query(self, **params: Any) -> dict:
        crit: dict = {}
        for f in self.fields:
            ops = {}
            if (v := params.get(f)) is not None:
                crit[f] = v
                continue
            if (v := params.get(f + "_not_eq")) is not None:
                ops["$ne"] = v
            if (v := params.get(f + "_min")) is not None:
                ops["$gte"] = v
            if (v := params.get(f + "_max")) is not None:
                ops["$lte"] = v
            if (v := params.get(f + "_eq_any")) is not None:
                ops["$in"] = _split(v)
            if (v := params.get(f + "_neq_any")) is not None:
                ops["$nin"] = _split(v)
            if ops:
                crit[f] = ops
        return {"criteria": crit} if crit else {}


class StringQueryOperator(NumericQuery):
    """Same surface minus min/max (reference:dynamic.py:200-248)."""

    def query(self, **params: Any) -> dict:
        trimmed = {k: v for k, v in params.items()
                   if not (k.endswith("_min") or k.endswith("_max"))}
        return super().query(**trimmed)


class PaginationQuery(QueryOperator):
    def __init__(self, default_limit: int = 100, max_limit: int = 1000):
        self.default_limit = default_limit
        self.max_limit = max_limit

    def query(self, **params: Any) -> dict:
        if (limit := params.get("_limit")) is not None or \
           (skip := params.get("_skip")) is not None:
            limit = int(params.get("_limit") or self.default_limit)
            skip = int(params.get("_skip") or 0)
        else:
            per_page = int(params.get("_per_page") or self.default_limit)
            page = int(params.get("_page") or 1)
            limit, skip = per_page, (page - 1) * per_page
        if limit > self.max_limit:
            raise ValueError(
                f"requested limit {limit} exceeds max_limit {self.max_limit} "
                "(reference:pagination.py:61-68)")
        return {"skip": skip, "limit": limit}


class SortQuery(QueryOperator):
    def query(self, **params: Any) -> dict:
        raw = params.get("_sort_fields")
        if not raw:
            return {}
        sort = {}
        for f in _split(raw):
            if f.startswith("-"):
                sort[f[1:]] = -1
            else:
                sort[f] = 1
        return {"sort": sort}


class SparseFieldsQuery(QueryOperator):
    def __init__(self, default_fields: Optional[list[str]] = None):
        self.default_fields = default_fields

    def query(self, **params: Any) -> dict:
        if params.get("_all_fields"):
            return {}
        raw = params.get("_fields")
        fields = _split(raw) if raw else self.default_fields
        return {"properties": fields} if fields else {}


class SubmissionQuery(QueryOperator):
    """Latest-state filtering on submission documents: the current state
    is the LAST element of the state array."""

    def query(self, **params: Any) -> dict:
        state = params.get("state")
        if state is None:
            return {}
        return {"criteria": {
            "$expr": {"$eq": [{"$arrayElemAt": ["$state", -1]}, state]}}}


class DateTimeQuery(QueryOperator):
    """eq/not_eq/min/max on timestamp fields; ISO-8601 strings parse to
    datetime driver-side (the criteria compiler compares them as
    timestamp literals). Mirrors the reference's numeric datetime params
    (reference:src/maggma/api/query_operator/dynamic.py:166-198)."""

    def __init__(self, fields: list[str]):
        self.fields = list(fields)

    def query(self, **params: Any) -> dict:
        import datetime as _dt

        def pv(v: Any) -> Any:
            return _dt.datetime.fromisoformat(v) if isinstance(v, str) else v

        crit: dict = {}
        for f in self.fields:
            if (v := params.get(f)) is not None:
                crit[f] = pv(v)
                continue
            ops = {}
            for suffix, op in (("_not_eq", "$ne"), ("_min", "$gte"),
                               ("_max", "$lte")):
                if (v := params.get(f + suffix)) is not None:
                    ops[op] = pv(v)
            if ops:
                crit[f] = ops
        return {"criteria": crit} if crit else {}


class BooleanQuery(QueryOperator):
    """eq/not_eq on boolean fields ("true"/"1"/"yes" parse truthy)."""

    def __init__(self, fields: list[str]):
        self.fields = list(fields)

    def query(self, **params: Any) -> dict:
        def pb(v: Any) -> bool:
            return v if isinstance(v, bool) else str(v).lower() in (
                "1", "true", "yes")

        crit: dict = {}
        for f in self.fields:
            if (v := params.get(f)) is not None:
                crit[f] = pb(v)
            elif (v := params.get(f + "_not_eq")) is not None:
                crit[f] = {"$ne": pb(v)}
        return {"criteria": crit} if crit else {}


def operators_from_schema(schema, exclude: tuple = (),
                          include: Optional[list[str]] = None) -> list[QueryOperator]:
    """Synthesize the per-field query operators from a declared schema —
    the reference generates numeric/string/datetime params from a
    pydantic model (reference:src/maggma/api/query_operator/
    dynamic.py:63-76,108-248); here the StructType IS the declared model,
    so a resource serves `<field>_min=`/`<field>_eq_any=`/... for every
    scalar column without hand-written field lists. Nested/array/binary
    columns are skipped (dotted-path params remain the hand-built route).
    """
    from pyspark.sql.types import (
        BooleanType, ByteType, DateType, DecimalType, DoubleType,
        FloatType, IntegerType, LongType, ShortType, StringType,
        TimestampNTZType, TimestampType,
    )

    numeric_t = (ByteType, ShortType, IntegerType, LongType, FloatType,
                 DoubleType, DecimalType)
    datetime_t = (TimestampType, TimestampNTZType, DateType)
    numeric, string, dts, bools = [], [], [], []
    for f in schema.fields:
        if f.name in exclude or (include is not None and f.name not in include):
            continue
        t = f.dataType
        if isinstance(t, numeric_t):
            numeric.append(f.name)
        elif isinstance(t, StringType):
            string.append(f.name)
        elif isinstance(t, datetime_t):
            dts.append(f.name)
        elif isinstance(t, BooleanType):
            bools.append(f.name)
    ops: list[QueryOperator] = []
    if numeric:
        ops.append(NumericQuery(numeric))
    if string:
        ops.append(StringQueryOperator(string))
    if dts:
        ops.append(DateTimeQuery(dts))
    if bools:
        ops.append(BooleanQuery(bools))
    return ops


def operators_for_store(store, exclude: tuple = (),
                        include: Optional[list[str]] = None) -> list[QueryOperator]:
    """operators_from_schema over a SparkStore's DataFrame schema."""
    return operators_from_schema(store.df.schema, exclude=exclude,
                                 include=include)


def _split(v: Any) -> list:
    if isinstance(v, (list, tuple)):
        return list(v)
    return [s.strip() for s in str(v).split(",") if s.strip()]


def merge_queries(fragments: list[dict]) -> dict:
    """$and-merge criteria; last-wins for scalar params
    (reference:src/maggma/api/utils.py:37-52)."""
    crits = [f["criteria"] for f in fragments if f.get("criteria")]
    merged: dict = {}
    for f in fragments:
        for k, v in f.items():
            if k != "criteria":
                merged[k] = v
    if len(crits) == 1:
        merged["criteria"] = crits[0]
    elif crits:
        merged["criteria"] = {"$and": crits}
    return merged


def execute_store_params(store, params: dict, with_meta: bool = False):
    """STORE_PARAMS -> DataFrame chain on a SparkStore (the §3.1 path).
    with_meta also returns {"total_doc": count-sans-paging}
    (reference:src/maggma/api/resource/read_resource.py:244-246)."""
    df = store.query(
        criteria=params.get("criteria"),
        properties=params.get("properties"),
        sort=params.get("sort"),
        skip=params.get("skip", 0),
        limit=params.get("limit", 0),
    )
    if not with_meta:
        return df
    meta = {"total_doc": store.count(params.get("criteria"))}
    return df, meta
