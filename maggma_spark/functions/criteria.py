"""Mongo-criteria-dict -> Catalyst ``Column`` compiler.

This is the core front end of the engine: the reference's entire query
surface is the PyMongo criteria dialect (reference:docs/getting_started/
query_101.md, reference:src/maggma/core/store.py:100-119). We compile a
criteria dict into a single Catalyst ``Column`` predicate so that Spark
can push it into the parquet scan (predicate pushdown), prune columns,
and fold constants — none of which the reference could do (it shipped the
dict to mongod and hoped; reference:src/maggma/stores/mongolike.py:331-339).

Null/missing-field semantics (documented, Mongo-faithful where Spark's
columnar model allows):

- ``{f: None}`` matches *missing or null* — in a columnar engine a field
  absent from a document IS null, so ``isNull()`` reproduces both.
- ``$ne``/``$nin``/``$not`` also match documents where the field is
  missing (Mongo behavior) -> predicate ORs ``isNull()``.
- ``$exists: True`` -> ``isNotNull()``. Deviation from Mongo: a document
  holding an explicit null is treated as "missing" (schemaless presence
  and null are indistinguishable after columnarization). A field absent
  from the *schema* compiles to a constant, so ``$exists: False`` on a
  never-seen field is ``True`` for every row — matching the reference's
  disjoint-key-set semantics (SURVEY §1.3).
- Range operators (``$gt`` etc.) never match null/missing, in both
  engines, for free (SQL three-valued logic).

Array-field semantics (schema-aware, matching Mongo's element-or-whole
matching, reference:src/maggma/stores/mongolike.py:176-181 array
unravel):

- ``{tags: "x"}`` on an array column -> ``array_contains``.
- ``{tags: {"$in": [..]}}`` -> ``arrays_overlap``.
- ``$all`` / ``$size`` / ``$elemMatch`` supported natively.

Everything stays JVM-side: the compiler emits only built-in
``pyspark.sql.functions`` expressions — no Python UDFs — so the whole
predicate participates in whole-stage codegen and parquet pushdown.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Optional

from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

try:  # Spark 4.x semi-structured VARIANT support
    from pyspark.sql.types import VariantType
except ImportError:  # pragma: no cover - older Spark
    VariantType = None

Resolver = Callable[[str], Column]

_COMPARISONS = {
    "$eq": None,  # special-cased (null semantics)
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}


def _lit(v: Any) -> Column:
    """Literal constructor accepting python scalars, datetimes and lists."""
    if isinstance(v, (list, tuple)):
        return F.array(*[_lit(x) for x in v])
    return F.lit(v)


def _path_type(schema: Optional[StructType], path: str) -> Optional[DataType]:
    """Resolve a dotted path against a StructType; None if unresolvable."""
    if schema is None:
        return None
    cur: DataType = schema
    for part in path.split("."):
        if not isinstance(cur, StructType):
            return None
        names = {f.name: f.dataType for f in cur.fields}
        if part not in names:
            return None
        cur = names[part]
    return cur


def _variant_split(schema: Optional[StructType],
                   path: str) -> Optional[tuple[str, str]]:
    """If a dotted path drills INTO a VariantType column, return
    (variant_column_path, json_path) — e.g. `meta.a.b` over a variant
    column `meta` gives ("meta", "$.a.b"). None when the path doesn't
    cross a variant (or Spark predates VariantType).

    VARIANT is the Spark-4 mapping for the reference's schemaless
    document tails (SURVEY §1.3): fields that vary per document live in
    one semi-structured column instead of an ever-widening struct
    union, and criteria still address them by dotted path."""
    if schema is None or VariantType is None:
        return None
    parts = path.split(".")
    cur: DataType = schema
    for i, part in enumerate(parts):
        if not isinstance(cur, StructType):
            return None
        names = {f.name: f.dataType for f in cur.fields}
        if part not in names:
            return None
        cur = names[part]
        if isinstance(cur, VariantType) and i + 1 < len(parts):
            rest = parts[i + 1:]
            return ".".join(parts[:i + 1]), "$" + "".join(f".{p}" for p in rest)
    return None


def _variant_cast_type(v: Any) -> str:
    """Extraction type for a variant comparison, driven by the query
    value: numerics compare as double (so int criteria don't truncate
    stored doubles), bools/strings/timestamps as themselves."""
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "double"
    if isinstance(v, _dt.datetime):
        return "timestamp"
    if isinstance(v, (list, tuple)) and v:
        return f"array<{_variant_cast_type(v[0])}>"
    return "string"


def _variant_field_pred(root: str, jpath: str, value: Any,
                        resolve: Resolver) -> Column:
    """Criteria on a path inside a VARIANT column. Supported: bare
    equality, $eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists/$regex.
    Values extract with try_variant_get typed by the QUERY value
    (mistyped documents become null -> non-matches, Mongo-style)."""
    base = resolve(root)
    raw = F.try_variant_get(base, jpath, "variant")

    def typed(v: Any) -> Column:
        return F.try_variant_get(base, jpath, _variant_cast_type(v))

    def null_or_missing() -> Column:
        return raw.isNull() | F.is_variant_null(raw)

    if not _is_operator_doc(value):
        if isinstance(value, dict):
            raise ValueError(
                "exact sub-document match inside a VARIANT column is "
                "not supported; use dotted-path criteria per field")
        if value is None:
            return null_or_missing()
        return typed(value) == _lit(value)

    preds = []
    for op, v in value.items():
        if op == "$eq":
            preds.append(null_or_missing() if v is None
                         else typed(v) == _lit(v))
        elif op == "$ne":
            if v is None:
                preds.append(~null_or_missing())
            else:
                preds.append(
                    F.coalesce(typed(v) != _lit(v), F.lit(True)))
        elif op in ("$gt", "$gte", "$lt", "$lte"):
            preds.append(_COMPARISONS[op](typed(v), _lit(v)))
        elif op == "$in":
            non_null = [x for x in v if x is not None]
            p = (typed(non_null[0]).isin(non_null) if non_null
                 else F.lit(False))
            if len(non_null) != len(v):
                p = p | null_or_missing()
            preds.append(p)
        elif op == "$nin":
            non_null = [x for x in v if x is not None]
            p = (typed(non_null[0]).isin(non_null) if non_null
                 else F.lit(False))
            if len(non_null) != len(v):
                p = p | null_or_missing()
            preds.append(~F.coalesce(p, F.lit(False)))
        elif op == "$exists":
            present = raw.isNotNull()
            preds.append(present if v else ~present)
        elif op == "$regex":
            opts = value.get("$options", "")
            pat = f"(?{opts})" + v if opts else v
            preds.append(typed("").rlike(pat))
        elif op == "$options":
            continue
        else:
            raise ValueError(
                f"operator {op!r} is not supported on paths inside a "
                "VARIANT column (supported: eq/ne/gt/gte/lt/lte/in/nin/"
                "exists/regex)")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _path_in_schema(schema: Optional[StructType], path: str) -> Optional[bool]:
    if schema is None:
        return None  # unknown — assume present
    return _path_type(schema, path) is not None


def default_resolver(schema: Optional[StructType] = None) -> Resolver:
    """Dotted path -> Column; schema-absent paths become typed nulls so the
    disjoint-key-set semantics of the reference hold (a field some docs
    lack is simply null there)."""

    def resolve(path: str) -> Column:
        if schema is not None and not _path_in_schema(schema, path):
            return F.lit(None)
        return F.col(path)

    return resolve


def _is_operator_doc(v: Any) -> bool:
    return isinstance(v, dict) and len(v) > 0 and all(
        isinstance(k, str) and k.startswith("$") for k in v
    )


def _eq_pred(col: Column, v: Any, ftype: Optional[DataType]) -> Column:
    """Bare / $eq equality with Mongo null + array-field semantics."""
    if v is None:
        return col.isNull()
    if isinstance(ftype, ArrayType) and not isinstance(v, (list, tuple)):
        # Mongo: scalar equality against an array matches any element.
        return F.array_contains(col, _lit(v))
    return col == _lit(v)


def _in_pred(col: Column, values: list, ftype: Optional[DataType]) -> Column:
    non_null = [v for v in values if v is not None]
    has_null = len(non_null) != len(values)
    if isinstance(ftype, ArrayType) and non_null and not isinstance(non_null[0], (list, tuple)):
        pred = F.arrays_overlap(col, F.array(*[_lit(v) for v in non_null]))
    elif non_null:
        pred = col.isin(non_null)
    else:
        pred = F.lit(False)
    if has_null:
        pred = pred | col.isNull()
    return pred


def _field_op_pred(col: Column, op: str, v: Any, ftype: Optional[DataType],
                   resolve: Resolver) -> Column:
    """One `$op: value` applied to one field column."""
    if op == "$eq":
        return _eq_pred(col, v, ftype)
    if op in ("$gt", "$gte", "$lt", "$lte"):
        return _COMPARISONS[op](col, _lit(v))
    if op == "$ne":
        if v is None:
            return col.isNotNull()
        # Mongo $ne matches docs where the field is missing.
        return (~_eq_pred(col, v, ftype)) | col.isNull()
    if op == "$in":
        if not isinstance(v, (list, tuple)):
            raise ValueError("$in requires a list")
        return _in_pred(col, list(v), ftype)
    if op == "$nin":
        if not isinstance(v, (list, tuple)):
            raise ValueError("$nin requires a list")
        return (~_in_pred(col, list(v), ftype)) | col.isNull()
    if op == "$exists":
        return col.isNotNull() if v else col.isNull()
    if op == "$not":
        sub = _field_pred(col, v, ftype, resolve)
        return (~sub) | col.isNull()
    if op == "$regex":
        return col.rlike(v)
    if op == "$options":
        # handled jointly with $regex in _field_pred; standalone is a no-op
        return F.lit(True)
    if op == "$mod":
        divisor, remainder = v
        return (col % _lit(divisor)) == _lit(remainder)
    if op == "$type":
        return _type_pred(col, v, ftype)
    if op == "$size":
        return F.size(col) == _lit(v)
    if op == "$all":
        preds = [F.array_contains(col, _lit(x)) for x in v]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if op == "$elemMatch":
        elem_t = ftype.elementType if isinstance(ftype, ArrayType) else None

        def elem_pred(e: Column) -> Column:
            if _is_operator_doc(v):
                out = F.lit(True)
                for o, ov in v.items():
                    out = out & _field_op_pred(e, o, ov, elem_t, resolve)
                return out
            # sub-document criteria against struct elements
            def sub_resolve(path: str) -> Column:
                c: Column = e
                for part in path.split("."):
                    c = c[part]
                return c

            return compile_criteria(v, resolver=sub_resolve)

        return F.exists(col, elem_pred)
    raise ValueError(f"Unsupported criteria operator: {op}")


# Mongo BSON type aliases/codes -> predicate over the column's STATIC
# Spark type. Columnar storage fixes each column's type at the schema, so
# $type is a plan-time constant AND-ed with per-row null presence (Mongo
# matches only docs where the field EXISTS with that type; 'null' matches
# explicit nulls).
_BSON_TYPE_GROUPS: dict = {
    "double": ("double", "float"), 1: ("double", "float"),
    "string": ("string",), 2: ("string",),
    "object": ("struct",), 3: ("struct",),
    "array": ("array",), 4: ("array",),
    "binData": ("binary",), 5: ("binary",),
    "bool": ("boolean",), 8: ("boolean",),
    "date": ("timestamp", "timestamp_ntz", "date"), 9: ("timestamp", "timestamp_ntz", "date"),
    "int": ("int", "smallint", "tinyint"), 16: ("int", "smallint", "tinyint"),
    "long": ("bigint",), 18: ("bigint",),
    "decimal": ("decimal",), 19: ("decimal",),
    "number": ("double", "float", "int", "smallint", "tinyint", "bigint",
               "decimal"),
}


def _type_pred(col: Column, v: Any, ftype: Optional[DataType]) -> Column:
    aliases = v if isinstance(v, list) else [v]
    simple = ftype.simpleString() if ftype is not None else None
    base = simple.split("(")[0].split("<")[0] if simple else None
    out = F.lit(False)
    for alias in aliases:
        if alias in ("null", 10):
            out = out | col.isNull()
            continue
        if alias not in _BSON_TYPE_GROUPS:
            raise ValueError(f"unsupported $type alias {alias!r}")
        if base is not None and base in _BSON_TYPE_GROUPS[alias]:
            out = out | col.isNotNull()
    return out


def _field_pred(col: Column, opdoc: dict, ftype: Optional[DataType],
                resolve: Resolver) -> Column:
    """`{field: {"$op": v, ...}}` — AND of each operator."""
    opts = opdoc.get("$options", "")
    out: Optional[Column] = None
    for op, v in opdoc.items():
        if op == "$options":
            continue
        if op == "$regex" and "i" in opts:
            pred = col.rlike(f"(?i){v}")
        else:
            pred = _field_op_pred(col, op, v, ftype, resolve)
        out = pred if out is None else out & pred
    return out if out is not None else F.lit(True)


# --------------------------------------------------------------------------
# $expr aggregation-expression mini-language
# (reference:src/maggma/api/query_operator/submission.py:27-35 uses
#  {"$expr": {"$gt": [{"$arrayElemAt": ["$state", -1]}, v]}})
# --------------------------------------------------------------------------

_EXPR_BINOPS = {
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
    "$eq": lambda a, b: a.eqNullSafe(b),
    "$ne": lambda a, b: ~a.eqNullSafe(b),
    "$add": lambda a, b: a + b,
    "$subtract": lambda a, b: a - b,
    "$multiply": lambda a, b: a * b,
    "$divide": lambda a, b: a / b,
}

# Mongo trigonometric expression operators -> the JVM math functions.
# Deviation: Mongo RAISES on out-of-domain inputs (e.g. $asin of 2);
# the JVM functions return NaN — same rows, different failure mode.
_EXPR_TRIG = {
    "$sin": F.sin, "$cos": F.cos, "$tan": F.tan,
    "$asin": F.asin, "$acos": F.acos, "$atan": F.atan,
    "$sinh": F.sinh, "$cosh": F.cosh, "$tanh": F.tanh,
    "$asinh": F.asinh, "$acosh": F.acosh, "$atanh": F.atanh,
}


def _let1(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding: evaluate `bound` ONCE per row and hand it to
    `body` (Column -> Column) as a lambda variable, via a
    single-element-array transform. Catalyst inlines every reference
    to a subexpression verbatim (no common-subexpression elimination
    reaches inside lambdafunctions, and higher-order functions are
    CodegenFallback), so an expression referencing a heavy operand —
    a sorted array, a regexp_extract_all — k times would otherwise
    re-evaluate it k times per row; with a per-element O(m) operand
    that was O(m^2)/row (measured 2.4 s for 5000 documents on the
    $regexFindAll index scan before this binding)."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def _regex_group_count(pat: str) -> int:
    """Number of capture groups in a regex — Python's re when the
    pattern parses (it shares Java's group syntax for the common
    subset), else a mechanical count of unescaped '(' not followed
    by '?'."""
    import re as _re

    try:
        return _re.compile(pat).groups
    except _re.error:
        n, i = 0, 0
        while i < len(pat):
            if pat[i] == "\\":
                i += 2
                continue
            if pat[i] == "(" and pat[i + 1: i + 2] != "?":
                n += 1
            i += 1
        return n


def _regex_pat(args: Any, op: str) -> str:
    """Literal pattern + inline-flag translation shared by
    $regexFind/$regexFindAll (Mongo options i/m/s/x map to Java's
    embedded flags)."""
    pat = args["regex"]
    if not isinstance(pat, str):
        raise ValueError(f"{op} regex must be a literal string")
    opts = "".join(c for c in (args.get("options") or "") if c in "imsx")
    return (f"(?{opts})" if opts else "") + pat


def struct_comparator(sort_doc: dict):
    """array_sort comparator over struct elements for a Mongo sortBy
    document {field: 1|-1, ...} — chained JVM lambda, no UDF; Mongo
    null order (nulls lowest) via the explicit null branches. Shared
    by $sortArray and the $top/$bottom/$topN/$bottomN accumulators."""
    fields = list(sort_doc.items())

    def cmp(left, right):
        out = F.lit(0)
        for f, d in reversed(fields):
            lf, rf = left[f], right[f]
            c = (F.when(lf.eqNullSafe(rf), F.lit(0))
                 .when(lf.isNull(), F.lit(-d))
                 .when(rf.isNull(), F.lit(d))
                 .when(lf < rf, F.lit(-d)).otherwise(F.lit(d)))
            out = F.when(c != 0, c).otherwise(out)
        return out.cast("int")

    return cmp


def _mongo_fmt_to_java(fmt: str) -> str:
    """Mongo %-specifier date format -> Java/Spark pattern (shared by
    $dateFromString and $dateToString); unsupported specifiers raise
    instead of silently passing through. Literal runs containing
    letters (or quotes) are single-quoted — Java patterns treat bare
    letters as pattern characters, so Mongo's default
    "%Y-%m-%dT%H:%M:%S.%LZ" must become
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", not an invalid bare-T/zone-Z
    pattern. %% is a literal percent (never an "unsupported
    specifier")."""
    spec = {"Y": "yyyy", "m": "MM", "d": "dd", "H": "HH", "M": "mm",
            "S": "ss", "L": "SSS", "j": "DDD"}
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if not lit:
            return
        s = "".join(lit)
        if any(c.isalpha() or c == "'" for c in s):
            out.append("'" + s.replace("'", "''") + "'")
        else:
            out.append(s)
        lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise ValueError(
                    f"date format {fmt!r} ends with a bare %")
            nxt = fmt[i + 1]
            if nxt == "%":
                lit.append("%")
            elif nxt in spec:
                flush()
                out.append(spec[nxt])
            else:
                raise ValueError(
                    f"date format {fmt!r} has unsupported "
                    f"specifier %{nxt}")
            i += 2
        else:
            lit.append(c)
            i += 1
    flush()
    return "".join(out)


def compile_expr(expr: Any, resolve: Resolver) -> Column:
    """Compile the `$expr` aggregation-operator subset into a Column."""
    if isinstance(expr, str) and expr.startswith("$"):
        return resolve(expr[1:])
    if isinstance(expr, list):
        # an array literal in expression position evaluates its
        # elements (Mongo: ["$f", {"$add": ...}, 3] builds an array)
        return F.array(*[compile_expr(e, resolve) for e in expr])
    if not isinstance(expr, dict):
        return _lit(expr)
    if len(expr) != 1:
        raise ValueError(f"$expr operator doc must have one key: {expr}")
    op, args = next(iter(expr.items()))
    if op == "$literal":
        return _lit(args)
    if op == "$arrayElemAt":
        arr, idx = args
        arr_c = compile_expr(arr, resolve)
        # Mongo is 0-based (negative = from end); element_at is 1-based.
        if isinstance(idx, int):
            return F.element_at(arr_c, idx + 1 if idx >= 0 else idx)
        idx_c = compile_expr(idx, resolve)
        return F.element_at(arr_c, F.when(idx_c >= 0, idx_c + 1).otherwise(idx_c))
    if op in _EXPR_BINOPS:
        a, b = args
        return _EXPR_BINOPS[op](compile_expr(a, resolve), compile_expr(b, resolve))
    if op == "$and":
        out = F.lit(True)
        for a in args:
            out = out & compile_expr(a, resolve)
        return out
    if op == "$or":
        out = F.lit(False)
        for a in args:
            out = out | compile_expr(a, resolve)
        return out
    if op == "$not":
        (a,) = args if isinstance(args, list) else (args,)
        return ~compile_expr(a, resolve)
    if op == "$ifNull":
        return F.coalesce(*[compile_expr(a, resolve) for a in args])
    if op == "$abs":
        return F.abs(compile_expr(args, resolve))
    if op == "$size":
        return F.size(compile_expr(args, resolve))
    if op == "$max":
        return F.greatest(*[compile_expr(a, resolve) for a in args])
    if op == "$min":
        return F.least(*[compile_expr(a, resolve) for a in args])
    if op == "$concat":
        return F.concat(*[compile_expr(a, resolve) for a in args])
    if op == "$cond":
        if isinstance(args, dict):
            cond, then, els = args["if"], args["then"], args["else"]
        else:
            cond, then, els = args
        return F.when(
            compile_expr(cond, resolve).cast("boolean"),
            compile_expr(then, resolve),
        ).otherwise(compile_expr(els, resolve))
    if op == "$toLower":
        return F.lower(compile_expr(args, resolve))
    if op == "$toUpper":
        return F.upper(compile_expr(args, resolve))
    if op == "$strLenCP":
        return F.length(compile_expr(args, resolve))
    if op == "$trim":
        inp = args["input"] if isinstance(args, dict) else args
        return F.trim(compile_expr(inp, resolve))
    if op == "$mod":
        a, b = args
        return compile_expr(a, resolve) % compile_expr(b, resolve)
    if op == "$year":
        return F.year(compile_expr(args, resolve))
    if op == "$month":
        return F.month(compile_expr(args, resolve))
    if op == "$dayOfMonth":
        return F.dayofmonth(compile_expr(args, resolve))
    if op == "$hour":
        return F.hour(compile_expr(args, resolve))
    if op == "$minute":
        return F.minute(compile_expr(args, resolve))
    if op == "$second":
        return F.second(compile_expr(args, resolve))
    if op == "$dayOfWeek":  # Mongo: 1 (Sunday) .. 7 — matches dayofweek
        return F.dayofweek(compile_expr(args, resolve))
    if op == "$dayOfYear":
        return F.dayofyear(compile_expr(args, resolve))
    if op == "$floor":
        return F.floor(compile_expr(args, resolve))
    if op == "$ceil":
        return F.ceil(compile_expr(args, resolve))
    if op == "$round":
        if isinstance(args, list):
            if len(args) == 1:
                val, place = args[0], 0
            elif len(args) == 2:
                val, place = args
            else:
                raise ValueError("$round takes [value] or [value, place]")
        else:
            val, place = args, 0
        if not isinstance(place, int):
            raise ValueError("$round place must be a literal integer")
        return F.round(compile_expr(val, resolve), place)
    if op == "$trunc":
        # Mongo truncates toward zero, optionally at `place` decimal
        # digits (place>0) or left of the decimal point (place<0).
        if isinstance(args, list):
            if len(args) == 1:
                val, place = args[0], 0
            elif len(args) == 2:
                val, place = args
            else:
                raise ValueError("$trunc takes [value] or [value, place]")
        else:
            val, place = args, 0
        if not isinstance(place, int):
            raise ValueError("$trunc place must be a literal integer")
        e = compile_expr(val, resolve)
        if place == 0:
            return e.cast("long")
        if place > 0:
            scale = 10 ** place
            return (e * F.lit(scale)).cast("long") / F.lit(float(scale))
        scale = 10 ** (-place)
        return (e / F.lit(scale)).cast("long") * F.lit(scale)
    if op == "$sqrt":
        return F.sqrt(compile_expr(args, resolve))
    if op == "$pow":
        a, b = args
        return F.pow(compile_expr(a, resolve), compile_expr(b, resolve))
    if op == "$exp":
        return F.exp(compile_expr(args, resolve))
    if op == "$ln":
        return F.log(compile_expr(args, resolve))
    if op == "$log10":
        return F.log10(compile_expr(args, resolve))
    if op == "$substrCP":
        s, start, length = args
        # Mongo is 0-based; substring is 1-based
        return F.substring(
            compile_expr(s, resolve),
            compile_expr(start, resolve) + 1 if isinstance(start, int)
            else compile_expr(start, resolve) + F.lit(1),
            compile_expr(length, resolve))
    if op == "$split":
        s, delim = args
        if not isinstance(delim, str):
            raise ValueError("$split delimiter must be a literal string")
        import re as _re

        return F.split(compile_expr(s, resolve), _re.escape(delim))
    if op == "$toString":
        return compile_expr(args, resolve).cast("string")
    if op in ("$toInt", "$toLong"):
        return compile_expr(args, resolve).cast("long")
    if op in ("$toDouble", "$toDecimal"):
        return compile_expr(args, resolve).cast("double")
    if op == "$toBool":
        return compile_expr(args, resolve).cast("boolean")
    if op == "$in":
        needle, arr = args
        return F.array_contains(compile_expr(arr, resolve),
                                compile_expr(needle, resolve))
    if op == "$switch":
        out = None
        branches = args["branches"]
        default = compile_expr(args.get("default"), resolve) \
            if "default" in args else F.lit(None)
        for br in reversed(branches):
            case = compile_expr(br["case"], resolve).cast("boolean")
            then = compile_expr(br["then"], resolve)
            out = F.when(case, then).otherwise(default if out is None else out)
        return out if out is not None else default
    if op in ("$map", "$filter", "$reduce"):
        # array HOFs -> JVM lambda functions (transform/filter/
        # aggregate). The body compiles with a CHILD resolver: lambda
        # variables ("$$x", "$$this", "$$value") bind to the lambda
        # columns, "$$x.field" walks struct fields off the variable,
        # and unknown "$"-names DELEGATE to the enclosing resolver so
        # nested HOFs can reference outer lambda variables.
        def lam_resolver(bindings):
            def r2(name):
                for vname, col in bindings.items():
                    if name == vname:
                        return col
                    if name.startswith(vname + "."):
                        out = col
                        for fld in name[len(vname) + 1:].split("."):
                            out = out.getField(fld)
                        return out
                return resolve(name)  # outer lambda vars / row fields

            return r2

        arr = compile_expr(args["input"], resolve)
        if op == "$reduce":
            init = compile_expr(args["initialValue"], resolve)
            # Spark's aggregate() needs the merge output type to EQUAL
            # the accumulator type; widen integer seeds to long so
            # summing a bigint array over initialValue 0 resolves
            if isinstance(args["initialValue"], int) \
                    and not isinstance(args["initialValue"], bool):
                init = init.cast("long")

            def merge(acc, el):
                return compile_expr(args["in"], lam_resolver(
                    {"$value": acc, "$this": el}))

            return F.aggregate(arr, init, merge)
        var = args.get("as", "this")
        body = args["in"] if op == "$map" else args["cond"]

        def hof(el):  # exactly one parameter: PySpark inspects arity
            return compile_expr(body, lam_resolver(
                {f"${var}": el, "$this": el}))

        return F.transform(arr, hof) if op == "$map" else F.filter(arr, hof)
    if op == "$concatArrays":
        return F.concat(*[compile_expr(a, resolve) for a in args])
    if op == "$setUnion":
        # Mongo set operators ALWAYS dedupe, even with one argument
        out = F.array_distinct(compile_expr(args[0], resolve))
        for a in args[1:]:
            out = F.array_union(out, compile_expr(a, resolve))
        return out
    if op == "$setIntersection":
        out = F.array_distinct(compile_expr(args[0], resolve))
        for a in args[1:]:
            out = F.array_intersect(out, compile_expr(a, resolve))
        return out
    if op == "$setDifference":
        a, b = args
        return F.array_except(compile_expr(a, resolve),
                              compile_expr(b, resolve))
    if op == "$slice":
        # [array, n] (first n / last n if n<0) or [array, position, n];
        # position is 0-based (F.slice is 1-based)
        if len(args) == 2:
            arr, n = args
            if not isinstance(n, int):
                raise ValueError("$slice n must be a literal integer")
            arr_c = compile_expr(arr, resolve)
            if n >= 0:
                return F.slice(arr_c, 1, n)
            # "last |n|": Mongo returns the WHOLE array when |n| exceeds
            # its length, so clamp the (negative) start at -size; on an
            # EMPTY array that clamp is 0 and Spark's slice raises
            # (INVALID_PARAMETER_VALUE.START), where Mongo returns []
            return F.when(F.size(arr_c) == 0, arr_c).otherwise(
                F.slice(arr_c,
                        F.greatest(F.lit(n), -F.size(arr_c)), F.lit(-n)))
        arr, pos, n = args
        if not isinstance(pos, int) or not isinstance(n, int) or n <= 0:
            raise ValueError("$slice [arr, position, n]: literal ints, n>0")
        return F.slice(compile_expr(arr, resolve),
                       pos + 1 if pos >= 0 else pos, n)
    if op == "$indexOfArray":
        if len(args) > 2:
            # Mongo's optional start/end range would silently change
            # the answer if ignored — fail loudly instead
            raise ValueError(
                "$indexOfArray start/end range arguments are not "
                "supported; $slice the array first")
        arr, needle = args[0], args[1]
        # array_position: 1-based, 0 when absent -> Mongo 0-based, -1
        return (F.array_position(compile_expr(arr, resolve),
                                 compile_expr(needle, resolve))
                - F.lit(1)).cast("long")
    if op == "$meta":
        if args == "vectorSearchScore":
            # populated by the $vectorSearch stage
            return F.col("__vector_search_score")
        if args in ("searchScore", "textScore"):
            # populated by the $search stage
            return F.col("__search_score")
        raise ValueError(f"$meta {args!r} not supported")
    if op == "$objectToArray":
        # documents-as-MapType (the VariantJSONStore / dynamic-doc
        # shape) -> array<struct<k,v>> via JVM map_entries. StructType
        # inputs would need schema introspection the expression dialect
        # deliberately avoids — convert to a map upstream.
        m = compile_expr(args, resolve)
        return F.transform(
            F.map_entries(m),
            lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")))
    if op == "$arrayToObject":
        arr = compile_expr(args, resolve)
        return F.map_from_entries(
            F.transform(arr, lambda e: F.struct(e["k"], e["v"])))
    if op == "$getField":
        if not isinstance(args, dict) or not isinstance(
                args.get("field"), str):
            raise ValueError(
                '$getField requires {"field": <literal str>, '
                '"input": <expr>}')
        inp = compile_expr(args["input"], resolve)
        # works for struct fields AND map keys; unlike a dotted path
        # it tolerates dots INSIDE the field name
        return inp.getItem(args["field"])
    if op == "$sortArray":
        arr = compile_expr(args["input"], resolve)
        by = args["sortBy"]
        if isinstance(by, int):
            return F.sort_array(arr, asc=by > 0)
        return F.array_sort(arr, struct_comparator(by))
    if op == "$zip":
        arrs = [compile_expr(a, resolve) for a in args["inputs"]]
        longest = bool(args.get("useLongestLength"))
        defaults = args.get("defaults")
        sizes = [F.size(a) for a in arrs]
        n = (F.greatest(*sizes) if longest else F.least(*sizes)) \
            if len(arrs) > 1 else sizes[0]
        # F.get is 0-based and null-safe past the end (element_at
        # raises under ANSI); sequence guards the empty case
        idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
            .otherwise(F.array().cast("array<int>"))

        def row(i):
            elems = []
            for j, a in enumerate(arrs):
                e = F.get(a, i)
                if longest and defaults is not None:
                    e = F.coalesce(e, _lit(defaults[j]))
                elems.append(e)
            return F.array(*elems)

        return F.transform(idx, row)
    if op == "$dateFromString":
        ds = compile_expr(args["dateString"], resolve)
        if "onError" in args:
            raise ValueError("$dateFromString onError is not supported")
        fmt = args.get("format")
        if fmt is None:
            parsed = ds.cast("timestamp")  # ISO-8601 and friends
        else:
            parsed = F.to_timestamp(ds, _mongo_fmt_to_java(fmt))
        if "onNull" in args:
            parsed = F.when(ds.isNull(),
                            _lit(args["onNull"])).otherwise(parsed)
        return parsed
    if op == "$toDate":
        return compile_expr(args, resolve).cast("timestamp")
    if op == "$dateToString":
        d = compile_expr(args["date"], resolve)
        fmt = args.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
        out = F.date_format(d, _mongo_fmt_to_java(fmt))
        if "onNull" in args:
            out = F.when(d.isNull(), _lit(args["onNull"])).otherwise(out)
        return out
    if op in ("$replaceAll", "$replaceOne"):
        inp = compile_expr(args["input"], resolve)
        find, repl = args["find"], args["replacement"]
        if not isinstance(find, str):
            raise ValueError(f"{op} find must be a literal string")
        if op == "$replaceAll":
            return F.replace(inp, F.lit(find), _lit(repl))
        pos = F.locate(find, inp)  # literal find: non-regex, first hit
        repl_c = compile_expr(repl, resolve)
        return F.when(pos == 0, inp).otherwise(F.concat(
            F.substr(inp, F.lit(1), pos - 1), repl_c,
            F.substr(inp, pos + len(find), F.length(inp))))
    if op in ("$ltrim", "$rtrim"):
        inp = compile_expr(args["input"], resolve)
        chars = args.get("chars")
        if chars is None:
            return (F.ltrim if op == "$ltrim" else F.rtrim)(inp)
        if not isinstance(chars, str) or not chars:
            raise ValueError(f"{op} chars must be a literal string")
        # Mongo trims ANY char in the set; re.escape leaves
        # alphanumerics bare (escaping a letter inside a class flips
        # its meaning — \d, \b...) and escapes the class metachars
        import re as _re

        cls = "[" + "".join(_re.escape(c) for c in chars) + "]+"
        pat = ("^" + cls) if op == "$ltrim" else (cls + "$")
        return F.regexp_replace(inp, pat, "")
    if op == "$log":
        num, base = args
        # ln(x)/ln(b) — the identity both engines use; supports
        # expression bases, unlike F.log's literal-only base
        return (F.log(compile_expr(num, resolve))
                / F.log(compile_expr(base, resolve)))
    if op == "$log10":
        return F.log10(compile_expr(args, resolve))
    if op == "$reverseArray":
        return F.reverse(compile_expr(args, resolve))
    if op == "$setIsSubset":
        a, b = args
        return F.size(F.array_except(
            compile_expr(a, resolve), compile_expr(b, resolve))) == 0
    if op in ("$anyElementTrue", "$allElementsTrue"):
        arg = args[0] if isinstance(args, list) and len(args) == 1 \
            else args
        arr = compile_expr(arg, resolve)
        hof = F.exists if op == "$anyElementTrue" else F.forall
        return hof(arr, lambda x: x.cast("boolean"))
    if op == "$isoWeek":
        return F.weekofyear(compile_expr(args, resolve))
    if op == "$isoDayOfWeek":  # Monday=1 .. Sunday=7
        return (F.weekday(compile_expr(args, resolve)) + 1)
    if op == "$millisecond":
        return (F.unix_millis(compile_expr(args, resolve)
                              .cast("timestamp")) % 1000).cast("int")
    if op == "$range":
        start = compile_expr(args[0], resolve).cast("long")
        end = compile_expr(args[1], resolve).cast("long")
        step = (compile_expr(args[2], resolve).cast("long")
                if len(args) > 2 else F.lit(1).cast("long"))
        # Mongo end is EXCLUSIVE and empty ranges yield []; sequence is
        # inclusive and raises on inverted bounds — guard per row
        # (CaseWhen evaluates only the matching branch)
        last = F.when(step > 0, end - 1).otherwise(end + 1)
        nonempty = ((step > 0) & (start < end)) | ((step < 0) & (start > end))
        return F.when(nonempty, F.sequence(start, last, step)) \
            .otherwise(F.array().cast("array<bigint>"))
    if op == "$first":
        return F.element_at(compile_expr(args, resolve), 1)
    if op == "$last":
        return F.element_at(compile_expr(args, resolve), -1)
    if op == "$regexMatch":
        pat = args["regex"]
        if not isinstance(pat, str):
            raise ValueError("$regexMatch regex must be a literal string")
        if "i" in (args.get("options") or ""):
            pat = f"(?i){pat}"
        return compile_expr(args["input"], resolve).rlike(pat)
    if op == "$dateTrunc":
        return F.date_trunc(args["unit"],
                            compile_expr(args["date"], resolve))
    if op == "$dateAdd":
        return F.timestamp_add(
            args["unit"].upper(),
            compile_expr(args["amount"], resolve),
            compile_expr(args["startDate"], resolve))
    if op == "$dateDiff":
        # Mongo counts UNIT BOUNDARY CROSSINGS, not elapsed units —
        # trunc both ends to the unit, then diff in whole units.
        # Boundaries follow the SESSION timezone; the engine pins it to
        # UTC (session.py), which is also Mongo's $dateDiff default. A
        # DST-shifted session timezone would miscount day/hour
        # crossings around transitions — keep the UTC pin.
        unit = args["unit"]
        s = compile_expr(args["startDate"], resolve)
        e = compile_expr(args["endDate"], resolve)
        if unit == "year":
            return (F.year(e) - F.year(s)).cast("long")
        if unit == "month":
            return ((F.year(e) - F.year(s)) * 12
                    + (F.month(e) - F.month(s))).cast("long")
        secs = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}
        if unit not in secs:
            raise ValueError(f"$dateDiff unit {unit!r} not supported")
        ts, te = F.date_trunc(unit, s), F.date_trunc(unit, e)
        return ((te.cast("long") - ts.cast("long"))
                / F.lit(secs[unit])).cast("long")
    # ---- round-7 wave -----------------------------------------------
    if op in ("$sum", "$avg"):
        # EXPRESSION form (Mongo also uses these names as accumulators
        # — the pipeline compiler dispatches those separately): a list
        # of expressions, or a single array-valued expression. Nulls
        # are ignored (Mongo ignores non-numeric operands); empty
        # $sum is 0, empty $avg is null.
        if isinstance(args, list):
            cols = [compile_expr(a, resolve).cast("double")
                    for a in args]
            cnt = sum((c.isNotNull().cast("int") for c in cols),
                      F.lit(0))
            tot = sum((F.coalesce(c, F.lit(0.0)) for c in cols),
                      F.lit(0.0))
        else:
            arr = compile_expr(args, resolve)
            nn = F.filter(arr, lambda x: x.isNotNull())
            cnt = F.size(nn)
            tot = F.aggregate(nn, F.lit(0.0),
                              lambda a, x: a + x.cast("double"))
        if op == "$sum":
            return tot
        return F.when(cnt > 0, tot / cnt)
    if op in ("$cmp", "$strcasecmp"):
        a, b = (compile_expr(x, resolve) for x in args)
        if op == "$strcasecmp":
            a, b = F.upper(a), F.upper(b)
        # null sorts lowest, as in the sort comparator
        return (F.when(a.eqNullSafe(b), 0)
                .when(a.isNull(), -1).when(b.isNull(), 1)
                .when(a < b, -1).otherwise(1))
    if op in ("$substr", "$substrBytes"):
        # character-based here; identical to $substrBytes for ASCII
        # (Spark substring counts codepoints, Mongo $substrBytes
        # counts UTF-8 bytes — multibyte inputs differ)
        s, start, length = args
        return F.substring(compile_expr(s, resolve),
                           compile_expr(start, resolve) + 1,
                           compile_expr(length, resolve))
    if op == "$strLenBytes":
        return F.octet_length(compile_expr(args, resolve))
    if op in ("$isArray", "$isNumber"):
        (a,) = args if isinstance(args, list) else (args,)
        t = F.typeof(compile_expr(a, resolve))
        if op == "$isArray":
            return t.startswith("array")
        return t.isin("tinyint", "smallint", "int", "bigint", "float",
                      "double") | t.startswith("decimal")
    if op == "$convert":
        casts = {"int": "int", "long": "long", "double": "double",
                 "decimal": "decimal(38,9)", "string": "string",
                 "bool": "boolean", "date": "timestamp"}
        to = args["to"]
        if to not in casts:
            raise ValueError(f"$convert to {to!r} not supported")
        inp = compile_expr(args["input"], resolve)
        out = inp.try_cast(casts[to]) if "onError" in args \
            else inp.cast(casts[to])
        if "onError" in args:
            out = F.when(inp.isNotNull() & out.isNull(),
                         _lit(args["onError"])).otherwise(out)
        if "onNull" in args:
            out = F.when(inp.isNull(), _lit(args["onNull"])) \
                .otherwise(out)
        return out
    if op == "$degreesToRadians":
        return F.radians(compile_expr(args, resolve))
    if op == "$radiansToDegrees":
        return F.degrees(compile_expr(args, resolve))
    if op == "$week":
        # Mongo/strftime %U: Sunday-start weeks, days before the first
        # Sunday are week 0
        d = compile_expr(args, resolve)
        return F.floor((F.dayofyear(d) + 7 - F.dayofweek(d)) / 7) \
            .cast("int")
    if op == "$isoWeekYear":
        return F.date_part(F.lit("YEAROFWEEK"),
                           compile_expr(args, resolve)).cast("long")
    if op == "$let":
        vars_c = {k: compile_expr(v, resolve)
                  for k, v in args["vars"].items()}

        def let_resolve(name: str) -> Column:
            # "$$var" reaches the resolver as "$var" (one $ consumed)
            if name.startswith("$"):
                head, *rest = name[1:].split(".")
                if head in vars_c:
                    col = vars_c[head]
                    for p in rest:
                        col = col[p]
                    return col
            return resolve(name)

        return compile_expr(args["in"], let_resolve)
    if op == "$setEquals":
        cols = [F.array_distinct(compile_expr(a, resolve))
                for a in args]
        out = F.lit(True)
        for c in cols[1:]:
            out = out & (F.size(F.array_except(cols[0], c)) == 0) \
                & (F.size(F.array_except(c, cols[0])) == 0)
        return out
    if op in ("$bitAnd", "$bitOr", "$bitXor"):
        cols = [compile_expr(a, resolve) for a in args]
        out = cols[0]
        for c in cols[1:]:
            out = (out.bitwiseAND(c) if op == "$bitAnd" else
                   out.bitwiseOR(c) if op == "$bitOr" else
                   out.bitwiseXOR(c))
        return out
    if op == "$bitNot":
        return F.bitwise_not(compile_expr(args, resolve))
    if op == "$mergeObjects":
        # expression form over MapType documents, later-wins (the
        # ACCUMULATOR form lives in the pipeline compiler)
        entries = F.concat(*[F.map_entries(compile_expr(a, resolve))
                             for a in args])
        rev = F.reverse(entries)
        ks = F.array_distinct(F.transform(rev, lambda e: e["key"]))
        return F.map_from_arrays(
            ks,
            F.transform(ks, lambda k: F.element_at(
                F.filter(rev, lambda e: e["key"] == k), 1)["value"]))
    if op == "$dateSubtract":
        return F.timestamp_add(
            args["unit"].upper(),
            -compile_expr(args["amount"], resolve),
            compile_expr(args["startDate"], resolve))
    if op == "$dateFromParts":
        if "isoWeekYear" in args:
            raise ValueError("$dateFromParts ISO-week form is not "
                             "supported")
        def part(name, dflt):
            return compile_expr(args[name], resolve) if name in args \
                else F.lit(dflt)
        return F.make_timestamp(
            part("year", 1970), part("month", 1), part("day", 1),
            part("hour", 0), part("minute", 0),
            part("second", 0).cast("double")
            + part("millisecond", 0).cast("double") / 1000.0)
    if op == "$dateToParts":
        if isinstance(args, dict) and args.get("iso8601"):
            raise ValueError("$dateToParts iso8601 form is not "
                             "supported")
        d = compile_expr(args["date"] if isinstance(args, dict)
                         else args, resolve)
        return F.struct(
            F.year(d).alias("year"), F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"), F.hour(d).alias("hour"),
            F.minute(d).alias("minute"), F.second(d).alias("second"),
            (F.unix_millis(d.cast("timestamp")) % 1000).cast("int")
            .alias("millisecond"))
    # ---- round-7b wave ----------------------------------------------
    if op in _EXPR_TRIG:
        (a,) = args if isinstance(args, list) else (args,)
        return _EXPR_TRIG[op](compile_expr(a, resolve))
    if op == "$atan2":
        y, x = args
        return F.atan2(compile_expr(y, resolve), compile_expr(x, resolve))
    if op in ("$indexOfCP", "$indexOfBytes"):
        # codepoint-based for both; identical for ASCII ($indexOfBytes
        # counts UTF-8 bytes in Mongo — same caveat as $substrBytes).
        # The needle must be a literal (locate's contract); start/end
        # are literal codepoint offsets, end EXCLUSIVE for the match
        # end. -1 = absent, null input -> null (Mongo semantics).
        s = compile_expr(args[0], resolve)
        needle = args[1]
        if not isinstance(needle, str):
            raise ValueError(f"{op} substring must be a literal string")
        start = args[2] if len(args) > 2 else 0
        end = args[3] if len(args) > 3 else None
        if not isinstance(start, int) or (
                end is not None and not isinstance(end, int)):
            raise ValueError(f"{op} start/end must be literal integers")
        hay = s if end is None else F.substring(s, 1, end)
        pos = F.locate(needle, hay, start + 1)
        return F.when(s.isNull(), F.lit(None).cast("long")) \
            .otherwise(F.when(pos > 0, pos - 1).otherwise(-1)
                       .cast("long"))
    if op == "$regexFind":
        # {match, idx, captures} of the FIRST match, null when none.
        # Deviation: a capture group that did not participate in the
        # match yields "" (regexp_extract), not Mongo's null.
        pat = _regex_pat(args, op)
        inp = compile_expr(args["input"], resolve)
        ng = _regex_group_count(args["regex"])
        caps = F.array(*[F.regexp_extract(inp, pat, g)
                         for g in range(1, ng + 1)]) if ng else \
            F.array().cast("array<string>")
        return F.when(inp.rlike(pat), F.struct(
            F.regexp_extract(inp, pat, 0).alias("match"),
            (F.regexp_instr(inp, F.lit(pat)) - 1).cast("int")
            .alias("idx"),
            caps.alias("captures")))
    if op == "$regexFindAll":
        # array of {match, idx, captures}; [] when no match or null
        # input (Mongo). idx comes from a left-to-right position scan
        # over the extracted match strings (F.aggregate + F.position):
        # exact for self-delimiting patterns; a lookaround that makes
        # an identical EARLIER substring a non-match can mis-index.
        pat = _regex_pat(args, op)
        inp = compile_expr(args["input"], resolve)
        ng = _regex_group_count(args["regex"])
        matches = F.regexp_extract_all(inp, F.lit(pat), F.lit(0))
        groups = [F.regexp_extract_all(inp, F.lit(pat), F.lit(g))
                  for g in range(1, ng + 1)]
        idxs = F.aggregate(
            matches,
            F.struct(F.lit(1).alias("pos"),
                     F.array().cast("array<int>").alias("out")),
            lambda acc, m: F.struct(
                (F.position(m, inp, acc["pos"])
                 + F.greatest(F.length(m), F.lit(1))).alias("pos"),
                F.concat(acc["out"], F.array(
                    (F.position(m, inp, acc["pos"]) - 1).cast("int")))
                .alias("out")),
            lambda acc: acc["out"])
        # bind the extraction + position-scan arrays ONCE (_let1):
        # referencing them per output element re-ran the O(m) scans
        # per match = O(m^2)/row
        packed = F.struct(
            matches.alias("m"), idxs.alias("ix"),
            *[g.alias(f"g{j}") for j, g in enumerate(groups, 1)])

        def build(t):
            m = t["m"]
            n_m = F.size(m)
            seq = F.when(n_m > 0, F.sequence(F.lit(0), n_m - 1)) \
                .otherwise(F.array().cast("array<int>"))

            def row(i):
                return F.struct(
                    F.get(m, i).alias("match"),
                    F.get(t["ix"], i).alias("idx"),
                    (F.array(*[F.get(t[f"g{j}"], i)
                               for j in range(1, ng + 1)]) if ng
                     else F.array().cast("array<string>"))
                    .alias("captures"))

            return F.transform(seq, row)

        out = _let1(packed, build)
        empty = ("array<struct<match:string,idx:int,"
                 "captures:array<string>>>")
        return F.when(inp.isNull(), F.array().cast(empty)).otherwise(out)
    if op in ("$setField", "$unsetField"):
        # documents-as-MapType (same convention as $objectToArray);
        # $setField value $$REMOVE == $unsetField. map_concat would
        # raise on a duplicate key (mapKeyDedupPolicy=EXCEPTION), so
        # the existing key is filtered out first.
        field = args.get("field")
        if not isinstance(field, str):
            raise ValueError(f"{op} field must be a literal string")
        inp = compile_expr(args["input"], resolve)
        cleaned = F.map_filter(inp, lambda k, v: k != F.lit(field))
        if op == "$unsetField" or args.get("value") == "$$REMOVE":
            return cleaned
        return F.map_concat(cleaned, F.create_map(
            F.lit(field), compile_expr(args["value"], resolve)))
    if op in ("$maxN", "$minN", "$firstN", "$lastN"):
        # EXPRESSION forms over an array operand (the accumulator
        # forms live in the pipeline compiler). $maxN/$minN ignore
        # nulls (Mongo); $firstN/$lastN keep order and nulls.
        n = args.get("n")
        if not isinstance(n, int) or n < 1:
            raise ValueError(f"{op} n must be a literal integer >= 1")
        arr = compile_expr(args["input"], resolve)
        if op in ("$maxN", "$minN"):
            nn = F.filter(arr, lambda x: x.isNotNull())
            ordered = F.array_sort(nn)
            if op == "$maxN":
                ordered = F.reverse(ordered)
            return F.slice(ordered, 1, n)
        if op == "$firstN":
            return F.slice(arr, 1, n)
        sz = F.size(arr)
        return F.when(sz <= 0, arr).otherwise(
            F.slice(arr, F.greatest(F.lit(-n), -sz),
                    F.least(F.lit(n), sz)))
    if op in ("$median", "$percentile") and isinstance(args, dict) \
            and "input" in args:
        # EXPRESSION forms over an array operand: exact continuous
        # interpolation (identical to F.percentile / DuckDB
        # quantile_cont) — a strictly-deterministic stand-in for
        # Mongo's t-digest "approximate" method; nulls ignored,
        # empty -> null.
        arr = compile_expr(args["input"], resolve)
        sorted_nn = F.array_sort(F.filter(
            arr, lambda x: x.isNotNull()).cast("array<double>"))

        # bind the sorted array ONCE (_let1): each interpolation
        # references it ~5x (size twice, lo/hi element lookups), and
        # without the binding every reference re-filtered and
        # re-sorted the operand per row
        def q(nn: Column, p: float) -> Column:
            n = F.size(nn)
            r = (n - 1) * F.lit(float(p))
            lo = F.floor(r).cast("int")
            frac = r - lo
            lo_v = F.element_at(nn, lo + 1)
            # p=1.0 lands on the last element: lo+2 is past the end
            hi_v = F.coalesce(F.try_element_at(nn, lo + 2), lo_v)
            return F.when(n > 0, lo_v * (1.0 - frac) + hi_v * frac)

        if op == "$median":
            return _let1(sorted_nn, lambda nn: q(nn, 0.5))
        ps = args["p"]
        if not (isinstance(ps, list) and
                all(isinstance(p, (int, float)) for p in ps)):
            raise ValueError("$percentile p must be a list of literal "
                             "numbers")
        return _let1(sorted_nn, lambda nn: F.array(
            *[q(nn, float(p)) for p in ps]))
    if op == "$binarySize":
        return F.octet_length(compile_expr(args, resolve)).cast("long")
    if op == "$rand":
        if args not in ({},):
            raise ValueError("$rand takes {}")
        return F.rand()
    raise ValueError(f"Unsupported $expr operator: {op}")


def _text_pred(spec: Any, schema: Optional[StructType], resolve: Resolver) -> Column:
    """{"$text": {"$search": "..."}} — OR-of-terms, case-insensitive
    match (Mongo $text defaults; reference compiles the equivalent Atlas
    $search pipeline, reference:src/maggma/api/resource/utils.py:69-115).
    Column engines have no text index — the scoring scan IS the index.
    The searched column is `$field` if given (engine extension), else a
    column named "text"."""
    from maggma_spark.functions.text import text_search_score

    if not isinstance(spec, dict) or not isinstance(spec.get("$search"), str):
        raise ValueError('$text requires {"$search": <string>}')
    field = spec.get("$field")
    if field is None:
        names = {f.name for f in schema.fields} if schema is not None else set()
        if "text" in names:
            field = "text"
        else:
            raise ValueError(
                '$text needs a "$field" (no default "text" column in schema)')
    return text_search_score(resolve(field), spec["$search"]) > 0


# --------------------------------------------------------------------------
# top-level compiler
# --------------------------------------------------------------------------


def compile_criteria(criteria: Optional[dict],
                     schema: Optional[StructType] = None,
                     resolver: Optional[Resolver] = None) -> Column:
    """Compile a Mongo criteria dict into one Catalyst Column predicate.

    Parameters
    ----------
    criteria : the Mongo-dialect filter dict (None/{} -> TRUE)
    schema : optional StructType for array-field awareness and
        absent-field null semantics
    resolver : optional dotted-path -> Column resolver (used for
        $elemMatch recursion and view-level field aliasing)
    """
    resolve = resolver or default_resolver(schema)
    if not criteria:
        return F.lit(True)

    preds: list[Column] = []
    for key, value in criteria.items():
        if key == "$and":
            sub = [compile_criteria(c, schema, resolver) for c in value]
            out = sub[0]
            for p in sub[1:]:
                out = out & p
            preds.append(out)
        elif key == "$or":
            sub = [compile_criteria(c, schema, resolver) for c in value]
            out = sub[0]
            for p in sub[1:]:
                out = out | p
            preds.append(out)
        elif key == "$nor":
            sub = [compile_criteria(c, schema, resolver) for c in value]
            out = sub[0]
            for p in sub[1:]:
                out = out | p
            # null-evaluating clauses are non-matches => doc passes $nor
            preds.append(~F.coalesce(out, F.lit(False)))
        elif key == "$not":
            preds.append(~F.coalesce(compile_criteria(value, schema, resolver), F.lit(False)))
        elif key == "$expr":
            preds.append(compile_expr(value, resolve).cast("boolean"))
        elif key == "$jsonSchema":
            preds.append(_json_schema_pred(value, schema, resolve))
        elif key == "$text":
            preds.append(_text_pred(value, schema, resolve))
        elif key == "$where":
            raise ValueError(f"Unsupported top-level operator: {key}")
        elif key.startswith("$"):
            raise ValueError(f"Unsupported top-level operator: {key}")
        else:
            vsplit = _variant_split(schema, key)
            if vsplit is not None:
                preds.append(_variant_field_pred(*vsplit, value, resolve))
                continue
            col = resolve(key)
            ftype = _path_type(schema, key)
            if _is_operator_doc(value):
                preds.append(_field_pred(col, value, ftype, resolve))
            elif isinstance(value, dict):
                # exact sub-document match: every named field equal AND
                # every other schema field null. (Mongo compares BSON
                # bytes, so ITS subdoc match is field-order-sensitive;
                # column storage has one field order per schema, so we
                # match order-insensitively — see DEVIATIONS.md.)
                preds.append(_subdoc_eq(col, value, _path_type(schema, key)))
            else:
                preds.append(_eq_pred(col, value, ftype))

    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


_JSON_TYPE_CHECK = {
    "string": "string",
    "integer": ("bigint", "int", "smallint", "tinyint", "long"),
    "number": ("double", "float", "bigint", "int", "long"),
    "boolean": "boolean",
    "array": None,  # prefix-checked
    "object": None,
}


def _json_schema_pred(js: dict, schema: Optional[StructType],
                      resolve: Resolver) -> Column:
    """Mongo's `$jsonSchema` query operator (subset: required,
    properties.{type, enum, minimum, maximum}). Type conformance is a
    plan-time fact in a columnar engine — a mistyped column makes the
    predicate constant-false, matching "no documents conform"."""
    pred = F.lit(True)
    for req in js.get("required", []):
        pred = pred & resolve(req).isNotNull()
    for fname, spec in js.get("properties", {}).items():
        col = resolve(fname)
        want = spec.get("type")
        if want is not None and schema is not None:
            actual = _path_type(schema, fname)
            if actual is None:
                pred = pred & F.lit(False)
                continue
            simple = actual.simpleString()
            chk = _JSON_TYPE_CHECK.get(want)
            if chk is None:
                ok = simple.startswith("array") if want == "array" else \
                    simple.startswith("struct")
            elif isinstance(chk, tuple):
                ok = simple in chk
            else:
                ok = simple == chk
            if not ok:
                pred = pred & F.lit(False)
                continue
        if "enum" in spec:
            pred = pred & col.isin(spec["enum"])
        if "minimum" in spec:
            pred = pred & (col >= F.lit(spec["minimum"]))
        if "maximum" in spec:
            pred = pred & (col <= F.lit(spec["maximum"]))
    return pred


def _subdoc_eq(col: Column, value: dict, ftype: Optional[DataType]) -> Column:
    """Exact sub-document equality: named fields equal (recursively),
    remaining schema fields null, and the struct itself non-null."""
    pred = col.isNotNull()
    for k, v in value.items():
        sub = col[k]
        if isinstance(v, dict):
            sub_t = None
            if isinstance(ftype, StructType) and k in ftype.fieldNames():
                t = ftype[k].dataType
                sub_t = t if isinstance(t, StructType) else None
            pred = pred & _subdoc_eq(sub, v, sub_t)
        elif v is None:
            pred = pred & sub.isNull()
        else:
            pred = pred & (sub == _lit(v))
    if isinstance(ftype, StructType):
        for f in ftype.fields:
            if f.name not in value:
                pred = pred & col[f.name].isNull()
    return pred


# --------------------------------------------------------------------------
# projection compiler
# (reference:src/maggma/stores/mongolike.py:311-312 — properties as list or
#  {field: 1} dict; dotted paths keep their dotted name in output docs)
# --------------------------------------------------------------------------


def compile_projection(properties: Any,
                       schema: Optional[StructType] = None) -> Optional[list[Column]]:
    """properties list / {f:1} dict / {f:0} exclusion dict -> select
    Columns (None = all).

    Inclusion: list or {field: 1}. Exclusion (Mongo parity): a dict whose
    values are all falsy selects every schema column EXCEPT those named
    (requires `schema`; mixing 0s and 1s raises, as in Mongo).
    Dotted paths are selected as nested-struct extraction and aliased to
    the dotted name, mirroring how the reference yields
    ``{"g.h": ...}``-addressable projections.
    """
    if properties is None:
        return None
    if isinstance(properties, dict):
        if not properties:
            return None  # Mongo: an empty projection returns full docs
        flags = set(bool(v) for v in properties.values())
        if flags == {True}:
            properties = list(properties)
        elif flags == {False}:
            if schema is None:
                raise ValueError("exclusion projection requires a schema")
            excluded = set(properties)
            top_excluded = {p for p in excluded if "." not in p}
            # dotted exclusions drop the nested struct LEAF (Mongo
            # {'a.b': 0} parity); unresolvable paths are no-ops, as in
            # Mongo. Grouped per top-level column so one dropFields call
            # handles all leaves under it.
            drops: dict[str, list[str]] = {}
            for p in excluded:
                if "." not in p:
                    continue
                top, rest = p.split(".", 1)
                if top not in top_excluded and _path_in_schema(schema, p):
                    drops.setdefault(top, []).append(rest)
            cols = []
            for f in schema.fields:
                if f.name in top_excluded:
                    continue
                if f.name in drops:
                    cols.append(
                        F.col(f.name).dropFields(*drops[f.name])
                        .alias(f.name))
                else:
                    cols.append(F.col(f.name))
            return cols
        else:
            raise ValueError(
                "cannot mix inclusion and exclusion in a projection "
                "(Mongo parity)")
    cols = []
    for p in properties:
        vsplit = _variant_split(schema, p)
        if vsplit is not None:
            root, jpath = vsplit
            cols.append(
                F.try_variant_get(F.col(root), jpath, "variant").alias(p))
        elif "." in p:
            cols.append(F.col(p).alias(p))
        else:
            cols.append(F.col(p))
    return cols
