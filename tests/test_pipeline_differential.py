"""Differential testing: seeded-random aggregation pipelines compiled
by functions/agg_pipeline.py vs a mechanically-derived DuckDB SQL twin
over the same table — integer-only measures so comparisons are exact.

Stage coverage (asserted at the bottom of the test so the mix is
recorded): $match / $project / $group / $sort / $limit from the round-3
generator, plus the round-4 compiler additions $setWindowFields,
$bucket, $densify + $fill (value and locf), and $graphLookup (recursive
CTE twin). Round 7 adds `expr_tree`: randomly composed integer /
boolean / string expression trees (arith, %, bit ops, CASE, min/max,
concat/substr/replace/case-folding) compiled by compile_expr and
replayed mechanically in SQL — integer-only so comparisons stay exact.
"""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

from maggma_spark.functions.agg_pipeline import compile_pipeline

ROWS = [(k, ["red", "green", "blue", "teal"][k % 4], (k * 37) % 100,
         (k * 13) % 7) for k in range(200)]
# a binary tree: node i's parent is i//2 — known depths for $graphLookup
EDGES = [(i, i // 2) for i in range(1, 64)]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(ROWS, "k bigint, g string, x bigint, y bigint")
    edf = spark.createDataFrame(EDGES, "node bigint, parent bigint")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, g VARCHAR, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    con.execute("CREATE TABLE e (node BIGINT, parent BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    return sdf, edf, con


def _gen_matches(rng: random.Random, stages, sql):
    for _ in range(rng.randint(0, 2)):
        col = rng.choice(["k", "x", "y", "g"])
        if col == "g":
            v = rng.choice(["red", "green", "blue", "nope"])
            op = rng.choice(["$eq", "$ne"])
            stages.append({"$match": {col: {op: v}}})
            cmp = "<>" if op == "$ne" else "="  # g is non-null: $ne == <>
            sql = f"SELECT * FROM ({sql}) WHERE {col} {cmp} '{v}'"
        else:
            v = rng.randint(0, 99)
            op, cmp = rng.choice(
                [("$gte", ">="), ("$lt", "<"), ("$gt", ">"), ("$lte", "<=")])
            stages.append({"$match": {col: {op: v}}})
            sql = f"SELECT * FROM ({sql}) WHERE {col} {cmp} {v}"
    return sql


def _gen_pipeline(rng: random.Random, mix: Counter):
    """Random pipeline + its SQL twin, tracking live columns."""
    stages: list[dict] = []
    sql = "SELECT * FROM t"
    cols = ["k", "g", "x", "y"]
    shape = rng.choice(["group", "project", "plain", "window", "bucket",
                        "densify", "densify_part", "graph", "addfields",
                        "sortbycount", "bucketauto", "window_global",
                        "expr_sort", "expr_zip_date", "grouptop",
                        "expr_tree"])
    mix[shape] += 1
    if not shape.startswith(("densify", "graph")):  # closed-form twins
        sql = _gen_matches(rng, stages, sql)

    if shape == "grouptop":
        # round-7 rank-prefiltered $top/$bottom (scalar outputs; the
        # prefilter window must pick exactly the comparator's row)
        op = rng.choice(["$top", "$bottom"])
        mix[f"grouptop:{op}"] += 1
        d = rng.choice([1, -1])
        stages.append({"$group": {
            "_id": "$g",
            "t": {op: {"sortBy": {"x": d, "k": 1}, "output": "$k"}},
            "n": {"$count": {}}}})
        order = ("ASC" if d > 0 else "DESC") + ", k"
        pick = 1 if op == "$top" else -1
        idx = "1" if op == "$top" else "count(*)"
        # $bottom = LAST in sortBy order (ties broken by k ascending)
        sql = (f"SELECT g AS _id, (array_agg(k ORDER BY x {order}))"
               f"[{idx}] AS t, count(*) AS n FROM ({sql}) GROUP BY g")
        cols = ["_id", "t", "n"]
    elif shape == "window_global":
        # UNPARTITIONED $setWindowFields -> the distributed scaffold
        # (_swf_global): ranks with prior-range offsets, running
        # accumulators with broadcast carries, whole-frame scalars,
        # round-7 value-range / finite-documents frames and global
        # $first/$last. k is unique in t, so frames are deterministic.
        wop = rng.choice(["rank", "denseRank", "documentNumber",
                          "sumrun", "sumrunb", "minrun", "maxrunb",
                          "avgfull", "rangerun", "rangefin", "docfin",
                          "gfirst", "glast", "sdrun", "sdfull"])
        mix[f"window_global:{wop}"] += 1
        if wop in ("rank", "denseRank", "documentNumber"):
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {f"${wop}": {}}}}})
            fn = {"rank": "RANK()", "denseRank": "DENSE_RANK()",
                  "documentNumber": "ROW_NUMBER()"}[wop]
            expr = f"CAST({fn} OVER (ORDER BY k) AS BIGINT)"
        elif wop in ("sdrun", "sdfull"):
            # round-7c stddev carries: small-int x keeps both engines'
            # partial sums exact; 6dp rounding absorbs the different
            # recombination orders (naive carries vs streaming kernel)
            mop, fn = rng.choice([("$stdDevPop", "stddev_pop"),
                                  ("$stdDevSamp", "stddev_samp")])
            frame = (["unbounded", "current"] if wop == "sdrun"
                     else ["unbounded", "unbounded"])
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w0": {mop: "$x",
                                  "window": {"documents": frame}}}}})
            stages.append({"$addFields": {"w": {"$round": ["$w0", 6]}}})
            stages.append({"$unset": "w0"})
            hi = ("CURRENT ROW" if wop == "sdrun"
                  else "UNBOUNDED FOLLOWING")
            expr = (f"round({fn}(x) OVER (ORDER BY k ROWS BETWEEN "
                    f"UNBOUNDED PRECEDING AND {hi}), 6)")
        elif wop == "rangerun":
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {"$sum": "$x",
                                 "window": {"range": ["unbounded",
                                                      "current"]}}}}})
            expr = ("SUM(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED "
                    "PRECEDING AND CURRENT ROW)")
        elif wop == "rangefin":
            c1, c2 = rng.randint(0, 40), rng.randint(0, 40)
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {"$sum": "$x",
                                 "window": {"range": [-c1, c2]}}}}})
            expr = (f"SUM(x) OVER (ORDER BY k RANGE BETWEEN {c1} "
                    f"PRECEDING AND {c2} FOLLOWING)")
        elif wop == "docfin":
            c1, c2 = rng.randint(0, 5), rng.randint(0, 5)
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {"$min": "$x",
                                 "window": {"documents": [-c1, c2]}}}}})
            expr = (f"MIN(x) OVER (ORDER BY k ROWS BETWEEN {c1} "
                    f"PRECEDING AND {c2} FOLLOWING)")
        elif wop in ("gfirst", "glast"):
            op, acc, frame = {
                "gfirst": ("$first", "FIRST_VALUE(x)",
                           ("unbounded", "current")),
                "glast": ("$last", "LAST_VALUE(x)",
                          ("current", "unbounded")),
            }[wop]
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {op: "$x",
                                 "window": {"documents": list(frame)}}}}})
            lo = ("UNBOUNDED PRECEDING" if frame[0] == "unbounded"
                  else "CURRENT ROW")
            hi = ("UNBOUNDED FOLLOWING" if frame[1] == "unbounded"
                  else "CURRENT ROW")
            expr = (f"{acc} OVER (ORDER BY k ROWS BETWEEN {lo} "
                    f"AND {hi})")
        else:
            op, acc, frame = {
                "sumrun": ("$sum", "SUM(x)",
                           ("unbounded", "current")),
                "sumrunb": ("$sum", "SUM(x)",
                            ("current", "unbounded")),
                "minrun": ("$min", "MIN(x)",
                           ("unbounded", "current")),
                "maxrunb": ("$max", "MAX(x)",
                            ("current", "unbounded")),
                "avgfull": ("$avg", "AVG(x)",
                            ("unbounded", "unbounded")),
            }[wop]
            stages.append({"$setWindowFields": {
                "sortBy": {"k": 1},
                "output": {"w": {op: "$x",
                                 "window": {"documents": list(frame)}}}}})
            lo = ("UNBOUNDED PRECEDING" if frame[0] == "unbounded"
                  else "CURRENT ROW")
            hi = ("UNBOUNDED FOLLOWING" if frame[1] == "unbounded"
                  else "CURRENT ROW")
            expr = (f"{acc} OVER (ORDER BY k ROWS BETWEEN {lo} AND {hi})")
        sql = f"SELECT *, {expr} AS w FROM ({sql})"
        cols = cols + ["w"]
    elif shape == "window":
        wop = rng.choice(["rank", "denseRank", "documentNumber",
                          "sumrun", "sumfull", "sumrange"])
        mix[f"window:{wop}"] += 1
        if wop in ("rank", "denseRank", "documentNumber"):
            stages.append({"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"k": 1},
                "output": {"w": {f"${wop}": {}}}}})
            fn = {"rank": "RANK()", "denseRank": "DENSE_RANK()",
                  "documentNumber": "ROW_NUMBER()"}[wop]
            expr = f"{fn} OVER (PARTITION BY g ORDER BY k)"
        elif wop == "sumrange":
            c = rng.randint(1, 30)
            stages.append({"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"k": 1},
                "output": {"w": {"$sum": "$x",
                                 "window": {"range": [-c, "current"]}}}}})
            expr = ("SUM(x) OVER (PARTITION BY g ORDER BY k RANGE "
                    f"BETWEEN {c} PRECEDING AND CURRENT ROW)")
        else:
            frame = (["unbounded", "current"] if wop == "sumrun"
                     else ["unbounded", "unbounded"])
            stages.append({"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"k": 1},
                "output": {"w": {"$sum": "$x",
                                 "window": {"documents": frame}}}}})
            hi = ("CURRENT ROW" if wop == "sumrun"
                  else "UNBOUNDED FOLLOWING")
            expr = ("SUM(x) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN "
                    f"UNBOUNDED PRECEDING AND {hi})")
        sql = f"SELECT *, {expr} AS w FROM ({sql})"
        cols = cols + ["w"]
    elif shape == "bucket":
        b = sorted(rng.sample(range(0, 100), 3))
        outs = rng.sample([("count", {"$sum": 1}, "count(*)"),
                           ("sx", {"$sum": "$x"}, "sum(x)"),
                           ("mx", {"$max": "$x"}, "max(x)")],
                          rng.randint(1, 3))
        stages.append({"$bucket": {
            "groupBy": "$x", "boundaries": b, "default": "other",
            "output": {n: d for n, d, _ in outs}}})
        case = (f"CASE WHEN x >= {b[0]} AND x < {b[1]} THEN '{b[0]}' "
                f"WHEN x >= {b[1]} AND x < {b[2]} THEN '{b[1]}' "
                "ELSE 'other' END")
        sel = ", ".join(f"{twin} AS {n}" for n, _, twin in outs)
        sql = (f"SELECT {case} AS _id, {sel} FROM ({sql}) GROUP BY 1")
        cols = ["_id"] + [n for n, _, _ in outs]
    elif shape == "densify":
        step = rng.choice([3, 7, 13])
        stages.append({"$densify": {
            "field": "x", "range": {"step": step, "bounds": "full"}}})
        sql = f"""
          WITH b AS ({sql}),
          grid AS (SELECT unnest(generate_series(
                     (SELECT min(x) FROM b), (SELECT max(x) FROM b),
                     {step})) AS gs),
          gaps AS (SELECT CAST(NULL AS BIGINT) AS k,
                          CAST(NULL AS VARCHAR) AS g, gs AS x,
                          CAST(NULL AS BIGINT) AS y
                   FROM grid WHERE gs NOT IN (SELECT x FROM b))
          SELECT * FROM b UNION ALL SELECT * FROM gaps"""
        fill = rng.choice(["none", "value", "locf"])
        mix[f"fill:{fill}"] += 1
        if fill == "value":
            stages.append({"$fill": {"output": {"g": {"value": "gap"},
                                                "y": {"value": -1}}}})
            sql = (f"SELECT k, coalesce(g, 'gap') AS g, x, "
                   f"coalesce(y, -1) AS y FROM ({sql})")
        elif fill == "locf":
            # gap rows have unique x (only missing steps are added), so
            # (x, k NULLS FIRST) totally orders every tie group that a
            # gap row's LOCF lookback can cross -> deterministic
            stages.append({"$fill": {"sortBy": {"x": 1, "k": 1},
                                     "output": {"g": {"method": "locf"}}}})
            sql = (
                "SELECT k, last_value(g IGNORE NULLS) OVER "
                "(ORDER BY x ASC, k ASC NULLS FIRST ROWS BETWEEN "
                "UNBOUNDED PRECEDING AND CURRENT ROW) AS g, x, y "
                f"FROM ({sql})")
    elif shape == "densify_part":
        # per-partition bounds: each g spans ITS OWN min/max of x, and
        # a partitioned locf fill completes y inside each g
        step = rng.choice([5, 11])
        stages.append({"$densify": {
            "field": "x", "partitionByFields": ["g"],
            "range": {"step": step, "bounds": "partition"}}})
        stages.append({"$fill": {
            "partitionBy": "$g", "sortBy": {"x": 1, "k": 1},
            "output": {"y": {"method": "locf"}}}})
        sql = f"""
          WITH b AS ({sql}),
          spans AS (SELECT g, min(x) AS lo, max(x) AS hi
                    FROM b GROUP BY g),
          grid AS (SELECT g, unnest(generate_series(lo, hi, {step})) AS x
                   FROM spans),
          gaps AS (SELECT CAST(NULL AS BIGINT) AS k, grid.g, grid.x,
                          CAST(NULL AS BIGINT) AS y
                   FROM grid LEFT JOIN (SELECT DISTINCT g, x FROM b) e
                     ON e.g = grid.g AND e.x = grid.x
                   WHERE e.g IS NULL),
          u AS (SELECT * FROM b UNION ALL SELECT * FROM gaps)
          SELECT k, g, x,
                 last_value(y IGNORE NULLS) OVER (
                   PARTITION BY g ORDER BY x ASC, k ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
          FROM u"""
    elif shape == "graph":
        depth = rng.randint(0, 4)
        mix[f"graph:d{depth}"] += 1
        stages.append({"$graphLookup": {
            "from": "__EDGES__", "startWith": "$k",
            "connectFromField": "parent", "connectToField": "node",
            "as": "anc", "maxDepth": depth}})
        stages.append({"$project": {"k": 1, "g": 1,
                                    "n": {"$size": "$anc"}}})
        sql = f"""
          WITH b AS ({sql}),
          r0 AS (SELECT b.k AS gid, e.node, 0 AS depth
                 FROM b JOIN e ON e.node = b.k),
          r AS (
            WITH RECURSIVE rr AS (
              SELECT * FROM r0
              UNION
              SELECT rr.gid, p.node, rr.depth + 1
              FROM rr JOIN e c ON c.node = rr.node
                      JOIN e p ON p.node = c.parent
              WHERE rr.depth < {depth})
            SELECT * FROM rr),
          cnt AS (SELECT gid, count(DISTINCT node) AS n
                  FROM r GROUP BY gid)
          SELECT b.k, b.g, coalesce(cnt.n, 0) AS n
          FROM b LEFT JOIN cnt ON cnt.gid = b.k"""
        cols = ["k", "g", "n"]
    elif shape == "bucketauto":
        nb = rng.randint(2, 6)
        stages.append({"$bucketAuto": {
            "groupBy": "$x", "buckets": nb,
            "output": {"n": {"$sum": 1}, "sy": {"$sum": "$y"}}}})
        stages.append({"$project": {"lo": "$_id.min", "hi": "$_id.max",
                                    "n": 1, "sy": 1}})
        # the same deterministic boundary rule, mechanically in SQL:
        # distinct-value cum counts -> floor(before * B / total), ties
        # cohere; max boundary = next bucket's min, last = global max
        sql = f"""
          WITH base AS ({sql}),
          vals AS (SELECT x AS v, count(*) AS c FROM base GROUP BY x),
          cum AS (SELECT v, coalesce(sum(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS before FROM vals),
          assign AS (SELECT b.*, least(CAST(floor(cum.before * {nb} * 1.0
                       / (SELECT count(*) FROM base)) AS BIGINT),
                       {nb} - 1) AS bkt
                     FROM base b JOIN cum ON cum.v = b.x),
          bounds AS (SELECT bkt, min(x) AS lo FROM assign GROUP BY bkt),
          bounds2 AS (SELECT bkt, lo, coalesce(lead(lo) OVER (ORDER BY bkt),
                        (SELECT max(x) FROM base)) AS hi FROM bounds),
          agg AS (SELECT bkt, count(*) AS n, sum(y) AS sy
                  FROM assign GROUP BY bkt)
          SELECT lo, hi, n, CAST(sy AS BIGINT) AS sy
          FROM agg JOIN bounds2 USING (bkt)"""
        cols = ["lo", "hi", "n", "sy"]
    elif shape == "addfields":
        c = rng.randint(1, 9)
        op, sym = rng.choice([("$add", "+"), ("$subtract", "-"),
                              ("$multiply", "*")])
        stages.append({"$addFields": {
            "z": {op: ["$x", c]},
            "flag": {"$cond": {"if": {"$gte": ["$y", 3]},
                               "then": 1, "else": 0}}}})
        sql = (f"SELECT *, x {sym} {c} AS z, "
               "CASE WHEN y >= 3 THEN 1 ELSE 0 END AS flag "
               f"FROM ({sql})")
        cols = cols + ["z", "flag"]
    elif shape == "expr_sort":
        # round-6 expression wave: $sortArray over a $map/$range-built
        # array, folded to a string with $reduce + $toString
        c1, c2 = rng.randint(2, 9), rng.randint(2, 9)
        d = rng.choice([1, -1])
        stages.append({"$addFields": {"w": {"$reduce": {
            "input": {"$sortArray": {
                "input": {"$map": {
                    "input": {"$range": [0, 3]}, "as": "i",
                    "in": {"$switch": {"branches": [
                        {"case": {"$eq": ["$$i", 0]},
                         "then": {"$mod": ["$x", c1]}},
                        {"case": {"$eq": ["$$i", 1]},
                         "then": {"$mod": ["$y", c2]}}],
                        "default": {"$mod": ["$k", 10]}}}}},
                "sortBy": d}},
            "initialValue": "",
            "in": {"$concat": ["$$value", "-",
                               {"$toString": "$$this"}]}}}}})
        vs = f"[x % {c1}, y % {c2}, k % 10]"
        order = "ASC" if d > 0 else "DESC"
        sql = (f"SELECT *, list_aggregate(list_transform(list_sort("
               f"{vs}, '{order}'), v -> '-' || CAST(v AS VARCHAR)), "
               f"'string_agg', '') AS w FROM ({sql})")
        cols = cols + ["w"]
    elif shape == "expr_zip_date":
        # $zip + $arrayElemAt over $map/$range-built arrays, plus a
        # $dateFromString round-trip through $dayOfMonth
        c = rng.randint(2, 9)
        stages.append({"$addFields": {
            "w": {"$reduce": {
                "input": {"$map": {
                    "input": {"$zip": {"inputs": [
                        {"$map": {"input": {"$range": [0, 2]},
                                  "as": "i",
                                  "in": {"$add": ["$x", "$$i"]}}},
                        {"$map": {"input": {"$range": [0, 2]},
                                  "as": "i",
                                  "in": {"$mod": [{"$add": ["$y", "$$i"]},
                                                  c]}}}]}},
                    "as": "p",
                    "in": {"$concat": [
                        {"$toString": {"$arrayElemAt": ["$$p", 0]}}, ":",
                        {"$toString": {"$arrayElemAt": ["$$p", 1]}}]}}},
                "initialValue": "",
                "in": {"$concat": ["$$value", "|", "$$this"]}}},
            "dom": {"$dayOfMonth": {"$dateFromString": {
                "dateString": {"$concat": [
                    "2024-01-",
                    {"$cond": [{"$lt": [{"$add": [{"$mod": ["$x", 28]},
                                                  1]}, 10]},
                               {"$concat": ["0", {"$toString":
                                   {"$add": [{"$mod": ["$x", 28]}, 1]}}]},
                               {"$toString":
                                   {"$add": [{"$mod": ["$x", 28]}, 1]}}]}
                ]}}}}}})
        sql = (
            "SELECT *, '|' || CAST(x AS VARCHAR) || ':' || "
            f"CAST(y % {c} AS VARCHAR) || '|' || "
            "CAST(x + 1 AS VARCHAR) || ':' || "
            f"CAST((y + 1) % {c} AS VARCHAR) AS w, "
            "CAST(x % 28 + 1 AS INT) AS dom "
            f"FROM ({sql})")
        cols = cols + ["w", "dom"]
    elif shape == "expr_tree":
        # round-7 expression dialect: randomly composed integer /
        # boolean / string expression trees, compiled by compile_expr
        # and replayed mechanically in SQL. Integer-only arithmetic so
        # the comparison stays exact (trig/float ops are oracle-row
        # territory); %, bit ops, and CASE have identical semantics in
        # the JVM and DuckDB for two's-complement BIGINTs.
        def num(depth):
            if depth <= 0 or rng.random() < 0.3:
                if rng.random() < 0.3:
                    c = rng.randint(0, 9)
                    return c, str(c)
                f = rng.choice(["x", "y", "k"])
                return "$" + f, f
            op = rng.choice(["add", "sub", "mul", "mod", "abs", "min",
                             "max", "cond", "band", "bor", "bxor"])
            a_m, a_s = num(depth - 1)
            if op == "abs":
                return {"$abs": a_m}, f"abs({a_s})"
            if op == "mod":
                c = rng.randint(2, 13)
                return {"$mod": [a_m, c]}, f"(({a_s}) % {c})"
            if op == "mul":
                c = rng.randint(2, 5)
                return {"$multiply": [a_m, c]}, f"(({a_s}) * {c})"
            if op == "cond":
                p_m, p_s = pred(depth - 1)
                c_m, c_s = num(depth - 1)
                return ({"$cond": [p_m, a_m, c_m]},
                        f"(CASE WHEN {p_s} THEN ({a_s}) "
                        f"ELSE ({c_s}) END)")
            b_m, b_s = num(depth - 1)
            return {
                "add": ({"$add": [a_m, b_m]}, f"(({a_s}) + ({b_s}))"),
                "sub": ({"$subtract": [a_m, b_m]},
                        f"(({a_s}) - ({b_s}))"),
                "min": ({"$min": [a_m, b_m]}, f"least({a_s}, {b_s})"),
                "max": ({"$max": [a_m, b_m]},
                        f"greatest({a_s}, {b_s})"),
                "band": ({"$bitAnd": [a_m, b_m]},
                         f"(({a_s}) & ({b_s}))"),
                "bor": ({"$bitOr": [a_m, b_m]},
                        f"(({a_s}) | ({b_s}))"),
                "bxor": ({"$bitXor": [a_m, b_m]},
                         f"xor(CAST({a_s} AS BIGINT), "
                         f"CAST({b_s} AS BIGINT))"),
            }[op]

        def pred(depth):
            a_m, a_s = num(max(depth, 0))
            b_m, b_s = num(max(depth, 0))
            op, sym = rng.choice(
                [("$gt", ">"), ("$gte", ">="), ("$lt", "<"),
                 ("$lte", "<="), ("$eq", "="), ("$ne", "<>")])
            m, s = {op: [a_m, b_m]}, f"(({a_s}) {sym} ({b_s}))"
            if depth > 0 and rng.random() < 0.4:
                c_m, c_s = pred(depth - 1)
                bop = rng.choice(["$and", "$or"])
                return ({bop: [m, c_m]},
                        f"({s} {'AND' if bop == '$and' else 'OR'} {c_s})")
            if rng.random() < 0.2:
                return {"$not": [m]}, f"(NOT {s})"
            return m, s

        def sx(depth):
            if depth <= 0 or rng.random() < 0.35:
                n_m, n_s = num(0)
                return rng.choice([
                    ("$g", "g"),
                    ({"$toUpper": "$g"}, "upper(g)"),
                    ({"$toString": n_m}, f"CAST({n_s} AS VARCHAR)")])
            op = rng.choice(["concat", "upper", "lower", "substr",
                             "replace"])
            a_m, a_s = sx(depth - 1)
            if op == "concat":
                b_m, b_s = sx(depth - 1)
                return ({"$concat": [a_m, "-", b_m]},
                        f"(({a_s}) || '-' || ({b_s}))")
            if op == "upper":
                return {"$toUpper": a_m}, f"upper({a_s})"
            if op == "lower":
                return {"$toLower": a_m}, f"lower({a_s})"
            if op == "substr":
                c = rng.randint(1, 6)
                return ({"$substrCP": [a_m, 0, c]},
                        f"substr({a_s}, 1, {c})")
            return ({"$replaceAll": {"input": a_m, "find": "e",
                                     "replacement": "_"}},
                    f"replace({a_s}, 'e', '_')")

        n_m, n_s = num(3)
        p_m, p_s = pred(2)
        s_m, s_s = sx(2)
        stages.append({"$addFields": {
            "w1": {"$toLong": n_m},
            "w2": s_m,
            "w3": {"$cond": [p_m, 1, 0]},
            "w4": {"$strLenCP": s_m}}})
        sql = (f"SELECT *, CAST({n_s} AS BIGINT) AS w1, {s_s} AS w2, "
               f"(CASE WHEN {p_s} THEN 1 ELSE 0 END) AS w3, "
               f"CAST(length({s_s}) AS INT) AS w4 FROM ({sql})")
        cols = cols + ["w1", "w2", "w3", "w4"]
    elif shape == "sortbycount":
        stages.append({"$sortByCount": "$g"})
        sql = (f"SELECT g AS _id, count(*) AS count FROM ({sql}) "
               "GROUP BY g ORDER BY count DESC, _id ASC")
        cols = ["_id", "count"]
    elif shape == "group":
        accs = rng.sample(
            [("n", {"$sum": 1}, "count(*)"),
             ("sx", {"$sum": "$x"}, "sum(x)"),
             ("mx", {"$max": "$x"}, "max(x)"),
             ("mn", {"$min": "$y"}, "min(y)")],
            rng.randint(1, 3))
        gdoc = {"_id": "$g"}
        sel = ["g AS _id"]
        for name, doc, twin in accs:
            gdoc[name] = doc
            sel.append(f"{twin} AS {name}")
        stages.append({"$group": gdoc})
        sql = f"SELECT {', '.join(sel)} FROM ({sql}) GROUP BY g"
        cols = ["_id"] + [a[0] for a in accs]
        if rng.random() < 0.5:
            n = rng.randint(1, 3)
            stages.append({"$sort": {"_id": 1}})
            stages.append({"$limit": n})
            sql = f"SELECT * FROM ({sql}) ORDER BY _id LIMIT {n}"
    elif shape == "project":
        keep = rng.sample(["k", "g", "x", "y"], rng.randint(1, 3))
        if "k" not in keep:
            keep.append("k")
        stages.append({"$project": {c: 1 for c in keep}})
        sql = f"SELECT {', '.join(keep)} FROM ({sql})"
        cols = keep
    if shape in ("plain", "project") and rng.random() < 0.5:
        n = rng.randint(1, 20)
        stages.append({"$sort": {"k": -1}})
        stages.append({"$limit": n})
        sql = f"SELECT * FROM ({sql}) ORDER BY k DESC LIMIT {n}"
    return stages, sql, cols


def _canon(rows):
    # repr-normalize so None sorts; exact for the all-integer measures
    return sorted(tuple(repr(v) for v in r) for r in rows)


def test_random_pipelines_match_duckdb(spark, frames):
    sdf, edf, con = frames
    rng = random.Random(17)  # seed chosen so all 16 families draw >= 2
    mix: Counter = Counter()
    for case in range(100):
        stages, sql, cols = _gen_pipeline(rng, mix)
        for st in stages:  # bind the edges frame for $graphLookup
            if "$graphLookup" in st and st["$graphLookup"]["from"] == "__EDGES__":
                st["$graphLookup"] = dict(st["$graphLookup"], **{"from": edf})
        try:
            got = compile_pipeline(sdf, stages)
        except ValueError as exc:
            # $bucketAuto raises on an empty input by contract; a
            # random $match conjunction can legitimately produce one —
            # the twin must agree that nothing survived the filters
            assert "empty input" in str(exc), (case, stages, exc)
            assert not con.sql(
                f"SELECT * FROM ({sql})").fetchall(), (case, stages)
            mix["bucketauto:empty"] += 1
            continue
        spark_rows = _canon(tuple(r[c] for c in cols) for r in got.collect())
        duck_rows = _canon(
            con.sql(f"SELECT {', '.join(cols)} FROM ({sql})").fetchall())
        assert spark_rows == duck_rows, (
            f"case {case}: {stages}\nsql: {sql}\n"
            f"spark={spark_rows[:5]} duck={duck_rows[:5]}")
    # the recorded stage mix: every r4 compiler addition must have been
    # exercised several times in the 70 seeds
    for family in ("window", "bucket", "densify", "densify_part",
                   "graph", "addfields", "sortbycount", "bucketauto",
                   "window_global", "expr_sort", "expr_zip_date",
                   "grouptop", "expr_tree"):
        assert mix[family] >= 2, mix  # 16 families over 100 seeds
    assert mix["fill:value"] >= 1 and mix["fill:locf"] >= 1, mix
