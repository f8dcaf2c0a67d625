"""Property-based differential testing of the criteria compiler: random
criteria trees run through BOTH the Spark compiler and a direct SQL
rendering on DuckDB over the same parquet; row sets must agree.

This is the oracle discipline the reference lacks entirely (SURVEY §5:
no property-based/randomized testing anywhere).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from maggma_spark.functions.criteria import compile_criteria

SF = "/root/testdata/sf0.001"

# -- paired (criteria-dict, sql-where) generators ---------------------------

statuses = st.sampled_from(["F", "O", "P"])
prios = st.sampled_from(["1-URGENT", "2-HIGH", "5-LOW"])
prices = st.floats(min_value=1000, max_value=500000).map(lambda x: round(x, 2))


def _quote(v):
    return f"'{v}'" if isinstance(v, str) else repr(v)


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(
        ["eq", "ne", "in", "nin", "gt", "gte", "lt", "lte", "regex", "mod",
         "substr", "floor", "switch"]))
    if kind in ("eq", "ne", "in", "nin"):
        field, vals = draw(st.sampled_from(
            [("o_orderstatus", statuses), ("o_orderpriority", prios)]))
        if kind == "eq":
            v = draw(vals)
            return {field: v}, f"{field} = {_quote(v)}"
        if kind == "ne":
            v = draw(vals)
            return ({field: {"$ne": v}},
                    f"({field} <> {_quote(v)} OR {field} IS NULL)")
        lst = draw(st.lists(vals, min_size=1, max_size=3, unique=True))
        sql_list = ", ".join(_quote(v) for v in lst)
        if kind == "in":
            return {field: {"$in": lst}}, f"{field} IN ({sql_list})"
        return ({field: {"$nin": lst}},
                f"({field} NOT IN ({sql_list}) OR {field} IS NULL)")
    if kind in ("gt", "gte", "lt", "lte"):
        v = draw(prices)
        op = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[kind]
        return {"o_totalprice": {f"${kind}": v}}, f"o_totalprice {op} {v!r}"
    if kind == "regex":
        pat = draw(st.sampled_from(["URGENT", "^1-", "LOW$", "2-|5-"]))
        return ({"o_orderpriority": {"$regex": pat}},
                f"regexp_matches(o_orderpriority, '{pat}')")
    if kind == "mod":
        divisor = draw(st.integers(2, 7))
        rem = draw(st.integers(0, 1))
        return ({"o_orderkey": {"$mod": [divisor, rem]}},
                f"o_orderkey % {divisor} = {rem}")
    if kind == "substr":
        ch = draw(st.sampled_from(["1", "2", "5"]))
        return ({"$expr": {"$eq": [
                    {"$substrCP": ["$o_orderpriority", 0, 1]}, ch]}},
                f"substr(o_orderpriority, 1, 1) = '{ch}'")
    if kind == "floor":
        divisor = draw(st.integers(1000, 5000))
        rem = draw(st.integers(0, 2))
        return ({"$expr": {"$eq": [
                    {"$mod": [{"$floor": {"$divide":
                        ["$o_totalprice", divisor]}}, 3]}, rem]}},
                f"CAST(floor(o_totalprice / {divisor}) AS BIGINT) % 3 = {rem}")
    # $switch: classify status, compare to a label
    label = draw(st.sampled_from(["open", "done", "other"]))
    return ({"$expr": {"$eq": [
                {"$switch": {"branches": [
                    {"case": {"$eq": ["$o_orderstatus", "O"]}, "then": "open"},
                    {"case": {"$eq": ["$o_orderstatus", "F"]}, "then": "done"}],
                    "default": "other"}},
                label]}},
            f"(CASE WHEN o_orderstatus = 'O' THEN 'open' "
            f"WHEN o_orderstatus = 'F' THEN 'done' ELSE 'other' END) = '{label}'")


@st.composite
def tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(leaf())
    combo = draw(st.sampled_from(["$and", "$or", "$nor", "implicit_and"]))
    n = draw(st.integers(2, 3))
    subs = [draw(tree(depth=depth + 1)) for _ in range(n)]
    crits = [c for c, _ in subs]
    sqls = [s for _, s in subs]
    if combo == "$and":
        return {"$and": crits}, "(" + " AND ".join(sqls) + ")"
    if combo == "$or":
        return {"$or": crits}, "(" + " OR ".join(sqls) + ")"
    if combo == "$nor":
        return ({"$nor": crits},
                "(NOT COALESCE(" + " OR ".join(sqls) + ", FALSE))")
    merged: dict = {}
    clash = False
    for c in crits:
        for k, v in c.items():
            if k in merged:
                clash = True
            merged[k] = v
    if clash:  # dict keys must be unique; fall back to $and
        return {"$and": crits}, "(" + " AND ".join(sqls) + ")"
    return merged, "(" + " AND ".join(sqls) + ")"


@pytest.fixture(scope="module")
def orders_df(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").cache()
    yield df
    # unpersist, or Spark's cache manager substitutes InMemoryRelation
    # for LATER scans of this same parquet path — silently disabling
    # parquet pushdown in other modules' plan-quality assertions
    df.unpersist()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return con


@given(pair=tree())
def test_criteria_matches_duckdb(orders_df, ddb, pair):
    crit, sql = pair
    spark_keys = {
        r[0] for r in orders_df.filter(
            compile_criteria(crit, schema=orders_df.schema))
        .select("o_orderkey").collect()
    }
    duck_keys = {
        r[0] for r in ddb.execute(
            f"SELECT o_orderkey FROM orders WHERE {sql}").fetchall()
    }
    assert spark_keys == duck_keys, f"criteria {crit} disagreed with SQL {sql}"


# ---------------------------------------------------------------------------
# null/missing-field semantics fuzzing over a null-heavy table
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402


@pytest.fixture(scope="module")
def nullful(spark):
    rows = []
    for i in range(240):
        rows.append({
            "id": i,
            "s": None if i % 3 == 0 else f"v{i % 5}",
            "n": None if i % 4 == 0 else i % 7,
            "arr": None if i % 5 == 0 else [i % 3, i % 4],
        })
    sdf = spark.createDataFrame(
        rows, schema="id long, s string, n long, arr array<long>")
    pdf = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("nullful", pdf)
    sdf = sdf.cache()
    yield sdf, con
    sdf.unpersist()  # see orders_df — don't poison later plan tests


@st.composite
def null_leaf(draw):
    kind = draw(st.sampled_from(
        ["s_eq", "s_null", "s_ne", "s_nin", "n_range", "n_exists",
         "arr_contains", "arr_in", "not_n"]))
    if kind == "s_eq":
        v = draw(st.sampled_from(["v0", "v1", "v2", "v3", "v4"]))
        return {"s": v}, f"s = '{v}'"
    if kind == "s_null":
        return {"s": None}, "s IS NULL"
    if kind == "s_ne":
        v = draw(st.sampled_from(["v0", "v1"]))
        return {"s": {"$ne": v}}, f"(s <> '{v}' OR s IS NULL)"
    if kind == "s_nin":
        lst = draw(st.lists(st.sampled_from(["v0", "v1", "v2"]),
                            min_size=1, max_size=2, unique=True))
        q = ", ".join(f"'{v}'" for v in lst)
        return {"s": {"$nin": lst}}, f"(s NOT IN ({q}) OR s IS NULL)"
    if kind == "n_range":
        v = draw(st.integers(0, 6))
        op = draw(st.sampled_from(["$gt", "$gte", "$lt", "$lte"]))
        sql_op = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
        return {"n": {op: v}}, f"n {sql_op} {v}"
    if kind == "n_exists":
        want = draw(st.booleans())
        return ({"n": {"$exists": want}},
                "n IS NOT NULL" if want else "n IS NULL")
    if kind == "arr_contains":
        v = draw(st.integers(0, 3))
        # Mongo scalar-vs-array equality matches any element
        return {"arr": v}, f"(arr IS NOT NULL AND list_contains(arr, {v}))"
    if kind == "arr_in":
        lst = draw(st.lists(st.integers(0, 3), min_size=1, max_size=2,
                            unique=True))
        q = ", ".join(str(v) for v in lst)
        return ({"arr": {"$in": lst}},
                f"(arr IS NOT NULL AND list_has_any(arr, [{q}]))")
    v = draw(st.integers(0, 6))
    # $not matches docs where the field is missing too
    return ({"n": {"$not": {"$gte": v}}},
            f"(NOT COALESCE(n >= {v}, FALSE))")


@st.composite
def null_tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(null_leaf())
    combo = draw(st.sampled_from(["$and", "$or", "$nor"]))
    subs = [draw(null_tree(depth=depth + 1))
            for _ in range(draw(st.integers(2, 3)))]
    crits, sqls = [c for c, _ in subs], [s for _, s in subs]
    if combo == "$and":
        return {"$and": crits}, "(" + " AND ".join(sqls) + ")"
    if combo == "$or":
        return {"$or": crits}, "(" + " OR ".join(sqls) + ")"
    return ({"$nor": crits},
            "(NOT COALESCE(" + " OR ".join(sqls) + ", FALSE))")


@given(pair=null_tree())
def test_null_semantics_match_duckdb(nullful, pair):
    sdf, con = nullful
    crit, sql = pair
    spark_ids = {r[0] for r in sdf.filter(
        compile_criteria(crit, schema=sdf.schema)).select("id").collect()}
    duck_ids = {r[0] for r in con.execute(
        f"SELECT id FROM nullful WHERE {sql}").fetchall()}
    assert spark_ids == duck_ids, f"criteria {crit} vs SQL {sql}"
