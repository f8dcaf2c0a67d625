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
        ["eq", "ne", "in", "nin", "gt", "gte", "lt", "lte", "regex", "mod"]))
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
    divisor = draw(st.integers(2, 7))
    rem = draw(st.integers(0, 1))
    return ({"o_orderkey": {"$mod": [divisor, rem]}},
            f"o_orderkey % {divisor} = {rem}")


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
    return spark.read.parquet(f"{SF}/orders.parquet").cache()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return con


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
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
