"""Differential testing: 40 seeded-random aggregation pipelines compiled
by functions/agg_pipeline.py vs a mechanically-derived DuckDB SQL twin
over the same table — integer-only measures so comparisons are exact."""

from __future__ import annotations

import random

import duckdb
import pytest

from maggma_spark.functions.agg_pipeline import compile_pipeline

ROWS = [(k, ["red", "green", "blue", "teal"][k % 4], (k * 37) % 100,
         (k * 13) % 7) for k in range(200)]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(ROWS, "k bigint, g string, x bigint, y bigint")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, g VARCHAR, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    return sdf, con


def _gen_pipeline(rng: random.Random):
    """Random pipeline + its SQL twin, tracking live columns."""
    stages, sql = [], "SELECT * FROM t"
    cols = ["k", "g", "x", "y"]
    for _ in range(rng.randint(0, 2)):  # matches
        col = rng.choice(["k", "x", "y", "g"])
        if col == "g":
            v = rng.choice(["red", "green", "blue", "nope"])
            op, cmp_sql = rng.choice([("$eq", "="), ("$ne", "<>")])
            stages.append({"$match": {col: {op: v}}})
            if op == "$ne":  # Mongo $ne also matches nulls; g is non-null
                sql = f"SELECT * FROM ({sql}) WHERE {col} <> '{v}'"
            else:
                sql = f"SELECT * FROM ({sql}) WHERE {col} = '{v}'"
        else:
            v = rng.randint(0, 99)
            op, cmp_sql = rng.choice(
                [("$gte", ">="), ("$lt", "<"), ("$gt", ">"), ("$lte", "<=")])
            stages.append({"$match": {col: {op: v}}})
            sql = f"SELECT * FROM ({sql}) WHERE {col} {cmp_sql} {v}"
    shape = rng.choice(["group", "project", "plain"])
    if shape == "group":
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
    if shape != "group" and rng.random() < 0.5:
        n = rng.randint(1, 20)
        stages.append({"$sort": {"k": -1}})
        stages.append({"$limit": n})
        sql = f"SELECT * FROM ({sql}) ORDER BY k DESC LIMIT {n}"
    return stages, sql, cols


def test_random_pipelines_match_duckdb(spark, frames):
    sdf, con = frames
    rng = random.Random(7)
    for case in range(40):
        stages, sql, cols = _gen_pipeline(rng)
        got = compile_pipeline(sdf, stages)
        spark_rows = sorted(
            tuple(r[c] for c in cols) for r in got.collect())
        duck_rows = sorted(
            tuple(r) for r in con.sql(
                f"SELECT {', '.join(cols)} FROM ({sql})").fetchall())
        assert spark_rows == duck_rows, (
            f"case {case}: {stages}\nsql: {sql}\n"
            f"spark={spark_rows[:5]} duck={duck_rows[:5]}")
