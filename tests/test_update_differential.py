"""Differential testing of the Mongo update dialect: random chains of
update_many({criteria}, {$set/$inc/$unset}) compiled by
operators/merge.py::apply_update_operators vs a mechanically-derived
CASE-WHEN SQL twin on DuckDB — the per-row update semantics (matched
rows change, others pass through, null criteria fail) must agree
bit-for-bit. $rename/$push per-row semantics are pinned by unit tests
(schema changes make their twins less mechanical)."""

from __future__ import annotations

import random

import duckdb
import pytest

from maggma_spark.operators.merge import apply_update_operators

ROWS = [(k, (k * 7) % 50 if k % 5 else None, (k * 3) % 20,
         f"s{k % 4}" if k % 7 else None) for k in range(120)]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(
        ROWS, "k bigint, a bigint, b bigint, s string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, a BIGINT, b BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    return sdf, con


def _gen_criteria(rng: random.Random):
    kind = rng.choice(["k_lt", "a_gte", "s_eq", "s_exists", "all"])
    if kind == "k_lt":
        v = rng.randint(0, 120)
        return {"k": {"$lt": v}}, f"k < {v}"
    if kind == "a_gte":
        v = rng.randint(0, 50)
        # null a fails $gte in Mongo; SQL NULL >= v is NULL -> ELSE
        return {"a": {"$gte": v}}, f"a >= {v}"
    if kind == "s_eq":
        v = f"s{rng.randint(0, 4)}"
        return {"s": v}, f"s = '{v}'"
    if kind == "s_exists":
        return {"s": {"$exists": True}}, "s IS NOT NULL"
    return {}, "TRUE"


def _gen_update(rng: random.Random, crit_sql: str):
    """One update doc with disjoint targets + per-column SQL exprs.
    At most one operator per column (Mongo rejects conflicting paths);
    round-7 ops $mul/$min/$max join the pool — both engines' least/
    greatest skip nulls, which IS Mongo's missing-field-takes-operand
    rule."""
    exprs = {c: c for c in ("a", "b", "s")}
    update: dict = {}
    a_op = rng.choice(["unset_a", "set_a", "min_a", None])
    b_op = rng.choice(["inc_b", "mul_b", "max_b", None])
    s_op = rng.choice(["set_s", None])
    if s_op == "set_s":
        v = f"v{rng.randint(0, 9)}"
        update.setdefault("$set", {})["s"] = v
        exprs["s"] = f"CASE WHEN {crit_sql} THEN '{v}' ELSE s END"
    if b_op == "inc_b":
        d = rng.randint(-5, 9)
        update.setdefault("$inc", {})["b"] = d
        exprs["b"] = (f"CASE WHEN {crit_sql} THEN coalesce(b, 0) + {d} "
                      "ELSE b END")
    elif b_op == "mul_b":
        d = rng.randint(-3, 5)
        update.setdefault("$mul", {})["b"] = d
        exprs["b"] = (f"CASE WHEN {crit_sql} THEN coalesce(b, 0) * {d} "
                      "ELSE b END")
    elif b_op == "max_b":
        v = rng.randint(0, 25)
        update.setdefault("$max", {})["b"] = v
        exprs["b"] = (f"CASE WHEN {crit_sql} THEN greatest(b, {v}) "
                      "ELSE b END")
    if a_op == "unset_a":
        update["$unset"] = ["a"]
        exprs["a"] = f"CASE WHEN {crit_sql} THEN NULL ELSE a END"
    elif a_op == "set_a":
        v = rng.randint(0, 99)
        update.setdefault("$set", {})["a"] = v
        exprs["a"] = f"CASE WHEN {crit_sql} THEN {v} ELSE a END"
    elif a_op == "min_a":
        v = rng.randint(0, 60)
        update.setdefault("$min", {})["a"] = v
        exprs["a"] = (f"CASE WHEN {crit_sql} THEN least(a, {v}) "
                      "ELSE a END")
    if not update:  # degenerate draw: force one op
        update["$set"] = {"s": "vx"}
        exprs["s"] = f"CASE WHEN {crit_sql} THEN 'vx' ELSE s END"
    return update, exprs


def test_random_update_chains_match_duckdb(spark, frames):
    sdf, con = frames
    rng = random.Random(11)
    for case in range(30):
        df = sdf
        sql = "SELECT k, a, b, s FROM t"
        trail = []
        for _ in range(rng.randint(1, 3)):
            criteria, crit_sql = _gen_criteria(rng)
            update, exprs = _gen_update(rng, crit_sql)
            trail.append((criteria, update))
            df = apply_update_operators(df, criteria, update)
            sql = (f"SELECT k, {exprs['a']} AS a, {exprs['b']} AS b, "
                   f"{exprs['s']} AS s FROM ({sql})")
        got = sorted(tuple(repr(v) for v in r)
                     for r in df.select("k", "a", "b", "s").collect())
        want = sorted(tuple(repr(v) for v in r)
                      for r in con.sql(sql).fetchall())
        assert got == want, f"case {case}: {trail}\nsql: {sql}"


def test_random_positional_updates_match_duckdb(spark):
    """Round-8 arrayFilters/positional dialect, differentially:
    random chains of $set/$inc over `arr.$[]` / `arr.$[e]` (random
    comparison filter) / `arr.$` (first element matched by the
    query's $elemMatch) vs DuckDB list_transform twins with indexed
    lambdas. Null arrays must pass through untouched."""
    import duckdb

    rng = random.Random(23)
    rows = []
    for k in range(80):
        if k % 9 == 0:
            rows.append((k, None))
        else:
            rows.append((k, [((k * 13 + j * 7) % 40) - 5
                             for j in range(k % 5)]))
    sdf = spark.createDataFrame(rows, "k bigint, arr array<bigint>")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, arr BIGINT[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)

    for case in range(25):
        df, sql = sdf, "SELECT k, arr FROM t"
        trail = []
        for _ in range(rng.randint(1, 3)):
            kv = rng.randint(0, 80)
            crit_sql = f"k < {kv}"
            kind = rng.choice(["all_set", "all_inc", "filt_set",
                               "filt_inc", "first_set"])
            thr = rng.randint(-5, 34)
            val = rng.randint(-9, 9)
            if kind == "all_set":
                criteria = {"k": {"$lt": kv}}
                update = {"$set": {"arr.$[]": val}}
                lam = f"x -> CAST({val} AS BIGINT)"
            elif kind == "all_inc":
                criteria = {"k": {"$lt": kv}}
                update = {"$inc": {"arr.$[]": val}}
                lam = f"x -> x + {val}"
            elif kind == "filt_set":
                criteria = {"k": {"$lt": kv}}
                update = {"$set": {"arr.$[e]": val}}
                lam = (f"x -> CASE WHEN x >= {thr} THEN "
                       f"CAST({val} AS BIGINT) ELSE x END")
            elif kind == "filt_inc":
                criteria = {"k": {"$lt": kv}}
                update = {"$inc": {"arr.$[e]": val}}
                lam = (f"x -> CASE WHEN x >= {thr} "
                       f"THEN x + {val} ELSE x END")
            else:
                # $: criteria's $elemMatch picks the FIRST >= thr
                criteria = {"k": {"$lt": kv},
                            "arr": {"$elemMatch": {"$gte": thr}}}
                update = {"$set": {"arr.$": val}}
                crit_sql = (f"k < {kv} AND len(list_filter(arr, "
                            f"x -> x >= {thr})) > 0")
                fi = (f"list_filter(list_transform(arr, (x, i) -> "
                      f"CASE WHEN x >= {thr} THEN i END), "
                      "v -> v IS NOT NULL)[1]")
                lam = (f"(x, i) -> CASE WHEN i = {fi} THEN "
                       f"CAST({val} AS BIGINT) ELSE x END")
            af = [{"e": {"$gte": thr}}] if "filt" in kind else None
            trail.append((criteria, update, af))
            df = apply_update_operators(df, criteria, update,
                                        array_filters=af)
            sql = (f"SELECT k, CASE WHEN {crit_sql} AND arr IS NOT "
                   f"NULL THEN list_transform(arr, {lam}) "
                   f"ELSE arr END AS arr FROM ({sql})")
        got = sorted((r["k"], repr(r["arr"]))
                     for r in df.select("k", "arr").collect())
        want = sorted((r[0], repr(r[1]))
                      for r in con.sql(sql).fetchall())
        assert got == want, f"case {case}: {trail}\nsql: {sql}"


def test_upsert_set_on_insert(spark):
    """$setOnInsert + upsert=True: no match -> exactly one Mongo-
    seeded row appended; match -> $setOnInsert is a no-op and no row
    is added."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint")
    out = apply_update_operators(
        df, {"k": 9}, {"$setOnInsert": {"v": 99}, "$inc": {"n": 3}},
        upsert=True).orderBy("k").collect()
    assert [tuple(r) for r in out] == [(1, 10, None), (2, 20, None),
                                       (9, 99, 3)]
    out2 = apply_update_operators(
        df, {"k": 1}, {"$setOnInsert": {"v": 99}}, upsert=True)
    assert out2.count() == 2
    assert out2.filter("k = 1").first()["v"] == 10


def test_upsert_operator_on_criteria_seeded_field(spark):
    """Mongo applies update operators ON TOP of the criteria-equality
    seed when both target the same field: filter {k:5} + $inc {k:3}
    inserts k=8 (not 3), $mul multiplies the seed (not 0), $min/$max
    compare against the seed."""
    df = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    inc = apply_update_operators(
        df, {"k": 5}, {"$inc": {"k": 3}}, upsert=True)
    assert sorted(r["k"] for r in inc.collect()) == [1, 8]
    mul = apply_update_operators(
        df, {"k": 5}, {"$mul": {"k": 4}}, upsert=True)
    assert sorted(r["k"] for r in mul.collect()) == [1, 20]
    mn = apply_update_operators(
        df, {"k": 5}, {"$min": {"k": 3}}, upsert=True)
    assert sorted(r["k"] for r in mn.collect()) == [1, 3]
    mx = apply_update_operators(
        df, {"k": 5}, {"$max": {"k": 3}}, upsert=True)
    assert sorted(r["k"] for r in mx.collect()) == [1, 5]
    # unseeded fields keep the empty-doc base (0 for $inc/$mul)
    base = apply_update_operators(
        df, {"k": 9}, {"$inc": {"v": 3}, "$mul": {"k": 7}}, upsert=True)
    assert sorted(tuple(r) for r in base.collect()) == [(1, 10), (63, 3)]


def test_upsert_min_max_cross_type_seed_raises_dialect_error(spark):
    """Mongo resolves {s:'a'} + {'$max':{'s':5}} via BSON type
    ordering; this dialect doesn't model the BSON type order, so the
    mixed-type seed/operand comparison must raise a NAMED dialect
    ValueError at plan-build time, not a bare TypeError."""
    from maggma_spark.operators.merge import _upsert_insert_row

    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    with pytest.raises(ValueError, match="mixed-type"):
        _upsert_insert_row(df, {"s": "a"}, {"$max": {"s": 5}})
    with pytest.raises(ValueError, match="mixed-type"):
        _upsert_insert_row(df, {"s": "a"}, {"$min": {"s": 5}})
    # same-typed seed/operand still folds fine
    ok = _upsert_insert_row(df, {"s": "a"}, {"$max": {"s": "z"}})
    assert ok.first()["s"] == "z"


def test_fill_linear_matches_duckdb_random(spark):
    """$fill method=linear vs the identical window formula in DuckDB on
    random unique-x series with planted null runs — bit-equal doubles
    (same IEEE expression order on both sides)."""
    import random

    import duckdb

    from maggma_spark.functions.agg_pipeline import compile_pipeline

    rng = random.Random(23)
    con = duckdb.connect()
    back = ("OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)")
    fwd = ("OVER (ORDER BY x ROWS BETWEEN CURRENT ROW "
           "AND UNBOUNDED FOLLOWING)")
    twin = f"""
      SELECT x, coalesce(CAST(v AS DOUBLE),
        last_value(CAST(v AS DOUBLE) IGNORE NULLS) {back}
        + (first_value(CAST(v AS DOUBLE) IGNORE NULLS) {fwd}
           - last_value(CAST(v AS DOUBLE) IGNORE NULLS) {back})
          * (CAST(x AS DOUBLE) - last_value(CASE WHEN v IS NOT NULL
               THEN CAST(x AS DOUBLE) END IGNORE NULLS) {back})
          / (first_value(CASE WHEN v IS NOT NULL
               THEN CAST(x AS DOUBLE) END IGNORE NULLS) {fwd}
             - last_value(CASE WHEN v IS NOT NULL
               THEN CAST(x AS DOUBLE) END IGNORE NULLS) {back})) AS v
      FROM t"""
    for case in range(8):
        xs = sorted(rng.sample(range(0, 500), 40))
        rows = [(x, rng.uniform(-50, 50) if rng.random() < 0.55 else None)
                for x in xs]
        con.execute("CREATE OR REPLACE TABLE t (x BIGINT, v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        sdf = spark.createDataFrame(rows, "x bigint, v double")
        got = sorted((r["x"], repr(r["v"])) for r in compile_pipeline(
            sdf, [{"$fill": {"sortBy": {"x": 1},
                             "output": {"v": {"method": "linear"}}}}])
            .collect())
        want = sorted((x, repr(v)) for x, v in con.sql(twin).fetchall())
        assert got == want, f"case {case}"
