"""As-of join semantics vs hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from maggma_spark.operators.asof import asof_join


def T(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_basic(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=T(10), ev="e1"),
        Row(k=1, ts=T(20), ev="e2"),
        Row(k=2, ts=T(5), ev="e3"),
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=T(8), price=100.0),
        Row(k=1, ts=T(15), price=200.0),
        Row(k=2, ts=T(99), price=300.0),
    ])
    out = {r["ev"]: r["price"] for r in asof_join(
        left, right, on="k", left_ts="ts").collect()}
    assert out == {"e1": 100.0, "e2": 200.0, "e3": None}


def test_asof_tie_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, ts=T(10), ev="e")])
    right = spark.createDataFrame([Row(k=1, ts=T(10), price=5.0)])
    out = asof_join(left, right, on="k", left_ts="ts").collect()
    assert out[0]["price"] == 5.0  # exact-timestamp match is visible


def test_asof_tolerance(spark):
    left = spark.createDataFrame([Row(k=1, ts=T(30), ev="e")])
    right = spark.createDataFrame([Row(k=1, ts=T(5), price=7.0)])
    hit = asof_join(left, right, on="k", left_ts="ts",
                    tolerance="40 minutes").collect()
    assert hit[0]["price"] == 7.0
    miss = asof_join(left, right, on="k", left_ts="ts",
                     tolerance="10 minutes").collect()
    assert miss[0]["price"] is None


def test_asof_vs_duckdb(spark):
    """Differential check against DuckDB's native ASOF JOIN on the real
    events/orders tables."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet") if False else None
    from maggma_spark.plans.catalog import table_store

    ev = table_store(spark, sf, "events").df.select("event_id", "user_id", "ts")
    orders = table_store(spark, sf, "orders").df.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    got = asof_join(
        ev, orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    ).select("event_id", "o_orderkey").collect()

    con = duckdb.connect()
    # ties: several orders can share (custkey, orderdate); both engines
    # resolve to the MAX orderkey (our window picks the greatest payload
    # struct; the oracle dedupes with QUALIFY before the ASOF join)
    want = con.execute(f"""
        WITH o2 AS (
          SELECT o_custkey AS user_id, o_orderdate, o_orderkey
          FROM '{sf}/orders.parquet'
          QUALIFY row_number() OVER (
            PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
        SELECT e.event_id, o2.o_orderkey
        FROM '{sf}/events.parquet' e
        ASOF LEFT JOIN o2 ON e.user_id = o2.user_id AND e.ts >= o2.o_orderdate
    """).fetchall()
    assert len(got) == len(want)
    want_d = dict(want)
    mismatches = [(r["event_id"], r["o_orderkey"], want_d[r["event_id"]])
                  for r in got if r["o_orderkey"] != want_d[r["event_id"]]]
    assert not mismatches, mismatches[:5]


def test_range_join(spark):
    from pyspark.sql import functions as F

    from maggma_spark.operators.range_join import range_join

    left = spark.createDataFrame(
        [Row(k=1, lts=T(10), le="a"), Row(k=1, lts=T(60), le="b"),
         Row(k=2, lts=T(10), le="c")])
    right = spark.createDataFrame(
        [Row(k=1, rts=T(15), re="X"), Row(k=1, rts=T(45), re="Y"),
         Row(k=2, rts=T(30), re="Z")])
    out = {(r["le"], r["re"]) for r in range_join(
        left, right, "lts", "rts", "10 minutes", on="k").collect()}
    assert out == {("a", "X")}  # only pairs within ±10min on the same key
    out2 = {(r["le"], r["re"]) for r in range_join(
        left, right, "lts", "rts", "30 minutes", on="k").collect()}
    assert out2 == {("a", "X"), ("b", "Y"), ("c", "Z")}


def test_range_join_vs_duckdb(spark):
    """Differential: bucketized band join == naive inequality join."""
    import duckdb

    from maggma_spark.plans.catalog import table_store
    from maggma_spark.operators.range_join import range_join

    sf = "/root/testdata/sf0.001"
    ev = table_store(spark, sf, "events").df.select("event_id", "user_id", "ts")
    a = ev.select(F.col("event_id").alias("eid_a"), "user_id",
                  F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_id").alias("eid_b"), "user_id",
                  F.col("ts").alias("ts_b"))
    got = {(r["eid_a"], r["eid_b"]) for r in range_join(
        a, b, "ts_a", "ts_b", "5 minutes", on="user_id")
        .filter(F.col("eid_a") < F.col("eid_b")).collect()}

    con = duckdb.connect()
    want = set(map(tuple, con.execute(f"""
        SELECT a.event_id, b.event_id
        FROM '{sf}/events.parquet' a JOIN '{sf}/events.parquet' b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
        AND a.ts BETWEEN b.ts - INTERVAL 5 MINUTE AND b.ts + INTERVAL 5 MINUTE
    """).fetchall()))
    assert got == want and len(got) > 0


from pyspark.sql import functions as F  # noqa: E402
