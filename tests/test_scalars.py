"""Scalar helper parity tests (reference:tests/test_utils.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from maggma_spark.functions.scalars import (
    merge_structs,
    obj_hash,
    to_dt,
    to_isoformat_ceil_ms,
)


def test_to_isoformat_ceil_ms(spark):
    df = spark.createDataFrame([
        Row(i=1, ts=dt.datetime(2024, 1, 1, 12, 0, 0, 123000)),  # exact ms
        Row(i=2, ts=dt.datetime(2024, 1, 1, 12, 0, 0, 123001)),  # ceils up
        Row(i=3, ts=dt.datetime(2024, 1, 1, 12, 0, 0, 999999)),  # rolls second
    ])
    got = {r["i"]: r["iso"] for r in df.select(
        "i", to_isoformat_ceil_ms("ts").alias("iso")).collect()}
    assert got[1] == "2024-01-01T12:00:00.123"
    assert got[2] == "2024-01-01T12:00:00.124"
    assert got[3] == "2024-01-01T12:00:01.000"
    # round-trips through to_dt
    rt = df.select("i", to_dt(to_isoformat_ceil_ms("ts")).alias("back")).collect()
    assert all(r["back"] is not None for r in rt)


def test_obj_hash_stability(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=1, b="x"), Row(a=2, b="y")])
    hashes = [r["h"] for r in df.select(obj_hash("a", "b").alias("h")).collect()]
    assert hashes[0] == hashes[1] != hashes[2]
    assert len(hashes[0]) == 40  # sha1 hex


def test_merge_structs(spark):
    schema_ddl = ("base struct<x:int,nested:struct<p:int,q:int>,only_base:string>, "
                  "patch struct<x:int,nested:struct<p:int,q:int>,only_base:string>")
    df = spark.createDataFrame([Row(
        base=Row(x=1, nested=Row(p=10, q=20), only_base="b"),
        patch=Row(x=2, nested=Row(p=None, q=99), only_base=None),
    )], schema=schema_ddl)
    schema = df.schema["base"].dataType
    out = df.select(
        merge_structs(F.col("base"), F.col("patch"), schema).alias("m")
    ).collect()[0]["m"].asDict(recursive=True)
    assert out["x"] == 2                    # patch wins
    assert out["nested"]["p"] == 10         # null patch leaf -> base
    assert out["nested"]["q"] == 99         # nested patch wins
    assert out["only_base"] == "b"          # missing in patch -> base
