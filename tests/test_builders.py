"""Builder end-to-end pipelines on MemoryStores (reference:tests/builders/
test_copy_builder.py, test_group_builder.py, test_projection_builder.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from maggma_spark.operators.builders import (
    CopyBuilder,
    GroupBuilder,
    MapBuilder,
    ProjectionBuilder,
)
from maggma_spark.sources.memory import MemoryStore

OLD = dt.datetime(2024, 1, 1)
NEW = dt.datetime(2024, 2, 1)


@pytest.fixture()
def src_tgt(spark):
    src = MemoryStore(
        spark,
        [Row(k=i, last_updated=(NEW if i < 3 else OLD), v="new" if i < 3 else "old")
         for i in range(10)],
        name="src", key="k")
    tgt = MemoryStore(
        spark,
        [Row(k=i, last_updated=OLD, v="old") for i in range(8)],
        name="tgt", key="k")
    return src, tgt


def test_copy_builder_incremental(spark, src_tgt):
    src, tgt = src_tgt
    b = CopyBuilder(src, tgt)
    # stale = updated (0,1,2) + new (8,9)
    assert sorted(r["k"] for r in b.stale_keys().collect()) == [0, 1, 2, 8, 9]
    b.run()
    assert tgt.count() == 10
    assert tgt.query_one({"k": 1})["v"] == "new"
    assert tgt.query_one({"k": 5})["v"] == "old"
    # second run: nothing stale
    assert b.stale_keys().count() == 0


def test_copy_builder_delete_orphans(spark, src_tgt):
    src, tgt = src_tgt
    tgt.update([Row(k=99, last_updated=OLD, v="orphan")])
    CopyBuilder(src, tgt, delete_orphans=True).run()
    assert tgt.count({"k": 99}) == 0
    assert tgt.count() == 10


def test_map_builder_ufn_and_errors(spark, src_tgt):
    src, tgt2 = src_tgt
    tgt = MemoryStore(spark, None, name="t2", key="k",
                     schema="k long, doubled long, state string, error string, _bt timestamp, last_updated timestamp")

    def fn(doc):
        if doc["k"] == 2:
            raise ValueError("boom")
        return {"doubled": doc["k"] * 2, "last_updated": doc["last_updated"]}

    b = MapBuilder(src, tgt, ufn=fn,
                   output_schema="doubled long, last_updated timestamp")
    b.run()
    assert tgt.count() == 10
    assert tgt.query_one({"k": 4})["doubled"] == 8
    failed = tgt.query_one({"state": "failed"})
    assert failed["k"] == 2 and "boom" in failed["error"]


def test_map_builder_retry_failed(spark, src_tgt):
    src, _ = src_tgt
    tgt = MemoryStore(
        spark,
        [Row(k=i, last_updated=NEW, state=("failed" if i == 5 else "successful"))
         for i in range(10)],
        name="t", key="k")
    b = MapBuilder(src, tgt, retry_failed=True)
    assert 5 in {r["k"] for r in b.stale_keys().collect()}
    b2 = MapBuilder(src, tgt, retry_failed=False)
    assert 5 not in {r["k"] for r in b2.stale_keys().collect()}


def test_group_builder(spark):
    src = MemoryStore(
        spark,
        [Row(k=i, g=i % 3, val=float(i), last_updated=OLD) for i in range(9)],
        name="src", key="k")
    tgt = MemoryStore(spark, None, name="tgt", key="g",
                     schema="g long, total double, ks array<long>, last_updated timestamp, state string, error string")

    def fn(docs):
        return {"total": sum(d["val"] for d in docs)}

    GroupBuilder(src, tgt, ["g"], fn, "total double").run()
    assert tgt.count() == 3
    row = tgt.query_one({"g": 0})
    assert row["total"] == 0.0 + 3 + 6
    assert row["ks"] == [0, 3, 6]


def test_projection_builder(spark):
    s1 = MemoryStore(spark, [Row(task_id=i, a=i, shared=f"s1-{i}") for i in range(5)],
                     name="s1", key="task_id")
    s2 = MemoryStore(spark, [Row(task_id=i, b=i * 2, shared=f"s2-{i}") for i in range(3, 8)],
                     name="s2", key="task_id")
    tgt = MemoryStore(spark, None, name="tgt", key="task_id",
                     schema="task_id long, a long, b long, shared string")
    ProjectionBuilder([s1, s2], tgt).run()
    assert tgt.count() == 8  # full outer: 0..7
    r4 = tgt.query_one({"task_id": 4})
    assert r4["a"] == 4 and r4["b"] == 8 and r4["shared"] == "s2-4"  # last wins
    r1 = tgt.query_one({"task_id": 1})
    assert r1["a"] == 1 and r1["b"] is None and r1["shared"] == "s1-1"


def test_projection_builder_rename(spark):
    s1 = MemoryStore(spark, [Row(task_id=1, raw=10)], name="s1", key="task_id")
    s2 = MemoryStore(spark, [Row(task_id=1, other=20)], name="s2", key="task_id")
    tgt = MemoryStore(spark, None, name="tgt", key="task_id",
                     schema="task_id long, x long, y long")
    ProjectionBuilder([s1, s2], tgt,
                      fields_to_project=[{"raw": "x"}, {"other": "y"}]).run()
    row = tgt.query_one({"task_id": 1})
    assert row["x"] == 10 and row["y"] == 20


def test_map_builder_projection_keeps_key(spark, src_tgt):
    # a user projection without the key/watermark still works: they are
    # forced into the scan (reference map_builder.py:120-123)
    src, _ = src_tgt
    tgt = MemoryStore(spark, None, name="tp", key="k",
                      schema="k long, vlen int, state string, error string, _bt timestamp")
    b = MapBuilder(src, tgt, ufn=lambda d: {"vlen": len(d["v"])},
                   output_schema="vlen int", projection=["v"])
    b.run()
    assert tgt.count() == 10
    assert tgt.query_one({"k": 0})["vlen"] == 3


def test_group_builder_drops_null_keys(spark):
    src = MemoryStore(
        spark,
        [Row(k=1, g=1, val=1.0, last_updated=OLD),
         Row(k=2, g=None, val=2.0, last_updated=OLD),
         Row(k=3, g=1, val=3.0, last_updated=OLD)],
        name="src", key="k")
    tgt = MemoryStore(spark, None, name="tgt", key="g",
                      schema="g long, total double, ks array<long>, "
                             "last_updated timestamp, state string, error string")
    GroupBuilder(src, tgt, ["g"], lambda docs: {
        "total": sum(d["val"] for d in docs)}, "total double").run()
    assert tgt.count() == 1  # the null-keyed doc is dropped
    assert tgt.query_one({"g": 1})["total"] == 4.0


def test_group_builder_max_group_rows_guard(spark):
    """A group above max_group_rows fails fast with guidance instead of
    silently OOMing the executor (the reference contract materializes
    whole groups in one task)."""
    src = MemoryStore(spark, [Row(task_id=i, g=0, v=float(i)) for i in range(50)],
                      name="src", key="task_id")
    tgt = MemoryStore(spark, None, name="tgt", key="g",
                      schema="g long, total double, task_ids array<long>, state string, error string")
    gb = GroupBuilder(src, tgt, ["g"],
                      lambda docs: {"total": sum(d["v"] for d in docs)},
                      "total double", max_group_rows=10)
    with pytest.raises(Exception, match="max_group_rows"):
        gb.run()
        tgt.count()  # MemoryStore.update is lazy; force the job
    # cap disabled -> runs (fresh target: the poisoned lazy update above
    # stays chained in the old store's plan)
    tgt2 = MemoryStore(spark, None, name="tgt2", key="g",
                       schema="g long, total double, task_ids array<long>, state string, error string")
    GroupBuilder(src, tgt2, ["g"],
                 lambda docs: {"total": sum(d["v"] for d in docs)},
                 "total double", max_group_rows=None).run()
    assert tgt2.query_one({"g": 0})["total"] == sum(range(50))
