"""Compound-store view tests (reference:tests/stores/
test_compound_stores.py, test_advanced_stores.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from maggma_spark.operators.compound import (
    AliasingStore,
    ConcatStore,
    JointStore,
    SandboxStore,
)
from maggma_spark.sources.memory import MemoryStore


@pytest.fixture()
def ab_stores(spark):
    # FIXTURES.md A5: a.json i=0..9, b.json i=10..19
    a = MemoryStore(spark, [Row(task_id=i, A=i) for i in range(10)],
                    name="a", key="task_id")
    b = MemoryStore(spark, [Row(task_id=i, B=i) for i in range(10, 20)],
                    name="b", key="task_id")
    return a, b


def test_joint_store_left_join(spark, ab_stores):
    a, b = ab_stores
    overlap = MemoryStore(spark, [Row(task_id=i, B=i * 10) for i in range(5, 15)],
                          name="b", key="task_id")
    js = JointStore([a, overlap], main="a", key="task_id")
    rows = {r["task_id"]: r.asDict(recursive=True) for r in js.df.collect()}
    assert len(rows) == 10  # left join keeps all of main
    assert rows[7]["b"] == {"B": 70}
    assert rows[2]["b"] is None  # unmatched main rows kept ($unwind preserveNull)


def test_joint_store_merge_at_root(spark):
    main = MemoryStore(spark, [Row(task_id=1, x=1, shared="main")], name="m", key="task_id")
    other = MemoryStore(spark, [Row(task_id=1, y=2, shared="other")], name="o", key="task_id")
    js = JointStore([main, other], main="m", key="task_id", merge_at_root=True)
    row = js.df.collect()[0].asDict()
    assert row["x"] == 1 and row["y"] == 2
    assert row["shared"] == "main"  # ROOT wins per $mergeObjects order


def test_concat_store(spark, ab_stores):
    a, b = ab_stores
    cs = ConcatStore([a, b], key="task_id")
    assert cs.count() == 20
    # disjoint schemas: A null for b-rows
    assert cs.count({"A": {"$exists": True}}) == 10
    assert sorted(cs.distinct("task_id")) == list(range(20))
    # skip/sort/limit work (broken in the reference, compound_stores.py:446)
    rows = cs.query(sort={"task_id": -1}, skip=2, limit=3).collect()
    assert [r["task_id"] for r in rows] == [17, 16, 15]


def test_aliasing_store(spark):
    inner = MemoryStore(spark, [Row(task_id=1, internal=5)], name="i", key="task_id")
    al = AliasingStore(inner, {"internal": "public"})
    assert al.query_one({"public": 5})["public"] == 5
    assert "internal" not in al.df.columns
    al.update([Row(task_id=2, public=7)])
    assert inner.query_one({"task_id": 2})["internal"] == 7
    al.remove_docs({"public": 5})
    assert inner.count() == 1


def test_sandbox_store(spark):
    docs = [Row(task_id=1, v=1, sbxn=["core"]), Row(task_id=2, v=2, sbxn=["other"]),
            Row(task_id=3, v=3, sbxn=None)]
    inner = MemoryStore(spark, docs, name="i", key="task_id")
    sb = SandboxStore(inner, "core")
    assert sorted(r["task_id"] for r in sb.df.collect()) == [1, 3]
    sb.update([Row(task_id=4, v=4)])
    assert inner.query_one({"task_id": 4})["sbxn"] == ["core"]
    sb.remove_docs({"v": {"$gte": 0}})
    # only core-visible rows removed; 'other' row remains
    assert sorted(r["task_id"] for r in inner.df.collect()) == [2]


def test_aliasing_store_dotted(spark):
    inner = MemoryStore(
        spark,
        [Row(task_id=1, g=Row(h=7, z=9), other=1)],
        name="i", key="task_id")
    al = AliasingStore(inner, {"g.h": "h_exposed"})
    row = al.df.collect()[0].asDict(recursive=True)
    assert row["h_exposed"] == 7
    assert row["g"] == {"z": 9}  # sibling survives, moved leaf unset
    assert al.query_one({"h_exposed": {"$gte": 5}})["task_id"] == 1
    # write-back folds the exposed flat field into the nested path
    # (pydash set_ semantics; doc replaces stored one wholesale)
    al.update([Row(task_id=2, h_exposed=11)])
    got = inner.query_one({"task_id": 2})
    assert got["g"]["h"] == 11 and got["g"]["z"] is None
    # when the incoming doc carries the struct too, the leaf is replaced
    # and its siblings from the doc survive
    al.update([Row(task_id=3, g=Row(h=0, z=5), h_exposed=13)])
    got3 = inner.query_one({"task_id": 3})
    assert got3["g"]["h"] == 13 and got3["g"]["z"] == 5
    # round-trip through the aliased read view
    assert al.query_one({"h_exposed": 13})["task_id"] == 3


def test_joint_store_criteria_on_joined_struct(spark, ab_stores):
    a, _ = ab_stores
    other = MemoryStore(spark, [Row(task_id=i, B=i * 10) for i in range(5, 15)],
                        name="b", key="task_id")
    js = JointStore([a, other], main="a", key="task_id")
    # dotted-path criteria reach into the joined struct column
    got = sorted(r["task_id"] for r in js.query(
        criteria={"b.B": {"$gte": 80}}).collect())
    assert got == [8, 9]
    # and $exists distinguishes matched from unmatched rows
    assert js.count({"b": {"$exists": False}}) == 5
