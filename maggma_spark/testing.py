"""Store contract-test kit — run the shared Store semantics against ANY
backend implementation.

The reference validates each backend with a near-identical test file
(reference:tests/stores/test_mongolike.py, test_aws.py, test_azure.py,
...). This kit productizes that pattern: implement a new store, pass a
factory to `run_store_contract`, and the canonical semantics (criteria
matching, null-inclusive distinct, groupby missing-key drop, upsert
precedence, compound keys, remove semantics, incremental diff) are
asserted in one call.

Usage (pytest):

    def test_my_store_contract(spark, tmp_path):
        run_store_contract(lambda docs, key: MyStore(spark, ..., docs, key))

The factory receives (docs: list[Row-like], key: str) and must return a
connected, readable+writable store holding exactly those docs.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

OLD = dt.datetime(2024, 1, 1)
NEW = dt.datetime(2024, 2, 1)

CONTRACT_DOCS = [
    {"task_id": "mp-1", "a": 4, "d": 9, "tag": "x", "last_updated": OLD},
    {"task_id": "mp-2", "a": 5, "d": 9, "tag": None, "last_updated": OLD},
    {"task_id": "mp-3", "a": 6, "d": 10, "tag": "y", "last_updated": NEW},
    {"task_id": "mp-4", "a": 7, "d": None, "tag": "x", "last_updated": NEW},
]


def run_store_contract(factory: Callable, key: str = "task_id") -> None:
    store = factory(CONTRACT_DOCS, key)
    store.connect()

    # -- counts & criteria ----------------------------------------------
    assert store.count() == 4
    assert store.count({"a": {"$gte": 5}}) == 3
    assert store.count({"tag": None}) == 1            # null matches missing
    assert store.count({"tag": {"$ne": "x"}}) == 2    # $ne matches missing
    assert store.count({"$or": [{"a": 4}, {"d": {"$exists": False}}]}) == 2

    # -- projections & sort/limit ---------------------------------------
    rows = store.query({"d": 9}, properties=[key, "a"],
                       sort={"a": -1}).collect()
    assert [r["a"] for r in rows] == [5, 4]
    assert set(rows[0].asDict()) == {key, "a"}
    one = store.query_one({"a": 6})
    assert one[key] == "mp-3"

    # -- distinct (null-inclusive) --------------------------------------
    got = set(store.distinct("tag"))
    assert got == {"x", "y", None}

    # -- groupby (missing-key drop) -------------------------------------
    groups = dict(
        (g["d"], len(docs)) for g, docs in store.groupby_docs("d"))
    assert groups == {9: 2, 10: 1}

    # -- upsert ----------------------------------------------------------
    store.update([{"task_id": "mp-3", "a": 60, "d": 10, "tag": "y",
                   "last_updated": NEW},
                  {"task_id": "mp-9", "a": 9, "d": 11, "tag": "z",
                   "last_updated": NEW}])
    assert store.count() == 5
    assert store.query_one({"task_id": "mp-3"})["a"] == 60

    # -- watermark & incremental diff -----------------------------------
    assert store.last_updated == NEW
    newer = factory(
        [{"task_id": "mp-1", "a": 4, "d": 9, "tag": "x",
          "last_updated": dt.datetime(2024, 3, 1)}], key)
    stale = {r[0] for r in store.newer_in(newer, exhaustive=True).collect()}
    assert stale == {"mp-1"}

    # -- remove (only definite matches) ----------------------------------
    store.remove_docs({"d": 9})
    assert store.count() == 3
    assert store.count({"d": None}) == 1  # null-predicate rows survive
    store.close()
