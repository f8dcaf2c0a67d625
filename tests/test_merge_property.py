"""Property-based upsert invariants: for ANY old/new doc sets, the merged
store is key-unique, new docs win, and untouched old docs survive."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from maggma_spark.operators.merge import upsert_by_key

docs = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 10**6)),
    min_size=0, max_size=25,
).map(lambda lst: [{"k": k, "v": v, "src": None} for k, v in lst])


@given(old=docs, new=docs)
def test_upsert_invariants(spark, old, new):
    for d in old:
        d["src"] = "old"
    for d in new:
        d["src"] = "new"
    schema = "k bigint, v bigint, src string"
    old_df = spark.createDataFrame(old, schema=schema) if old else None
    new_df = spark.createDataFrame(new, schema=schema)
    if not new and old_df is None:
        return
    merged = upsert_by_key(old_df, new_df, "k").collect()

    keys = [r["k"] for r in merged]
    assert len(keys) == len(set(keys)), "merged store must be key-unique"
    new_keys = {d["k"] for d in new}
    old_keys = {d["k"] for d in old}
    assert set(keys) == new_keys | old_keys
    for r in merged:
        if r["k"] in new_keys:
            assert r["src"] == "new", "new docs must win on key clash"
        else:
            assert r["src"] == "old", "untouched old docs must survive"
