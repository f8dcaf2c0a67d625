from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from maggma_spark.api.app import (
    SubmissionError,
    serve_submission_post,
    serve_submission_patch,
)
from maggma_spark.sources.memory import MemoryStore


TS = dt.datetime(2024, 1, 2, 3, 4, 5)


def _store(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "submission_id long, payload string")
    return MemoryStore(spark, df, key="submission_id", name="subs")


def test_post_initializes_state_history(spark):
    st = _store(spark)
    out = serve_submission_post(
        st, {"submission_id": 3, "payload": "gamma"}, now=TS)
    assert out["meta"] == "Submission successful"
    row = st.query_one(criteria={"submission_id": 3})
    assert row["payload"] == "gamma"
    assert row["state"] == ["submitted"]
    assert row["updated"] == [TS]
    # pre-existing docs got null state (schema widened), not ['submitted']
    assert st.query_one(criteria={"submission_id": 1})["state"] is None


def test_post_duplicate_check_rejects(spark):
    st = _store(spark)
    with pytest.raises(SubmissionError) as ei:
        serve_submission_post(
            st, {"submission_id": 1, "payload": "dup"},
            duplicate_fields_check=["submission_id"], now=TS)
    assert ei.value.status_code == 400
    assert "Duplicate" in ei.value.detail


def test_post_calculated_submission_id(spark):
    df = spark.createDataFrame(
        [("a", "alpha")], "submission_id string, payload string")
    st = MemoryStore(spark, df, key="submission_id", name="subs_str")
    serve_submission_post(
        st, {"payload": "delta"}, calculate_submission_id=True,
        submission_id="fixed-uuid", now=TS)
    row = st.query_one(criteria={"submission_id": "fixed-uuid"})
    assert row is not None and row["payload"] == "delta"
    # default path really generates a uuid
    out = serve_submission_post(
        st, {"payload": "eps"}, calculate_submission_id=True, now=TS)
    assert len(out["data"]["submission_id"]) == 36


def test_patch_sets_matching_only(spark):
    st = _store(spark)
    serve_submission_patch(st, {"submission_id": 1}, {"payload": "patched"})
    assert st.query_one(criteria={"submission_id": 1})["payload"] == "patched"
    assert st.query_one(criteria={"submission_id": 2})["payload"] == "beta"


def test_patch_new_field_widens_schema(spark):
    st = _store(spark)
    serve_submission_patch(st, {"submission_id": 2}, {"flag": True})
    assert st.query_one(criteria={"submission_id": 2})["flag"] is True
    assert st.query_one(criteria={"submission_id": 1})["flag"] is None


def test_post_then_patch_round_trip(spark):
    st = _store(spark)
    serve_submission_post(st, {"submission_id": 9, "payload": "p"}, now=TS)
    serve_submission_patch(
        st, {"submission_id": 9}, {"state": ["submitted", "completed"]})
    row = st.query_one(criteria={"submission_id": 9})
    assert row["state"] == ["submitted", "completed"]
    # untouched doc unaffected
    assert st.query_one(criteria={"submission_id": 1})["payload"] == "alpha"


def test_patch_dotted_path_sets_struct_leaf(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (2, {"a": 3, "b": 4})],
        "submission_id long, meta struct<a:long,b:long>")
    st = MemoryStore(df.sparkSession, df, key="submission_id", name="s2")
    serve_submission_patch(st, {"submission_id": 1}, {"meta.b": 99})
    assert st.query_one(criteria={"submission_id": 1})["meta"]["b"] == 99
    assert st.query_one(criteria={"submission_id": 2})["meta"]["b"] == 4


def test_parquet_store_update_matching(spark, tmp_path):
    from maggma_spark.sources.parquet import ParquetStore

    path = str(tmp_path / "subs.parquet")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "submission_id long, payload string"
    ).write.parquet(path)
    st = ParquetStore(spark, path, name="subs", key="submission_id")
    st.update_matching({"submission_id": 2}, {"payload": "z"})
    assert st.query_one(criteria={"submission_id": 2})["payload"] == "z"
    assert st.query_one(criteria={"submission_id": 1})["payload"] == "x"


def test_apply_update_operators(spark):
    from maggma_spark.operators.merge import apply_update_operators

    df = spark.createDataFrame(
        [(1, 10, ["a"]), (2, None, None), (3, 5, ["x", "y"])],
        "id long, score long, tags array<string>")
    out = apply_update_operators(
        df, {"id": {"$lte": 2}},
        {"$inc": {"score": 3}, "$push": {"tags": "new"},
         "$set": {"flag": True}})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] == 13 and rows[1]["tags"] == ["a", "new"]
    assert rows[2]["score"] == 3 and rows[2]["tags"] == ["new"]  # null -> 0/[]
    assert rows[3]["score"] == 5 and rows[3]["tags"] == ["x", "y"]
    assert rows[1]["flag"] is True and rows[3]["flag"] is None

    out2 = apply_update_operators(df, {"id": 1}, {"$unset": ["score"]})
    r2 = {r["id"]: r["score"] for r in out2.collect()}
    assert r2[1] is None and r2[3] == 5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported update"):
        apply_update_operators(df, {}, {"$bit": {"score": {"and": 2}}})


def test_store_update_matching_operator_dialect(spark):
    st = MemoryStore(
        spark,
        spark.createDataFrame([(1, 5), (2, 7)], "submission_id long, n long"),
        key="submission_id")
    st.update_matching({"submission_id": 1}, {"$inc": {"n": 10},
                                              "$set": {"state": "bumped"}})
    assert st.query_one(criteria={"submission_id": 1})["n"] == 15
    assert st.query_one(criteria={"submission_id": 2})["n"] == 7
    assert st.query_one(criteria={"submission_id": 2})["state"] is None
