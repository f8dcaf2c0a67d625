"""MemoryStore — in-session store over a cached DataFrame.

Reference parity: MemoryStore (mongomock-backed,
reference:src/maggma/stores/mongolike.py:506-604). Here the "memory" is a
Spark DataFrame (optionally cached) — still distributed across executors,
so a "MemoryStore" holding 1 TB is fine on a real cluster; nothing lives
on the driver.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from maggma_spark.operators.merge import (
    remove_matching,
    set_matching,
    upsert_by_key,
)
from maggma_spark.store import SparkStore


class MemoryStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        data: Union[DataFrame, list, None] = None,
        name: str = "memory",
        key: str = "task_id",
        last_updated_field: str = "last_updated",
        schema: Any = None,
        cache: bool = False,
        **kwargs: Any,
    ):
        self.spark = spark
        self._cache = cache
        if data is not None:
            df = self._coerce(data, schema)
        elif schema is not None:
            # empty store with a declared schema (builder targets start
            # this way before their first update)
            df = spark.createDataFrame([], schema=schema)
        else:
            df = None
        self._df: Optional[DataFrame] = df
        super().__init__(lambda: self._require_df(), name=name, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    def _coerce(self, data: Union[DataFrame, dict, list], schema: Any) -> DataFrame:
        if isinstance(data, DataFrame):
            return data
        if isinstance(data, dict):  # single doc, reference:mongolike.py:383
            data = [data]
        return self.spark.createDataFrame(data, schema=schema)

    def _require_df(self) -> DataFrame:
        if self._df is None:
            raise ValueError(f"MemoryStore {self.name!r} holds no data yet")
        return self._df

    _LINEAGE_CHECKPOINT_EVERY = 16

    def _set(self, df: DataFrame) -> None:
        if self._cache and self._df is not None:
            self._df.unpersist()
        # every update chains a window+union onto the plan; a builder
        # loop issuing hundreds of updates would grow the logical plan
        # (and analysis time) without bound — truncate lineage
        # periodically
        self._mutations = getattr(self, "_mutations", 0) + 1
        if self._mutations % self._LINEAGE_CHECKPOINT_EVERY == 0:
            df = df.localCheckpoint(eager=False)
        self._df = df.cache() if self._cache else df

    # -- write surface ---------------------------------------------------
    def update(self, docs: Any, key: Union[str, Sequence[str], None] = None) -> None:
        """Upsert by key (reference:src/maggma/stores/mongolike.py:372-406)."""
        new = self._coerce(docs, None)
        self._set(upsert_by_key(self._df, new, key or self.key, self.last_updated_field))

    def remove_docs(self, criteria: dict) -> None:
        self._set(remove_matching(self._require_df(), criteria))

    def update_matching(self, criteria: dict, updates: dict) -> None:
        """update_many analog (reference:src/maggma/api/resource/
        submission.py:372-375, set-based): a plain dict is $set; a dict
        of $-operators ($set/$inc/$unset/$rename/$push) applies the
        Mongo update dialect."""
        df = self._require_df()
        if any(k.startswith("$") for k in updates):
            from maggma_spark.operators.merge import apply_update_operators

            self._set(apply_update_operators(df, criteria, updates))
        else:
            self._set(set_matching(df, criteria, updates))
