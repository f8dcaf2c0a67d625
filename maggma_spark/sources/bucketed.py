"""BucketedTableStore — catalog tables bucketed on the key for
shuffle-free co-located joins.

The 100 TB join story: two datasets bucketed identically on their join
key hash-partition their FILES at write time; a join between them needs
NO exchange at read time (each task zips bucket i with bucket i). This
replaces the reference's `ensure_index` advice (reference:src/maggma/
builders/map_builder.py:67-86) — the columnar analog of a join index.

Mechanics: `bucketBy` requires a catalog table (`saveAsTable`); with the
default in-memory/Derby catalog, bucket metadata persists for the Spark
application's lifetime (a Hive metastore or a lakehouse format makes it
durable — deployment concern, same code). `sortBy` within buckets
additionally removes the sort from sort-merge plans.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from maggma_spark.operators.merge import remove_matching, upsert_by_key
from maggma_spark.store import SparkStore


class BucketedTableStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key: str = "task_id",
        last_updated_field: str = "last_updated",
        num_buckets: int = 64,
        **kwargs: Any,
    ):
        self.spark = spark
        self.table = table
        self.num_buckets = num_buckets
        super().__init__(lambda: spark.table(table), name=table, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _write(self, df: DataFrame, mode: str = "overwrite") -> None:
        keys = self.keys
        (
            df.write.mode(mode)
            .bucketBy(self.num_buckets, keys[0], *keys[1:])
            .sortBy(keys[0], *keys[1:])
            .format("parquet")
            .saveAsTable(self.table)
        )

    def update(self, docs: Any, key: Union[str, Sequence[str], None] = None) -> None:
        new = docs if isinstance(docs, DataFrame) else self.spark.createDataFrame(docs)
        if self.exists():
            old = self.df
            merged = upsert_by_key(old, new, key or self.key, self.last_updated_field)
            # break lineage before overwriting the table we read from
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = new
        self._write(merged)

    def remove_docs(self, criteria: dict) -> None:
        remaining = remove_matching(self.df, criteria).localCheckpoint(eager=True)
        self._write(remaining)
