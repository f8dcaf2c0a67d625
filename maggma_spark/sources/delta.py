"""DeltaStore — transactional lakehouse store (delta-spark backed).

The parquet stores rewrite data on update (stage-and-swap or dynamic
partition overwrite — `sources/parquet.py` documents why). A Delta
table replaces those rewrites with REAL transactional operations:
`update()` is `MERGE INTO` (matched keys update in place, new keys
insert, schema evolution merges new columns), `remove_docs` /
`update_matching` are transactional `DELETE` / `UPDATE`, and
concurrent readers always see a consistent snapshot — the lakehouse
answer to the reference's live-database write-through semantics
(reference:src/maggma/stores/mongolike.py:383 update;
aws.py:190-216 S3Store writes). At 100 TB, MERGE touches only the
files containing matched keys (data skipping on the join condition)
instead of the partition- or table-scale rewrites of plain parquet.

The `delta-spark` package is optional and NOT part of this build's
baked-in environment: the import is gated, construction raises a
clear ImportError where it is absent, and the contract suite skips.
Everything here follows the public Delta Lake Python API
(delta.tables.DeltaTable) only.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from maggma_spark.store import SparkStore


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def configure_delta_session(builder):
    """Apply the two session configs Delta needs
    (sql.extensions + catalog); returns the builder. Use together with
    `delta.configure_spark_with_delta_pip(builder)` when building a
    session from scratch."""
    return (builder
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog"))


class DeltaStore(SparkStore):
    """Path-backed Delta table with the standard Store surface.

    update(): MERGE INTO on the (compound) key with
    whenMatchedUpdateAll / whenNotMatchedInsertAll and automatic
    schema merge — the transactional equivalent of upsert_by_key.
    remove_docs(): transactional DELETE with the compiled criteria.
    update_matching(): transactional UPDATE ($set-style only; the
    $-operator dialect routes through the generic rewrite).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        name: str = "delta",
        key: str = "task_id",
        last_updated_field: str = "last_updated",
        **kwargs: Any,
    ):
        if not delta_available():
            raise ImportError(
                "DeltaStore requires the optional `delta-spark` "
                "package (pip install 'maggma-spark[delta]') and a "
                "Delta-enabled SparkSession (see "
                "configure_delta_session); the ParquetStore upsert "
                "path is the non-transactional fallback")
        self.spark = spark
        self.path = path
        super().__init__(self._read, name=name, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    # -- IO --------------------------------------------------------------
    def _read(self) -> DataFrame:
        return self.spark.read.format("delta").load(self.path)

    def exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def as_spec(self) -> dict:
        return {
            "@class": "maggma_spark.sources.delta.DeltaStore",
            "path": self.path,
            "key": self.key,
            "last_updated_field": self.last_updated_field,
        }

    def _coerce(self, docs: Any) -> DataFrame:
        if isinstance(docs, DataFrame):
            return docs
        if isinstance(docs, dict):
            docs = [docs]
        return self.spark.createDataFrame(docs)

    # -- write surface ---------------------------------------------------
    def update(self, docs: Any,
               key: Union[str, Sequence[str], None] = None) -> None:
        from delta.tables import DeltaTable

        new = self._coerce(docs)
        keys = key or self.key
        keys = [keys] if isinstance(keys, str) else list(keys)
        # within-batch dedup first: MERGE requires a unique source key
        # (multiple source matches for one target row is an error);
        # keep the newest doc per key, same rule as upsert_by_key
        if self.last_updated_field in new.columns:
            from maggma_spark.operators.merge import latest_per_key

            new = latest_per_key(new, keys, self.last_updated_field)
        else:
            new = new.dropDuplicates(keys)
        if not self.exists():
            new.write.format("delta").mode("overwrite").save(self.path)
            return
        # schema evolution: new columns in the batch merge into the
        # table schema instead of erroring
        self.spark.conf.set(
            "spark.databricks.delta.schema.autoMerge.enabled", "true")
        tgt = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (tgt.alias("t").merge(new.alias("s"), cond)
         .whenMatchedUpdateAll()
         .whenNotMatchedInsertAll()
         .execute())

    def remove_docs(self, criteria: dict) -> None:
        from delta.tables import DeltaTable

        from maggma_spark.functions.criteria import compile_criteria

        tgt = DeltaTable.forPath(self.spark, self.path)
        tgt.delete(compile_criteria(criteria, schema=self.df.schema))

    def update_matching(self, criteria: dict, updates: dict) -> None:
        from delta.tables import DeltaTable

        from maggma_spark.functions.criteria import compile_criteria

        if any(k.startswith("$") for k in updates):
            # $-operator dialect needs the projection rewrite; fall
            # back to a full transactional overwrite of the rewritten
            # frame (still snapshot-isolated)
            from maggma_spark.operators.merge import (
                apply_update_operators,
            )

            out = apply_update_operators(self.df, criteria, updates)
            out.write.format("delta").mode("overwrite") \
                .option("overwriteSchema", "true").save(self.path)
            return
        from pyspark.sql import functions as F

        tgt = DeltaTable.forPath(self.spark, self.path)
        tgt.update(
            condition=compile_criteria(criteria, schema=self.df.schema),
            set={k: F.lit(v) for k, v in updates.items()})

    def compact(self, target_file_mb: int = 128) -> None:
        """Delta OPTIMIZE (bin-packing compaction)."""
        from delta.tables import DeltaTable

        DeltaTable.forPath(self.spark, self.path).optimize() \
            .executeCompaction()

    def vacuum(self, retention_hours: float = 168.0) -> None:
        from delta.tables import DeltaTable

        DeltaTable.forPath(self.spark, self.path).vacuum(retention_hours)
