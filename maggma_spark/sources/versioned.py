"""VersionedParquetStore — immutable-version publish with time travel.

Beyond-reference capability: the reference mutates its backing
collection in place; a 100 TB pipeline wants the lakehouse write
discipline instead — every update PUBLISHES a new immutable version
directory, readers pin a version (or take the latest) and never see a
half-written dataset, old versions stay queryable for debugging /
reproducibility / incremental diffing, and cleanup is an explicit
`vacuum`. This is the Delta/Iceberg snapshot pattern re-expressed on
plain parquet:

    <path>/v=00001/part-*.parquet
    <path>/v=00002/part-*.parquet     <- latest wins

- **atomic publish**: each version writes to `<path>/.staging-N`, then a
  single directory rename makes it visible — readers list committed
  `v=` directories only, so a crashed writer leaves garbage but never a
  truncated "latest".
- **time travel**: `df_at(version)` / `as_of` reads any retained
  version; `diff(v_old, v_new)` is the CDC delta via snapshot_diff
  (insert/update/delete rows).
- **scale**: versions share nothing (plain directories), so publish
  cost is the merged-frame write — the same cost ParquetStore.update
  already pays — and old-version reads are ordinary pruned parquet
  scans. On object stores the rename is the store's atomic-list unit.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from maggma_spark.operators.merge import (
    remove_matching,
    set_matching,
    snapshot_diff,
    upsert_by_key,
)
from maggma_spark.store import SparkStore

_V_RE = re.compile(r"^v=(\d{5})$")


class VersionedParquetStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        name: str = "versioned",
        key: Union[str, Sequence[str]] = "task_id",
        last_updated_field: str = "last_updated",
        **kwargs: Any,
    ):
        if "://" in path:
            raise ValueError(
                "VersionedParquetStore currently supports local paths; "
                "object-store version listing needs the Hadoop FS API — "
                "use a lakehouse table format there instead")
        self.spark = spark
        self.path = path
        super().__init__(lambda: self._read(self.latest_version()),
                         name=name, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    # -- version bookkeeping --------------------------------------------
    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for entry in os.listdir(self.path):
            m = _V_RE.match(entry)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> Optional[int]:
        vs = self.versions()
        return vs[-1] if vs else None

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version:05d}")

    def _read(self, version: Optional[int]) -> DataFrame:
        if version is None:
            raise ValueError(f"{self.name!r} has no published versions yet")
        if version not in self.versions():
            raise ValueError(
                f"version {version} not found (have {self.versions()})")
        return self.spark.read.parquet(self._vdir(version))

    def df_at(self, version: int) -> DataFrame:
        """Time travel: the dataset exactly as published at `version`."""
        return self._read(version)

    def _publish(self, df: DataFrame) -> int:
        nxt = (self.latest_version() or 0) + 1
        os.makedirs(self.path, exist_ok=True)
        staging = os.path.join(self.path, f".staging-{nxt:05d}")
        df.write.mode("overwrite").parquet(staging)
        os.replace(staging, self._vdir(nxt))
        return nxt

    # -- write surface: every write publishes a NEW version -------------
    def update(self, docs: Any, key: Union[list[str], str, None] = None) -> None:
        new = docs if isinstance(docs, DataFrame) else (
            self.spark.createDataFrame([docs] if isinstance(docs, dict)
                                       else docs))
        old = self._read(self.latest_version()) if self.versions() else None
        merged = upsert_by_key(old, new, key or self.key,
                               self.last_updated_field)
        self._publish(merged)

    def remove_docs(self, criteria: dict) -> None:
        self._publish(remove_matching(self.df, criteria))

    def update_matching(self, criteria: dict, updates: dict) -> None:
        self._publish(set_matching(self.df, criteria, updates))

    def diff(self, v_old: int, v_new: Optional[int] = None) -> DataFrame:
        """CDC delta between two published versions:
        (key, change_type in {insert, update, delete})."""
        v_new = v_new if v_new is not None else self.latest_version()
        return snapshot_diff(self._read(v_old), self._read(v_new), self.key)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest `keep_last` versions (and any crashed
        staging directories). Returns the versions removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        drop = vs[:-keep_last]
        for v in drop:
            shutil.rmtree(self._vdir(v), ignore_errors=True)
        for entry in os.listdir(self.path) if os.path.isdir(self.path) else []:
            if entry.startswith(".staging-"):
                shutil.rmtree(os.path.join(self.path, entry),
                              ignore_errors=True)
        return drop

    def as_spec(self) -> dict:
        return {
            "@class": "maggma_spark.sources.versioned.VersionedParquetStore",
            "path": self.path, "name": self.name, "key": self.key,
            "last_updated_field": self.last_updated_field,
        }
