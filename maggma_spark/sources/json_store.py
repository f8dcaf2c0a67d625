"""JSONStore — one or more JSON files as a store, with optional
write-back.

Reference parity: JSONStore (reference:src/maggma/stores/
mongolike.py:606-797; write-back `update_json_file` :762-775). Reads both
JSON-lines and multi-line (array-of-objects) files; `file_writable=True`
rewrites the backing file on update/remove — kept single-file
(`coalesce(1)`) for the reference's one-file contract, which is a
driver-visible small-store convenience, NOT the scale path (use
ParquetStore for that).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from maggma_spark.operators.merge import remove_matching, upsert_by_key
from maggma_spark.store import SparkStore


class JSONStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        paths: Union[str, Sequence[str]],
        name: str = "json",
        key: str = "task_id",
        last_updated_field: str = "last_updated",
        file_writable: bool = False,
        multiline: Optional[bool] = None,
        **kwargs: Any,
    ):
        self.spark = spark
        self.paths = [paths] if isinstance(paths, str) else list(paths)
        self.file_writable = file_writable
        if file_writable and len(self.paths) != 1:
            raise ValueError("file_writable requires exactly one path "
                             "(reference:src/maggma/stores/mongolike.py:648-653)")
        self.multiline = multiline
        super().__init__(self._read, name=name, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    def _detect_multiline(self) -> bool:
        """A file starting with '[' is an array-of-objects document."""
        for p in self.paths:
            for f in sorted(glob.glob(p)) or [p]:
                if os.path.isfile(f):
                    with open(f, "rb") as fh:
                        head = fh.read(64).lstrip()
                    return head.startswith(b"[")
        return False

    def _read(self) -> DataFrame:
        ml = self.multiline if self.multiline is not None else self._detect_multiline()
        return self.spark.read.option("multiLine", ml).json(self.paths)

    def _coerce(self, docs: Any) -> DataFrame:
        return docs if isinstance(docs, DataFrame) else self.spark.createDataFrame(docs)

    def _writeback(self, df: DataFrame) -> None:
        if not self.file_writable:
            raise NotImplementedError(
                "JSONStore is read-only unless file_writable=True")
        target = self.paths[0]
        staging = target + ".__staging"
        df.coalesce(1).write.mode("overwrite").json(staging)
        part = [f for f in os.listdir(staging) if f.startswith("part-")][0]
        os.replace(os.path.join(staging, part), target)
        import shutil

        shutil.rmtree(staging)

    def update(self, docs: Any, key: Union[str, Sequence[str], None] = None) -> None:
        old = self._read() if any(os.path.exists(p) for p in self.paths) else None
        merged = upsert_by_key(old, self._coerce(docs), key or self.key,
                               self.last_updated_field)
        self._writeback(merged)

    def remove_docs(self, criteria: dict) -> None:
        self._writeback(remove_matching(self._read(), criteria))
