"""BlobStore — binary payloads + searchable metadata in one columnar
table (the GridFS pattern, collapsed).

Reference parity: GridFSStore / GridFSURIStore (reference:src/maggma/
stores/gridfs.py:41,441): blobs in chunks + a `files` metadata collection,
queries auto-prefixed with `metadata.` (reference:src/maggma/stores/
gridfs.py:188-203), only the newest upload kept per key
(reference:src/maggma/stores/gridfs.py:404-409).

Spark-first collapse: ONE parquet table with a BinaryType `payload`
column and a `metadata` struct. Criteria arrive in the reference's
dialect (bare field names refer to metadata fields) and are rewritten to
`metadata.`-prefixed paths unless they name a reserved top-level column —
the same transform_criteria contract. Column pruning means metadata-only
queries never touch payload bytes (the "index-only" path is free);
newest-per-key is the upsert window.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from maggma_spark.sources.parquet import ParquetStore

RESERVED = {"payload", "uploadDate", "length", "md5"}


def _prefix_criteria(criteria: dict, key: str) -> dict:
    """Bare metadata field names -> metadata.<field> paths
    (reference:src/maggma/stores/gridfs.py:188-203)."""
    out: dict = {}
    for k, v in criteria.items():
        if k in ("$and", "$or", "$nor"):
            out[k] = [_prefix_criteria(c, key) for c in v]
        elif k.startswith("$") or k == key or k in RESERVED or k.startswith("metadata."):
            out[k] = v
        else:
            out[f"metadata.{k}"] = v
    return out


class BlobStore(ParquetStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "task_id",
        searchable_fields: Optional[Sequence[str]] = None,
        **kwargs: Any,
    ):
        kwargs.setdefault("last_updated_field", "uploadDate")
        super().__init__(spark, path, name=f"blob://{path}", key=key, **kwargs)
        self.searchable_fields = list(searchable_fields or [])

    def query(self, criteria: Optional[dict] = None, *args: Any, **kwargs: Any) -> DataFrame:
        if criteria:
            criteria = _prefix_criteria(criteria, self.key)
        return super().query(criteria, *args, **kwargs)

    def count(self, criteria: Optional[dict] = None) -> int:
        return super().count(_prefix_criteria(criteria, self.key) if criteria else None)

    def distinct_df(self, field: str, criteria: Optional[dict] = None) -> DataFrame:
        if field != self.key and field not in RESERVED and not field.startswith("metadata."):
            field = f"metadata.{field}"
        return super().distinct_df(
            field, _prefix_criteria(criteria, self.key) if criteria else None)

    def put(self, docs: Sequence[dict]) -> None:
        """Upload blobs: each doc is {key, payload: bytes, **metadata}.
        Metadata packs into the struct; uploadDate/length/md5 derive."""
        rows = []
        now = _dt.datetime.utcnow()
        for d in docs:
            d = dict(d)
            payload = d.pop("payload")
            k = d.pop(self.key)
            rows.append((k, payload, d, now))
        df = self.spark.createDataFrame(
            rows, f"{self.key} string, payload binary, metadata map<string,string>, "
                  "uploadDate timestamp")
        # map -> struct with stable fields for dotted-path criteria
        meta_keys = sorted({mk for _, _, m, _ in rows for mk in m})
        df = df.withColumn(
            "metadata",
            F.struct(*[F.col("metadata").getItem(mk).alias(mk) for mk in meta_keys]),
        ).withColumn("length", F.length("payload")).withColumn(
            "md5", F.md5("payload"))
        self.update(df, key=self.key)
