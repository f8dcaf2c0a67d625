"""Scalar helpers mirroring the reference's utility surface (SURVEY §2.8).

Reference parity:
- `to_isoformat_ceil_ms` (reference:src/maggma/utils.py:81-87): datetime
  -> ISO string truncated to milliseconds, *ceilinged* (+1 ms when any
  sub-millisecond component exists) so watermark comparisons never
  re-match the boundary document.
- `to_dt` (reference:src/maggma/utils.py:90-96): ISO string -> datetime.
- `recursive_update` (reference:src/maggma/utils.py:106-121): deep dict
  merge — here a recursive *struct* merge where the patch side wins on
  leaves and nested structs merge field-wise.
- `obj_hash` (reference:src/maggma/stores/aws.py:468-473): stable SHA1 of
  a document's canonical JSON form.

All pure Column expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import StructType


def to_dt(col: Column | str) -> Column:
    """ISO-8601 string -> timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)


def to_isoformat_ceil_ms(col: Column | str) -> Column:
    """timestamp -> ISO string at millisecond precision, ceiling.

    Ceil semantics: any value with sub-millisecond precision rounds UP to
    the next millisecond (reference:src/maggma/utils.py:81-87 — used so a
    string-watermark store never re-processes the boundary doc)."""
    c = F.col(col) if isinstance(col, str) else col
    # cast: accept TIMESTAMP_NTZ parquet columns too (UTC session tz)
    micros = F.unix_micros(c.cast("timestamp"))
    ceil_ms = F.floor((micros + F.lit(999)) / F.lit(1000))
    return F.date_format(
        F.timestamp_millis(ceil_ms.cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss.SSS",
    )


def obj_hash(*cols: Column | str, algo: str = "sha1") -> Column:
    """Stable digest of the canonical JSON of the given columns
    (reference:src/maggma/stores/aws.py:468-473 uses sha1; md5/sha256
    are offered because the JSON rendering is engine-portable — DuckDB's
    to_json produces byte-identical text for int/string structs, so the
    digest is independently recomputable)."""
    struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols])
    js = F.to_json(struct)
    if algo == "sha1":
        return F.sha1(js)
    if algo == "sha256":
        return F.sha2(js, 256)
    if algo == "md5":
        return F.md5(js)
    raise ValueError("algo must be sha1, sha256, or md5")


def merge_structs(base: Column, patch: Column, schema: StructType) -> Column:
    """Recursive struct merge, patch wins on leaves, nested structs merge
    field-wise; null patch fields fall back to base (the reference's
    recursive_update)."""
    fields = []
    for f in schema.fields:
        b, p = base[f.name], patch[f.name]
        if isinstance(f.dataType, StructType):
            merged = F.when(p.isNull(), b).when(b.isNull(), p).otherwise(
                merge_structs(b, p, f.dataType))
            fields.append(merged.alias(f.name))
        else:
            fields.append(F.coalesce(p, b).alias(f.name))
    return F.struct(*fields)
