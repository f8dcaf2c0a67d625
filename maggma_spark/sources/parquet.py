"""ParquetStore — path-backed columnar store (the workhorse backend).

Replaces the reference's blob-object stores: S3Store's msgpack-objects +
separate searchable-fields index (reference:src/maggma/stores/aws.py:30,
59,190-216) and AzureBlobStore (reference:src/maggma/stores/azure.py:60)
collapse into a single parquet dataset — Spark's columnar scan gives
predicate pushdown and column pruning natively, so the index/blob split
(and "searchable_fields") disappears (SURVEY §2.1).

Paths may be local, `s3a://`, or `abfss://` — same code path.

Write path / scale design:
- `update` computes the merged frame (upsert_by_key: one shuffle on the
  key) and rewrites the dataset. On plain parquet a full-file rewrite is
  unavoidable for unpartitioned data; with `partition_by` set we use
  dynamic partition overwrite (`partitionOverwriteMode=dynamic`) so ONLY
  partitions containing updated keys rewrite — the parquet-native
  equivalent of MERGE INTO. At 100 TB: choose a partition column aligned
  with update locality (e.g. date or key-hash bucket) and updates touch
  a bounded partition subset.
- Spark cannot overwrite a path it is concurrently reading, so the
  unpartitioned rewrite stages to `<path>.__staging` then swaps. (A
  transactional table format would remove the swap; out of scope here.)
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from maggma_spark.operators.merge import (
    remove_matching,
    set_matching,
    upsert_by_key,
)
from maggma_spark.store import SparkStore


def _nanos_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark cannot scan
    them natively; we read them as int64 nanos and convert."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def dataset_exists(spark: SparkSession, path: str) -> bool:
    """Dataset presence for local paths AND object-store URIs.
    `os.path.exists` is always False for s3a://abfss:// — a remote store
    would silently look empty and update() would REPLACE it instead of
    upserting — so URI paths go through the Hadoop FileSystem API."""
    if "://" not in path:
        return os.path.exists(path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def dataset_size_bytes(spark: SparkSession, path: str) -> int:
    if "://" not in path:
        if not os.path.exists(path):
            return 0
        return sum(
            f.stat().st_size
            for f in __import__("pathlib").Path(path).rglob("*.parquet")
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return 0
    return int(fs.getContentSummary(hpath).getLength())


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp tolerance: ns columns
    are read as int64 (`nanosAsLong`) then truncated to microseconds —
    the same truncation DuckDB/Arrow apply when casting ns->us."""
    ns_cols = _nanos_ts_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for c in ns_cols:
        # INT96 timestamps also surface as ns in the Arrow schema but Spark
        # scans them as TIMESTAMP natively — only true TIMESTAMP(NANOS)
        # columns arrive as int64 under nanosAsLong and need conversion.
        if isinstance(dtypes.get(c), LongType):
            # ns -> us MUST be exact INTEGER division: epoch nanoseconds
            # (~1.7e18) exceed double's 2^53 exact range, so a float
            # divide can shift timestamps by 1 us. `div` is the JVM
            # integral division (toward zero, matching Arrow's ns->us
            # cast); the identifier is backtick-escaped so hostile
            # column names stay inert in the expression string.
            ident = "`" + c.replace("`", "``") + "`"
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{ident} div 1000")))
    return df


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 6) -> Column:
    """Morton key with quantile-bucket normalization (skew-robust,
    strings hash-bucketed) — delegates to the canonical implementation
    in operators/zorder.py (which also offers min-max normalization
    with injectable stats and a Hilbert variant)."""
    from maggma_spark.operators.zorder import zorder_key as _zk

    return _zk(df, cols, bits=bits, normalization="quantile")


class ParquetStore(SparkStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        name: str = "parquet",
        key: str = "task_id",
        last_updated_field: str = "last_updated",
        partition_by: Optional[Sequence[str]] = None,
        **kwargs: Any,
    ):
        self.spark = spark
        self.path = path
        self.partition_by = list(partition_by) if partition_by else None
        super().__init__(lambda: read_parquet(spark, path), name=name, key=key,
                         last_updated_field=last_updated_field, **kwargs)

    def exists(self) -> bool:
        return self._dataset_exists()

    def _dataset_exists(self) -> bool:
        return dataset_exists(self.spark, self.path)

    def _dataset_size_bytes(self) -> int:
        return dataset_size_bytes(self.spark, self.path)

    def as_spec(self) -> dict:
        spec = {
            "@class": "maggma_spark.sources.parquet.ParquetStore",
            "path": self.path,
            "key": self.key,
            "last_updated_field": self.last_updated_field,
        }
        if self.partition_by:
            spec["partition_by"] = self.partition_by
        return spec

    def _coerce(self, docs: Any) -> DataFrame:
        if isinstance(docs, DataFrame):
            return docs
        if isinstance(docs, dict):  # single doc, reference:mongolike.py:383
            docs = [docs]
        return self.spark.createDataFrame(docs)

    def _rewrite(self, df: DataFrame, dynamic: bool = True) -> None:
        """Rewrite the dataset.

        dynamic=True (update path): dynamic-partition overwrite — only
        partitions present in `df` rewrite. The caller MUST have bounded
        `df` to the touched partitions and broken lineage (checkpoint).

        dynamic=False (remove_docs/compact): FULL static rewrite. A
        dynamic overwrite would skip partitions whose rows were all
        removed, so their old files would survive and deleted docs
        resurface — static mode clears them. Local paths stage-and-swap
        (no lineage conflict, atomic-ish); URI paths checkpoint first
        because Spark cannot overwrite a path it is still reading.
        """
        if self.partition_by and dynamic:
            self._save(
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by),
                self.path,
            )
            return

        def writer(frame: DataFrame):
            # pin static mode: if the session sets
            # partitionOverwriteMode=dynamic globally, fully-emptied
            # partitions would keep their old files and deleted docs
            # would resurface — exactly what this path must prevent
            w = (frame.write.mode("overwrite")
                 .option("partitionOverwriteMode", "static"))
            if self.partition_by:
                w = w.partitionBy(*self.partition_by)
            return w

        if "://" in self.path:  # object store: no atomic rename — break
            # lineage, then static overwrite (replaces every partition)
            df = df.localCheckpoint(eager=True)
            self._save(writer(df), self.path)
            return
        staging = self.path.rstrip("/") + ".__staging"
        self._save(writer(df), staging)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.replace(staging, self.path)

    def _save(self, writer, path: str) -> None:
        """Single funnel for physical writes — FormatStore overrides this
        (and the reader) to serve csv/json/orc through the same store."""
        writer.parquet(path)

    # -- write surface ---------------------------------------------------
    def update(self, docs: Any, key: Union[str, Sequence[str], None] = None,
               _small_new: bool = False) -> None:
        """Upsert `docs` by key. ``_small_new`` (round-12, the
        streaming-ingest private fast path): the caller asserts the
        new frame is micro-batch-bounded. The merge then becomes
        within-new dedup + a broadcast anti-join over the stored
        side + union — the STORE side is scanned but never exchanged
        or sorted, where the generic window merge shuffles old ∪ new
        by key on every call (at 100 TB that is one full shuffle of
        the table per micro-batch). Result-identical to the window
        merge given the store's own key-uniqueness invariant (every
        write funnels through a by-key merge, so `old` carries one
        row per key)."""
        new = self._coerce(docs)
        old = self.df if self._dataset_exists() else None
        if old is not None and self.partition_by:
            # partition-scoped merge: only partitions the new docs touch
            # participate; dynamic overwrite then rewrites exactly those
            # (update cost ∝ touched partitions, not table size)
            from pyspark.sql import functions as F

            parts = new.select(*self.partition_by).distinct()
            old = old.join(F.broadcast(parts), on=self.partition_by,
                           how="left_semi")
        kcols = key or self.key
        if _small_new and old is not None:
            from pyspark.sql import functions as F

            # same pick as the merged window restricted to new rows:
            # upsert_by_key(None, new) applies the identical
            # (precedence, last_updated) ordering over new alone
            new = upsert_by_key(None, new, kcols, self.last_updated_field)
            klist = [kcols] if isinstance(kcols, str) else list(kcols)
            keep = old.join(
                F.broadcast(new.select(*klist).dropDuplicates(klist)),
                on=klist, how="left_anti")
            merged = new.unionByName(keep, allowMissingColumns=True)
        else:
            merged = upsert_by_key(old, new, kcols, self.last_updated_field)
        if old is not None and self.partition_by:
            # break lineage: the dynamic overwrite reads from self.path
            # (the local staging swap and the remote branch of _rewrite
            # handle their own lineage)
            merged = merged.localCheckpoint(eager=True)
        self._rewrite(merged)

    def remove_docs(self, criteria: dict) -> None:
        # full static rewrite (dynamic would resurrect fully-emptied
        # partitions); staging-swap/checkpoint handles the self-read
        self._rewrite(remove_matching(self.df, criteria), dynamic=False)

    def update_matching(self, criteria: dict, updates: dict) -> None:
        """update_many analog: plain dict = $set; $-operator dict uses
        the Mongo update dialect. A projection rewrite touches every
        row's file, so this is a full static rewrite; at 100 TB prefer a
        lakehouse MERGE/UPDATE for sub-table rewrites."""
        if any(k.startswith("$") for k in updates):
            from maggma_spark.operators.merge import apply_update_operators

            out = apply_update_operators(self.df, criteria, updates)
        else:
            out = set_matching(self.df, criteria, updates)
        self._rewrite(out, dynamic=False)

    def compact(self, target_file_mb: int = 128) -> None:
        """Small-files compaction: rewrite the dataset into files sized
        for scan efficiency. Incremental upserts accrete small files;
        at 100 TB a scan of millions of 1 MB files is metadata-bound —
        periodic compaction (or a lakehouse format's OPTIMIZE) restores
        ~128 MB files aligned with spark.sql.files.maxPartitionBytes."""
        import math

        df = self.df
        total_bytes = self._dataset_size_bytes()
        n = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
        if self.partition_by:
            self._rewrite(df.repartition(n, *self.partition_by), dynamic=False)
        else:
            self._rewrite(df.repartition(n), dynamic=False)

    def optimize(self, cluster_by: Sequence[str],
                 target_file_mb: int = 128,
                 method: str = "range",
                 num_files: Optional[int] = None,
                 zorder_bits: int = 6) -> None:
        """Layout optimization: rewrite clustered AND sorted on
        `cluster_by` so parquet row-group min/max statistics become
        selective — a point/range query on the cluster key then skips
        whole files and row groups instead of scanning them (the
        columnar analog of the reference's ensure_index; at 100 TB the
        difference between touching one file and touching all of them).

        method="range" (default): lexicographic repartitionByRange +
        sort — optimal for the FIRST cluster column, useless for the
        second once the first is selective.

        method="hilbert": the Hilbert-curve variant (exactly two
        numeric columns, min-max normalized) — consecutive key values
        are always ADJACENT cells, so range-partition cuts never glue
        far-apart regions together.

        method="zorder": Morton-interleaved multi-column clustering
        (the lakehouse OPTIMIZE ZORDER analog) — every file covers a
        narrow sub-rectangle of the cluster-column space, so
        predicates on ANY subset of the columns skip files. Bucket
        boundaries come from approxQuantile (driver gets ≤ 2^bits
        scalars per column); string columns bucket by xxhash64 (equal
        values co-locate; string range scans won't prune).
        """
        import math

        cols = list(cluster_by)
        total_bytes = self._dataset_size_bytes()
        n = num_files or max(
            1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
        if method == "range":
            laid_out = (
                self.df.repartitionByRange(n, *[F.col(c) for c in cols])
                .sortWithinPartitions(*cols)
            )
        elif method in ("zorder", "hilbert"):
            if method == "hilbert":
                # better boundary locality: consecutive key values are
                # ALWAYS adjacent cells (operators/zorder.py) — exactly
                # two numeric columns, min-max normalized
                from maggma_spark.operators.zorder import hilbert_key
                z = hilbert_key(self.df, cols, bits=zorder_bits)
            else:
                z = zorder_key(self.df, cols, bits=zorder_bits)
            laid_out = (
                self.df.withColumn("__z", z)
                .repartitionByRange(n, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            raise ValueError(
                "method must be 'range', 'zorder' or 'hilbert'")
        self._rewrite(laid_out, dynamic=False)

    def optimize_incremental(self, cluster_by: Sequence[str],
                             target_file_mb: int = 128) -> dict:
        """Partition-scoped OPTIMIZE (round-8, r7 verdict next #10):
        rewrite ONLY the hive partitions whose current file layout is
        not clustered on the leading cluster column — at 100 TB a
        full-table OPTIMIZE is a 100 TB write, but newly-ingested
        partitions are the only unclustered ones, so the incremental
        story is "detect by file statistics, rewrite the offenders,
        leave everything else's files untouched".

        Detection is file-level and fully distributed: per (partition,
        file) min/max of the leading cluster key (one scan of that
        single column), then a per-partition window marks partitions
        where any file's key range overlaps the next file's — the
        same min/max the parquet footers expose to scan pruning, so
        "unclustered here" = "a range scan cannot skip files there".
        Only ONE ROW PER HIVE PARTITION reaches the driver. Offending
        partitions are rewritten through dynamic partition overwrite
        (lineage broken by localCheckpoint, as the upsert path does);
        clustered partitions keep their files byte-identical —
        pinned by test_optimize_incremental_leaves_clustered_files.

        Returns {"partitions_total", "partitions_rewritten"}.
        """
        import math

        from pyspark.sql import Window

        if not self.partition_by:
            raise ValueError(
                "optimize_incremental needs a hive-partitioned store "
                "(partition_by); use optimize() for monolithic layouts")
        cols = list(cluster_by)
        key = F.col(cols[0])
        pcols = list(self.partition_by)
        fstats = (self.df
                  .select(*pcols, key.alias("__k"),
                          F.input_file_name().alias("__f"))
                  .groupBy(*pcols, "__f")
                  .agg(F.min("__k").alias("__lo"),
                       F.max("__k").alias("__hi")))
        w = Window.partitionBy(*pcols).orderBy("__lo", "__hi", "__f")
        # Strict `<` on purpose: repartitionByRange splits AT key
        # boundaries, so two adjacent freshly-optimized files may both
        # contain the boundary key (next.lo == cur.hi). `<=` would
        # re-flag those partitions on every run forever; a point scan
        # reading one extra file at an exact range boundary is the
        # accepted cost. Multi-file single-key partitions are likewise
        # left alone — rewriting cannot improve a one-key layout.
        overlap = F.lead("__lo").over(w) < F.col("__hi")
        parts = (fstats
                 .withColumn("__bad", F.coalesce(overlap, F.lit(False)))
                 .groupBy(*pcols)
                 .agg(F.max("__bad").alias("__bad"))
                 .collect())
        bad = [tuple(r[c] for c in pcols) for r in parts if r["__bad"]]
        report = {"partitions_total": len(parts),
                  "partitions_rewritten": len(bad)}
        if not bad:
            return report
        pred = F.struct(*[F.col(c) for c in pcols]).isin(
            [tuple(b) for b in bad]) if len(pcols) > 1 else \
            F.col(pcols[0]).isin([b[0] for b in bad])
        subset = self.df.filter(pred).localCheckpoint()
        total_bytes = self._dataset_size_bytes()
        frac = max(1, len(bad)) / max(1, len(parts))
        n = max(1, math.ceil(
            total_bytes * frac / (target_file_mb * 1024 * 1024)))
        laid_out = (subset
                    .repartitionByRange(n, *[F.col(c) for c in pcols],
                                        *[F.col(c) for c in cols])
                    .sortWithinPartitions(*pcols, *cols))
        self._save(
            laid_out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*pcols),
            self.path)
        return report
