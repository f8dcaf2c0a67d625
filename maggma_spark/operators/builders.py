"""Builders — the reference's three-phase ETL node (get_items →
process_item → update_targets, reference:src/maggma/core/builder.py:55-107)
re-expressed as single Spark jobs.

What disappears (SURVEY §3.2): prechunk/chunk_size → Spark partitioning;
BackPressure/AsyncUnorderedMap/ProcessPool → executor scheduling; the
ZMQ/RabbitMQ manager-worker cluster → the Spark driver itself. What
remains is the *semantics*: incremental watermark diff, pure per-item
transforms with error-state capture, grouped many-to-one transforms, and
multi-source projection merges.

Error-state contract (reference:src/maggma/builders/map_builder.py:135-170):
a failing item yields {key, state: "failed", error: str(exc), _bt: now}
instead of poisoning the job; `retry_failed` replays failed keys on the
next run. Per-item SIGALRM timeouts (reference:src/maggma/utils.py:169-206)
do not survive the executor model — the documented semantic change is
that timeouts, when needed, must be enforced inside the user function.

Scale notes:
- The incremental diff is an anti/semi join on the key — no chunked
  `$in` scans (reference:src/maggma/builders/map_builder.py:126-133);
  the stale-key frame stays distributed and is usually broadcast by AQE.
- User functions run via mapInPandas/applyInPandas (Arrow-batched), the
  only places Python appears; identity builders (CopyBuilder) are pure
  column ops and never leave the JVM.
"""

from __future__ import annotations

import datetime as _dt
import traceback
from typing import Any, Callable, Iterable, Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    StructField,
    StructType,
    StringType,
    TimestampType,
)

from maggma_spark.operators.merge import delete_orphans as _delete_orphans
from maggma_spark.store import SparkStore


class Builder:
    """Base dataflow node (reference:src/maggma/core/builder.py:16-107)."""

    def __init__(self, sources: Sequence[SparkStore], targets: Sequence[SparkStore]):
        self.sources = list(sources)
        self.targets = list(targets)

    def connect(self) -> None:
        for s in [*self.sources, *self.targets]:
            s.connect()

    def get_items(self) -> DataFrame:
        raise NotImplementedError

    def process_items(self, items: DataFrame) -> DataFrame:
        return items

    def update_targets(self, processed: DataFrame) -> None:
        raise NotImplementedError

    def finalize(self) -> None:
        pass

    def run(self) -> None:
        """One Spark job: read → transform → merge-write
        (replaces reference:src/maggma/cli/serial.py:13-68 and the
        multiprocess/distributed runners entirely)."""
        self.connect()
        self.update_targets(self.process_items(self.get_items()))
        self.finalize()


def _parse_schema(schema: Union[str, StructType]) -> StructType:
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


class MapBuilder(Builder):
    """One-to-one transform with incremental recomputation
    (reference:src/maggma/builders/map_builder.py:38-207).

    ufn: dict -> dict pure function (None = identity copy). With a ufn,
    `output_schema` declares the produced fields (DDL string or
    StructType); the engine appends key, state, error, _bt columns.
    """

    def __init__(
        self,
        source: SparkStore,
        target: SparkStore,
        ufn: Optional[Callable[[dict], dict]] = None,
        query: Optional[dict] = None,
        projection: Optional[list] = None,
        output_schema: Union[str, StructType, None] = None,
        delete_orphans: bool = False,
        retry_failed: bool = False,
        incremental: bool = True,
        store_process_time: bool = True,
    ):
        super().__init__([source], [target])
        self.source, self.target = source, target
        self.ufn = ufn
        self.query = query
        self.projection = projection
        self.output_schema = output_schema
        self.delete_orphans = delete_orphans
        self.retry_failed = retry_failed
        self.incremental = incremental
        self.store_process_time = store_process_time

    # -- extract ---------------------------------------------------------
    def stale_keys(self) -> DataFrame:
        """Keys to (re)process: newer-in-source ∪ (optionally) previously
        failed (reference:src/maggma/builders/map_builder.py:100-133)."""
        keys = self.target.newer_in(self.source, criteria=self.query, exhaustive=True)
        tgt_df = self.target.try_df()
        if self.retry_failed and tgt_df is not None and "state" in tgt_df.columns:
            failed = (
                tgt_df.filter(F.col("state") == "failed")
                .select(*self.target.keys)
                .toDF(*self.source.keys)
            )
            keys = keys.unionByName(failed).distinct()
        return keys

    def get_items(self) -> DataFrame:
        projection = self.projection
        if projection is not None:
            # the key and watermark always ride along (the reference
            # forces them into the projection too,
            # reference:src/maggma/builders/map_builder.py:120-123)
            needed = [*self.source.keys, self.source.last_updated_field]
            src_cols = set(self.source.df.columns)
            projection = list(projection) + [
                c for c in needed if c not in projection and c in src_cols]
        items = self.source.query(criteria=self.query, properties=projection)
        if not self.incremental:
            return items
        return items.join(self.stale_keys(), on=self.source.keys, how="left_semi")

    # -- transform -------------------------------------------------------
    def process_items(self, items: DataFrame) -> DataFrame:
        if self.ufn is None:
            return items
        if self.output_schema is None:
            raise ValueError("MapBuilder with a ufn requires output_schema")
        out_schema = _parse_schema(self.output_schema)
        key_fields = [items.schema[k] for k in self.source.keys
                      if k not in out_schema.fieldNames()]
        full = StructType(
            key_fields
            + list(out_schema.fields)
            + [
                StructField("state", StringType()),
                StructField("error", StringType()),
                StructField("_bt", TimestampType()),
            ]
        )
        fn = self.ufn
        keys = list(self.source.keys)
        names = full.fieldNames()
        time_it = self.store_process_time and "_process_time" in names

        # A Python-heavy stage must use every core: a narrow input (one
        # small file, an exploded literal) can arrive as 1-2 partitions,
        # serializing the whole transform. Widen to the cluster's
        # default parallelism before entering Python. (RDD introspection
        # is unavailable under Spark Connect — widen unconditionally
        # there; the shuffle is cheap relative to a Python stage.)
        try:
            sc = items.sparkSession.sparkContext
            target_parts = sc.defaultParallelism
            narrow = items.rdd.getNumPartitions() < target_parts
        except Exception:
            narrow, target_parts = True, 200
        if narrow:
            items = items.repartition(target_parts)

        def mapper(batches: Iterable) -> Iterable:
            import time

            import pandas as pd

            for pdf in batches:
                # column-wise extraction then zip: ~10x faster per row
                # than to_dict("records") for wide Arrow batches
                col_names = list(pdf.columns)
                col_data = [pdf[c].tolist() for c in col_names]
                out_rows = []
                bt = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
                for vals in zip(*col_data):
                    rec = dict(zip(col_names, vals))
                    try:
                        t0 = time.perf_counter()
                        res = dict(fn(rec) or {})
                        if time_it:
                            res.setdefault("_process_time", time.perf_counter() - t0)
                        res.update({k: rec[k] for k in keys})
                        res.update(state="successful", error=None, _bt=bt)
                    except Exception as exc:  # error-doc capture
                        res = {k: rec[k] for k in keys}
                        res.update(
                            state="failed",
                            error=f"{exc}\n{traceback.format_exc(limit=3)}",
                            _bt=bt,
                        )
                    out_rows.append([res.get(n) for n in names])
                yield pd.DataFrame(out_rows, columns=names)

        return items.mapInPandas(mapper, schema=full)

    # -- load ------------------------------------------------------------
    def update_targets(self, processed: DataFrame) -> None:
        self.target.update(processed, key=self.target.key)

    def finalize(self) -> None:
        if self.delete_orphans:
            kept = _delete_orphans(
                self.target.df, self.source.df.select(*self.source.keys),
                self.target.keys,
            )
            # rewrite through the store's write path
            self.target._set(kept) if hasattr(self.target, "_set") else \
                self.target.update(kept, key=self.target.key)


class CopyBuilder(MapBuilder):
    """Identity sync (reference:src/maggma/builders/copy_builder.py) —
    pure column ops; never leaves the JVM."""

    def __init__(self, source: SparkStore, target: SparkStore, **kwargs: Any):
        kwargs.setdefault("ufn", None)
        super().__init__(source, target, **kwargs)


class GroupBuilder(Builder):
    """Many-to-one grouped transform
    (reference:src/maggma/builders/group_builder.py:107-181).

    ufn: list[dict] -> dict applied per group via applyInPandas; the
    output doc carries the member keys as `{source.key}s` and the group's
    max(last_updated).

    The reference contract materializes the WHOLE group in one task
    (reference:src/maggma/builders/group_builder.py:143-150): a hot
    group is therefore a task OOM at 100 TB. `max_group_rows` (500k
    default) raises a clear error inside the task instead of letting the
    executor die; for algebraic aggregations use operators.skew.
    salted_groupby, which never materializes a group."""

    def __init__(
        self,
        source: SparkStore,
        target: SparkStore,
        grouping_keys: Sequence[str],
        ufn: Callable[[list[dict]], dict],
        output_schema: Union[str, StructType],
        query: Optional[dict] = None,
        max_group_rows: Optional[int] = 500_000,
    ):
        super().__init__([source], [target])
        self.source, self.target = source, target
        self.grouping_keys = list(grouping_keys)
        self.ufn = ufn
        self.output_schema = output_schema
        self.query = query
        self.max_group_rows = max_group_rows

    def get_items(self) -> DataFrame:
        items = self.source.query(criteria=self.query)
        # docs missing a grouping key are dropped, matching Store.groupby
        # (reference:src/maggma/stores/mongolike.py:581-583)
        for k in self.grouping_keys:
            items = items.filter(F.col(k).isNotNull())
        return items

    def process_items(self, items: DataFrame) -> DataFrame:
        out_schema = _parse_schema(self.output_schema)
        gkeys = self.grouping_keys
        skey = self.source.key
        lu = self.source.last_updated_field
        has_lu = lu in items.columns
        plural = f"{skey}s"
        fields = [items.schema[k] for k in gkeys]
        import pyspark.sql.types as T

        fields += list(out_schema.fields)
        fields += [StructField(plural, T.ArrayType(items.schema[skey].dataType))]
        if has_lu:
            fields += [StructField(lu, items.schema[lu].dataType)]
        fields += [StructField("state", StringType()), StructField("error", StringType())]
        full = StructType(fields)
        names = full.fieldNames()
        fn = self.ufn

        cap = self.max_group_rows

        def apply(pdf):  # one group per call
            import pandas as pd

            if cap is not None and len(pdf) > cap:
                raise ValueError(
                    f"GroupBuilder group of {len(pdf)} rows exceeds "
                    f"max_group_rows={cap}; a group must fit one task. "
                    "Raise the cap, narrow grouping_keys, or use "
                    "salted_groupby for algebraic aggregations.")
            recs = pdf.to_dict("records")
            base = {k: recs[0][k] for k in gkeys}
            base[plural] = sorted(r[skey] for r in recs)
            if has_lu:
                base[lu] = max(r[lu] for r in recs)
            try:
                res = dict(fn(recs) or {})
                base.update(res)
                base.update(state="successful", error=None)
            except Exception as exc:
                base.update(state="failed", error=str(exc))
            return pd.DataFrame([[base.get(n) for n in names]], columns=names)

        return items.groupBy(*gkeys).applyInPandas(apply, schema=full)

    def update_targets(self, processed: DataFrame) -> None:
        self.target.update(processed, key=self.target.key)


class ProjectionBuilder(Builder):
    """N-source merge by key (reference:src/maggma/builders/
    projection_builder.py:112-219): full outer join across sources with
    per-source field selection/rename; on clashing fields the *last*
    listed source wins when non-null (last-writer-wins)."""

    def __init__(
        self,
        sources: Sequence[SparkStore],
        target: SparkStore,
        fields_to_project: Optional[Sequence[Union[list, dict, None]]] = None,
    ):
        super().__init__(list(sources), [target])
        self.target = target
        self.fields_to_project = list(fields_to_project or [None] * len(sources))
        if len(self.fields_to_project) != len(self.sources):
            raise ValueError("fields_to_project must match sources length")

    def get_items(self) -> DataFrame:
        key = self.target.key
        frames: list[DataFrame] = []
        for store, spec in zip(self.sources, self.fields_to_project):
            df = store.df
            if spec is None:
                mapping = {c: c for c in df.columns if c != store.key}
            elif isinstance(spec, dict):
                mapping = dict(spec)  # source_field -> target_field
            else:
                mapping = {c: c for c in spec}
            cols = [F.col(store.key).alias(key)] + [
                F.col(src).alias(dst) for src, dst in mapping.items()
            ]
            frames.append(df.select(*cols))

        out = frames[0]
        for nxt in frames[1:]:
            clash = (set(out.columns) & set(nxt.columns)) - {key}
            left = out.select(
                key, *[F.col(c).alias(f"__l_{c}") if c in clash else F.col(c)
                       for c in out.columns if c != key])
            right = nxt.select(
                key, *[F.col(c).alias(f"__r_{c}") if c in clash else F.col(c)
                       for c in nxt.columns if c != key])
            out = left.join(right, on=key, how="full_outer")
            for c in clash:  # later source wins when non-null
                out = out.withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(f"__l_{c}")))
            out = out.drop(*[f"__l_{c}" for c in clash], *[f"__r_{c}" for c in clash])
        return out

    def update_targets(self, processed: DataFrame) -> None:
        self.target.update(processed, key=self.target.key)
