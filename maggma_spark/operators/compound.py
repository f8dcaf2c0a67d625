"""Compound stores — join/union/alias/row-level-security *views* over other
stores. Each is a lazy DataFrame composition; Catalyst plans the physical
join/union (broadcast vs shuffle, AQE) — the reference delegated all of
this to Mongo aggregation pipelines.

Reference parity:
- JointStore  reference:src/maggma/stores/compound_stores.py:14-230
  ($lookup left equi-join on the shared key; $unwind preserveNull; joined
  doc lands as a struct column named after the collection; merge_at_root
  merges fields to the top level with ROOT winning on clashes
  (:174-189); last_updated = max across collections (:200-204))
- ConcatStore  reference:src/maggma/stores/compound_stores.py:317-500
  (union-all; the reference's skip/sort/limit were explicitly broken
  (:446 TODO) — unionByName + one plan fixes them for free)
- AliasingStore  reference:src/maggma/stores/advanced_stores.py:198-388
  (field renames both directions, incl. dotted paths)
- SandboxStore  reference:src/maggma/stores/advanced_stores.py:391-510
  (mandatory criteria {"$or":[{sbxn $in [sb]},{sbxn $exists False}]} on
  read; stamps sbxn on write)

Scale notes: the joint view's non-main sides are typically dimension-like
— callers can pass `broadcast=True` per store to force a broadcast hash
join; otherwise AQE converts post-shuffle when small. The union view is
shuffle-free (narrow).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Column

from maggma_spark.store import SparkStore


class JointStore(SparkStore):
    """Left equi-join of a main store against N others on the shared key.

    Each non-main store's document appears as a struct column named after
    that store; with merge_at_root=True the joined fields are flattened
    into the top level with the main document winning name clashes.
    """

    def __init__(
        self,
        stores: Sequence[SparkStore],
        main: Optional[str] = None,
        key: Optional[str] = None,
        merge_at_root: bool = False,
        broadcast_others: bool = False,
        name: str = "joint",
        last_updated_field: str = "last_updated",
    ):
        self.stores = {s.name: s for s in stores}
        self.main = main or stores[0].name
        self.merge_at_root = merge_at_root
        self.broadcast_others = broadcast_others
        jkey = key or stores[0].key
        super().__init__(self._build, name=name, key=jkey,
                         last_updated_field=last_updated_field)

    def _build(self) -> DataFrame:
        key = self.key
        main_df = self.stores[self.main].df
        out = main_df
        lu_cols: list[Column] = []
        if self.last_updated_field in main_df.columns:
            lu_cols.append(F.col(self.last_updated_field))
        for sname, store in self.stores.items():
            if sname == self.main:
                continue
            sdf = store.df
            other_cols = [c for c in sdf.columns if c != key]
            packed = sdf.select(F.col(key), F.struct(*other_cols).alias(sname))
            if self.broadcast_others:
                packed = F.broadcast(packed)
            out = out.join(packed, on=key, how="left")
            if store.last_updated_field in other_cols:
                lu_cols.append(F.col(f"{sname}.{store.last_updated_field}"))
        if self.merge_at_root:
            # ROOT (main) wins on clashes per $mergeObjects order
            main_cols = set(main_df.columns)
            flat: list[Column] = [F.col(c) for c in main_df.columns]
            for sname, store in self.stores.items():
                if sname == self.main:
                    continue
                for c in store.df.columns:
                    if c == self.key:
                        continue
                    if c in main_cols:
                        continue  # main wins; keep main's column
                    flat.append(F.col(f"{sname}.{c}").alias(c))
            out = out.select(*flat)
        if len(lu_cols) > 1 and not self.merge_at_root:
            out = out.withColumn(self.last_updated_field, F.greatest(*lu_cols))
        return out


class ConcatStore(SparkStore):
    """Union-all across stores with disjoint-schema tolerance."""

    def __init__(self, stores: Sequence[SparkStore], name: str = "concat",
                 key: Optional[Union[str, list]] = None,
                 last_updated_field: str = "last_updated"):
        self.stores = list(stores)
        super().__init__(self._build, name=name, key=key or stores[0].key,
                         last_updated_field=last_updated_field)

    def _build(self) -> DataFrame:
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            (s.df for s in self.stores),
        )


class AliasingStore(SparkStore):
    """Rename-view over a store: exposes `aliases[underlying] = exposed`
    names on read; writes rename back before delegating."""

    def __init__(self, store: SparkStore, aliases: dict, name: Optional[str] = None):
        self.store = store
        self.aliases = dict(aliases)  # underlying -> exposed
        self._reverse = {v: k for k, v in self.aliases.items()}
        key = self.aliases.get(store.key, store.key)
        lu = self.aliases.get(store.last_updated_field, store.last_updated_field)
        super().__init__(self._build, name=name or f"{store.name}_aliased",
                         key=key, last_updated_field=lu)

    def _build(self) -> DataFrame:
        df = self.store.df
        dotted: dict[str, list[str]] = {}
        for src in self.aliases:
            if "." in src:
                top, rest = src.split(".", 1)
                dotted.setdefault(top, []).append(rest)
        cols = []
        for c in df.columns:
            if c in dotted:
                # move nested leaves out: drop them from the struct, keep
                # siblings (reference:src/maggma/utils.py:137-155 pydash
                # get+set+unset substitution semantics)
                expr: Column = F.col(c)
                for rest in dotted[c]:
                    expr = expr.dropFields(rest)
                cols.append(expr.alias(self.aliases.get(c, c)))
            else:
                cols.append(F.col(c).alias(self.aliases.get(c, c)))
        for src, exposed in self.aliases.items():
            if "." in src:
                cols.append(F.col(src).alias(exposed))
        return df.select(*cols)

    def update(self, docs: Any, key: Any = None) -> None:
        df = docs if isinstance(docs, DataFrame) else self.store.spark.createDataFrame(docs)
        # dotted sources write back as pydash set_: the exposed flat
        # field is folded into its nested path on the doc being written
        # (reference:src/maggma/stores/compound_stores.py substitute +
        # utils.py:137-155). As in the reference, the written doc
        # replaces the stored one wholesale — struct siblings absent
        # from the incoming doc null out via unionByName's nested
        # missing-field fill, exactly like a Mongo ReplaceOne.
        for src, exposed in self.aliases.items():
            if "." not in src or exposed not in df.columns:
                continue
            top, rest = src.split(".", 1)
            if top in df.columns:
                df = df.withColumn(top, F.col(top).withField(rest, F.col(exposed)))
            else:
                expr: Column = F.col(exposed)
                for part in reversed(rest.split(".")):
                    expr = F.struct(expr.alias(part))
                df = df.withColumn(top, expr)
            df = df.drop(exposed)
        flat_reverse = {v: k for k, v in self.aliases.items() if "." not in k}
        renamed = df.select(*[F.col(c).alias(flat_reverse.get(c, c)) for c in df.columns])
        self.store.update(renamed, key=[self._reverse.get(k, k) for k in (
            [key] if isinstance(key, str) else key)] if key else None)

    def remove_docs(self, criteria: dict) -> None:
        self.store.remove_docs(_rename_criteria(criteria, self._reverse))


def _rename_criteria(criteria: dict, mapping: dict) -> dict:
    """Substitute exposed field names back to underlying ones in a
    criteria dict (reference:src/maggma/utils.py:137-155)."""
    out: dict = {}
    for k, v in criteria.items():
        if k in ("$and", "$or", "$nor"):
            out[k] = [_rename_criteria(c, mapping) for c in v]
        elif k.startswith("$"):
            out[k] = v
        else:
            out[mapping.get(k, k)] = v
    return out


class SandboxStore(SparkStore):
    """Row-level-security view: only rows whose `sbxn` array contains the
    sandbox (or that have no sandbox at all) are visible; writes stamp
    the sandbox."""

    def __init__(self, store: SparkStore, sandbox: str, sbxn_field: str = "sbxn"):
        self.store = store
        self.sandbox = sandbox
        self.sbxn_field = sbxn_field
        super().__init__(self._build, name=f"{store.name}_{sandbox}",
                         key=store.key, last_updated_field=store.last_updated_field)

    def _build(self) -> DataFrame:
        df = self.store.df
        if self.sbxn_field not in df.columns:
            return df
        c = F.col(self.sbxn_field)
        return df.filter(F.array_contains(c, self.sandbox) | c.isNull())

    def update(self, docs: Any, key: Any = None) -> None:
        df = docs if isinstance(docs, DataFrame) else self.store.spark.createDataFrame(docs)
        if self.sbxn_field in df.columns:
            df = df.withColumn(
                self.sbxn_field,
                F.when(F.col(self.sbxn_field).isNull(),
                       F.array(F.lit(self.sandbox))).otherwise(F.col(self.sbxn_field)),
            )
        else:
            df = df.withColumn(self.sbxn_field, F.array(F.lit(self.sandbox)))
        self.store.update(df, key=key)

    def remove_docs(self, criteria: dict) -> None:
        self.store.remove_docs({
            "$and": [criteria, {"$or": [
                {self.sbxn_field: {"$in": [self.sandbox]}},
                {self.sbxn_field: {"$exists": False}},
            ]}]
        })
