"""Declarative pipeline specs -> DAG of Spark jobs.

Reference parity: the `mrun builder.json` CLI (reference:src/maggma/
cli/__init__.py:105-228) executing MSONable-serialized builder lists
(`@class`/`@module` resolution, reference:src/maggma/utils.py:209-218 and
cli/__init__.py:165-174). The serial / multiprocess / ZMQ-distributed
execution engines (SURVEY §3.2) all collapse into sequential Spark jobs —
Spark itself is the distributed engine; builder order is the only
scheduling the spec layer owes.

Spec format (JSON/YAML-compatible dict):

    {"stores": {
        "src":  {"@class": "maggma_spark.sources.parquet.ParquetStore",
                 "path": "/data/src", "key": "k"},
        "tgt":  {"@class": "maggma_spark.sources.parquet.ParquetStore",
                 "path": "/data/tgt", "key": "k"}},
     "builders": [
        {"@class": "maggma_spark.operators.builders.CopyBuilder",
         "source": "$stores.src", "target": "$stores.tgt"}]}

`$stores.NAME` references resolve to constructed store objects; any
`@class` dict resolves by import path (the MSONable-style mechanism,
minus the monty dependency).
"""

from __future__ import annotations

import importlib
import json
from typing import Any, Optional

from pyspark.sql import SparkSession


def resolve_class(path: str):
    """Import-path resolution, plus the reference's source-file loading
    (reference:src/maggma/cli/source_loader.py:115-131): a spec of the
    form `/path/to/file.py:ClassName` loads the class from a source file
    that is not on sys.path (the `mrun my_builders.py` workflow), and
    `/path/to/nb.ipynb:ClassName` loads it from a notebook
    (reference:src/maggma/cli/source_loader.py:115-131 — the reference
    shells through nbconvert; a notebook is plain JSON, so the code
    cells are concatenated and exec'd directly, with IPython magics and
    shell escapes skipped)."""
    import os

    if ".py:" in path or ".ipynb:" in path:
        file, _, attr = path.partition(":")
        modname = os.path.splitext(os.path.basename(file))[0]
        if file.endswith(".ipynb"):
            import types

            with open(file) as fh:
                nb = json.load(fh)
            cells = []
            for cell in nb.get("cells", []):
                if cell.get("cell_type") != "code":
                    continue
                src = cell.get("source", "")
                lines = src.splitlines(True) if isinstance(src, str) else src
                cells.append("".join(
                    ln for ln in lines
                    if not ln.lstrip().startswith(("%", "!"))))
            mod = types.ModuleType(f"_maggma_nb_{modname}")
            mod.__file__ = file
            exec(compile("\n".join(cells), file, "exec"), mod.__dict__)
            return getattr(mod, attr)
        from importlib import util as _il_util

        spec = _il_util.spec_from_file_location(f"_maggma_src_{modname}", file)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return getattr(mod, attr)
    module, _, cls = path.rpartition(".")
    return getattr(importlib.import_module(module), cls)


class PipelineRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.stores: dict[str, Any] = {}

    def _construct(self, spec: dict, inject_spark: bool = True) -> Any:
        spec = dict(spec)
        cls = resolve_class(spec.pop("@class"))
        spec.pop("@module", None)
        kwargs = {k: self._resolve_value(v) for k, v in spec.items()}
        try:
            return cls(self.spark, **kwargs) if inject_spark else cls(**kwargs)
        except TypeError:
            return cls(**kwargs)

    def _resolve_value(self, v: Any) -> Any:
        if isinstance(v, str) and v.startswith("$stores."):
            name = v[len("$stores."):]
            if name not in self.stores:
                raise KeyError(f"pipeline references unknown store {name!r}")
            return self.stores[name]
        if isinstance(v, dict) and "@class" in v:
            return self._construct(v)
        return v

    def load(self, spec: dict | str) -> "PipelineRunner":
        if isinstance(spec, str):
            with open(spec) as fh:
                spec = json.load(fh)
        for name, store_spec in spec.get("stores", {}).items():
            store = self._construct(store_spec)
            store.name = name
            self.stores[name] = store
        self._builder_specs = spec.get("builders", [])
        return self

    def builders(self) -> list:
        out = []
        for bspec in self._builder_specs:
            out.append(self._construct(bspec, inject_spark=False))
        return out

    def run(self, reporter: Optional[callable] = None,
            report_store: Any = None) -> list[dict]:
        """Execute builders sequentially (each is internally a fully
        parallel Spark job); returns per-builder reports.

        `report_store`: a writable SparkStore that receives the per-
        builder event docs (the `mrun --reporting` store sink,
        reference:src/maggma/cli/__init__.py:123-147)."""
        reports = []
        for i, builder in enumerate(self.builders()):
            import time

            t0 = time.perf_counter()
            builder.run()
            rec = {
                "builder": type(builder).__name__,
                "index": i,
                "seconds": round(time.perf_counter() - t0, 3),
                "state": "successful",
            }
            reports.append(rec)
            if reporter:
                reporter(rec)
        if report_store is not None and reports:
            import datetime as _dt

            stamped = [dict(r, report_id=i,
                            last_updated=_dt.datetime.now(_dt.timezone.utc)
                            .replace(tzinfo=None))
                       for i, r in enumerate(reports)]
            report_store.update(stamped, key="report_id")
        return reports
