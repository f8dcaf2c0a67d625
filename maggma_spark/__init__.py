"""maggma_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of materialsproject/maggma.

Architecture (Spark-first, NOT a port):

- ``functions.criteria``: the Mongo-criteria-dict -> Catalyst ``Column``
  compiler. This is the engine's logical-plan front end; everything else
  (stores, builders, the REST-style param layer) reuses it. Catalyst then
  does predicate pushdown / pruning / join planning — we never hand-plan.
- ``store``: the Store facade (query/count/distinct/groupby/update/
  remove_docs/newer_in) over a lazily-evaluated DataFrame.
- ``sources``: backends (memory, parquet, json, binary-file, hive-
  partitioned open-data) — each is just a reader/writer pair; the operator
  surface is shared.
- ``operators``: key-merge upsert, incremental watermark diff, compound
  stores (join/union/alias/sandbox views), builders (map/group/projection),
  and the LLM-data operators (dedup, similarity, text analysis,
  multimodal).
- ``streaming``: event-time windows (tumbling/sliding/session) as batch
  DataFrame transforms plus Structured Streaming runners.
- ``plans``: declarative JSON pipeline specs -> DAG of Spark jobs, and
  write-time validation.

Reference parity citations appear in each module's docstrings as
``reference:path:line`` pointing into materialsproject/maggma.
"""

from maggma_spark.store import SparkStore
from maggma_spark.functions.criteria import compile_criteria

__version__ = "0.5.0"

__all__ = ["SparkStore", "compile_criteria", "__version__"]
