from maggma_spark.sources.memory import MemoryStore
from maggma_spark.sources.parquet import ParquetStore

__all__ = ["MemoryStore", "ParquetStore"]
