from maggma_spark.operators.merge import upsert_by_key, remove_matching, delete_orphans

__all__ = ["upsert_by_key", "remove_matching", "delete_orphans"]
