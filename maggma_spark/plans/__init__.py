from maggma_spark.plans.catalog import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
