"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query on /root/testdata/sf0.001
queries()       -> {name: (spark, sf_dir) -> DataFrame} per SURVEY §2 op
oracle_sql()    -> {name: DuckDB-runnable ANSI SQL twin}

Implementations live in maggma_spark.plans.catalog; each goes through the
engine's public APIs (SparkStore / criteria compiler / compound stores /
builders / llm-ops), not raw DataFrame code, so the correctness gate
exercises the engine itself.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from maggma_spark.plans.catalog import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from maggma_spark.plans.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from maggma_spark.plans.catalog import ORACLES

    return dict(ORACLES)
