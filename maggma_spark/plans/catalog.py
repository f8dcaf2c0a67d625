"""Query catalog: one entry per implemented operator from SURVEY.md §2,
each expressed through the engine's own APIs (SparkStore, criteria
compiler, compound stores, builders, llm-ops) with a DuckDB oracle SQL
twin for the driver's correctness gate.

Conventions:
- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded (2dp for money sums, 4-6dp for avgs /
  similarities) so value-hashes are stable across summation orders;
- raw column pass-throughs are NOT rounded (bit-exact by construction);
- every query takes (spark, sf_dir) and returns a lazy DataFrame.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from maggma_spark.sources.parquet import ParquetStore
from maggma_spark.store import SparkStore

TABLE_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

TABLE_LU = {"orders": "o_orderdate", "events": "ts"}


def table_store(spark: SparkSession, sf_dir: str, name: str) -> ParquetStore:
    return ParquetStore(
        spark,
        f"{sf_dir}/{name}.parquet",
        name=name,
        key=TABLE_KEYS[name],
        last_updated_field=TABLE_LU.get(name, "last_updated"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.2 filters / projections (criteria compiler over parquet scans)
# ---------------------------------------------------------------------------


@register(
    "filter_eq_project",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders WHERE o_orderstatus = 'F'""",
)
def filter_eq_project(spark, sf):
    return table_store(spark, sf, "orders").query(
        criteria={"o_orderstatus": "F"},
        properties=["o_orderkey", "o_custkey", "o_totalprice"],
    )


@register(
    "filter_in_range",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
       FROM lineitem
       WHERE l_returnflag IN ('A','R') AND l_quantity >= 30
         AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'""",
)
def filter_in_range(spark, sf):
    return table_store(spark, sf, "lineitem").query(
        criteria={
            "l_returnflag": {"$in": ["A", "R"]},
            "l_quantity": {"$gte": 30},
            "l_shipdate": {"$lt": dt.datetime(1999, 1, 1)},
        },
        properties=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    )


@register(
    "filter_bool_ops",
    """SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
       FROM orders
       WHERE o_orderpriority = '1-URGENT'
          OR (o_totalprice > 150000 AND o_orderstatus <> 'F')""",
)
def filter_bool_ops(spark, sf):
    return table_store(spark, sf, "orders").query(
        criteria={
            "$or": [
                {"o_orderpriority": "1-URGENT"},
                {"$and": [
                    {"o_totalprice": {"$gt": 150000}},
                    {"o_orderstatus": {"$ne": "F"}},
                ]},
            ]
        },
        properties=["o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"],
    )


@register(
    "filter_regex_nin",
    """SELECT p_partkey, p_name, p_type, p_brand
       FROM part
       WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)')
         AND p_brand NOT IN ('Brand#1','Brand#2','Brand#3')""",
)
def filter_regex_nin(spark, sf):
    return table_store(spark, sf, "part").query(
        criteria={
            "p_type": {"$regex": "^(PROMO|ECONOMY)"},
            "p_brand": {"$nin": ["Brand#1", "Brand#2", "Brand#3"]},
        },
        properties=["p_partkey", "p_name", "p_type", "p_brand"],
    )


@register(
    "filter_exists",
    """SELECT doc_id, lang, n_chars FROM documents WHERE text IS NOT NULL""",
)
def filter_exists(spark, sf):
    # $exists over a present field AND over a field absent from the schema
    # (disjoint-key-set semantics: absent field => exists False for all).
    return table_store(spark, sf, "documents").query(
        criteria={"text": {"$exists": True}, "missing_field": {"$exists": False}},
        properties=["doc_id", "lang", "n_chars"],
    )


@register(
    "filter_expr_arith",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > 2000 * 100""",
)
def filter_expr_arith(spark, sf):
    return table_store(spark, sf, "orders").query(
        criteria={"$expr": {"$gt": ["$o_totalprice", {"$multiply": [2000, 100]}]}},
        properties=["o_orderkey", "o_totalprice"],
    )


# ---------------------------------------------------------------------------
# §2.6 sort / skip / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_skip_topk",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       LIMIT 100 OFFSET 10""",
)
def sort_skip_topk(spark, sf):
    return table_store(spark, sf, "lineitem").query(
        properties=["l_orderkey", "l_linenumber", "l_extendedprice"],
        sort={"l_extendedprice": -1},
        skip=10,
        limit=100,
    )


# ---------------------------------------------------------------------------
# §2.4 distinct / groupby / count
# ---------------------------------------------------------------------------


@register(
    "distinct_criteria",
    """SELECT DISTINCT c_mktsegment FROM customer WHERE c_acctbal > 0""",
)
def distinct_criteria(spark, sf):
    return table_store(spark, sf, "customer").distinct_df(
        "c_mktsegment", criteria={"c_acctbal": {"$gt": 0}}
    )


@register(
    "count_with_criteria",
    """SELECT count(*) AS n FROM orders
       WHERE o_orderstatus = 'O' AND o_totalprice >= 50000""",
)
def count_with_criteria(spark, sf):
    st = table_store(spark, sf, "orders")
    return st.query(
        criteria={"o_orderstatus": "O", "o_totalprice": {"$gte": 50000}}
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_customer_by_nation",
    """SELECT c_nationkey,
              count(*) AS n_cust,
              round(sum(c_acctbal), 2) AS sum_acctbal,
              max(c_acctbal) AS max_acctbal
       FROM customer GROUP BY c_nationkey""",
)
def agg_customer_by_nation(spark, sf):
    st = table_store(spark, sf, "customer")
    return st.query().groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


@register(
    "store_groupby_docs",
    """SELECT c_nationkey, count(*) AS n_docs,
              array_agg(c_custkey ORDER BY c_custkey) AS custkeys
       FROM customer GROUP BY c_nationkey""",
)
def store_groupby_docs(spark, sf):
    # the faithful Store.groupby surface: (_id, docs[]) — reduced here to
    # hashable outputs (group size + sorted member keys)
    g = table_store(spark, sf, "customer").groupby("c_nationkey")
    return g.select(
        F.col("_id.c_nationkey").alias("c_nationkey"),
        F.size("docs").alias("n_docs"),
        F.array_sort(F.transform("docs", lambda d: d["c_custkey"])).alias("custkeys"),
    )


@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 4) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf):
    """TPC-H Q1 flagship: criteria-compiled pushdown filter + hash agg
    with map-side partial aggregation; no UDFs, full codegen."""
    st = table_store(spark, sf, "lineitem")
    lq = st.query(criteria={"l_shipdate": {"$lte": dt.datetime(1998, 9, 2)}})
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return lq.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(charge), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
