"""Architecture throughput comparison: the reference's execution model
(driver-side Python loop over dict documents — its serial runner,
reference:src/maggma/cli/serial.py:13-68) vs this engine's Spark plans,
on identical data and identical logical work. No reference code is used;
the loop re-implements the serial MapBuilder contract from documented
behavior.

Workload design notes (honesty matters here):
- The reference's own sizing assumption is ~100k items with nontrivial
  per-item compute (its Timeout default is "100,000 items / 1 day /
  16 cores", reference:src/maggma/utils.py:179-181). The map workload
  therefore uses 100k docs (documents table replicated) and a per-item
  function with realistic compute (repeated hashing, ~100 us/doc).
  A trivial per-item fn on 5k rows is won by a bare Python loop —
  framework overhead dominates; that regime is not what either system
  is for.
- The scan workload times BOTH sides end-to-end from parquet: the
  Python side pays list materialization (the reference pays BSON
  decode + network against Mongo — strictly more).

Run: python scripts/compare_architectures.py [sf_dir]
Prints one JSON line per workload.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

REPLICAS = 20  # 5k docs -> 100k items, the reference's own sizing regime


def per_item_compute(text: str) -> str:
    """Stand-in for real scientific per-item work (~100 us/item; the
    reference's own Timeout default implies ~14 s/item budgets,
    reference:src/maggma/utils.py:179-181 — this is generous to the
    serial loop)."""
    h = text.encode()
    for _ in range(200):
        h = hashlib.sha256(h).digest()
    return h.hex()


def reference_style_map(rows, fn):
    target: dict = {}
    for item in rows:  # get_items -> process_item -> update_targets
        try:
            out = fn(item)
            out["doc_id"] = item["doc_id"]
            out["state"] = "successful"
        except Exception as exc:
            out = {"doc_id": item["doc_id"], "state": "failed", "error": str(exc)}
        target[out["doc_id"]] = out  # ReplaceOne(upsert=True) equivalent
    return target


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from maggma_spark.plans.catalog import table_store
    from maggma_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("arch-compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()  # warm the JVM
    # warm the Python workers too (fork + pandas import, once per
    # executor core) — we measure steady-state pipeline throughput, not
    # first-ever-task cold start
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long").count()

    results = []

    # ---------------- workload 1: incremental map with error capture ----
    def ufn(doc):
        if doc["n_chars"] % 997 == 0:
            raise ValueError("boom")
        return {"digest": per_item_compute(doc["text"])}

    t0 = time.perf_counter()
    con = duckdb.connect()
    base = [
        {"doc_id": r[0], "text": r[1], "n_chars": r[2]}
        for r in con.execute(
            f"SELECT doc_id, text, n_chars FROM "
            f"'{sf_dir}/documents.parquet'").fetchall()
    ]
    rows = [
        {"doc_id": d["doc_id"] + i * 1_000_000, "text": d["text"],
         "n_chars": d["n_chars"]}
        for i in range(REPLICAS) for d in base
    ]
    ref_out = reference_style_map(rows, ufn)
    ref_s = time.perf_counter() - t0

    from maggma_spark.operators.builders import MapBuilder
    from maggma_spark.sources.memory import MemoryStore

    t0 = time.perf_counter()
    docs_df = table_store(spark, sf_dir, "documents").df.select(
        "doc_id", "text", "n_chars")
    big = docs_df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
    ).withColumn("doc_id", F.col("doc_id") + F.col("__r") * 1_000_000).drop("__r")
    src = MemoryStore(spark, big, key="doc_id", name="src")
    tgt = MemoryStore(spark, None, name="t", key="doc_id",
                      schema="doc_id bigint, digest string, state string, "
                             "error string, _bt timestamp")
    MapBuilder(src, tgt, ufn=ufn, output_schema="digest string",
               incremental=False, store_process_time=False).run()
    n = tgt.count()
    spark_s = time.perf_counter() - t0
    assert n == len(ref_out), (n, len(ref_out))
    results.append({"workload": "map_builder_100k_items",
                    "rows": len(rows),
                    "reference_style_sec": round(ref_s, 3),
                    "maggma_spark_sec": round(spark_s, 3)})

    # ---------------- workload 2: filter+project scan from parquet ------
    t0 = time.perf_counter()
    con2 = duckdb.connect()
    lineitems = con2.execute(
        f"SELECT l_quantity, l_extendedprice, l_discount, l_returnflag "
        f"FROM '{sf_dir}/lineitem.parquet'").fetchall()
    ref_rows = [(r[3], r[1]) for r in lineitems
                if r[3] in ("A", "R") and r[0] >= 30]
    ref_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    cnt = table_store(spark, sf_dir, "lineitem").query(
        criteria={"l_returnflag": {"$in": ["A", "R"]},
                  "l_quantity": {"$gte": 30}},
        properties=["l_returnflag", "l_extendedprice"]).count()
    spark_s = time.perf_counter() - t0
    assert cnt == len(ref_rows)
    results.append({"workload": "filter_project_scan",
                    "rows": len(lineitems),
                    "reference_style_sec": round(ref_s, 3),
                    "maggma_spark_sec": round(spark_s, 3)})

    for r in results:
        r["speedup"] = round(r["reference_style_sec"] / r["maggma_spark_sec"], 2)
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
