"""Flagship composed-pipeline probe past bench SF (r7 verdict #9).

The per-operator 10M probes exist (SCALE.md rounds 4-8); this times
the two COMPOSED pipelines — `dedup_pipeline_end2end` and
`corpus_pipeline_full_stack` — at sf1-equivalent document scale:
/root/testdata tops out at sf0.1 (5k docs), so the probe synthesizes
a x`mult` corpus (default 100 -> 500k docs, ~1M rows inside the
dedup pipeline after its planted doubling) by unioning id-offset
copies of the sf0.1 documents table with a per-copy text
perturbation (copies are NOT near-dups of the originals, so the LSH
candidate volume stays realistic instead of planting a 100-way
clique per doc), writes it to a temp dir shaped like a testdata SF
dir, and runs the exact catalog plans against it.

Run: python scripts/scale_probe_flagship_sf1.py [mult]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from pyspark.sql import functions as F

    from maggma_spark.plans import catalog
    from maggma_spark.session import get_spark

    spark = get_spark("scale-probe-flagship-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"mult": mult}

    tmp = tempfile.mkdtemp(prefix="sf1_probe_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        base_n = docs.count()
        timings["docs"] = base_n * mult
        copies = spark.range(mult).select(F.col("id").alias("__copy"))
        big = (docs.crossJoin(F.broadcast(copies))
               .select(*[c for c in docs.columns
                         if c not in ("doc_id", "text")],
                       (F.col("doc_id") + F.col("__copy") * base_n * 2)
                       .alias("doc_id"),
                       F.when(F.col("__copy") == 0, F.col("text"))
                       .otherwise(F.concat(
                           F.col("text"), F.lit(" variant token "),
                           F.col("__copy").cast("string")))
                       .alias("text")))
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet"))

        t0 = time.perf_counter()
        row = catalog.dedup_pipeline_end2end(spark, tmp).collect()[0]
        timings["dedup_pipeline_end2end"] = round(
            time.perf_counter() - t0, 2)
        # every doc is doubled by the pipeline's planted copy; each
        # planted pair collapses to one surviving original. At this
        # volume the LSH bucket caps (_cap_buckets — the guard that
        # keeps hot shingle buckets from going quadratic) may drop a
        # tiny fraction of candidate pairs, so assert recall, not
        # perfection: a doubled id surviving means its planted pair
        # was never proposed.
        assert row["n_rows"] == 2 * base_n * mult, row
        missed = row["n_kept"] - row["n_kept_orig"]
        recall = 1.0 - missed / (base_n * mult)
        assert recall >= 0.999, (row, recall)
        timings["dedup_kept"] = row["n_kept"]
        timings["dedup_planted_recall"] = round(recall, 5)

        t1 = time.perf_counter()
        chunks = catalog.corpus_pipeline_full_stack(spark, tmp)
        agg = chunks.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("key").alias("docs"),
            F.sum("n_tokens").alias("tok")).collect()[0]
        timings["corpus_pipeline_full_stack"] = round(
            time.perf_counter() - t1, 2)
        assert agg["n"] > 0 and agg["docs"] > 0, agg
        timings["corpus_chunks"] = agg["n"]
        timings["corpus_docs_surviving"] = agg["docs"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
