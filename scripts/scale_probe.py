"""Scale probe: core operators at 10M+ rows on local[32] — evidence that
plans hold an order of magnitude past the bench SF (not a cluster test;
shuffle shapes and memory behavior are what's being probed).

Generates a synthetic keyed table in /tmp once, then times:
  - full-scan filter+agg (pushdown + partial agg)
  - upsert of a 1% delta into a partitioned store (partition-scoped)
  - exhaustive newer_in diff (anti-join + lu compare)
  - exact-dedup digest groupBy
  - latest-per-key window

Run: python scripts/scale_probe.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/maggma_spark_scale_probe"


def timed(label, fn, out):
    t0 = time.perf_counter()
    result = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    return result


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import functions as F

    from maggma_spark.session import get_spark
    from maggma_spark.sources.parquet import ParquetStore

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"rows": n}

    data_path = f"{BASE}/base"
    if os.path.exists(BASE):
        shutil.rmtree(BASE)

    def gen():
        (spark.range(0, n, 1, 64)
         .select(
             F.col("id").alias("k"),
             (F.col("id") % 97).alias("part"),
             F.timestamp_millis(F.lit(1700000000000) + F.col("id") % 100000)
             .alias("last_updated"),
             (F.rand(1) * 1000).alias("value"),
             F.concat(F.lit("text-"), (F.col("id") % 250000).cast("string"))
             .alias("payload"),
         )
         .write.partitionBy("part").parquet(data_path))

    timed("generate_partitioned_10M", gen, timings)
    store = ParquetStore(spark, data_path, key="k",
                         last_updated_field="last_updated",
                         partition_by=["part"])

    timed("filter_agg_scan", lambda: (
        store.query({"value": {"$gte": 500}})
        .groupBy("part").agg(F.count(F.lit(1)), F.sum("value")).count()
    ), timings)

    # update locality matters: a delta clustered in 5/97 partitions
    # rewrites ~5% of the table; the same row count scattered across all
    # partitions rewrites everything (measured both ways below)
    delta_clustered = (spark.range(0, n, 20)
                       .filter((F.col("id") % 97) < 5)
                       .select(F.col("id").alias("k"),
                               (F.col("id") % 97).alias("part"),
                               F.timestamp_millis(F.lit(1800000000000))
                               .alias("last_updated"),
                               F.lit(-1.0).alias("value"),
                               F.lit("updated").alias("payload")))
    timed("upsert_clustered_delta_5of97_parts",
          lambda: store.update(delta_clustered), timings)

    delta_scattered = (spark.range(0, n, 100)
                       .select(F.col("id").alias("k"),
                               (F.col("id") % 97).alias("part"),
                               F.timestamp_millis(F.lit(1800000000001))
                               .alias("last_updated"),
                               F.lit(-2.0).alias("value"),
                               F.lit("updated2").alias("payload")))
    timed("upsert_scattered_delta_all_parts",
          lambda: store.update(delta_scattered), timings)

    src = ParquetStore(spark, data_path, key="k",
                       last_updated_field="last_updated", partition_by=["part"])
    tgt_df = src.df.withColumn(
        "last_updated",
        F.when(F.col("k") % 1000 == 0,
               F.col("last_updated") + F.expr("INTERVAL 1 DAY"))
        .otherwise(F.col("last_updated")))
    from maggma_spark.sources.memory import MemoryStore

    tgt = MemoryStore(spark, tgt_df, key="k", last_updated_field="last_updated")
    timed("newer_in_exhaustive_diff", lambda: src.newer_in(
        tgt, exhaustive=True).count(), timings)

    from maggma_spark.operators.dedup import exact_dedup

    timed("exact_dedup_digest", lambda: exact_dedup(
        src.df.select("k", "payload"), "payload", "k").count(), timings)

    from maggma_spark.operators.merge import latest_per_key

    timed("latest_per_key_window", lambda: latest_per_key(
        src.df.select("k", "part", "last_updated"), "part", "last_updated",
        tiebreak=["k"]).count(), timings)

    # round-4 operators an order of magnitude past the bench SF:
    # CC fixpoint on a chain-heavy n/2-edge graph (worst-ish diameter
    # before pointer jumping), and zero-shuffle chunking of n/10 docs
    from maggma_spark.operators.graph import connected_components

    edges = (spark.range(0, n // 2, 1, 64)
             .select((F.col("id") * 2).alias("key_a"),
                     (F.col("id") * 2 + 1).alias("key_b"))
             .union(spark.range(0, n // 20, 1, 64)
                    .select((F.col("id") * 20).alias("key_a"),
                            (F.col("id") * 20 + 2).alias("key_b"))))
    timed(f"connected_components_{n // 2 + n // 20}_edges", lambda:
          connected_components(edges).select(
              F.countDistinct("comp")).collect(), timings)

    from maggma_spark.operators.corpus import chunk_documents

    docs = (spark.range(0, n // 10, 1, 64)
            .select(F.col("id").alias("doc_id"),
                    F.concat_ws(" ", F.array_repeat(
                        F.concat(F.lit("w"), (F.col("id") % 1000)
                                 .cast("string")), 300)).alias("text")))
    timed("chunk_300tok_docs_into_128win", lambda: chunk_documents(
        docs, max_tokens=128, overlap=16).count(), timings)

    # incremental dedup: build a signature index over n/20 mostly-unique
    # docs ONCE, then dedup an n/200 batch (half planted copies, half
    # novel) against it — the claim under test is increment << build.
    from maggma_spark.operators.index import MinHashIndex

    n_corpus, n_batch = n // 20, n // 200
    mk_text = F.concat_ws(" ", *[
        F.concat(F.lit(f"s{j}x"),
                 ((F.col("id") * 31 + j * 7) % 1000003).cast("string"))
        for j in range(30)
    ])
    corpus_docs = (spark.range(0, n_corpus, 1, 64)
                   .select(F.col("id").alias("doc_id"),
                           mk_text.alias("text")))
    idx = MinHashIndex(spark, f"{BASE}/mhidx", num_hashes=32, bands=8)
    timed(f"minhash_index_build_{n_corpus}_docs",
          lambda: idx.build(corpus_docs), timings)
    copies = (spark.range(0, n_batch // 2, 1, 32)
              .select((F.col("id") + 10_000_000).alias("doc_id"),
                      mk_text.alias("text")))  # same text rule => dups
    novel = (spark.range(0, n_batch - n_batch // 2, 1, 32)
             .select((F.col("id") + 20_000_000).alias("doc_id"),
                     F.concat_ws(" ", *[
                         F.concat(F.lit(f"n{j}y"),
                                  ((F.col("id") * 17 + j) % 999983)
                                  .cast("string"))
                         for j in range(30)
                     ]).alias("text")))
    batch = copies.unionByName(novel)
    timed(f"minhash_index_increment_{n_batch}_batch", lambda:
          idx.dedup_increment(batch, jaccard_threshold=0.8).count(),
          timings)

    # deterministic training shuffle: n rows -> 256 shards, rank window
    # included (the full export plan minus the disk write)
    from maggma_spark.operators.corpus import dedup_paragraphs, shuffle_shards

    timed(f"shuffle_shards_{n}_rows_256_shards", lambda: shuffle_shards(
        src.df.select("k", "payload"), "k", 256, seed=3)
        .groupBy("shard").count().count(), timings)

    # paragraph dedup over n/20 docs x 8 paragraphs with a 1-in-50
    # duplicated paragraph pool (window + regroup at ~n/2.5 paragraphs)
    para_docs = (spark.range(0, n // 20, 1, 64)
                 .select(F.col("id").alias("doc_id"),
                         F.concat_ws("\n\n", *[
                             F.concat(F.lit(f"para {j} body "),
                                      ((F.col("id") * 13 + j * 101) % (n // 50))
                                      .cast("string"))
                             for j in range(8)
                         ]).alias("text")))
    timed(f"dedup_paragraphs_{n // 20}_docs_8para", lambda: dedup_paragraphs(
        para_docs).agg(F.sum("n_paras_dropped")).collect(), timings)

    # late round-4 operators at full n: the claims under test are
    # (a) the budget cumsum has NO single-partition stage, (b) the
    # funnel is one shuffle over n events, (c) sessionize's two windows
    # share one exchange, (d) checksums compress n rows to 4096 buckets
    from maggma_spark.operators.analytics import funnel_steps, sessionize
    from maggma_spark.operators.corpus import select_token_budget
    from maggma_spark.operators.merge import table_checksums

    budget_in = src.df.select(
        "k", F.col("value").alias("score"),
        (F.col("k") % 400 + 50).alias("toks"))
    timed(f"select_token_budget_{n}_rows", lambda: select_token_budget(
        budget_in, budget_tokens=n * 10, score_col="score",
        token_col="toks", key_col="k").count(), timings)

    events = src.df.select(
        (F.col("k") % (n // 100)).alias("user_id"),
        F.col("last_updated").alias("ts"),
        F.col("k").alias("event_id"),
        F.when(F.col("k") % 3 == 0, "view")
        .when(F.col("k") % 3 == 1, "click")
        .otherwise("purchase").alias("event_type"))
    timed(f"funnel_3step_{n}_events", lambda: funnel_steps(
        events, "user_id", "ts", "event_type",
        ["view", "click", "purchase"])
        .agg(F.sum("steps_completed")).collect(), timings)

    timed(f"sessionize_{n}_events", lambda: sessionize(
        events, "user_id", "ts", gap_seconds=60,
        order_cols=["event_id"])
        .agg(F.max("session_seq")).collect(), timings)

    timed(f"table_checksums_{n}_rows_4096_buckets", lambda: table_checksums(
        src.df.select("k", "value", "payload"), "k", buckets=4096)
        .count(), timings)

    print(json.dumps(timings))
    shutil.rmtree(BASE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
