"""Round-5 scale probe: graph kernels and the profile/sketch family at
10M rows / ~5M edges on local[32] — the measured evidence behind the
SCALE.md 100 TB extrapolations for these operator families.

Graph: a 2M-node graph with a triangle-rich ring+chord backbone and
1000 heavy hubs (degree ~2000) — the skewed-degree shape where a naive
wedge join explodes and the degree-oriented plan must not.

Run: python scripts/scale_probe_graph_profile.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, out):
    t0 = time.perf_counter()
    result = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    return result


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import functions as F

    from maggma_spark.session import get_spark

    spark = get_spark("scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict = {"rows": n}

    # ---- graph kernels -------------------------------------------------
    nodes = n // 5  # 2M nodes at the 10M default
    ring = (spark.range(0, nodes - 1, 1, 64)
            .select(F.col("id").alias("key_a"),
                    (F.col("id") + 1).alias("key_b")))
    chords = (spark.range(0, nodes - 2, 2, 64)
              .select(F.col("id").alias("key_a"),
                      (F.col("id") + 2).alias("key_b")))
    hubs = (spark.range(0, nodes, 1, 64)
            .select(F.col("id").alias("key_a"),
                    (F.col("id") % 1000).alias("key_b")))
    edges = ring.union(chords).union(hubs)
    n_edges = edges.count()
    timings["edges"] = n_edges

    from maggma_spark.operators.graph import (k_core, pagerank,
                                              triangle_count)

    tri = timed(f"triangle_count_{n_edges}_edges_1000_hubs", lambda:
                triangle_count(edges).collect(), timings)
    timings["triangles"] = tri[0][0]

    timed(f"pagerank_5iter_{n_edges}_edges", lambda:
          pagerank(edges, max_iter=5, directed=False)
          .agg(F.sum("rank")).collect(), timings)

    timed(f"k_core_k4_{n_edges}_edges", lambda:
          k_core(edges, k=4).count(), timings)

    # ---- profile / sketch family --------------------------------------
    df = (spark.range(0, n, 1, 64)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 97).alias("part"),
                  (F.rand(1) * 1000).alias("value"),
                  F.concat(F.lit("text-"), (F.col("id") % 250000)
                           .cast("string")).alias("payload"),
                  F.when(F.col("id") % 10 == 0, None)
                  .otherwise(F.col("id") % 7).alias("y")))

    from maggma_spark.operators.profile import (histogram,
                                                histogram_quantiles,
                                                profile_table)

    timed(f"profile_table_exact_{n}_rows_5cols", lambda:
          profile_table(df).collect(), timings)
    timed(f"profile_table_approx_{n}_rows_5cols", lambda:
          profile_table(df, approx=True).collect(), timings)
    hist = histogram(df, "value", 0.0, 1000.0, nbins=20)
    timed(f"histogram_{n}_rows_20bins", lambda: hist.collect(), timings)
    hist = hist.localCheckpoint(eager=True)
    timed(f"histogram_quantiles_{n}_rows", lambda:
          histogram_quantiles(hist, [0.5, 0.9, 0.99]).collect(), timings)

    from maggma_spark.operators.sketch import cms_build, cms_estimate

    sketch = cms_build(df, "payload", depth=5, width=4096)
    timed(f"cms_build_{n}_rows_5x4096", lambda: sketch.count(), timings)
    sketch = sketch.localCheckpoint(eager=True)
    items = (spark.range(0, 1000)
             .select(F.concat(F.lit("text-"), F.col("id").cast("string"))
                     .alias("payload")))
    timed("cms_estimate_1000_items", lambda:
          cms_estimate(sketch, items, "payload", depth=5,
                       width=4096).collect(), timings)

    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
