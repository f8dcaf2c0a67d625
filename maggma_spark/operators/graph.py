"""Distributed connected components + duplicate-cluster resolution.

Beyond-reference capability (the reference has no graph operators; its
dedup story stops at per-pair candidates). A near-dup pipeline needs one
more step than candidate PAIRS: transitive closure into CLUSTERS, then
"keep one representative per cluster". At 100 TB the pair graph does not
fit the driver, so the closure must itself be a distributed fixpoint.

Algorithm: min-label propagation with pointer jumping.

- every node starts labeled with itself;
- each round, a node takes the min of its own label and its neighbors'
  labels (one shuffle join on the adjacency + one groupBy);
- then labels are "shortcut": comp := label(comp) (one self-join), the
  pointer-jumping step that collapses chains in O(log diameter) rounds
  instead of O(diameter).

Cost per round: 2 hash joins + 1 partial-agg groupBy, all keyed on node
ids — |E| + |V| shuffle rows, no per-round growth. Lineage is truncated
every round with localCheckpoint so the plan never deepens. Convergence
is detected with a scalar changed-count (no driver-side data collect).
For LSH dedup graphs (many tiny components, bounded by the bucket-size
cap in operators/dedup.py:_cap_buckets) this converges in 2-4 rounds.

The same round structure is the standard MapReduce CC recipe (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — the
large-star/small-star alternation; min-propagation + pointer jumping has
the same per-round shuffle shape and a simpler invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, comp) for every node appearing in `edges`, where
    comp is the MINIMUM node id of the node's connected component.

    Edges are treated as undirected; self-loops and duplicates are fine
    (they are symmetrized and deduped once up front).
    """
    a, b = F.col(src), F.col(dst)
    adj = (
        edges.select(a.alias("__a"), b.alias("__b"))
        .union(edges.select(b.alias("__a"), a.alias("__b")))
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )
    cur = (
        adj.select(F.col("__a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        # 1. neighbor-min: the smallest label among my neighbors
        nmin = (
            adj.join(
                cur.select(F.col("node").alias("__b"),
                           F.col("comp").alias("__bc")),
                on="__b",
            )
            .groupBy("__a")
            .agg(F.min("__bc").alias("__nm"))
        )
        step = (
            cur.join(nmin, cur["node"] == nmin["__a"], "left")
            .select(
                "node",
                F.col("comp").alias("__prev"),
                F.least(F.col("comp"),
                        F.coalesce(F.col("__nm"), F.col("comp"))).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # 2. pointer jumping: comp := label(comp)
        mapping = step.select(F.col("node").alias("__c"),
                              F.col("comp").alias("__cc"))
        step = (
            step.join(mapping, step["comp"] == mapping["__c"], "left")
            .select(
                "node",
                "__prev",
                F.coalesce(F.col("__cc"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = step.filter(F.col("comp") != F.col("__prev")).limit(1).count()
        cur = step.drop("__prev")
        if changed == 0:
            break
    return cur


def resolve_dup_clusters(
    df: DataFrame,
    key_col: str,
    pairs: DataFrame,
    pair_a: str = "key_a",
    pair_b: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Assign every row of `df` a cluster_id (min key of its transitive
    duplicate cluster; its own key if it appears in no pair) and a
    `keep` flag (True for exactly the min-key representative).

    `pairs` is any candidate-pair frame — exact_dedup digests,
    minhash_lsh_candidates, simhash_candidates, cosine_neardup_pairs —
    so the full dedup stack composes: candidates -> clusters -> keep.
    """
    comp = connected_components(pairs, pair_a, pair_b, max_iter=max_iter)
    joined = df.join(comp, df[key_col] == comp["node"], "left")
    return (
        joined.withColumn("cluster_id",
                          F.coalesce(F.col("comp"), F.col(key_col)))
        .withColumn("keep", F.col(key_col) == F.col("cluster_id"))
        .drop("node", "comp")
    )
