"""Connected components over a near-duplicate pair list.

Pair generators (MinHash/SimHash/embedding near-dup) emit EDGES; actual
deduplication needs the CLUSTERS — transitively connected groups with one
canonical survivor each. This operator labels every node with the
smallest node id reachable from it (min-label propagation):

1. undirect the edges (both orientations, distinct);
2. start labels = own id;
3. iterate: every node takes min(own label, neighbors' labels) — one
   equi-join + one hash aggregate per round, both on the node id;
4. stop when a round changes nothing (checked with one count per round).

Rounds needed = graph diameter; near-dup clusters are dense and shallow
(diameter 2-4 in practice), so convergence is a handful of rounds. Each
round is shuffle-partitioned by node id — no driver-side graph, no
cartesian anything; at 10^12 edges this is the standard BSP connected-
components loop (a large-star/small-star variant would cut rounds to
O(log d) at the cost of two joins per round — a plug-in swap here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(pairs: DataFrame, *, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 25) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = min node id in the node's connected cluster.
    Deterministic. Raises if ``max_iterations`` rounds don't converge
    (a pair graph with diameter > 25 is not a near-dup cluster shape —
    raise the cap explicitly if you really have one)."""
    edges = (pairs.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))

    # Iterative plans MUST truncate lineage each round: persist alone
    # keeps the logical plan growing (round N's tree embeds round N-1's
    # join+union+agg), which goes exponential in planning/explain cost.
    # localCheckpoint materializes the round AND cuts the plan. On a real
    # cluster with a checkpoint dir, df.checkpoint() is the fault-tolerant
    # form of the same call.
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_iterations):
        prop = (edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), "component"))
        new_labels = (labels.unionByName(prop)
                      .groupBy("node")
                      .agg(F.min("component").alias("component"))
                      .localCheckpoint(eager=True))
        # Convergence = no label changed. One aggregate over the joined
        # old/new labels (both tiny relative to the edge set).
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.component") != F.col("o.component"))
                   .count())
        # Release the previous round's snapshot (new_labels is already
        # materialized, so nothing still depends on it); the FINAL round's
        # checkpoint stays alive for the caller.
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds; the pair graph has unusually long chains — raise "
        "max_iterations explicitly")


def dedup_survivors(pairs: DataFrame, *, id_a: str = "id_a",
                    id_b: str = "id_b") -> DataFrame:
    """Per cluster: the canonical survivor (min id) and the cluster size.
    Output: (component, keep_id, n_members)."""
    comps = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (comps.groupBy("component")
            .agg(F.min("node").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_members")))
