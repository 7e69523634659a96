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
components loop.

For adversarial shapes (long chains, high-diameter graphs) pass
``algorithm="star"``: the large-star/small-star alternation of Kiveris
et al., "Connected Components in MapReduce and Beyond" (SoCC 2014) —
each round hangs every node off the minimum of its neighborhood, which
contracts chains geometrically, converging in O(log^2 n) rounds
regardless of diameter at the cost of two join+agg passes per round.
Result-identical to min-label (cross-validated in tests); min-label
stays the default because near-dup graphs are shallow and its single
join per round is cheaper there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(pairs: DataFrame, *, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 25,
                         algorithm: str = "minlabel") -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = min node id in the node's connected cluster.
    Deterministic.

    ``algorithm="minlabel"`` (default): one join+agg per round, rounds =
    diameter; raises if ``max_iterations`` rounds don't converge (a pair
    graph with diameter > 25 is not a near-dup cluster shape).
    ``algorithm="star"``: large-star/small-star, O(log^2 n) rounds
    independent of diameter — use for long-chain/adversarial graphs."""
    if algorithm == "star":
        return _connected_components_star(pairs, id_a=id_a, id_b=id_b,
                                          max_iterations=max_iterations)
    if algorithm != "minlabel":
        raise ValueError(
            f"algorithm must be minlabel/star, got {algorithm!r}")
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
                .select(F.col("dst").alias("node"), "component",
                        F.lit(None).cast(labels.schema["component"]
                                         .dataType).alias("_old")))
        # r8 (guide §2.4): carry each node's OLD label through the
        # aggregate (every node has exactly one labels row, so
        # max(_old) recovers it) — the convergence check becomes a
        # filter over the checkpointed round output instead of a
        # join+shuffle job per round.
        own = labels.select("node", "component",
                            F.col("component").alias("_old"))
        new_labels = (own.unionByName(prop)
                      .groupBy("node")
                      .agg(F.min("component").alias("component"),
                           (F.min("component") != F.max("_old"))
                           .alias("_chg"))
                      .localCheckpoint(eager=True))
        changed = new_labels.where("_chg").limit(1).count()
        # Release the previous round's snapshot (new_labels is already
        # materialized, so nothing still depends on it); the FINAL round's
        # checkpoint stays alive for the caller.
        labels.unpersist()
        labels = new_labels.drop("_chg")
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds; the pair graph has unusually long chains — raise "
        "max_iterations explicitly")


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al. 2014, Alg. 2 reduce): for every node u,
    connect each strictly-larger neighbor to m = min(N(u) + {u}).
    Contracts tall trees: big ids hop directly toward the minimum."""
    und = (edges.union(edges.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
           .where(F.col("u") != F.col("v"))
           .distinct())
    mins = (und.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (und.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star (Alg. 3 reduce): orient every edge (max, min); each
    node u links its smaller neighbors AND itself to m = min(N(u)).
    Flattens the remaining small trees into stars on the minimum."""
    ori = (edges.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    mins = ori.groupBy("u").agg(F.min("v").alias("m"))
    linked = (ori.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    selfed = mins.select(F.col("u"), F.col("m").alias("v"))
    return (linked.unionByName(selfed)
            .where(F.col("u") != F.col("v"))
            .distinct())


def _connected_components_star(pairs: DataFrame, *, id_a: str, id_b: str,
                               max_iterations: int) -> DataFrame:
    """Large-star/small-star alternation until the edge set is stable:
    the surviving edges form stars (v, m) on each component minimum.
    O(log^2 n) rounds worst-case, ~log(diameter) in practice — the
    adversarial-graph path min-label's diameter-bounded loop refuses.

    Each round: two join+agg passes, every one an equi-join/hash-agg on
    node ids (never all-pairs), localCheckpoint-truncated like the
    min-label loop. The large-star reduce on a component's minimum is
    the known hot key of this algorithm; AQE skew-join handles it, and
    rounds are few."""
    edges = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
             .where(F.col("u") != F.col("v"))
             .distinct()
             .localCheckpoint(eager=True))
    # Self-pairs (id_a == id_b) contribute no edges, so a node appearing
    # ONLY in self-pairs would vanish from the star output while the
    # min-label path emits (node, node) for it. Record those isolated
    # nodes up front and union them back at the end — the two algorithms
    # advertise result-identity (ADVICE r4).
    isolated = (pairs.where(F.col(id_a) == F.col(id_b))
                .select(F.col(id_a).alias("node")).distinct()
                .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        after = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # Converged when the edge sets match exactly. Both sides are
        # distinct, so ONE full-outer join finding no one-sided row is
        # the whole symmetric difference (r8: was two exceptAll
        # subtract jobs per round).
        stable = (after.withColumn("_a", F.lit(1))
                  .join(edges.withColumn("_e", F.lit(1)), ["u", "v"],
                        "full_outer")
                  .where(F.col("_a").isNull() | F.col("_e").isNull())
                  .limit(1).count() == 0)
        edges.unpersist()
        edges = after
        if stable:
            roots = edges.select(F.col("v").alias("node")).distinct() \
                .withColumn("component", F.col("node"))
            members = edges.select(F.col("u").alias("node"),
                                   F.col("v").alias("component"))
            out = members.unionByName(roots)
            lonely = (isolated.join(out.select("node"), "node",
                                    "left_anti")
                      .withColumn("component", F.col("node")))
            return out.unionByName(lonely)
    edges.unpersist()
    raise RuntimeError(
        f"star connected-components did not converge in {max_iterations} "
        "rounds — pathological input; raise max_iterations explicitly")


def dedup_survivors(pairs: DataFrame, *, id_a: str = "id_a",
                    id_b: str = "id_b",
                    algorithm: str = "minlabel") -> DataFrame:
    """Per cluster: the canonical survivor (min id) and the cluster size.
    Output: (component, keep_id, n_members). ``algorithm`` passes
    through to :func:`connected_components`."""
    comps = connected_components(pairs, id_a=id_a, id_b=id_b,
                                 algorithm=algorithm)
    return (comps.groupBy("component")
            .agg(F.min("node").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_members")))
