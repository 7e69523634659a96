"""Integer-exact PageRank — link-graph centrality for crawl curation.

Common-Crawl-scale pipelines rank hosts/pages by link centrality (the
public CC webgraph ships harmonic centrality and PageRank) and use it
as a quality prior. This is the fixed-iteration power method with the
floating point designed OUT so every engine lands on identical int64s:

    pr_0(v)     = scale DIV N
    pr_{k+1}(v) = (3·scale) DIV (20·N)
                  + (17 · Σ_{u→v} (pr_k(u) DIV outdeg(u))) DIV 20

i.e. damping d = 0.85 as the rational 17/20, all divisions explicit
integer floors. Documented deviation from textbook PageRank: mass
lost to floors and to dangling nodes is NOT redistributed — the
result is a deterministic fixed point of the integer recurrence (the
ordering, which is what a curation prior consumes, matches the float
ranking on non-pathological graphs), and exactness is what makes a
100 TB run certifiable against an oracle.

Scale shape: the Pregel shape — per iteration ONE equi-join of the
rank frame against the (outdeg-annotated, materialized once) edge
list, one hash aggregate on dst, one left join back to the node set.
Each iteration ``localCheckpoint``s: iterative DataFrame loops
otherwise stack 10 plans deep and re-derive everything (lineage
growth is the classic iterative-Spark failure). No Python, no
windows; hot dst nodes combine map-side in the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, *, iters: int = 10,
             scale: int = 10**12,
             src_col: str = "src", dst_col: str = "dst",
             ckpt_every: int = 5,
             n_nodes: int = None) -> DataFrame:
    """Integer PageRank over an edge list (duplicate edges count —
    parallel links weigh double, matching the SQL oracle's multiset
    semantics). Output: (node, pr) for every node appearing as src or
    dst. 10 iterations is the conventional curation-prior budget.

    ``ckpt_every`` (optimization round 8, guide §1.2/§5): a
    localCheckpoint per iteration made every round an eager job barrier
    — 66 driver jobs for 10 iterations, ~100 ms of scheduling each at
    bench scale. Checkpointing every ``ckpt_every`` rounds keeps the
    lineage bounded (plan depth <= ckpt_every join+agg rounds — the
    growth localCheckpoint exists to stop) while letting Spark pipeline
    the intermediate rounds' shuffles inside one job (measured 3.4s ->
    2.1s at sf0.1; rank arithmetic is untouched, results identical).
    ``n_nodes``: pass the node count when the caller already knows it
    to skip the extra count job; must equal the true distinct count.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if scale < 10**6:
        raise ValueError(f"scale must be >= 1e6, got {scale}")
    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ed = (e.join(outdeg, "src")
          .localCheckpoint(eager=True))   # annotated edges, built once
    n = int(n_nodes) if n_nodes is not None else nodes.count()
    base = (3 * scale) // (20 * n)
    pr = nodes.withColumn("pr", F.lit(scale // n).cast("long"))
    for i in range(iters):
        contrib = (ed.join(pr, ed["src"] == pr["node"])
                   .select(F.col("dst").alias("node"),
                           F.expr("pr DIV _deg").alias("_c")))
        agg = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        pr = (nodes.join(agg, "node", "left")
              .select("node",
                      (F.lit(base)
                       + F.expr("17 * coalesce(_s, 0) DIV 20"))
                      .cast("long").alias("pr")))
        if (i + 1) % ckpt_every == 0 or i == iters - 1:
            pr = pr.localCheckpoint(eager=True)
    return pr


def pagerank_oracle_sql(edges_sql: str, *, iters: int = 10,
                        scale: int = 10**12) -> str:
    """DuckDB replay of :func:`pagerank` with the iteration UNROLLED
    into chained CTEs (recursive CTEs cannot aggregate per step);
    N enters via scalar subqueries so the oracle needs no pre-pass.
    ``edges_sql`` yields (src, dst)."""
    parts = [f"""
WITH e AS ({edges_sql}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
nn AS (SELECT count(*) AS n FROM nodes),
pr0 AS (
    SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS pr
    FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
s{i} AS (
    SELECT e.dst AS node, sum(p.pr // o.deg) AS c
    FROM e JOIN pr{i - 1} p ON p.node = e.src
           JOIN outdeg o ON o.src = e.src
    GROUP BY 1),
pr{i} AS (
    SELECT n.node,
           CAST({3 * scale} // (20 * (SELECT n FROM nn))
                + 17 * COALESCE(s.c, 0) // 20 AS BIGINT) AS pr
    FROM nodes n LEFT JOIN s{i} s USING (node))""")
    parts.append(f"\nSELECT node, pr FROM pr{iters}")
    return "".join(parts)
