"""Hybrid retrieval: exact top-N reduction + reciprocal-rank fusion.

Modern curation retrieval is HYBRID — a lexical ranker (BM25) and an
embedding ranker disagree usefully, and reciprocal-rank fusion
(Cormack et al., SIGIR'09) combines them without score calibration:

    rrf(d) = Σ_rankers 1 / (k + rank_r(d)),   k = 60

Two exactness moves:

- **rank without a global sort**: each ranking is first reduced to its
  top-N candidates — for retrieval-sized N a lazy distributed partial
  top-k (TakeOrderedAndProject: bounded per-partition heaps, merged
  once, never a full Sort stage; r8), for N past the window budget the
  exact histogram threshold (:func:`rankselect.value_at_rank`, two
  counting aggregates) — and only the <= N + boundary-ties survivors
  enter a single-partition row_number window (bounded by construction,
  the same summary-window budget as the shard prefix scan). Scores
  must be int64 (fp6-quantize first): integer ties broken by ``id``
  make the rank total and engine-independent.
- **fusion without float accumulation**: each contribution
  1/(k + rank) is one IEEE division on small exact integers, quantized
  to fp6 int64 BEFORE summation, so the fused score is an
  order-independent integer sum (the bm25.py doctrine).

Scale shape per ranking: one bounded partial top-k (or, for huge N,
the two rankselect counting passes + a map-only threshold filter) +
one bounded window; fusion is a union of top-N-sized frames and one
hash aggregate. Nothing corpus-sized is fully sorted or shuffled
beyond the rankers' own plans.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators._persist import (
    materialize,
)
from json_time_series_extractor_spark.operators.rankselect import (
    value_at_rank,
)


def exact_top_n(df: DataFrame, n: int, *, score_col: str = "score",
                id_col: str = "id",
                coarse_bits: int = 20) -> DataFrame:
    """Top ``n`` rows by (score DESC, id ASC) with rank. NULL scores
    never rank. Two physical routes, identical rows either way:

    - ``n <= 2^coarse_bits`` (r8): one LAZY distributed partial top-k —
      ``orderBy(...).limit(n)`` plans as TakeOrderedAndProject
      (bounded per-partition heaps merged once; no full Sort stage —
      the same bounded pattern as the trainer-sample collects), and
      the rank window sees exactly those ``n`` rows. Zero driver
      actions, so a multi-ranker consumer (:func:`rrf_fuse`) stays ONE
      lazy plan instead of paying a persist + count + histogram
      collect per ranker.
    - larger ``n``: the sort-free histogram threshold
      (:func:`~.rankselect.value_at_rank`, two counting passes) — at
      ranks past the window budget a per-map-task heap of ``n`` rows
      is no longer O(1) state, while the counting select stays two
      map-side-combinable aggregates.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    v = F.col(score_col)
    order = [F.desc(score_col), F.asc(id_col)]
    w = Window.orderBy(*order)
    if n <= (1 << coarse_bits):
        return (df.where(v.isNotNull())
                .orderBy(*order).limit(n)
                .withColumn("rank", F.row_number().over(w)))
    # count + the two value_at_rank passes + the final window are
    # separate actions: persist or the ranker's whole plan re-executes
    # per action (bm25 inside rrf_hybrid measured 4x without this).
    nn = materialize(df.where(v.isNotNull()))
    cnt = nn.count()
    if cnt == 0:
        return nn.withColumn("rank", F.lit(0).cast("int")).limit(0)
    if cnt > n:
        t = value_at_rank(nn, score_col, cnt - n + 1,
                          coarse_bits=coarse_bits, n_rows=cnt)
        nn = nn.where(v.cast("long") >= F.lit(t))
    return (nn.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n))


def rrf_fuse(rankings: Sequence[Tuple[str, DataFrame]], *,
             k: int = 60, top_n: int = 50, id_col: str = "id",
             score_col: str = "score") -> DataFrame:
    """Fuse named rankings (each: ``id_col``, int64 ``score_col``).

    Output: (id, n_rankers, rrf_fp6, rank_<name>... — -1 where the
    ranker did not retrieve the id). Deterministic end to end: integer
    scores, id tie-breaks, fp6-quantized contributions, integer sum.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    names = [n for n, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError("ranking names must be unique")
    parts = []
    for name, df in rankings:
        top = exact_top_n(df.select(F.col(id_col).alias("id"),
                                    F.col(score_col).alias("score")),
                          top_n, score_col="score", id_col="id")
        parts.append(top.select(
            "id", F.lit(name).alias("_rk"), F.col("rank")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.floor(F.lit(1.0) / (F.lit(int(k)) + F.col("rank"))
                      .cast("double") * 1e6 + F.lit(0.5)).cast("long")
    return (u.groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_rankers"),
                 F.sum(contrib).alias("rrf_fp6"),
                 *[F.coalesce(
                     F.max(F.when(F.col("_rk") == nm, F.col("rank"))),
                     F.lit(-1)).cast("int").alias(f"rank_{nm}")
                   for nm in names]))


def rrf_oracle_sql(ranking_sqls: Sequence[Tuple[str, str]], *,
                   k: int = 60, top_n: int = 50) -> str:
    """DuckDB replay of :func:`rrf_fuse` as the naive sorted rankings
    (each SQL yields (id, score)); the histogram top-N must be
    indistinguishable from ORDER BY."""
    unions = []
    for name, sql in ranking_sqls:
        unions.append(f"""
    SELECT id, '{name}' AS rk, rn AS rank FROM (
        SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rn
        FROM ({sql}) WHERE score IS NOT NULL)
    WHERE rn <= {int(top_n)}""")
    u = "\n    UNION ALL\n".join(unions)
    rank_cols = ",\n       ".join(
        f"CAST(coalesce(max(CASE WHEN rk = '{name}' THEN rank END), -1)"
        f" AS INT) AS rank_{name}" for name, _ in ranking_sqls)
    return f"""
WITH u AS ({u})
SELECT id, CAST(count(*) AS BIGINT) AS n_rankers,
       CAST(sum(CAST(floor(1.0 / CAST({int(k)} + rank AS DOUBLE)
                           * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS rrf_fp6,
       {rank_cols}
FROM u GROUP BY 1
"""
