"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id:bigint, embedding:array<float>, ...)``:

- **Brute-force cosine top-k** (:func:`cosine_topk`): the exactness
  baseline. Dot products via ``zip_with`` + ``aggregate`` — JVM-side, no
  Python; top-k per query via a ``row_number`` window partitioned by query
  (no global sort). Cost Q x N — fine for small query sets / verification.

- **LSH-bucketed** (:func:`lsh_topk`): the scale path. Random-hyperplane
  signatures (deterministic planes derived from ``xxhash64`` of
  (plane, dim)), candidates = same-bucket join on any of ``tables``
  signature tables, exact re-rank within candidates. Recall is tunable via
  (bits, tables); candidates per query are bounded by bucket sizes, so the
  join never goes quadratic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0.0 when either norm is 0)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "vec_id",
                query_vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank) with deterministic
    tie-break (sim desc, neighbor_id asc). Self-matches are excluded when
    ids collide.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    # Broadcast the small query side: the cross join becomes map-side.
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("_qv"), F.col("_cv"))
                      .alias("cosine_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def plane_weights(table: int, plane: int, dim: int) -> list:
    """Deterministic pseudo-uniform weights in [-1, 1) for one hyperplane,
    derived from sha256(table:plane:d) — reproducible across runs/executors
    with no stored model and no RNG state."""
    import hashlib

    out = []
    for d in range(dim):
        digest = hashlib.sha256(f"{table}:{plane}:{d}".encode()).digest()
        out.append((int.from_bytes(digest[:8], "big") % 2_000_000)
                   / 1_000_000.0 - 1.0)
    return out


def hyperplane_signature(vec: Column, bits: int, table: int = 0,
                         dim: int = 64) -> Column:
    """Deterministic random-hyperplane LSH signature (one bigint).

    Plane weights are precomputed driver-side (:func:`plane_weights`) and
    embedded as constant arrays, so per row the work is ``bits`` constant-
    array dot products — no per-element hashing in the hot path.
    Bit p = 1 iff dot(plane_p, vec) > 0.
    """
    def bit(p: int) -> Column:
        weights = F.array(*[F.lit(w) for w in plane_weights(table, p, dim)])
        dot = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)) \
                .otherwise(F.lit(0).cast("long"))

    sig = F.lit(0).cast("long")
    for p in range(bits):
        sig = sig.bitwiseOR(bit(p))
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
             bits: int = 12, tables: int = 4, dim: Optional[int] = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "vec_id",
             query_vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: same-bucket candidates in any of ``tables``
    hyperplane tables, exact cosine re-rank. Output schema matches
    :func:`cosine_topk` (plus recall is approximate). ``dim`` defaults to
    probing one corpus row at plan time."""
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 64
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))

    def with_sigs(df: DataFrame, vec: str, out: str) -> DataFrame:
        sigs = F.array(*[hyperplane_signature(F.col(vec), bits, t, dim)
                         for t in range(tables)])
        return df.select("*", F.posexplode(sigs).alias("_table", out))

    cs = with_sigs(c, "_cv", "_sig")
    qs = with_sigs(q, "_qv", "_qsig")
    # Dedupe multi-table hits on the id pair only (grouping on the raw
    # embedding arrays would shuffle-compare 64-double keys for nothing).
    cands = (cs.join(F.broadcast(qs),
                     (cs._table == qs._table) & (cs._sig == qs._qsig)
                     & (F.col("query_id") != F.col("neighbor_id")))
             .groupBy("query_id", "neighbor_id")
             .agg(F.first("_qv").alias("_qv"), F.first("_cv").alias("_cv")))
    scored = cands.select(
        "query_id", "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
