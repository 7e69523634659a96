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


def dot_flat(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled over a known dimension: ``dim`` flat
    multiply-adds that stay inside whole-stage codegen. The higher-order
    ``zip_with``+``aggregate`` form is interpreted per element (no codegen,
    an allocation per lambda step) — 5-10x slower on the ANN hot paths.
    Summation is left-to-right like the fold, so results are bit-identical."""
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1)
             for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_flat_sql(a: str, b: str, dim: int) -> Column:
    """:func:`dot_flat` built as ONE parsed SQL expression (r8):
    identical Catalyst tree (element_at products summed left-to-right,
    left-associative like the Python loop), but one py4j round trip
    instead of ~3*dim — driver-side expression construction measured
    ~2s per semdedup plan build. ``a``/``b`` are SQL-resolvable column
    references (plain or alias-qualified names)."""
    return F.expr(" + ".join(
        f"element_at({a}, {i + 1}) * element_at({b}, {i + 1})"
        for i in range(dim)))


def cosine_flat(a: Column, b: Column, dim: int) -> Column:
    """Cosine similarity with unrolled expressions (see :func:`dot_flat`).
    Bit-identical to :func:`cosine` for vectors of exactly ``dim``."""
    denom = F.sqrt(dot_flat(a, a, dim)) * F.sqrt(dot_flat(b, b, dim))
    return F.when(denom > 0, dot_flat(a, b, dim) / denom).otherwise(F.lit(0.0))


def _probe_dim(df: DataFrame, vec_col: str) -> int:
    first = df.select(F.size(vec_col).alias("d")).first()
    return int(first["d"]) if first else 64


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "vec_id",
                query_vec_col: str = "embedding",
                dim: Optional[int] = None) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank) with deterministic
    tie-break (sim desc, neighbor_id asc). Self-matches are excluded when
    ids collide.
    """
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    # Norms are per-vector, not per-pair: computing them before the join
    # turns 3 dot products per pair into 1 (the denominator reuses the
    # precomputed norms bit-identically).
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    c = c.withColumn("_cn", F.sqrt(dot_flat_sql("_cv", "_cv", dim)))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    q = q.withColumn("_qn", F.sqrt(dot_flat_sql("_qv", "_qv", dim)))
    denom = F.col("_qn") * F.col("_cn")
    # Broadcast the small query side: the cross join becomes map-side.
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.when(denom > 0,
                             dot_flat_sql("_qv", "_cv", dim)
                             / denom)
                      .otherwise(F.lit(0.0)).alias("cosine_sim")))
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
        weights = F.lit(plane_weights(table, p, dim))   # one-call literal
        dot = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)) \
                .otherwise(F.lit(0).cast("long"))

    sig = F.lit(0).cast("long")
    for p in range(bits):
        sig = sig.bitwiseOR(bit(p))
    return sig


def ivf_centroids(corpus: DataFrame, *, n_centroids: int,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  sample_cap: int = 4096, iters: int = 8,
                  seed: int = 13):
    """Deterministic spherical k-means centroids for :func:`ivf_topk`.

    Training sample = the ``sample_cap`` corpus rows with the smallest
    ``xxhash64(id, seed)`` — a deterministic pseudo-random sample that a
    TakeOrderedAndProject computes with per-partition top-k + merge (no
    global sort, no full collect; at 10^12 rows the driver still only sees
    ``sample_cap`` vectors). k-means++ init and Lloyd iterations run on a
    seeded ``numpy`` Generator, so the model is bit-reproducible across
    runs and executors with no stored state. Returns a unit-normalized
    (n_centroids, dim) ndarray."""
    import numpy as np

    sampled = (corpus
               .select(_as_double(F.col(vec_col)).alias("_v"),
                       F.xxhash64(F.col(id_col).cast("string"),
                                  F.lit(seed)).alias("_h"))
               .orderBy("_h").limit(sample_cap)
               .select("_v").collect())
    if not sampled:
        # Empty corpus: zero centroids -> ivf_topk degrades to an empty
        # result instead of a numpy axis error mid-k-means.
        return np.zeros((0, 0), dtype=np.float64)
    m = np.array([r["_v"] for r in sampled], dtype=np.float64)
    return kmeans_unit_centroids(m, n_centroids, seed=seed, iters=iters)


def kmeans_unit_centroids(m, n_centroids: int, *, seed: int = 13,
                          iters: int = 8):
    """Seeded spherical k-means over the rows of ``m`` (n, dim):
    unit-normalize, k-means++ init, Lloyd iterations with deterministic
    empty-cell re-seed. Bit-reproducible for a given (row order, k,
    seed, iters) — the shared-Python trainer both the Spark operators
    (:func:`ivf_centroids`, semdedup) and the DuckDB oracle generators
    call on identically-selected samples (the BPE 'shared trainer'
    doctrine: model-sized state is shared, corpus-sized work is done by
    each engine independently)."""
    import numpy as np

    norms = np.sqrt((m * m).sum(axis=1))
    norms[norms == 0.0] = 1.0
    u = m / norms[:, None]
    k = min(n_centroids, len(u))
    rng = np.random.default_rng(seed)
    # k-means++ on cosine distance: each next seed drawn proportional to
    # distance from the closest already-chosen centroid.
    idx = [int(rng.integers(len(u)))]
    for _ in range(k - 1):
        d = np.maximum(1.0 - (u @ u[idx].T).max(axis=1), 0.0)
        total = d.sum()
        if total <= 0:
            idx.append(int(rng.integers(len(u))))
        else:
            idx.append(int(rng.choice(len(u), p=d / total)))
    cents = u[idx].copy()
    for _ in range(iters):
        assign = np.argmax(u @ cents.T, axis=1)
        for j in range(k):
            pts = u[assign == j]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[j] = v / n
            else:
                # Re-seed an empty cell at the point farthest from its
                # centroid — deterministic (argmax ties break by index).
                far = int(np.argmin((u @ cents.T).max(axis=1)))
                cents[j] = u[far]
    return cents


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "vec_id",
             query_vec_col: str = "embedding",
             dim: Optional[int] = None) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into ``n_centroids``
    inverted cells, probe each query against its ``n_probe`` nearest cells,
    exact cosine re-rank within the probed cells.

    Centroids come from :func:`ivf_centroids` — deterministic sampled
    spherical k-means (seeded k-means++ + Lloyd), bit-reproducible with no
    stored model. Cell assignment is a blocked matmul against the broadcast
    centroid matrix (numpy/BLAS in ``mapInPandas``, map-only, no shuffle);
    the candidate join is an equi-join on ``cell``, so per-query work is
    ~N * n_probe / n_centroids instead of N.
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    c = c.withColumn("_cn", F.sqrt(dot_flat_sql("_cv", "_cv", dim)))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    q = q.withColumn("_qn", F.sqrt(dot_flat_sql("_qv", "_qv", dim)))

    cunit = ivf_centroids(corpus, n_centroids=n_centroids,
                          id_col=id_col, vec_col=vec_col)
    spark = corpus.sparkSession
    b_cunit = spark.sparkContext.broadcast(cunit)

    def assign(top: int, vcol: str):
        def run(batches):
            cu = b_cunit.value
            # A tiny corpus can yield fewer centroids than n_probe.
            eff_top = min(top, len(cu))
            if eff_top == 0:
                return  # empty corpus: no cells -> empty result
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.array(list(pdf[vcol]), dtype=np.float64)
                n = np.sqrt((m * m).sum(axis=1))
                n[n == 0.0] = 1.0
                sims = (m / n[:, None]) @ cu.T
                # top cells per row, deterministic tie-break by cell index
                order = np.argsort(-sims, axis=1, kind="stable")[:, :eff_top]
                reps = np.repeat(np.arange(len(pdf)), eff_top)
                out = pdf.iloc[reps].reset_index(drop=True)
                out["cell"] = order.ravel().astype("int32")
                yield out

        return run

    c_cells = c.mapInPandas(
        assign(1, "_cv"),
        "neighbor_id long, _cv array<double>, _cn double, cell int")
    q_cells = q.mapInPandas(
        assign(n_probe, "_qv"),
        "query_id long, _qv array<double>, _qn double, cell int")

    # Each corpus vector lives in exactly one cell and a query probes
    # n_probe distinct cells, so (query, neighbor) pairs are already unique.
    denom = F.col("_qn") * F.col("_cn")
    scored = (c_cells.join(F.broadcast(q_cells), "cell")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.when(denom > 0,
                             dot_flat_sql("_qv", "_cv", dim)
                             / denom)
                      .otherwise(F.lit(0.0)).alias("cosine_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplane_signature_table(df: DataFrame, id_col: str, vec_col: str, *,
                               bits: int, tables: int, dim: int) -> DataFrame:
    """``(id, _table, _sig)`` — every row's hyperplane bucket in each of
    ``tables`` signature tables.

    One blocked matmul per Arrow batch against the (tables*bits, dim)
    plane matrix — map-only, no shuffle, BLAS inside. The relational
    alternatives both lose badly: a per-row ``zip_with``/``aggregate`` fold
    is interpreted per element, and a ``tables*bits``-buffer flat aggregate
    blows the whole-stage-codegen field limit (spark.sql.codegen.maxFields)
    and falls back to interpreted eval — measured 5-10x slower than the
    matmul at 96 planes x 64 dims. Plane weights are the deterministic
    :func:`plane_weights` values, so signatures are reproducible across
    runs/executors with no stored model."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [plane_weights(t, p, dim) for t in range(tables)
         for p in range(bits)], dtype=np.float64)      # (tables*bits, dim)
    pow2 = (1 << np.arange(bits, dtype=np.int64))
    spark = df.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    def run(batches):
        pl = b_planes.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf["_v_"]), dtype=np.float64)   # (n, dim)
            dots = m @ pl.T                          # (n, tables*bits)
            bits_m = (dots > 0).reshape(len(pdf), tables, bits)
            sigs = (bits_m * pow2[None, None, :]).sum(axis=2)  # (n, tables)
            n = len(pdf)
            yield pd.DataFrame({
                "_sid": np.repeat(pdf["_id_"].to_numpy(), tables),
                "_table": np.tile(np.arange(tables, dtype=np.int32), n),
                "_sig": sigs.reshape(-1).astype(np.int64),
            })

    prepared = df.select(F.col(id_col).alias("_id_"),
                         _as_double(F.col(vec_col)).alias("_v_"))
    out_schema = "_sid long, _table int, _sig long"
    return (prepared.mapInPandas(run, out_schema)
            .select(F.col("_sid").alias(id_col), "_table", "_sig"))


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
        dim = _probe_dim(corpus, vec_col)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    c = c.withColumn("_cn", F.sqrt(dot_flat_sql("_cv", "_cv", dim)))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    q = q.withColumn("_qn", F.sqrt(dot_flat_sql("_qv", "_qv", dim)))

    cs = hyperplane_signature_table(c, "neighbor_id", "_cv",
                                    bits=bits, tables=tables, dim=dim)
    qs = hyperplane_signature_table(q, "query_id", "_qv",
                                    bits=bits, tables=tables, dim=dim)
    # Dedupe multi-table hits on the id pair only, then join the vectors
    # back for the exact re-rank (carrying 64-double arrays through the
    # band join would shuffle them for nothing).
    cands = (cs.join(F.broadcast(qs),
                     (cs._table == qs._table) & (cs._sig == qs._sig)
                     & (F.col("query_id") != F.col("neighbor_id")))
             .select("query_id", "neighbor_id")
             .distinct())
    denom = F.col("_qn") * F.col("_cn")
    scored = (cands
              .join(c, "neighbor_id")
              .join(F.broadcast(q), "query_id")
              .select("query_id", "neighbor_id",
                      F.when(denom > 0,
                             dot_flat_sql("_qv", "_cv", dim)
                             / denom)
                      .otherwise(F.lit(0.0)).alias("cosine_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# Deterministic PCA for embedding columns (pre-ANN dimensionality reduction)
# ---------------------------------------------------------------------------

def pca_fit(m, n_components: int):
    """Shared deterministic PCA trainer over the rows of ``m`` (n, dim):
    mean-center, eigendecompose the covariance (numpy ``eigh`` —
    deterministic for a given input), take the top ``n_components`` by
    (eigenvalue DESC, index), and fix each eigenvector's arbitrary sign
    by making its largest-|entry| coordinate positive (ties to the
    lowest index). Returns (mean, components (k, dim),
    explained_variance_ratio (k,)) — model-sized state both engines
    share, the kmeans_unit_centroids / BPE doctrine.

    PCA before PQ/IVF is the standard FAISS preprocessing step (OPQ's
    simpler sibling): it packs variance into the leading coordinates so
    sub-quantizers split balanced work."""
    import numpy as np

    m = np.asarray(m, dtype=np.float64)
    mean = m.mean(axis=0)
    c = m - mean
    cov = (c.T @ c) / max(len(m) - 1, 1)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(-w, kind="stable")[:n_components]
    comps = v[:, order].T.copy()
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(w.sum()) or 1.0
    evr = np.maximum(w[order], 0.0) / total
    return mean, comps, evr


def pca_train(embeddings: DataFrame, n_components: int = 8, *,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_cap: int = 256):
    """Train :func:`pca_fit` on the deterministic md5-ranked sample
    (the :func:`~.dedup.semdedup_centroids` selection — a
    TakeOrderedAndProject both engines replay; see
    ``semdedup_sample_sql``)."""
    import numpy as np

    sampled = (embeddings
               .where(F.col(vec_col).isNotNull())
               .select(_as_double(F.col(vec_col)).alias("_v"),
                       F.md5(F.col(id_col).cast("string")).alias("_h"),
                       F.col(id_col).alias("_id"))
               .orderBy("_h", "_id").limit(sample_cap)
               .select("_v").collect())
    return pca_fit(np.array([r["_v"] for r in sampled],
                            dtype=np.float64), n_components)


def pca_project(embeddings: DataFrame, model, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                fp6: bool = True) -> DataFrame:
    """Project every embedding onto the PCA components: per component,
    ``dot(v, comp) - dot(mean, comp)`` — the mean term is a Python
    scalar, so each coordinate is ONE fold-dot against a literal vector
    (map-only, no Python workers, no shuffle). ``fp6`` quantizes each
    coordinate to a 1e-6 int so a SQL oracle replays values exactly.

    Output: (vec_id, pc0..pc{k-1})."""
    import numpy as np

    mean, comps, _ = model
    base = (embeddings
            .where(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("vec_id"),
                    _as_double(F.col(vec_col)).alias("_v")))
    cols = []
    for i, comp in enumerate(comps):
        cvec = F.lit([float(x) for x in comp])   # one-call array literal
        off = float(np.dot(mean, comp))
        val = _dot(F.col("_v"), cvec) - F.lit(off)
        if fp6:
            val = F.floor(val * 1e6 + F.lit(0.5)).cast("long")
        cols.append(val.alias(f"pc{i}"))
    return base.select("vec_id", *cols)


def pca_oracle_sql(model, *, table: str = "embeddings",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   fp6: bool = True) -> str:
    """DuckDB replay of :func:`pca_project` with the component vectors
    embedded as DOUBLE[] literals (list_inner_product's summation
    agrees with the fold-dot at the 1e-6 quantization — the
    cosine_scores-validated pairing). Kept beside the impl."""
    import numpy as np

    mean, comps, _ = model
    exprs = []
    for i, comp in enumerate(comps):
        lits = ", ".join(repr(float(x)) for x in comp)
        off = repr(float(np.dot(mean, comp)))
        e = (f"list_inner_product(CAST({vec_col} AS DOUBLE[]), "
             f"[{lits}]::DOUBLE[]) - CAST({off} AS DOUBLE)")
        if fp6:
            e = f"CAST(floor(({e}) * 1e6 + 0.5) AS BIGINT)"
        exprs.append(f"{e} AS pc{i}")
    cols = ",\n       ".join(exprs)
    return f"""
SELECT {id_col} AS vec_id,
       {cols}
FROM {table}
WHERE {vec_col} IS NOT NULL
"""
