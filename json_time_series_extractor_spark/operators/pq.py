"""Product-quantization ANN (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) — the
memory-bounded scale path next to the IVF and hyperplane-LSH indexes
in :mod:`.similarity`.

Why PQ at 100 TB: the brute-force and IVF paths carry the full
float vectors through the candidate scan (dim x 8 bytes/row); PQ
compresses each vector to ``m`` one-byte codes (64-dim float64 ->
8 bytes, 64x), so a corpus whose vectors do not fit executor memory
scans as codes with asymmetric-distance (ADC) lookup tables and only
the top re-rank candidates ever touch the original vectors again.

Shape (all map-only until a Q x R-sized shuffle):

1. **Train** — per-subspace k-means on the SAME deterministic sample
   discipline as :func:`similarity.ivf_centroids`: the ``sample_cap``
   rows with the smallest ``xxhash64(id, seed)`` (TakeOrdered, no
   global sort), seeded k-means++ init + Lloyd on a ``numpy``
   Generator — bit-reproducible, no stored model.
2. **Encode** — unit-normalize (the index answers COSINE; dot of unit
   vectors) and argmin each subvector against its codebook: one
   ``mapInPandas`` pass, (id, code array) out.
3. **Scan** — per query, an ADC lookup table (m x n_codes dots of the
   unit query against the codebook) scores a code row as the sum of m
   table gathers — no per-row vector math. Each Arrow batch emits its
   per-query top-R by the strict total order (adc DESC, neighbor_id
   ASC); because every global top-R element is top-R in its own
   batch, the global merge reproduces the exact global ADC top-R —
   partition-invariant by construction.
4. **Re-rank** — the Q x R candidates join their original vectors back
   (equi-join; the scan never shuffles vectors) for an exact cosine
   top-k, same output contract as ``cosine_topk``:
   (query_id, neighbor_id, cosine_sim, rank), self-matches excluded.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.similarity import (
    _as_double, _probe_dim, dot_flat_sql)


def pq_train(corpus: DataFrame, *, m: int = 8, n_codes: int = 256,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: Optional[int] = None, sample_cap: int = 4096,
             iters: int = 8, seed: int = 13):
    """Per-subspace codebooks: (m, n_codes, dim/m) float64 ndarray over
    UNIT-normalized training vectors. Deterministic: hash-ordered
    bounded sample, seeded k-means++ + Lloyd, argmin/argmax ties break
    by index."""
    import numpy as np

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sampled = (corpus
               .select(_as_double(F.col(vec_col)).alias("_v"),
                       F.xxhash64(F.col(id_col).cast("string"),
                                  F.lit(seed)).alias("_h"))
               .orderBy("_h").limit(sample_cap)
               .select("_v").collect())
    dsub = dim // m
    if not sampled:
        return np.zeros((m, 0, dsub), dtype=np.float64)
    x = np.array([r["_v"] for r in sampled], dtype=np.float64)
    norms = np.sqrt((x * x).sum(axis=1))
    norms[norms == 0.0] = 1.0
    u = x / norms[:, None]
    k = min(n_codes, len(u))
    books = np.zeros((m, k, dsub), dtype=np.float64)
    rng = np.random.default_rng(seed)
    for s in range(m):
        sub = u[:, s * dsub:(s + 1) * dsub]
        x2 = (sub * sub).sum(axis=1)
        # k-means++ on L2, incremental: only the NEWEST centroid can
        # lower a point's min distance (a full recompute per step is
        # O(k^2 n d) — measured 20s+ of the 30s ADC path before this).
        first = int(rng.integers(len(sub)))
        idx = [first]
        d2min = ((sub - sub[first]) ** 2).sum(axis=1)
        for _ in range(k - 1):
            total = d2min.sum()
            if total <= 0:
                nxt = int(rng.integers(len(sub)))
            else:
                nxt = int(rng.choice(len(sub), p=d2min / total))
            idx.append(nxt)
            np.minimum(d2min, ((sub - sub[nxt]) ** 2).sum(axis=1),
                       out=d2min)
        cents = sub[idx].copy()
        for _ in range(iters):
            # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2): one matmul
            # instead of an (n, k, dsub) broadcast temporary.
            score = sub @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = np.argmax(score, axis=1)
            d2near = x2 - 2.0 * score.max(axis=1)
            for j in range(k):
                pts = sub[assign == j]
                if len(pts):
                    cents[j] = pts.mean(axis=0)
                else:
                    # Deterministic empty-cell reseed: the point
                    # farthest from its nearest centroid.
                    cents[j] = sub[int(np.argmax(d2near))]
        books[s] = cents
    return books


def pq_encode(corpus: DataFrame, codebook, *, id_col: str = "vec_id",
              vec_col: str = "embedding",
              dim: Optional[int] = None) -> DataFrame:
    """(id, code array<int>) — each UNIT-normalized subvector's argmin
    centroid. One broadcast + one map-only Arrow pass; the code row is
    m ints (m bytes on disk after parquet byte-packing)."""
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    m, k, dsub = codebook.shape
    if m * dsub != dim:
        raise ValueError(f"codebook {codebook.shape} does not tile "
                         f"dim={dim}")
    b_books = corpus.sparkSession.sparkContext.broadcast(codebook)

    src = corpus.select(F.col(id_col).alias("_id"),
                        _as_double(F.col(vec_col)).alias("_v"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_books.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["_v"]), dtype=np.float64)
            norms = np.sqrt((x * x).sum(axis=1))
            norms[norms == 0.0] = 1.0
            u = x / norms[:, None]
            codes = np.empty((len(u), books.shape[0]), dtype=np.int64)
            for s in range(books.shape[0]):
                sub = u[:, s * dsub:(s + 1) * dsub]
                # ||a-c||^2 argmin == argmax(a.c - ||c||^2/2)
                score = sub @ books[s].T \
                    - 0.5 * (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = np.argmax(score, axis=1)
            yield pd.DataFrame({"_id": pdf["_id"],
                                "code": list(codes)})

    return src.mapInPandas(run, "_id long, code array<long>") \
        .select(F.col("_id").alias(id_col), "code")


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
               n_centroids: int = 16, n_probe: int = 4,
               m: int = 8, n_codes: int = 256, rerank: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "vec_id",
               query_vec_col: str = "embedding",
               dim: Optional[int] = None, sample_cap: int = 4096,
               iters: int = 8, seed: int = 13) -> DataFrame:
    """IVF-PQ hybrid (the FAISS ``IVFxx,PQyy`` shape, non-residual
    flavor — ``by_residual=False``; codebooks are shared across cells):
    the coarse IVF quantizer prunes the scan to each query's
    ``n_probe`` nearest cells, PQ codes bound the memory of what
    remains, and the exact cosine re-rank touches only Q × R
    survivors. This is the configuration that survives BOTH 100 TB
    axes at once: IVF divides scan WORK by ~n_centroids/n_probe, PQ
    divides scan BYTES by ~dim·8/m — neither alone does both.

    One combined encode+assign pass over the corpus (map-only Arrow;
    on disk the code table would be partitioned by ``cell`` so the
    probe filter becomes partition pruning), then the same
    partition-invariant batch-local top-R scan as :func:`pq_topk`
    restricted to probed cells, then the exact re-rank. Output
    contract identical to ``cosine_topk``.
    """
    import numpy as np
    import pandas as pd

    from json_time_series_extractor_spark.operators.similarity import (
        ivf_centroids)

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    books = pq_train(corpus, m=m, n_codes=n_codes, id_col=id_col,
                     vec_col=vec_col, dim=dim, sample_cap=sample_cap,
                     iters=iters, seed=seed)
    spark = corpus.sparkSession
    empty = "query_id long, neighbor_id long, cosine_sim double, rank int"
    if books.shape[1] == 0:
        return spark.createDataFrame([], empty)
    cunit = ivf_centroids(corpus, n_centroids=n_centroids,
                          id_col=id_col, vec_col=vec_col)
    if len(cunit) == 0:
        return spark.createDataFrame([], empty)
    dsub = dim // m
    r_cap = max(rerank * k, k)

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    qrows = q.collect()  # Q is the (small) query side, like cosine_topk
    if not qrows:
        return spark.createDataFrame([], empty)
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qx = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    qn = np.sqrt((qx * qx).sum(axis=1))
    qn[qn == 0.0] = 1.0
    qu = qx / qn[:, None]
    lut = np.einsum("qsd,skd->qsk", qu.reshape(len(qu), m, dsub), books)
    # per-query probe cells: top-n_probe by cosine vs unit centroids,
    # deterministic tie-break by cell index (stable argsort)
    eff_probe = min(n_probe, len(cunit))
    probes = np.argsort(-(qu @ cunit.T), axis=1,
                        kind="stable")[:, :eff_probe]
    b = spark.sparkContext.broadcast((qids, lut, probes, cunit))

    src = corpus.select(F.col(id_col).alias("_id"),
                        _as_double(F.col(vec_col)).alias("_v"))

    def encode_assign(batches: Iterable[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        _, _, _, cu = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["_v"]), dtype=np.float64)
            norms = np.sqrt((x * x).sum(axis=1))
            norms[norms == 0.0] = 1.0
            u = x / norms[:, None]
            cell = np.argmax(u @ cu.T, axis=1).astype(np.int32)
            codes = np.empty((len(u), m), dtype=np.int64)
            for s in range(m):
                sub = u[:, s * dsub:(s + 1) * dsub]
                score = sub @ books[s].T \
                    - 0.5 * (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = np.argmax(score, axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "cell": cell,
                                "code": list(codes)})

    coded = src.mapInPandas(
        encode_assign, "_id long, cell int, code array<long>")

    def scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, lut_b, probes_b, _ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(list(pdf["code"]), dtype=np.int64)
            cells = pdf["cell"].to_numpy()
            nid = pdf["_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids_b)):
                keep = np.isin(cells, probes_b[qi]) & (nid != ids_b[qi])
                if not keep.any():
                    continue
                adc = lut_b[qi, np.arange(m)[None, :],
                            c[keep]].sum(axis=1)
                n2 = nid[keep]
                order = np.lexsort((n2, -adc))[:r_cap]
                out_q.append(np.full(len(order), ids_b[qi]))
                out_n.append(n2[order])
                out_s.append(adc[order])
            if not out_q:
                continue
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "adc": np.concatenate(out_s)})

    cand = coded.mapInPandas(
        scan, "query_id long, neighbor_id long, adc double")
    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc())
    cand = (cand.withColumn("_r", F.row_number().over(wr))
            .where(F.col("_r") <= r_cap)
            .select("query_id", "neighbor_id"))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    c = c.withColumn("_cn",
                     F.sqrt(dot_flat_sql("_cv", "_cv", dim)))
    qd = q.withColumn("_qn",
                      F.sqrt(dot_flat_sql("_qv", "_qv", dim)))
    denom = F.col("_qn") * F.col("_cn")
    scored = (cand.join(c, "neighbor_id")
              .join(F.broadcast(qd), "query_id")
              .select("query_id", "neighbor_id",
                      F.when(denom > 0,
                             dot_flat_sql("_qv", "_cv", dim)
                             / denom)
                      .otherwise(F.lit(0.0)).alias("cosine_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
            m: int = 8, n_codes: int = 256, rerank: int = 8,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "vec_id",
            query_vec_col: str = "embedding",
            dim: Optional[int] = None, sample_cap: int = 4096,
            iters: int = 8, seed: int = 13) -> DataFrame:
    """PQ-ADC approximate top-k with exact cosine re-rank of the top
    ``rerank * k`` ADC candidates per query. Output matches
    :func:`similarity.cosine_topk`: (query_id, neighbor_id,
    cosine_sim, rank), self-matches excluded, deterministic and
    partition-invariant (strict ADC total order, see module doc)."""
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    books = pq_train(corpus, m=m, n_codes=n_codes, id_col=id_col,
                     vec_col=vec_col, dim=dim, sample_cap=sample_cap,
                     iters=iters, seed=seed)
    if books.shape[1] == 0:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, "
                "rank int")
    dsub = dim // m
    r_cap = max(rerank * k, k)

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _as_double(F.col(query_vec_col)).alias("_qv"))
    qrows = q.collect()  # Q is the (small) query side, like cosine_topk
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qx = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    qn = np.sqrt((qx * qx).sum(axis=1))
    qn[qn == 0.0] = 1.0
    qu = qx / qn[:, None]
    # ADC lookup tables: (Q, m, n_codes) dots of unit query subvectors
    # against the codebooks.
    lut = np.einsum("qsd,skd->qsk",
                    qu.reshape(len(qu), m, dsub), books)
    spark = corpus.sparkSession
    b = spark.sparkContext.broadcast((qids, lut))

    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col,
                      dim=dim)

    def scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, lut_b = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(list(pdf["code"]), dtype=np.int64)  # (B, m)
            nid = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids_b)):
                adc = lut_b[qi, np.arange(m)[None, :], c].sum(axis=1)
                keep = nid != ids_b[qi]  # self-exclusion, as cosine_topk
                a, n2 = adc[keep], nid[keep]
                # strict total order (adc desc, id asc): global top-R
                # elements are each top-R in their own batch.
                order = np.lexsort((n2, -a))[:r_cap]
                out_q.append(np.full(len(order), ids_b[qi]))
                out_n.append(n2[order])
                out_s.append(a[order])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "adc": np.concatenate(out_s)})

    cand = codes.mapInPandas(
        scan, "query_id long, neighbor_id long, adc double")
    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc())
    cand = (cand.withColumn("_r", F.row_number().over(wr))
            .where(F.col("_r") <= r_cap)
            .select("query_id", "neighbor_id"))

    # Exact cosine re-rank of the Q x R survivors only.
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("_cv"))
    c = c.withColumn("_cn",
                     F.sqrt(dot_flat_sql("_cv", "_cv", dim)))
    qd = q.withColumn("_qn",
                      F.sqrt(dot_flat_sql("_qv", "_qv", dim)))
    denom = F.col("_qn") * F.col("_cn")
    scored = (cand.join(c, "neighbor_id")
              .join(F.broadcast(qd), "query_id")
              .select("query_id", "neighbor_id",
                      F.when(denom > 0,
                             dot_flat_sql("_qv", "_cv", dim)
                             / denom)
                      .otherwise(F.lit(0.0)).alias("cosine_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
