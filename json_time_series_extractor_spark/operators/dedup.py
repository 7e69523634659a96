"""Deduplication operators for training-data pipelines.

Four families, all designed for the 100 TB regime:

- **Exact** (:func:`dedup_exact`): hash-groupBy on a normalized fingerprint;
  one shuffle on the hash, survivor = min(doc_id) (deterministic).
- **MinHash + LSH** (:func:`minhash_signatures`, :func:`lsh_candidate_pairs`):
  shingle -> k minhashes -> b bands; candidate pairs come from a self-join
  on (band_id, band_hash) — the join key is the bucket, so only same-bucket
  docs ever meet (no quadratic blow-up). Everything is Column expressions
  (``transform``/``aggregate``/``xxhash64``) — no Python workers.
- **SimHash** (:func:`simhash64`): 64-bit sign-aggregated token hashes,
  near-dups = small Hamming distance; expressed with pure expressions.
- **N-gram Jaccard** (:func:`ngram_jaccard_pairs`): exact verification of
  candidate pairs (array_intersect/array_union on distinct shingle sets);
  used standalone at small scale or as the LSH verify stage.
- **Embedding-cosine near-dup** (:func:`embedding_neardup_pairs`): pairs of
  documents whose embedding cosine similarity exceeds a threshold — exact
  all-pairs as the verification baseline, hyperplane-LSH bucketed candidates
  as the scale path (reuses the ANN machinery in ``similarity``).

All hashes derive from ``xxhash64`` with fixed seeds — deterministic across
runs and executors.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from json_time_series_extractor_spark.operators.textstats import tokens


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word ``n``-gram shingles of casefolded text. Documents
    shorter than ``n`` tokens contribute their whole token string."""
    toks = tokens(F.lower(text))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def dedup_exact(docs: DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: returns one surviving row per
    distinct content with the duplicate count.

    Output: (fingerprint, keep_id, n_dups).
    """
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                       r"\s+", " ")))
    return (docs
            .select(fp.alias("fingerprint"), F.col(id_col).alias("_id"))
            .groupBy("fingerprint")
            .agg(F.min("_id").alias("keep_id"),
                 F.count("*").alias("n_dups")))


def minhash_signatures(docs: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_n: int = 3) -> DataFrame:
    """Per-document MinHash signature: ``sig[i] = min(xxhash64(s, i))``
    over the shingle set. Map-only; signature is an ``array<bigint>``.

    Shaped as ONE ``aggregate`` over the shingle array folding an
    elementwise-min accumulator — the shingle expression appears once in
    the plan (a per-seed ``array_min(transform(...))`` comprehension would
    inline and re-evaluate the shingling ``num_hashes`` times)."""
    sh = word_shingles(F.col(text_col), shingle_n)
    max_long = (1 << 63) - 1
    sig = F.aggregate(
        sh,
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
            lambda a, b: F.least(a, b)))
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, *, bands: int = 16,
                        rows_per_band: Optional[int] = None) -> DataFrame:
    """Band the signatures and self-join on the band bucket.

    Output: distinct (id_a, id_b) with id_a < id_b. Shuffle key is
    (band_id, band_hash): hot buckets are real near-dup clusters, which is
    inherent to LSH, not key skew.
    """
    num_hashes = None
    for f in signatures.schema.fields:
        if f.name == "signature":
            num_hashes = None  # length is data-dependent; trust caller
    banded = signatures.select(
        "doc_id",
        F.posexplode(_band_hashes(F.col("signature"), bands))
        .alias("band_id", "band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band_id") == F.col("r.band_id"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("id_a"),
                    F.col("r.doc_id").alias("id_b"))
            .distinct())


def _band_hashes(signature: Column, bands: int) -> Column:
    """Hash each contiguous band of the signature into one bigint."""
    n = F.size(signature)
    rows = (n / bands).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(",", F.transform(F.slice(signature, b * rows + 1, rows),
                                         lambda x: x.cast("string"))),
            F.lit(99)))


def minhash_lsh_dedup_pairs(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", num_hashes: int = 64,
                            bands: int = 16, shingle_n: int = 3,
                            threshold: float = 0.8) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> exact
    Jaccard verify (>= threshold). Output: (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    cands = lsh_candidate_pairs(sigs, bands=bands)
    shingled = docs.select(F.col(id_col).alias("doc_id"),
                           word_shingles(F.col(text_col), shingle_n)
                           .alias("sh"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    joined = (cands
              .join(a, cands.id_a == F.col("a.doc_id"))
              .join(b, cands.id_b == F.col("b.doc_id")))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (joined
            .select("id_a", "id_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def ngram_jaccard_pairs(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Brute-force exact n-gram Jaccard over all pairs (small inputs /
    verification oracle). Output: (id_a, id_b, jaccard >= threshold)."""
    shingled = docs.select(F.col(id_col).alias("doc_id"),
                           word_shingles(F.col(text_col), shingle_n)
                           .alias("sh"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (pairs.select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"),
                         jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def embedding_neardup_pairs(embeddings: DataFrame, *,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.9,
                            use_lsh: bool = False,
                            bits: int = 8, tables: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim) with
    ``id_a < id_b`` and ``cosine_sim >= threshold``.

    ``use_lsh=False`` (exact): all-pairs self-join — the verification
    baseline, O(N^2) dot products, JVM-side only. ``use_lsh=True`` (scale
    path): random-hyperplane buckets (any of ``tables`` signature tables)
    generate candidates, exact cosine verifies — same-bucket join keys keep
    the pair count near-linear for clustered near-dups at 100 TB scale.
    """
    from json_time_series_extractor_spark.operators.similarity import (
        cosine, hyperplane_signature)

    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"))

    if use_lsh:
        first = base.select(F.size("_v").alias("d")).first()
        dim = int(first["d"]) if first else 64
        sigs = F.array(*[hyperplane_signature(F.col("_v"), bits, t, dim)
                         for t in range(tables)])
        banded = base.select(
            "_id", "_v", F.posexplode(sigs).alias("_table", "_sig"))
        a, b = banded.alias("a"), banded.alias("b")
        cands = (a.join(b, (F.col("a._table") == F.col("b._table"))
                        & (F.col("a._sig") == F.col("b._sig"))
                        & (F.col("a._id") < F.col("b._id")))
                 .groupBy(F.col("a._id").alias("id_a"),
                          F.col("b._id").alias("id_b"))
                 .agg(F.first("a._v").alias("_va"),
                      F.first("b._v").alias("_vb")))
    else:
        a, b = base.alias("a"), base.alias("b")
        cands = (a.join(b, F.col("a._id") < F.col("b._id"))
                 .select(F.col("a._id").alias("id_a"),
                         F.col("b._id").alias("id_b"),
                         F.col("a._v").alias("_va"),
                         F.col("b._v").alias("_vb")))

    return (cands
            .select("id_a", "id_b",
                    cosine(F.col("_va"), F.col("_vb")).alias("cosine_sim"))
            .where(F.col("cosine_sim") >= threshold))


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token multiset, as pure expressions.

    For each bit position j, sum(+1 if bit j of xxhash64(token) else -1)
    over tokens; result bit j = 1 if the sum is positive. Expressed as one
    ``aggregate`` over tokens accumulating a 64-element counter array.
    """
    toks = tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # shiftright needs a literal bit count, so the 64 bit-extractors are
    # built with Python-int shifts inside the merge lambda.
    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, j).bitwiseAND(F.lit(1))
                      for j in range(64)]),
            lambda c, bit: c + (bit * 2 - 1)))
    # Fold counters -> bits by zipping with a constant powers-of-two array
    # (sum == bitwise-or since the powers are distinct bits). `counters`
    # appears exactly once in the plan — no expression duplication.
    powers = F.array(*([F.lit(1 << j).cast("long") for j in range(63)]
                       + [F.lit(-(1 << 63)).cast("long")]))
    return F.aggregate(
        F.zip_with(counters, powers,
                   lambda c, p: F.when(c > 0, p)
                   .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x)


def simhash_near_dup_pairs(docs: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id", max_hamming: int = 3,
                           blocks: int = 4) -> DataFrame:
    """SimHash near-dup candidates via the block trick: split the 64-bit
    hash into ``blocks`` chunks — any pair within Hamming distance
    ``blocks - 1`` shares at least one exact chunk, so a self-join per
    chunk finds all such pairs without a cross join. Verify with popcount.

    Output: (id_a, id_b, hamming).
    """
    width = 64 // blocks
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     simhash64(F.col(text_col)).alias("simhash"))
    chunked = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            for b in range(blocks)]))
        .alias("block_id", "block_val"))
    a = chunked.alias("a")
    b = chunked.alias("b")
    hamming = _popcount64(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, (F.col("a.block_id") == F.col("b.block_id"))
                   & (F.col("a.block_val") == F.col("b.block_val"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"),
                    hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def _popcount64(col: Column) -> Column:
    return F.bit_count(col)
