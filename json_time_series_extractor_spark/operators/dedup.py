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

from json_time_series_extractor_spark.operators._persist import (
    materialize as _materialize)
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
    from json_time_series_extractor_spark.operators.textstats import (
        normalized_fingerprint)

    fp = normalized_fingerprint(F.col(text_col))
    return (docs
            .select(fp.alias("fingerprint"), F.col(id_col).alias("_id"))
            .groupBy("fingerprint")
            .agg(F.min("_id").alias("keep_id"),
                 F.count("*").alias("n_dups")))


def dedup_paragraphs(docs: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n\n") -> DataFrame:
    """Cross-document paragraph-level exact dedup (the boilerplate
    remover real pretraining pipelines run after URL/doc dedup: nav
    bars, cookie banners and footers repeat verbatim across a site).

    A paragraph survives only in its FIRST occurrence — the smallest
    ``(doc_id, position)`` over all documents containing it; every later
    copy is dropped and the documents are reassembled from their
    surviving paragraphs in original order.

    Output: (doc_id, clean_text, n_paras, n_dropped).

    Scale shape: posexplode (map-only) -> one partial/final hash
    aggregate keyed by paragraph to pick the keeper (a million-fold
    boilerplate paragraph collapses MAP-SIDE — deliberately an
    aggregate+join, not a window over partitionBy(paragraph), which
    would funnel each hot paragraph through one task) -> equi-join back
    -> one aggregate by document to reassemble. The keeper key is
    ``min(struct(doc_id, pos))`` — lexicographic struct ordering, so it
    works for ANY orderable id type (string URLs, the natural key of a
    crawl corpus, included) with no numeric packing and therefore no
    overflow or paragraph-count bound.
    """
    # _materialize: paras feeds BOTH the keeper aggregate and the join
    # probe; without it the posexplode+split subplan executes twice
    # (measured 1.25x whole-operator cost at 12M paragraphs — Spark
    # reuses exchanges, not arbitrary subplans).
    paras = _materialize(
        docs.select(F.col(id_col).alias("_doc"),
                    F.posexplode(F.split(F.col(text_col), sep))
                    .alias("_pos", "_para")))
    occ = F.struct(F.col("_doc").alias("d"), F.col("_pos").alias("p"))
    keepers = (paras
               .groupBy("_para")
               .agg(F.min(occ).alias("_keeper")))
    kept = (paras
            .join(keepers, "_para")
            .withColumn("_keep", occ == F.col("_keeper")))
    return (kept.groupBy("_doc")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("_keep"),
                        F.struct(F.col("_pos").alias("p"),
                                 F.col("_para").alias("t"))))),
                    lambda s: s["t"]), sep).alias("clean_text"),
                 F.sum(F.col("_keep").cast("int")).alias("n_paras"),
                 F.sum((~F.col("_keep")).cast("int")).alias("n_dropped"))
            .select(F.col("_doc").alias(id_col), "clean_text",
                    "n_paras", "n_dropped"))


def minhash_signatures(docs: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_n: int = 3) -> DataFrame:
    """Per-document MinHash signature: ``sig[i] = min(xxhash64(s, i))``
    over the shingle set; signature is an ``array<bigint>``.

    Shaped as explode(shingles) -> ``num_hashes`` flat ``min`` aggregates.
    The per-shingle work is plain whole-stage-codegen expressions (a
    nested ``aggregate``/``zip_with`` fold is 5-10x slower per row:
    higher-order lambdas allocate an array per step and defeat codegen).
    The groupBy is effectively map-only: shingles of a document live in its
    input partition, so map-side partial aggregation collapses to ~1 row
    per document before the (tiny) shuffle."""
    sh = word_shingles(F.col(text_col), shingle_n)
    # explode_outer, NOT explode: plain explode makes Generate inject a
    # pre-filter (size>0 AND isnotnull) that re-evaluates the whole shingle
    # HOF expression twice more per row — ~6x slower (HOFs get no codegen
    # subexpression elimination). word_shingles is never empty/null, so the
    # two are result-identical here.
    #
    # The shingle STRING is hashed once (variable-length input); the
    # num_hashes family then re-hashes that fixed 8-byte value — measured
    # ~3x faster than hashing the string per function at num_hashes=64,
    # and the min-hash property only needs the family to be independent
    # hashes of the shingle's identity.
    exploded = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode_outer(sh).alias("_s"))
                .select("doc_id", F.xxhash64("_s").alias("_h")))
    mins = [F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}")
            for i in range(num_hashes)]
    return (exploded.groupBy("doc_id").agg(*mins)
            .select("doc_id",
                    F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
                    .alias("signature")))


def lsh_candidate_pairs(signatures: DataFrame, *, bands: int = 16,
                        rows_per_band: Optional[int] = None,
                        max_bucket_size: Optional[int] = None,
                        observation=None) -> DataFrame:
    """Band the signatures and self-join on the band bucket.

    Output: distinct (id_a, id_b) with id_a < id_b. Shuffle key is
    (band_id, band_hash): hot buckets are real near-dup clusters, which is
    inherent to LSH, not key skew — but at web scale a templated/
    boilerplate cluster can put 10^5-10^6 members in ONE bucket, and the
    self-join would emit B^2 pairs from it (10^10+ from a single bucket).

    ``max_bucket_size`` bounds that: buckets with more than this many
    members skip the self-join and instead emit STAR edges
    (bucket-min, member) — linear in B and connected-components-
    equivalent to the clique (every member still reaches the same
    cluster), at the cost that downstream Jaccard verification sees each
    capped member paired with the bucket representative only. ``None``
    (default) keeps the exact all-pairs behavior.

    Capping is never silent: pass a ``pyspark.sql.Observation`` as
    ``observation`` and the action that consumes the pairs records
    ``capped_buckets`` (buckets that overflowed) and ``total_buckets``
    alongside the result.
    """
    banded = signatures.select(
        "doc_id",
        F.posexplode_outer(_band_hashes(F.col("signature"), bands))
        .alias("band_id", "band_hash"))
    if max_bucket_size is not None:
        if max_bucket_size < 2:
            raise ValueError(
                f"max_bucket_size must be >= 2, got {max_bucket_size}")
        from pyspark.sql import Window
        # One pass over the banded rows annotates each with its bucket
        # size and representative (min id). The window shuffles on the
        # SAME key the self-join needs, so the join below reuses the
        # exchange; the mega-bucket's window task is a linear count/min,
        # not a sort.
        w = Window.partitionBy("band_id", "band_hash")
        banded = (banded
                  .withColumn("_bn", F.count(F.lit(1)).over(w))
                  .withColumn("_rep", F.min("doc_id").over(w)))
        if observation is not None:
            is_rep = F.col("doc_id") == F.col("_rep")
            banded = banded.observe(
                observation,
                F.sum((is_rep & (F.col("_bn") > max_bucket_size))
                      .cast("long")).alias("capped_buckets"),
                F.sum(is_rep.cast("long")).alias("total_buckets"))
        small = banded.where(F.col("_bn") <= max_bucket_size)
        star = (banded
                .where((F.col("_bn") > max_bucket_size)
                       & (F.col("doc_id") != F.col("_rep")))
                .select(F.col("_rep").alias("id_a"),
                        F.col("doc_id").alias("id_b")))
    else:
        small, star = banded, None
    left = small.alias("l")
    right = small.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band_id") == F.col("r.band_id"))
                       & (F.col("l.band_hash") == F.col("r.band_hash"))
                       & (F.col("l.doc_id") < F.col("r.doc_id")))
             .select(F.col("l.doc_id").alias("id_a"),
                     F.col("r.doc_id").alias("id_b")))
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


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
                            threshold: float = 0.8,
                            materialize: bool = True,
                            max_bucket_size: Optional[int] = None,
                            observation=None) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> exact
    Jaccard verify (>= threshold). Output: (id_a, id_b, jaccard).

    ``materialize`` persists the signature and shingle tables, which the
    self-join and verify stages each read twice (see :func:`_materialize`).
    ``max_bucket_size``/``observation`` pass through to
    :func:`lsh_candidate_pairs` (mega-bucket star capping + its metrics);
    capped members are Jaccard-verified against the bucket representative
    only. The library default is ``None`` (exact all-pairs) so oracle /
    verification runs stay exhaustive; every CLI-reachable path defaults
    the cap to 10^4 (``cli.py --max-bucket-size``) because one templated
    10^6-member bucket would otherwise self-join into 10^12 pairs.
    """
    if num_hashes % bands != 0 or bands > num_hashes:
        # _band_hashes slices rows = num_hashes/bands per band: a remainder
        # silently ignores trailing hashes; bands > num_hashes degenerates
        # to empty slices (every doc in one bucket -> all-pairs join).
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}")
    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    if materialize:
        sigs = _materialize(sigs)
    cands = lsh_candidate_pairs(sigs, bands=bands,
                                max_bucket_size=max_bucket_size,
                                observation=observation)
    shingled = docs.select(F.col(id_col).alias("doc_id"),
                           word_shingles(F.col(text_col), shingle_n)
                           .alias("sh"))
    if materialize:
        shingled = _materialize(shingled)
    a = shingled.alias("a")
    b = shingled.alias("b")
    joined = (cands
              .join(a, cands.id_a == F.col("a.doc_id"))
              .join(b, cands.id_b == F.col("b.doc_id")))
    return (joined
            .select("id_a", "id_b", _jaccard(F.col("a.sh"), F.col("b.sh"))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def _jaccard(sh_a: Column, sh_b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-shingle arrays. The union size is
    derived as |A|+|B|-|A∩B| — array_union would materialize (and size) a
    second large array per pair just to count it."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        materialize: bool = True) -> DataFrame:
    """Exact n-gram Jaccard pairs (>= threshold) via an inverted index:
    explode shingles, equi-join on the shingle hash, count co-occurrences
    per pair, derive union from the per-doc set sizes.

    Output: (id_a, id_b, jaccard). Exact for any threshold > 0 (pairs with
    zero common shingles have jaccard 0 and are never candidates), without
    ever forming the full pair cross-product — unlike a nested-loop
    all-pairs ``array_intersect``, the join fans out only where shingles
    actually co-occur, so it survives corpus sizes where N^2 cannot. The
    equi-join key is ``xxhash64(shingle)`` (8 bytes shuffled per posting
    instead of the shingle text)."""
    shingled = docs.select(F.col(id_col).alias("doc_id"),
                           word_shingles(F.col(text_col), shingle_n)
                           .alias("sh"))
    # explode_outer: see minhash_signatures for the Generate-filter trap.
    postings = shingled.select(
        "doc_id", F.explode_outer("sh").alias("_s")).select(
        "doc_id", F.xxhash64("_s").alias("_h"))
    if materialize:
        postings = _materialize(postings)
    # Shingles are distinct per doc, so |set| = posting count — derived
    # from the (materialized) postings instead of re-shingling.
    sizes = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = postings.alias("a"), postings.alias("b")
    inter = (a.join(b, (F.col("a._h") == F.col("b._h"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("_inter")))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("_sza"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("_szb"))
    jac = F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def embedding_neardup_pairs(embeddings: DataFrame, *,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.9,
                            use_lsh: Optional[bool] = None,
                            bits: int = 8, tables: int = 8,
                            exact_max_rows: int = 1_000_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim) with
    ``id_a < id_b`` and ``cosine_sim >= threshold``.

    ``use_lsh=False`` (exact): blocked matrix products — the corpus is
    broadcast as one numpy matrix and each partition multiplies its block
    against it (Arrow-batched ``mapInPandas``, BLAS inside). This is the
    verification baseline: exact, but it collects the corpus to the
    driver, so it is ONLY safe below ~10^6-10^7 vectors.
    ``use_lsh=True`` (scale path): random-hyperplane buckets (any of
    ``tables`` signature tables) generate candidates, exact cosine
    verifies — same-bucket join keys keep the pair count near-linear for
    clustered near-dups at 100 TB scale.
    ``use_lsh=None`` (default) auto-switches: corpora above
    ``exact_max_rows`` take the LSH path, so calling the operator with
    defaults at warehouse scale can never OOM the driver (the count is one
    map-side-collapsed aggregate, paid only in auto mode).
    """
    from json_time_series_extractor_spark.operators.similarity import (
        dot_flat_sql, hyperplane_signature_table)

    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"))
    from json_time_series_extractor_spark.operators.similarity import (
        _probe_dim)

    dim = _probe_dim(base, "_v")

    if use_lsh is None:
        # limit+count short-circuits after exact_max_rows+1 rows — a full
        # count() would scan the whole corpus just to compare thresholds.
        use_lsh = base.limit(exact_max_rows + 1).count() > exact_max_rows
    if not use_lsh:
        return _neardup_pairs_blocked(base, threshold)

    # Per-vector norm computed once, before any pairing (1 dot per pair).
    base = base.withColumn(
        "_n", F.sqrt(dot_flat_sql("_v", "_v", dim)))
    banded = _materialize(  # self-joined below: hash each vector once
        hyperplane_signature_table(base, "_id", "_v", bits=bits,
                                   tables=tables, dim=dim))
    a, b = banded.alias("a"), banded.alias("b")
    pair_ids = (a.join(b, (F.col("a._table") == F.col("b._table"))
                       & (F.col("a._sig") == F.col("b._sig"))
                       & (F.col("a._id") < F.col("b._id")))
                .select(F.col("a._id").alias("id_a"),
                        F.col("b._id").alias("id_b"))
                .distinct())
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                     F.col("_n").alias("_na"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                     F.col("_n").alias("_nb"))
    cands = pair_ids.join(va, "id_a").join(vb, "id_b")

    # Vectorized verify: one einsum per Arrow batch over the joined pair
    # vectors (the join stays relational — the scale path never broadcasts
    # the corpus; only the per-pair scoring drops into numpy).
    def verify(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf["_va"]), dtype=np.float64)
            b = np.array(list(pdf["_vb"]), dtype=np.float64)
            denom = pdf["_na"].to_numpy() * pdf["_nb"].to_numpy()
            dots = np.einsum("ij,ij->i", a, b)
            cos = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0),
                           0.0)
            keep = cos >= threshold
            yield pd.DataFrame({
                "id_a": pdf["id_a"].to_numpy()[keep],
                "id_b": pdf["id_b"].to_numpy()[keep],
                "cosine_sim": cos[keep],
            })

    return cands.mapInPandas(verify,
                             "id_a long, id_b long, cosine_sim double")


def _neardup_pairs_blocked(base: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked matrix products.

    The whole corpus (ids + unit-normalized float64 matrix) is broadcast;
    each Arrow batch computes ``block @ corpus.T`` with numpy/BLAS and
    emits the surviving (id_a < id_b) pairs. Joining the pairs relationally
    would materialize two 64-double arrays per candidate pair — measured
    ~10x slower than the matmul at 2k vectors, and the gap grows with N^2.
    """
    import numpy as np
    import pandas as pd

    rows = base.collect()  # broadcast build side (verification-scale only)
    ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["_v"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0  # zero vectors: cosine defined as 0
    unit = mat / norms[:, None]
    spark = base.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_unit = spark.sparkContext.broadcast(unit)

    def run(batches):
        all_ids = b_ids.value
        all_unit = b_unit.value
        for pdf in batches:
            blk_ids = pdf["_id"].to_numpy(dtype=np.int64)
            blk = np.array(list(pdf["_v"]), dtype=np.float64)
            n = np.sqrt((blk * blk).sum(axis=1))
            n[n == 0.0] = 1.0
            sims = (blk / n[:, None]) @ all_unit.T
            keep = (sims >= threshold) & (blk_ids[:, None] < all_ids[None, :])
            i, j = np.nonzero(keep)
            yield pd.DataFrame({
                "id_a": blk_ids[i],
                "id_b": all_ids[j],
                "cosine_sim": sims[i, j],
            })

    return base.select("_id", "_v").mapInPandas(
        run, "id_a long, id_b long, cosine_sim double")


def remove_duplicate_spans(docs: DataFrame, *, n: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Exact-substring span REMOVAL — the acting half of Lee et al.
    (ACL'22) suffix-array dedup, of which :func:`duplicate_ngram_stats`
    is the signal: corpus-duplicated token runs are cut out of every
    occurrence except one canonical keeper, so boilerplate survives the
    corpus exactly once instead of per page.

    Semantics (deterministic, partition-invariant, SQL-replayable):

    - positional casefolded token ``n``-grams are *duplicated* when
      their window hash occurs >= 2 times corpus-wide (same rule as the
      stats op — same-doc repeats count);
    - each duplicated window hash has ONE canonical keeper occurrence:
      the lexicographically smallest (doc_id, position);
    - a token survives iff SOME window covering it is non-duplicated or
      keeper-owned; tokens covered only by foreign duplicated windows
      are removed. Docs shorter than ``n`` tokens (no windows) pass
      through whole.

    Output: (doc_id, n_tokens, n_removed, text_clean) — ``text_clean``
    the surviving ORIGINAL-case tokens joined by single spaces
    (whitespace is normalized; hashing casefolds, the output does not).

    Scale shape: windows explode (~tokens rows, materialized once —
    they feed the count aggregate, the keeper aggregate and the
    coverage fan-out), collapse through two partial/final hash
    aggregates on the 64-bit hash (count + min-struct keeper; hot
    boilerplate combines map-side), fan out n coverage rows per window
    (a bounded n× blowup of token rows), and roll back up per (doc,
    token) then per doc. No windows over raw text, no Python;
    ``hash_fn='md5hi'`` keeps the whole pipeline SQL-recomputable.
    """
    from json_time_series_extractor_spark.operators.textstats import (
        tokens)

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    ltoks = tokens(F.lower(F.col(text_col)))
    wins = F.when(
        F.size(ltoks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(ltoks) - n),
                    lambda i: F.concat_ws(" ", F.slice(ltoks, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))
    win_rows = _materialize(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.posexplode(wins).alias("_p0", "_w"))
        .select("doc_id", (F.col("_p0") + 1).alias("pos"),
                _token_hash64(F.col("_w"), hash_fn).alias("_h")))
    stats = (win_rows.groupBy("_h")
             .agg(F.count(F.lit(1)).alias("_cnt"),
                  F.min(F.struct(F.col("doc_id").alias("d"),
                                 F.col("pos").alias("p"))).alias("_k")))
    flagged = (win_rows
               .join(stats, "_h")
               .select("doc_id", "pos",
                       ((F.col("_cnt") < 2)
                        | ((F.col("_k.d") == F.col("doc_id"))
                           & (F.col("_k.p") == F.col("pos"))))
                       .alias("_ok")))
    cover = (flagged
             .select("doc_id", "_ok",
                     F.explode(F.sequence(
                         F.col("pos"),
                         F.col("pos") + F.lit(n - 1))).alias("j"))
             .groupBy("doc_id", "j")
             .agg(F.max("_ok").alias("_keep")))
    tok_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_j0", "tok")
    ).select("doc_id", (F.col("_j0") + 1).alias("j"), "tok")
    fin = (tok_rows.join(cover, ["doc_id", "j"], "left")
           .withColumn("_keep", F.coalesce("_keep", F.lit(True))))
    per_doc = (fin.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                    .alias("n_removed"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(F.col("_keep"),
                                       F.struct(F.col("j").alias("j"),
                                                F.col("tok")
                                                .alias("t"))))),
                            lambda s: s["t"]).alias("_st"), " ")
                    .alias("text_clean")))
    # empty/whitespace-only docs have zero token rows: reattach whole
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.coalesce("text_clean", F.lit(""))
                    .alias("text_clean")))


def _token_hash64(tok: Column, hash_fn: str) -> Column:
    """64-bit token hash for SimHash. ``xxhash64`` (default, fastest,
    JVM-native) or ``md5hi`` — the high 64 bits of md5, chosen because a
    SQL oracle can recompute it (DuckDB has md5 but not xxhash64), making
    md5hi-based simhashes value-verifiable end-to-end. The two hex halves
    are combined with shift+or (bitwise, so the sign bit wraps instead of
    tripping ANSI overflow checks)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(tok)
    if hash_fn == "md5hi":
        hx = F.md5(tok)
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown hash_fn {hash_fn!r} "
                     "(expected 'xxhash64' or 'md5hi')")


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token multiset, as pure expressions.

    For each bit position j, sum(+1 if bit j of xxhash64(token) else -1)
    over tokens; result bit j = 1 if the sum is positive. Expressed as one
    ``aggregate`` over tokens accumulating a 64-element counter array.
    NULL text is treated as empty (simhash 0), matching
    :func:`simhash64_agg`'s explode_outer path.
    """
    toks = tokens(F.lower(F.coalesce(text, F.lit(""))))
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


def simhash64_agg(docs: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  hash_fn: str = "xxhash64") -> DataFrame:
    """(doc_id, simhash) via explode + 64 flat sign-sum aggregates —
    result-identical to :func:`simhash64` but 5-10x faster (same
    HOF-vs-codegen reasoning as :func:`minhash_signatures`; the groupBy
    collapses map-side to ~1 row/doc). Tokenless documents get simhash 0,
    matching the expression path (all counters zero). ``hash_fn``: see
    :func:`_token_hash64`."""
    toks = tokens(F.lower(F.col(text_col)))
    # r8: hash each token ONCE in a projection — referencing the hash
    # expression from all 64 sign-sums re-evaluated the md5/conv chain
    # per bit (no cross-aggregate subexpression elimination).
    exploded = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode_outer(toks).alias("_t"))
                .select("doc_id", "_t",
                        _token_hash64(F.col("_t"), hash_fn).alias("_h")))
    h = F.col("_h")
    sums = [F.sum(F.when(F.col("_t").isNull(), F.lit(0)).otherwise(
        F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)).alias(f"_s{j}")
        for j in range(64)]
    agg = exploded.groupBy("doc_id").agg(*sums)
    total = F.lit(0).cast("long")
    for j in range(64):
        power = (1 << j) if j < 63 else -(1 << 63)
        total = total + F.when(F.col(f"_s{j}") > 0,
                               F.lit(power).cast("long")) \
                         .otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", total.alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id", max_hamming: int = 3,
                           blocks: int = 4, approximate: bool = False,
                           materialize: bool = True,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash near-dup candidates via the block trick: split the 64-bit
    hash into ``blocks`` chunks — any pair within Hamming distance
    ``blocks - 1`` shares at least one exact chunk, so a self-join per
    chunk finds all such pairs without a cross join. Verify with popcount.

    Output: (id_a, id_b, hamming).
    """
    if max_hamming > blocks - 1 and not approximate:
        # The block trick only guarantees completeness for Hamming distance
        # <= blocks - 1 (pigeonhole: beyond that a pair can differ in every
        # chunk and never share a join key). approximate=True opts into the
        # candidate-recall trade instead of silently under-reporting.
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the block-trick guarantee "
            f"(blocks - 1 = {blocks - 1}); raise blocks or pass "
            "approximate=True to accept reduced recall")
    width = 64 // blocks
    sh = simhash64_agg(docs, text_col=text_col, id_col=id_col,
                       hash_fn=hash_fn)
    if materialize:
        sh = _materialize(sh)  # self-joined below: compute the hashes once
    chunked = sh.select(
        "doc_id", "simhash",
        F.posexplode_outer(F.array(*[
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


def dedup_incremental(new_docs: DataFrame, ref_docs: DataFrame, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      method: str = "exact", threshold: float = 0.8,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_n: int = 3) -> DataFrame:
    """Cross-corpus dedup: drop ``new_docs`` rows duplicating the
    REFERENCE corpus (dedupe a fresh crawl against the existing training
    set — self-dedup within ``new_docs`` is :func:`dedup_exact` /
    :func:`minhash_lsh_dedup_pairs`, run separately).

    ``method='exact'``: left-anti join on the normalized fingerprint —
    one shuffle keyed by content hash; the reference side reduces to its
    distinct fingerprints first (tiny relative to its rows).
    ``method='minhash'``: banded new-vs-ref signature join (never a
    self-join, never all-pairs) + exact-Jaccard verify >= ``threshold``,
    then anti-join the matched ids. Returns surviving new rows with the
    input schema.
    """
    from json_time_series_extractor_spark.operators.textstats import (
        normalized_fingerprint)

    if method == "exact":
        fp = normalized_fingerprint(F.col(text_col))
        ref_fp = ref_docs.select(fp.alias("_fp")).distinct()
        return (new_docs.withColumn("_fp", fp)
                .join(ref_fp, "_fp", "left_anti")
                .drop("_fp"))
    if method != "minhash":
        raise ValueError(f"method must be exact/minhash, got {method!r}")

    def banded(docs: DataFrame, out_id: str) -> DataFrame:
        sig = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                                 num_hashes=num_hashes,
                                 shingle_n=shingle_n)
        return sig.select(
            F.col("doc_id").alias(out_id),
            F.posexplode_outer(_band_hashes(F.col("signature"), bands))
            .alias("band_id", "band_hash"))

    sh = word_shingles(F.col(text_col), shingle_n)
    shingles_new = _materialize(new_docs.select(
        F.col(id_col).alias("_nid"), F.array_distinct(sh).alias("_nsh")))
    shingles_ref = _materialize(ref_docs.select(
        F.col(id_col).alias("_rid"), F.array_distinct(sh).alias("_rsh")))
    cand = (banded(new_docs, "_nid")
            .join(banded(ref_docs, "_rid"), ["band_id", "band_hash"])
            .select("_nid", "_rid").distinct())
    matched = (cand
               .join(shingles_new, "_nid")
               .join(shingles_ref, "_rid")
               .where(_jaccard(F.col("_nsh"), F.col("_rsh"))
                      >= F.lit(threshold))
               .select(F.col("_nid").alias(id_col))
               .distinct())
    return new_docs.join(matched, id_col, "left_anti")


def duplicate_ngram_stats(docs: DataFrame, *, n: int = 8,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          hash_fn: str = "xxhash64") -> DataFrame:
    """Exact-substring duplication signal (the filter behind suffix-
    array dedup in Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022): the fraction of a document's
    positional token ``n``-grams that occur anywhere else in the corpus
    (another doc OR another position of the same doc). High fractions
    flag templated/boilerplate pages that survive whole-doc dedup.

    Output: (doc_id, n_windows, n_dup_windows, dup_fraction); documents
    shorter than ``n`` tokens have zero windows and fraction 0.0.

    Scale shape: positional windows explode (~tokens-per-doc rows),
    collapse through ONE partial/final hash aggregate on the 64-bit
    window hash (corpus-repeated boilerplate combines map-side), then
    an equi-join back and a per-doc aggregate. ``hash_fn='md5hi'``
    makes the pipeline SQL-recomputable (same contract as simhash);
    xxhash64 is the JVM-native scale default. Positional windows are
    deliberately NOT de-duplicated per doc — a phrase repeated inside
    one document is corpus duplication too (same-doc repeats count
    toward the >= 2 occurrence threshold).
    """
    from json_time_series_extractor_spark.operators.textstats import (
        tokens)

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    toks = tokens(F.lower(F.col(text_col)))
    wins = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))
    # _materialize: exploded feeds BOTH the corpus-count aggregate and
    # the join probe; without it the tokenize + window-concat + hash
    # derivation (the dominant cost: ~tokens x docs rows) executes
    # twice — the same defect measured and fixed in dedup_paragraphs
    # (1.25x there, larger here because the per-row expression work is
    # heavier).
    exploded = _materialize(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode_outer(wins).alias("_w"))
        .select("doc_id",
                F.when(F.col("_w").isNotNull(),
                       _token_hash64(F.col("_w"), hash_fn))
                .alias("_h")))
    counts = (exploded.where(F.col("_h").isNotNull())
              .groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt")))
    marked = (exploded
              .join(counts, "_h", "left")
              .groupBy("doc_id")
              .agg(F.sum(F.when(F.col("_h").isNotNull(), 1)
                         .otherwise(0)).alias("n_windows"),
                   F.sum(F.when(F.col("_cnt") >= 2, 1).otherwise(0))
                   .alias("n_dup_windows")))
    frac = F.when(F.col("n_windows") > 0,
                  F.col("n_dup_windows")
                  / F.col("n_windows").cast("double")).otherwise(0.0)
    return marked.select("doc_id", "n_windows", "n_dup_windows",
                         frac.alias("dup_fraction"))


def remove_boilerplate_lines(docs: DataFrame, *, min_df: int = 3,
                             min_chars: int = 6,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             hash_fn: str = "xxhash64") -> DataFrame:
    """Line-level boilerplate removal (the CCNet / RefinedWeb line
    filter): a line whose normalized form appears in >= ``min_df``
    DISTINCT documents is navigation/footer/banner furniture and is
    removed from EVERY document — unlike :func:`dedup_paragraphs`,
    which keeps one canonical copy, boilerplate has no canonical home.

    Semantics (deterministic, partition-invariant, SQL-replayable):

    - lines are the '\\n'-split of the text, preserved VERBATIM for
      reassembly (removal decisions never alter surviving bytes);
    - the dedup key is trim(lower(line)); lines whose key is shorter
      than ``min_chars`` are immune (blank lines and ok/yes/menu
      stubs repeat everywhere without being boilerplate *evidence*);
    - document frequency counts DISTINCT docs — a line repeated 100×
      inside ONE page is repetition (textstats territory), not
      boilerplate.

    Output: (doc_id, n_lines, n_removed, text_clean) — surviving lines
    joined by '\\n' in original order; docs with NULL text yield
    (0, 0, '').

    Scale shape: posexplode (map-only) → TWO-LEVEL distinct-doc count
    keyed by the 64-bit line hash ((hash, doc) partial/final agg, then
    a summary-sized count — never a count-distinct expand, so a
    million-page site collapses map-side) → equi-join the line rows
    against the flagged-hash summary → one reassembly aggregate per
    doc. No windows over raw text, no Python; ``hash_fn='md5hi'``
    keeps the pipeline SQL-recomputable.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    lines = _materialize(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.posexplode(F.split(F.col(text_col), "\n", -1))
                    .alias("pos", "_line"))
        .withColumn("_nrm", F.trim(F.lower(F.col("_line"))))
        .withColumn("_cand", F.length("_nrm") >= min_chars)
        .withColumn("_h", _token_hash64(F.col("_nrm"), hash_fn)))
    flagged = (lines.where(F.col("_cand"))
               .groupBy("_h", "doc_id").agg(F.lit(1).alias("_one"))
               .groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
               .where(F.col("_df") >= min_df)
               .select("_h", F.lit(True).alias("_flag")))
    fin = (lines.join(flagged, "_h", "left")
           .withColumn("_keep", ~(F.col("_cand")
                                  & F.coalesce("_flag", F.lit(False)))))
    per_doc = (fin.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                    .alias("n_removed"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(F.col("_keep"),
                                       F.struct(F.col("pos").alias("p"),
                                                F.col("_line")
                                                .alias("t"))))),
                            lambda s: s["t"]), "\n").alias("text_clean")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_lines", F.lit(0)).cast("long")
                    .alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).cast("long")
                    .alias("n_removed"),
                    F.coalesce("text_clean", F.lit("")).alias(
                        "text_clean")))


def collapse_repeated_lines(docs: DataFrame, *,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Within-document consecutive-duplicate-line collapse (the
    "stutter" cleaner: scraped terminal output, chat logs and
    generated pages repeat a line N times in a row; training data
    wants it once). The WITHIN-doc complement of
    :func:`remove_boilerplate_lines` (cross-doc): a line survives iff
    it differs from the line immediately above it — byte compare, so
    surviving bytes are untouched and non-consecutive repeats are
    deliberately preserved (those are structure, not stutter).

    Output: (doc_id, n_lines, n_collapsed, text_clean). NULL text
    yields (0, 0, '').

    Scale shape: posexplode (map-only) → ONE lag window per document
    (partition bounded by the doc's line count — the by-construction
    bound every per-doc window here shares) → one reassembly
    aggregate. No corpus-wide state at all.
    """
    lines = docs.select(F.col(id_col).alias("doc_id"),
                        F.posexplode(F.split(F.col(text_col), "\n", -1))
                        .alias("pos", "_line"))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("pos")
    fin = lines.withColumn(
        "_keep", F.coalesce(F.col("_line") != F.lag("_line").over(w),
                            F.lit(True)))
    per_doc = (fin.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                    .alias("n_collapsed"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(F.col("_keep"),
                                       F.struct(F.col("pos").alias("p"),
                                                F.col("_line")
                                                .alias("t"))))),
                            lambda s: s["t"]), "\n").alias("text_clean")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_lines", F.lit(0)).cast("long")
                    .alias("n_lines"),
                    F.coalesce("n_collapsed", F.lit(0)).cast("long")
                    .alias("n_collapsed"),
                    F.coalesce("text_clean", F.lit(""))
                    .alias("text_clean")))


# ---------------------------------------------------------------------------
# SemDeDup — cluster-based semantic deduplication (Abbas et al. 2023,
# arXiv:2303.09540)
# ---------------------------------------------------------------------------

def semdedup_sample_sql(table: str = "embeddings", *,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        sample_cap: int = 256) -> str:
    """DuckDB twin of :func:`semdedup_centroids`' training-sample
    selection — kept beside the impl so the oracle generator and the
    Spark operator provably pick the SAME rows in the SAME order
    (md5 of the stringified id is the shared deterministic rank; the
    id itself breaks md5 ties)."""
    return (f"SELECT CAST({vec_col} AS DOUBLE[]) AS v FROM {table} "
            f"WHERE {vec_col} IS NOT NULL "
            f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} "
            f"LIMIT {sample_cap}")


def semdedup_centroids(embeddings: DataFrame, *, n_centroids: int = 8,
                       sample_cap: int = 256, seed: int = 13,
                       iters: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding"):
    """Deterministic spherical k-means centroids for :func:`semdedup`.

    Sample = the ``sample_cap`` rows with the smallest
    ``(md5(id), id)`` — a deterministic pseudo-random sample computed
    as a TakeOrderedAndProject (per-partition top-k + merge: no global
    sort, and at 10^12 rows the driver still only sees ``sample_cap``
    vectors). md5 rather than xxhash64 because the ORACLE must select
    the identical sample in DuckDB (:func:`semdedup_sample_sql`); the
    trainer itself is the shared
    :func:`~.similarity.kmeans_unit_centroids`. Returns a
    unit-normalized (k, dim) float64 ndarray."""
    import numpy as np

    from json_time_series_extractor_spark.operators.similarity import (
        _as_double, kmeans_unit_centroids)

    sampled = (embeddings
               .where(F.col(vec_col).isNotNull())
               .select(_as_double(F.col(vec_col)).alias("_v"),
                       F.md5(F.col(id_col).cast("string")).alias("_h"),
                       F.col(id_col).alias("_id"))
               .orderBy("_h", "_id").limit(sample_cap)
               .select("_v").collect())
    if not sampled:
        return np.zeros((0, 0), dtype=np.float64)
    m = np.array([r["_v"] for r in sampled], dtype=np.float64)
    return kmeans_unit_centroids(m, n_centroids, seed=seed, iters=iters)


def _centroid_sims6(v: Column, centroids) -> Column:
    """Array of structs (fp6-quantized cosine to centroid i, -i), whose
    array_max IS the deterministic argmax: highest quantized similarity,
    ties to the LOWEST centroid id. Quantizing BEFORE the argmax is what
    makes the cluster assignment replayable in SQL — both engines
    compare the same integers, never raw doubles. The fold-form cosine
    keeps the k*dim assignment expressions compact (the unrolled
    ``cosine_flat`` times k centroids overflows the whole-stage-codegen
    method limit and falls back to interpreted anyway); it is
    bit-identical to the flat form per its docstring. r8: the k cosines
    are one ``transform`` over a literal centroid MATRIX — the same
    fold ops per element (results unchanged), built in ~20 py4j round
    trips instead of ~10k (driver plan construction measured ~0.8s for
    this helper alone)."""
    cmat = F.array(*[F.lit([float(x) for x in c]) for c in centroids])

    def _fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def _entry(c, i):
        dot = _fold_sum(F.zip_with(v, c, lambda x, y: x * y))
        denom = (F.sqrt(_fold_sum(F.transform(v, lambda x: x * x)))
                 * F.sqrt(_fold_sum(F.transform(c, lambda x: x * x))))
        cos = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
        q6 = F.floor(cos * 1e6 + F.lit(0.5)).cast("long")
        return F.struct(q6.alias("q6"), (-i).alias("nc"))

    return F.transform(cmat, _entry)


def semdedup(embeddings: DataFrame, centroids, *,
             threshold: float = 0.9,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             dim: Optional[int] = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with spherical
    k-means, then deduplicate WITHIN each cluster — two documents are
    semantic duplicates when their cosine similarity meets ``threshold``,
    and the survivor is the one LESS similar to its cluster centroid
    (the paper's keep-the-edge-example policy, their best-performing
    variant).

    Keeper rule (the paper's released triangular implementation, not a
    transitive-component rule): order each cluster by
    (centroid_sim ASC, id ASC); a row is DROPPED iff some EARLIER row of
    the same cluster is within ``threshold`` — whether or not that
    earlier row is itself dropped. Deterministic and order-free: the
    decision for each row depends only on set membership, so it
    distributes as one equi-join.

    Exactness: cluster assignment argmaxes fp6-QUANTIZED centroid
    similarities (ties to the lowest centroid id) and the duplicate
    test compares fp6-quantized pair similarities against
    ``floor(threshold*1e6+0.5)`` — every cross-engine decision happens
    on integers (repo doctrine: quantize before compare).

    Scale shape: assignment is map-only unrolled expressions (k*dim
    multiply-adds inside codegen, no Python); the pair stage is a
    self-equi-join ON THE CLUSTER ID — the method's defining property
    is that k scales with the corpus (the paper uses ~10^5 clusters for
    LAION) so per-cluster row counts stay bounded; the same B² caveat
    as LSH buckets applies and cluster sizes should be monitored via
    ``detect_hot_keys``-style counts when k is misconfigured.

    Output: (vec_id, cell, centroid_sim6, dropped) — one row per input
    vector with a non-null embedding and positive norm.
    """
    from json_time_series_extractor_spark.operators.similarity import (
        _as_double, _norm, _probe_dim, dot_flat_sql)

    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    t6 = int(__import__("math").floor(threshold * 1e6 + 0.5))
    base = (embeddings
            .where(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("vec_id"),
                    _as_double(F.col(vec_col)).alias("_v")))
    base = base.where(_norm(F.col("_v")) > 0)
    pick = F.array_max(_centroid_sims6(F.col("_v"), centroids))
    # r8 (guide §1.2 per-task work): carry each row's norm through the
    # persisted assignment so the pair stage evaluates ONE unrolled dot
    # per candidate pair instead of three — sqrt(dot(a,a)) per side is
    # computed once per ROW here and multiplied at the pair, the exact
    # cosine_flat op order (the cosine_topk precedent: bit-identical).
    assigned = _materialize(base.select(
        "vec_id", "_v",
        (-pick["nc"]).cast("int").alias("cell"),
        pick["q6"].alias("centroid_sim6"),
        F.sqrt(dot_flat_sql("_v", "_v", dim)).alias("_n")))
    lo, hi = assigned.alias("lo"), assigned.alias("hi")
    earlier = ((F.col("lo.centroid_sim6") < F.col("hi.centroid_sim6"))
               | ((F.col("lo.centroid_sim6") == F.col("hi.centroid_sim6"))
                  & (F.col("lo.vec_id") < F.col("hi.vec_id"))))
    pair_denom = F.col("lo._n") * F.col("hi._n")
    pair6 = F.floor(
        F.when(pair_denom > 0,
               dot_flat_sql("lo._v", "hi._v", dim) / pair_denom)
        .otherwise(F.lit(0.0))
        * 1e6 + F.lit(0.5)).cast("long")
    dropped = (lo.join(hi, (F.col("lo.cell") == F.col("hi.cell"))
                       & earlier, "inner")
               .where(pair6 >= F.lit(t6))
               .select(F.col("hi.vec_id").alias("vec_id"))
               .distinct()
               .withColumn("_d", F.lit(True)))
    return (assigned
            .join(dropped, "vec_id", "left")
            .select("vec_id", "cell", "centroid_sim6",
                    F.coalesce(F.col("_d"), F.lit(False)).alias("dropped")))


def semdedup_oracle_sql(centroids, *, threshold: float = 0.9,
                        table: str = "embeddings",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    """DuckDB ground truth for :func:`semdedup`, given the SAME centroid
    matrix (model-sized shared state; see :func:`semdedup_centroids`):
    assignment replayed with list_cosine_similarity + the identical
    quantize-then-argmax tie-break, the triangular keeper rule as an
    EXISTS join. Kept beside the impl."""
    t6 = int(__import__("math").floor(threshold * 1e6 + 0.5))
    rows = ",\n           ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(centroids))
    return f"""
WITH e AS (
    SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS v
    FROM {table}
    WHERE {vec_col} IS NOT NULL AND list_inner_product(
        CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[])) > 0),
c(cid, cv) AS (
    VALUES {rows}),
sims AS (
    SELECT e.vec_id, c.cid,
           CAST(floor(list_cosine_similarity(e.v, c.cv) * 1e6 + 0.5)
                AS BIGINT) AS q6
    FROM e CROSS JOIN c),
a AS (
    SELECT vec_id, cid AS cell, q6 AS centroid_sim6 FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY q6 DESC, cid) AS rk
        FROM sims) WHERE rk = 1),
av AS (
    SELECT a.*, e.v FROM a JOIN e USING (vec_id)),
dropped AS (
    SELECT DISTINCT hi.vec_id
    FROM av lo JOIN av hi ON lo.cell = hi.cell
     AND (lo.centroid_sim6 < hi.centroid_sim6
          OR (lo.centroid_sim6 = hi.centroid_sim6
              AND lo.vec_id < hi.vec_id))
    WHERE CAST(floor(list_cosine_similarity(lo.v, hi.v) * 1e6 + 0.5)
               AS BIGINT) >= {t6})
SELECT vec_id, CAST(cell AS INTEGER) AS cell, centroid_sim6,
       vec_id IN (SELECT vec_id FROM dropped) AS dropped
FROM a
"""
