"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word n-grams.

The standard training-data hygiene step (GPT-3 appendix C / Dodge et
al. 2021 "Documenting Large Webtext Corpora"): any training document
sharing an n-gram with a benchmark document is contaminated and must be
flagged (and usually dropped) before training. This is the corpus-side
dual of the dedup family in :mod:`operators.dedup` — the same
distinct-word-shingle machinery (:func:`operators.dedup.word_shingles`)
pointed at a *reference* set instead of at the corpus itself.

Scale shape: the eval side is a benchmark suite — thousands of
documents, at most a few million distinct n-grams — so its distinct
gram set BROADCASTS, and the training corpus (the 100 TB side) flows
through one map-side explode + broadcast-hash left join + one hash
aggregate keyed by doc_id. Grams of one document land in its own input
split, so the aggregate is effectively map-side; NO shuffle of corpus
text, no Python. For eval sets too big to broadcast raw, join on
``xxhash64(gram)`` instead (8 bytes/gram; the collision-free string
form below is the oracle-exact default).

Output per training doc: total distinct n-grams, how many hit the eval
set, the hit fraction, and the contamination flag — callers drop or
down-weight flagged docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators.dedup import word_shingles


def benchmark_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-doc n-gram overlap with the eval set.

    Output: (doc_id, n_grams, n_hit, contam_frac, contaminated) —
    ``n_grams`` distinct word n-grams in the doc, ``n_hit`` of them
    appearing anywhere in ``eval_docs``, ``contam_frac`` the 1e-6-fixed
    ratio, ``contaminated`` true iff any gram hits. Documents shorter
    than ``n`` tokens contribute their whole token string as one gram
    (so very short eval answers still match verbatim copies).
    """
    eval_grams = (eval_docs
                  .select(F.explode(word_shingles(F.col(text_col), n))
                          .alias("g"))
                  .distinct()
                  .withColumn("_hit", F.lit(1)))
    u = train_docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"))
    flagged = u.join(F.broadcast(eval_grams), "g", "left")
    out = (flagged.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit")))
    frac = (F.col("n_hit").cast("double")
            / F.col("n_grams").cast("double"))
    return out.select(
        "doc_id", "n_grams", "n_hit",
        F.floor(frac * 1e6 + F.lit(0.5)).cast("long").alias("contam_frac"),
        (F.col("n_hit") > 0).alias("contaminated"))


def contamination_oracle_sql(table: str = "documents", *, n: int = 8,
                             eval_pred: str = "doc_id % 19 = 3") -> str:
    """DuckDB recomputation: identical casefold/whitespace tokenization
    and shingling as the ``ngram_jaccard`` oracle (the proven replica of
    :func:`operators.dedup.word_shingles`), eval/train split by the same
    predicate the Spark query uses, overlap counted by a distinct-gram
    join. FULL value check of every column including the fixed-point
    fraction (two ints → one cast pair → one divide → floor: identical
    IEEE sequence both sides)."""
    return f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
    FROM {table}),
s AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= {n} THEN
               list_distinct(list_transform(
                   generate_series(1, len(toks) - {n - 1}),
                   i -> array_to_string(toks[i:i+{n - 1}], ' ')))
           ELSE [array_to_string(toks, ' ')] END AS sh
    FROM t),
eg AS (
    SELECT DISTINCT unnest(sh) AS g FROM s WHERE {eval_pred}),
tr AS (
    SELECT doc_id, unnest(sh) AS g FROM s WHERE NOT ({eval_pred})),
agg AS (
    SELECT tr.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
    FROM tr LEFT JOIN eg ON tr.g = eg.g
    GROUP BY 1)
SELECT doc_id, n_grams, n_hit,
       CAST(floor(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) AS contam_frac,
       n_hit > 0 AS contaminated
FROM agg
"""
