"""BM25 relevance scoring over the corpus, exactly reproducible.

The retrieval primitive a training-data pipeline uses for targeted
curation (find documents about X, mine hard negatives, build eval
sets): Robertson/Sparck-Jones BM25 with the standard k1 = 1.2,
b = 0.75 tuning,

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln((N − df + 0.5) / (df + 0.5) + 1)

Cross-engine exactness, three moves (the lmscore.py doctrine):

1. **No engine computes a log.** idf comes from ONE shared Python
   function (:func:`bm25_idf_fp6`) applied to exact integer (N, df) —
   Spark consumes it as a broadcast table, the oracle embeds the same
   values as a literal.
2. **The per-term ratio is rational.** k1 = 6/5 and b = 3/4, so
   multiplying numerator and denominator by 10·T (T = Σ doc lengths,
   avgdl = T/N) clears every fraction:

       term_fp6 = (idf_fp6 · tf · 22 · T) / (10·T·tf + 3·T + 9·dl·N)

   — exact decimal integers, ONE double division, then fp6
   quantization.
3. **The doc score is a sum of already-quantized int64s**, so term
   order cannot perturb it (float accumulation never happens).

Scale shape: one corpus stats aggregate (N, T — two int64s), one
explode→filter→hash aggregate for per-(doc, term) tf (the filter
keeps only query terms, so the shuffle is query-sized, not
corpus-sized), a Q-row bounded collect for df (the documented
verification-scale pattern shared with lmscore/bpe), one broadcast
join, one per-doc aggregate. No Python in the scoring path.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators._persist import (
    materialize,
)

_DEC = "decimal(38,0)"


def bm25_idf_fp6(n_docs: int, df: int) -> int:
    """The ONE place ln() happens: fp6-quantized BM25 idf from exact
    integer corpus counts. Both engines consume this value; neither
    recomputes it."""
    return int(math.floor(
        math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5))


def _doc_tokens(text):
    from json_time_series_extractor_spark.operators.textstats import (
        tokens,
    )
    return tokens(F.lower(text))


def bm25_scores(docs: DataFrame, query_terms: Sequence[str], *,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Score every document matching >= 1 query term (casefolded
    whitespace tokens; k1 = 1.2, b = 0.75 — fixed because their
    rationality is what makes the arithmetic exact).

    Output: (doc_id, n_terms — distinct query terms present, dl,
    score_fp6 — the int64 sum of fp6-quantized per-term scores).
    N and avgdl count ALL docs (NULL text scores dl = 0), matching
    the textbook corpus statistics.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = _doc_tokens(F.col(text_col))
    lens = docs.select(F.col(id_col).alias("doc_id"),
                       F.coalesce(F.size(toks), F.lit(0))
                       .cast("long").alias("dl"))
    # lens feeds the stats action AND the scoring join; tf feeds the
    # df collect AND the join — persist both or the tokenize/explode
    # subplans re-execute per action.
    lens = materialize(lens.withColumn(
        "dl", F.when(F.col("dl") < 0, F.lit(0)).otherwise(F.col("dl"))))
    tf = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(toks).alias("term"))
          .where(F.col("term").isin(list(terms)))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    tf = materialize(tf)
    # ONE bounded collect (r8): the corpus stats row (two int64s) and
    # the per-term dfs (one row per query term) were two driver
    # actions over the two persisted frames; a union of the two tiny
    # aggregates collects both in a single job. Values identical.
    summary = (lens.agg(F.count(F.lit(1)).alias("a"),
                        F.sum("dl").alias("b"))
               .select(F.lit(None).cast("string").alias("term"),
                       "a", "b")
               .unionByName(
                   tf.groupBy("term")
                   .agg(F.count(F.lit(1)).alias("a"),
                        F.lit(0).cast("long").alias("b")))
               .collect())
    n_docs = total = 0
    dfs = {}
    for r in summary:
        if r["term"] is None:
            n_docs, total = int(r["a"]), int(r["b"])
        else:
            dfs[r["term"]] = int(r["a"])
    if total == 0:
        raise ValueError("corpus has no tokens")
    idf_rows = [(t, bm25_idf_fp6(n_docs, dfs.get(t, 0)))
                for t in terms if t in dfs]
    if not idf_rows:
        return (lens.sparkSession.createDataFrame(
            [], "doc_id long, n_terms long, dl long, score_fp6 long"))
    idf = docs.sparkSession.createDataFrame(
        idf_rows, "term string, idf_fp6 long")
    num = (F.col("idf_fp6").cast(_DEC) * F.col("tf").cast(_DEC)
           * F.lit(22 * total).cast(_DEC))
    den = (F.lit(10 * total).cast(_DEC) * F.col("tf").cast(_DEC)
           + F.lit(3 * total).cast(_DEC)
           + F.lit(9 * n_docs).cast(_DEC) * F.col("dl").cast(_DEC))
    term_fp6 = F.floor(num.cast("double") / den.cast("double")
                       + F.lit(0.5)).cast("long")
    scored = (tf.join(lens, "doc_id")
              .join(F.broadcast(idf), "term")
              .withColumn("_s", term_fp6))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.first("dl").alias("dl"),
                 F.sum("_s").alias("score_fp6")))


def bm25_oracle_sql(table: str, query_terms: Sequence[str],
                    n_docs: int, total_tokens: int,
                    dfs: dict, *, text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`bm25_scores` given the (independently
    recomputed) corpus counts: embeds the SAME shared-Python idf
    values and the identical cleared-fraction integer formula. The
    caller supplies ``n_docs`` / ``total_tokens`` / ``dfs`` from its
    own DuckDB aggregation so the counts themselves are cross-checked
    (a count divergence shifts idf and fails the hash)."""
    terms = sorted(t for t in set(query_terms) if t in dfs)
    vals = ", ".join(
        f"('{t}', {bm25_idf_fp6(n_docs, dfs[t])})" for t in terms)
    n, tt = int(n_docs), int(total_tokens)
    return f"""
WITH idf AS (SELECT * FROM (VALUES {vals}) AS v(term, idf_fp6)),
lens AS (
    SELECT {id_col} AS doc_id,
           CAST(coalesce(len(list_filter(
               string_split_regex(lower({text_col}), '\\s+'),
               x -> x <> '')), 0) AS BIGINT) AS dl
    FROM {table}),
tf AS (
    SELECT {id_col} AS doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT {id_col},
                 unnest(list_filter(string_split_regex(
                     lower({text_col}), '\\s+'), x -> x <> '')) AS term
          FROM {table})
    WHERE term IN ({', '.join(repr(t) for t in terms)})
    GROUP BY 1, 2),
s AS (
    SELECT tf.doc_id, lens.dl,
           CAST(floor(
               CAST(CAST(idf.idf_fp6 AS HUGEINT) * tf.tf
                    * {22 * tt} AS DOUBLE)
               / CAST(CAST({10 * tt} AS HUGEINT) * tf.tf
                      + {3 * tt}
                      + CAST({9 * n} AS HUGEINT) * lens.dl AS DOUBLE)
               + 0.5) AS BIGINT) AS term_fp6
    FROM tf JOIN lens USING (doc_id) JOIN idf USING (term))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(first(dl) AS BIGINT) AS dl,
       CAST(sum(term_fp6) AS BIGINT) AS score_fp6
FROM s GROUP BY 1
"""
