"""Corpus-trained character-trigram language-model quality scoring.

The CCNet/Gopher pipelines filter web text by language-model
perplexity (Wenzek et al. 2020 train KenLM on Wikipedia and drop the
worst-scoring tail). This module is that filter with the LM trained on
the corpus itself — no external model download, fully deterministic,
oracle-replayable: an add-one-smoothed character-trigram model

    P(c₃ | c₁c₂) = (C₃(c₁c₂c₃) + 1) / (C₂(c₁c₂) + V)

over casefolded, whitespace-collapsed text, scoring each document by
its mean trigram log-probability (the monotone equivalent of
per-character perplexity: ppl = exp(-avg_logprob)).

Cross-engine exactness: ``log`` is libm territory — Java's ``Math.log``
and DuckDB's C ``log`` may differ in the last ulp, so NEITHER engine
ever computes a log. Counts are aggregated in-engine (Spark here,
DuckDB in the oracle generator), then ONE shared Python function turns
the (identical) integer counts into a quantized fixed-point logprob
table; Spark consumes it as a broadcast join table, the oracle embeds
it as a VALUES literal. Scoring is then pure integer arithmetic (int64
sums, truncating division) — bit-identical by construction.

Scale shape: training is one explode + hash aggregate over the corpus
(the only corpus-sized pass) truncated to the top ``max_vocab``
trigrams by (count DESC, gram ASC) — a BOUNDED collect (the documented
verification-scale pattern shared with bpe.py / similarity.py; char
trigram vocabularies saturate in the low tens of thousands regardless
of corpus size). Scoring is an explode + two broadcast left joins +
one hash aggregate keyed by doc_id — no shuffle of corpus text, no
Python in the scoring path.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

#: (gram -> lp_fp6, ctx -> lp_unseen_fp6, lp_novel_ctx_fp6, V)
LmTable = Tuple[Dict[str, int], Dict[str, int], int, int]


def _normalize(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def _char_trigrams(s: Column) -> Column:
    """All overlapping character trigrams of ``s`` (empty array when
    shorter than 3 chars)."""
    return F.when(
        F.length(s) >= 3,
        F.transform(F.sequence(F.lit(1), F.length(s) - 2),
                    lambda i: F.substring(s, i, 3)),
    ).otherwise(F.array().cast("array<string>"))


def trigram_frequencies(docs: DataFrame, *, text_col: str = "text",
                        max_vocab: int = 65536) -> DataFrame:
    """Top-``max_vocab`` (gram, cnt) by (cnt DESC, gram ASC) — the one
    corpus-sized aggregate of training."""
    return (docs
            .select(F.explode(_char_trigrams(_normalize(F.col(text_col))))
                    .alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("gram"))
            .limit(max_vocab))


def trigram_logprob_table(gram_counts: Iterable[Tuple[str, int]]
                          ) -> LmTable:
    """Shared trainer: quantized (1e-6 fixed point) log-probabilities
    from a truncated trigram count table. Everything — context totals
    C₂, character vocabulary V, smoothing — derives from the truncated
    table alone, so two engines that agree on the (deterministically
    truncated) counts agree on every score bit. Per-gram:
    ``lp = log((c+1)/(C₂(ctx)+V))``; unseen gram in a seen context:
    ``log(1/(C₂+V))``; unseen context: ``log(1/V)``.
    """
    counts: List[Tuple[str, int]] = [(g, int(c)) for g, c in gram_counts]
    ctx_tot: Dict[str, int] = {}
    chars = set()
    for g, c in counts:
        ctx_tot[g[:2]] = ctx_tot.get(g[:2], 0) + c
        chars.add(g[2])
    v = max(len(chars), 1)

    def q(x: float) -> int:
        return math.floor(x * 1e6 + 0.5)

    lp = {g: q(math.log((c + 1) / (ctx_tot[g[:2]] + v)))
          for g, c in counts}
    lp_unseen = {ctx: q(math.log(1.0 / (tot + v)))
                 for ctx, tot in ctx_tot.items()}
    return lp, lp_unseen, q(math.log(1.0 / v)), v


def lm_quality_scores(docs: DataFrame, table: LmTable, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold_fp6: int = -6_000_000) -> DataFrame:
    """Score every document against a trained table.

    Output: (doc_id, n_trigrams, logprob_sum_fp6, avg_logprob_fp6,
    quality_ok) — ``avg_logprob_fp6`` the truncating integer division
    of the summed fixed-point logprobs (NULL when the doc has no
    trigram), ``quality_ok`` false for docs scoring below
    ``threshold_fp6`` (default e⁻⁶ ≈ 0.0025 per char) and for
    unscorable docs.
    """
    lp, lp_unseen, lp0, _ = table
    spark = docs.sparkSession
    lp_df = F.broadcast(spark.createDataFrame(
        list(lp.items()) or [("", 0)][:0], "gram string, lp long"))
    ctx_df = F.broadcast(spark.createDataFrame(
        list(lp_unseen.items()) or [("", 0)][:0], "ctx string, lpu long"))
    u = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_char_trigrams(_normalize(F.col(text_col))))
        .alias("gram"))
    j = (u.join(lp_df, "gram", "left")
         .join(ctx_df, F.substring(F.col("gram"), 1, 2) == F.col("ctx"),
               "left"))
    per_gram = F.when(F.col("gram").isNull(), F.lit(None).cast("long")) \
        .otherwise(F.coalesce(F.col("lp"), F.col("lpu"), F.lit(lp0)))
    agg = (j.select("doc_id", per_gram.alias("_lp"))
           .groupBy("doc_id")
           .agg(F.count("_lp").alias("n_trigrams"),
                F.sum("_lp").alias("logprob_sum_fp6")))
    avg = F.when(F.col("n_trigrams") > 0,
                 F.expr("logprob_sum_fp6 DIV n_trigrams"))
    return agg.select(
        "doc_id", "n_trigrams",
        F.coalesce("logprob_sum_fp6", F.lit(0)).alias("logprob_sum_fp6"),
        avg.alias("avg_logprob_fp6"),
        F.coalesce(avg >= threshold_fp6, F.lit(False)).alias("quality_ok"))


def lm_scores_oracle_sql(table: str, lm: LmTable, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         threshold_fp6: int = -6_000_000) -> str:
    """DuckDB replay of :func:`lm_quality_scores` with the trained
    table embedded as VALUES (the oracle generator trains from
    DuckDB-computed counts — see ``duckdb_trigram_frequencies_sql`` —
    so the embedded table is derived independently of Spark). Pure
    integer arithmetic end to end; ``//`` and Spark's ``DIV`` both
    truncate toward zero."""
    lp, lp_unseen, lp0, _ = lm

    def rows(items):
        return ", ".join(
            "('" + k.replace("'", "''") + "', " + str(v) + ")"
            for k, v in sorted(items))

    lp_values = rows(lp.items()) or "('\\x00impossible', 0)"
    ctx_values = rows(lp_unseen.items()) or "('\\x00impossible', 0)"
    return f"""
WITH lp(gram, lp) AS (VALUES {lp_values}),
ctxt(ctx, lpu) AS (VALUES {ctx_values}),
n AS (
    SELECT {id_col} AS doc_id,
           trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')) AS s
    FROM {table}),
g AS (
    SELECT doc_id,
           CASE WHEN length(s) >= 3 THEN
               list_transform(generate_series(1, length(s) - 2),
                              i -> s[i:i+2])
           ELSE [] END AS grams
    FROM n),
u AS (
    SELECT doc_id, unnest(grams) AS gram FROM g),
scored AS (
    SELECT u.doc_id,
           coalesce(lp.lp, ctxt.lpu, {lp0}) AS lpg
    FROM u
    LEFT JOIN lp ON u.gram = lp.gram
    LEFT JOIN ctxt ON u.gram[1:2] = ctxt.ctx),
agg AS (
    SELECT doc_id, count(*) AS n_trigrams,
           CAST(sum(lpg) AS BIGINT) AS logprob_sum_fp6
    FROM scored GROUP BY 1)
SELECT d.{id_col} AS doc_id,
       CAST(coalesce(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       coalesce(a.logprob_sum_fp6, 0) AS logprob_sum_fp6,
       CASE WHEN a.n_trigrams > 0
            THEN a.logprob_sum_fp6 // a.n_trigrams END
           AS avg_logprob_fp6,
       coalesce(a.n_trigrams > 0
                AND a.logprob_sum_fp6 // a.n_trigrams
                    >= {threshold_fp6}, FALSE) AS quality_ok
FROM {table} d LEFT JOIN agg a ON d.{id_col} = a.doc_id
"""


def duckdb_trigram_frequencies_sql(table: str, *, text_col: str = "text",
                                   max_vocab: int = 65536) -> str:
    """DuckDB twin of :func:`trigram_frequencies` — the oracle
    generator trains from THIS."""
    return f"""
WITH n AS (
    SELECT trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')) AS s
    FROM {table}),
u AS (
    SELECT unnest(list_transform(generate_series(1, length(s) - 2),
                                 i -> s[i:i+2])) AS gram
    FROM n WHERE length(s) >= 3)
SELECT gram, count(*) AS cnt FROM u
GROUP BY 1 ORDER BY cnt DESC, gram LIMIT {max_vocab}
"""
