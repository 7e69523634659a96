"""Corpus-trained byte-pair-encoding token counts (round 7).

``with_token_counts`` (textstats.py) counts whitespace tokens and a
BPE-ish regex heuristic; a training-data pipeline wants LEARNED
subword counts (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016). This module learns a merge
table from the corpus itself and applies it — no external vocab
download, fully deterministic, oracle-replayable.

Shape for the 100 TB regime — the corpus-sized work is pure JVM:

1. **Word frequencies**: one explode + partial/final hash aggregate
   (hot words collapse map-side) — the only pass over the corpus.
2. **Training**: the top ``max_vocab`` (word, freq) rows by
   (freq DESC, word ASC) collect to the driver — a BOUNDED
   vocab-sized table (the documented verification-scale-collect
   pattern, like the IVF centroid sample in similarity.py). The merge
   loop is pure Python over that table: per iteration pick the most
   frequent adjacent symbol pair, tie-broken lexicographically, stop
   below frequency 2.
3. **Application**: encode each DISTINCT word once (vocab-sized
   mapInPandas with a per-batch memo — never per occurrence), then a
   corpus-sized equi-join + hash aggregate rolls counts up per doc.

Cross-engine exactness (the oracle contract): encoding merges ONE
occurrence per step — the occurrence with the smallest
(merge rank, position) — which is equivalent to the canonical
"merge all occurrences of the lowest-rank pair, left to right" but
is expressible as a DuckDB recursive CTE (one list rewrite per
iteration). Symbols are whitespace-free by construction, so the SQL
side keys pairs as 'a b' strings in a rank-ordered list literal.
The oracle trains its OWN merge table from word frequencies computed
by DuckDB over the same parquet; only the trainer function is shared,
so a divergence anywhere in the Spark pipeline (tokenization, counts,
truncation order, encoding) fails the value hash.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators.textstats import tokens

Merge = Tuple[str, str]


def word_frequencies(docs: DataFrame, *, text_col: str = "text"
                     ) -> DataFrame:
    """(word, freq) over casefolded whitespace tokens — one explode +
    one partial/final hash aggregate."""
    return (docs
            .select(F.explode(tokens(F.lower(F.col(text_col))))
                    .alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq")))


def bpe_train_merges(word_freqs: Iterable[Tuple[str, int]],
                     num_merges: int = 200,
                     min_pair_freq: int = 2) -> List[Merge]:
    """Deterministic BPE trainer over a (word, freq) table.

    Each iteration merges the adjacent symbol pair with the highest
    weighted frequency; ties break on the LEXICOGRAPHICALLY SMALLEST
    pair; training stops when the best pair's frequency drops below
    ``min_pair_freq`` (merging hapax pairs memorizes the sample).
    Pure Python over the vocab-sized input — shared verbatim by the
    Spark path and the DuckDB oracle generator so both engines carry
    an identical merge table whenever their word frequencies agree.
    """
    vocab: List[Tuple[List[str], int]] = [
        (list(w), int(f)) for w, f in word_freqs if w]
    merges: List[Merge] = []
    for _ in range(num_merges):
        counts: dict = {}
        for seq, f in vocab:
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for seq, _ in vocab:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_train(docs: DataFrame, *, text_col: str = "text",
              num_merges: int = 200, max_vocab: int = 65536,
              min_pair_freq: int = 2) -> List[Merge]:
    """Learn the merge table from *docs*: corpus-sized Spark aggregate,
    bounded (``max_vocab`` rows) collect, shared Python merge loop.
    Truncation order is (freq DESC, word ASC) — deterministic across
    partitionings."""
    wf = (word_frequencies(docs, text_col=text_col)
          .orderBy(F.col("freq").desc(), F.col("word"))
          .limit(max_vocab)
          .collect())
    return bpe_train_merges([(r["word"], r["freq"]) for r in wf],
                            num_merges, min_pair_freq)


def bpe_encode(word: str, rank_of: dict) -> List[str]:
    """Encode one word with a {(a, b): rank} table: repeatedly merge
    the occurrence with the smallest (rank, position). Equivalent to
    canonical lowest-rank-first BPE and mirrored 1:1 by the oracle's
    recursive CTE."""
    seq = list(word)
    while len(seq) > 1:
        best_rank = None
        best_pos = -1
        for p in range(len(seq) - 1):
            r = rank_of.get((seq[p], seq[p + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pos = r, p
        if best_rank is None:
            break
        seq[best_pos:best_pos + 2] = [seq[best_pos] + seq[best_pos + 1]]
    return seq


def bpe_token_counts(docs: DataFrame, merges: Sequence[Merge], *,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document learned-BPE token counts.

    Output: (doc_id, n_words, n_tokens_bpe_learned) — exact token
    count next to the learned subword count; tokenless documents emit
    (0, 0).

    Scale shape: per-(doc, word) counts are one hash aggregate; the
    Python encode runs once per DISTINCT WORD (vocab-sized mapInPandas,
    Arrow-batched, memoized within each batch); the roll-up back to
    documents is an equi-join + hash aggregate. The merge table ships
    in the task closure (bounded by ``num_merges``).
    """
    import pandas as pd

    rank_of = {pair: i for i, pair in enumerate(merges)}

    per = (docs
           .select(F.col(id_col).alias("doc_id"),
                   F.explode(tokens(F.lower(F.col(text_col))))
                   .alias("word"))
           .groupBy("doc_id", "word")
           .agg(F.count(F.lit(1)).alias("cnt")))

    def encode_batch(batches: Iterable[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            ns = []
            for w in pdf["word"]:
                n = memo.get(w)
                if n is None:
                    n = len(bpe_encode(w, rank_of))
                    memo[w] = n
                ns.append(n)
            yield pd.DataFrame({"word": pdf["word"], "n_sub": ns})

    vocab = per.select("word").distinct()
    encoded = vocab.mapInPandas(encode_batch, "word string, n_sub int")
    per_doc = (per.join(encoded, "word")
               .groupBy("doc_id")
               .agg(F.sum("cnt").alias("n_words"),
                    F.sum(F.col("cnt") * F.col("n_sub"))
                    .alias("n_tokens_bpe_learned")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_tokens_bpe_learned", F.lit(0))
                    .alias("n_tokens_bpe_learned")))


def duckdb_word_frequencies_sql(table: str, *, text_col: str = "text",
                                max_vocab: int = 65536) -> str:
    """DuckDB twin of :func:`word_frequencies` + the training
    truncation — the oracle generator trains from THIS, so the merge
    table embedded in the oracle is derived independently of Spark."""
    return f"""
SELECT x AS word, count(*) AS freq
FROM {table}, unnest(list_filter(
         string_split_regex(lower({text_col}), '\\s+'),
         x -> x <> '')) AS t(x)
GROUP BY 1
ORDER BY freq DESC, word
LIMIT {max_vocab}
"""


def bpe_oracle_sql(table: str, merges: Sequence[Merge], *,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """Recursive-CTE replay of :func:`bpe_token_counts` given a merge
    table: per distinct word, one (lowest-rank, leftmost) merge per
    recursion step until no pair in the table remains; the final
    subword count is the minimum emitted length (each step shrinks the
    sequence by exactly one)."""
    if merges:
        lit = "[" + ", ".join(
            "'" + (a + " " + b).replace("'", "''") + "'"
            for a, b in merges) + "]"
    else:
        lit = "CAST([] AS VARCHAR[])"
    return f"""
WITH RECURSIVE
wc AS (
    SELECT {id_col} AS doc_id, x AS word, count(*) AS cnt
    FROM {table}, unnest(list_filter(
             string_split_regex(lower({text_col}), '\\s+'),
             x -> x <> '')) AS t(x)
    GROUP BY 1, 2),
v AS (SELECT DISTINCT word FROM wc),
enc AS (
    SELECT word,
           list_transform(range(1, length(word) + 1),
                          i -> word[i:i]) AS seq
    FROM v
    UNION ALL
    SELECT word,
           list_concat(list_concat(seq[1:bp-1],
                                   [seq[bp] || seq[bp+1]]),
                       seq[bp+2:]) AS seq
    FROM (
        SELECT word, seq,
               (list_sort(list_transform(
                   list_filter(range(1, len(seq)),
                       p -> list_position({lit},
                                seq[p] || ' ' || seq[p+1]) > 0),
                   p -> [list_position({lit},
                             seq[p] || ' ' || seq[p+1]), p]))[1])[2]
               AS bp
        FROM enc) WHERE bp IS NOT NULL),
n_sub AS (
    SELECT word, min(len(seq)) AS n_sub FROM enc GROUP BY word),
per_doc AS (
    SELECT wc.doc_id,
           sum(wc.cnt) AS n_words,
           sum(wc.cnt * n_sub.n_sub) AS n_tokens_bpe_learned
    FROM wc JOIN n_sub USING (word)
    GROUP BY 1)
SELECT d.{id_col} AS doc_id,
       CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(p.n_tokens_bpe_learned, 0) AS BIGINT)
           AS n_tokens_bpe_learned
FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.doc_id
"""
