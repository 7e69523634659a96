"""Sequence packing manifest: concat-and-split for LLM training prep.

Training consumes fixed-length token sequences, not documents. The
standard batch recipe (GPT-style pretraining) concatenates every
document's tokens in a canonical order and splits the stream every
``seq_len`` tokens; what a pipeline actually needs to MATERIALIZE is
the manifest that says, for each document, where its tokens land:
which sequence its first token starts in, which sequence its last
token ends in, and the offset inside the first sequence. With that
manifest the (much larger) token-copy stage is embarrassingly parallel
— every worker knows its output coordinates without re-scanning
anything.

The whole operator is ONE exact prefix sum over documents in doc-id
order. A naive ``sum().over(Window.orderBy(id))`` is a global sort
into a single window partition — the exact scale-killer this repo
bans — so the prefix sum is two-phase, the textbook distributed scan:

1. shard = doc_id DIV ``shard_span`` (order-preserving: contiguous id
   ranges map to increasing shards);
2. per-shard token totals (map-side-combinable hash agg, one summary
   row per shard) are prefix-summed by a window over SHARD rows only —
   summary-sized, like the broadcast count frames elsewhere in this
   repo — and broadcast-joined back;
3. within each shard a partitioned window (bounded by ``shard_span``
   docs) adds the local prefix.

The result is bit-identical to the naive global window (integer sums
are associative), resilient to ragged shards (empty id ranges cost an
absent summary row, nothing else), and never sorts more than one
shard's rows in a task.

Assumptions, stated: ``doc_id`` is unique and non-negative (crawl ids
are), and the canonical order is ascending ``doc_id`` — the same
determinism contract the keyed-hash samplers rely on. Total tokens
must fit int64 (2^63 ≈ 9e18; a 100 TB corpus is ~2.5e13 tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(docs: DataFrame, seq_len: int, *,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   shard_span: int = 1_000_000) -> DataFrame:
    """Per-document packing manifest for fixed-``seq_len`` sequences.

    Output: (``id_col``, ``tokens_col``, ``tok_start`` — 0-based
    offset of the doc's first token in the concatenated stream,
    ``seq_first``/``seq_last`` — the sequence indices holding the
    doc's first/last token (NULL for empty docs), ``n_seqs`` — how
    many sequences the doc touches (0 for empty docs),
    ``off_in_first`` — the doc's offset inside ``seq_first``).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if shard_span < 1:
        raise ValueError(f"shard_span must be >= 1, got {shard_span}")
    did, nt = F.col(id_col), F.col(tokens_col).cast("long")
    d = docs.select(did.alias("_id"), nt.alias("_n"),
                    F.expr(f"{id_col} DIV {int(shard_span)}")
                    .alias("_shard"))
    # Phase 1+2: shard totals, prefix-summed over summary rows only.
    shard_w = (Window.orderBy("_shard")
               .rowsBetween(Window.unboundedPreceding, -1))
    bases = (d.groupBy("_shard").agg(F.sum("_n").alias("_tot"))
             .select("_shard",
                     F.coalesce(F.sum("_tot").over(shard_w),
                                F.lit(0).cast("long")).alias("_base")))
    # Phase 3: within-shard local prefix (bounded window partitions).
    local_w = (Window.partitionBy("_shard").orderBy("_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    out = (d.join(F.broadcast(bases), "_shard")
           .withColumn("_tok_start",
                       F.col("_base")
                       + F.coalesce(F.sum("_n").over(local_w),
                                    F.lit(0).cast("long"))))
    ln = F.lit(int(seq_len)).cast("long")
    seq_first = F.expr(f"_tok_start DIV {int(seq_len)}")
    seq_last = F.expr(f"(_tok_start + _n - 1) DIV {int(seq_len)}")
    nonempty = F.col("_n") > 0
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_n").alias(tokens_col),
        F.col("_tok_start").alias("tok_start"),
        F.when(nonempty, seq_first).alias("seq_first"),
        F.when(nonempty, seq_last).alias("seq_last"),
        F.when(nonempty, seq_last - seq_first + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
        F.when(nonempty, F.col("_tok_start") % ln).alias("off_in_first"))


def pack_oracle_sql(docs_sql: str, seq_len: int, *,
                    id_col: str = "doc_id",
                    tokens_col: str = "n_tokens") -> str:
    """DuckDB replay of :func:`pack_sequences` as the NAIVE global
    prefix sum — the two-phase scan must be indistinguishable from it.
    ``docs_sql`` yields (id_col, tokens_col)."""
    return f"""
WITH d AS ({docs_sql}),
p AS (
    SELECT {id_col}, CAST({tokens_col} AS BIGINT) AS n,
           CAST(COALESCE(sum(CAST({tokens_col} AS BIGINT)) OVER (
               ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS tok_start
    FROM d)
SELECT {id_col}, n AS {tokens_col}, tok_start,
       CAST(CASE WHEN n > 0 THEN tok_start // {int(seq_len)} END
            AS BIGINT) AS seq_first,
       CAST(CASE WHEN n > 0 THEN (tok_start + n - 1) // {int(seq_len)}
            END AS BIGINT) AS seq_last,
       CAST(CASE WHEN n > 0 THEN (tok_start + n - 1) // {int(seq_len)}
                                  - tok_start // {int(seq_len)} + 1
            ELSE 0 END AS BIGINT) AS n_seqs,
       CAST(CASE WHEN n > 0 THEN tok_start % {int(seq_len)} END
            AS BIGINT) AS off_in_first
FROM p
"""
