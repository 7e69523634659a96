"""Exact corpus-quantile thresholding: drop the worst q fraction.

Quality pipelines cut by PERCENTILE, not by absolute score (Gopher
drops the worst tail by LM score; CCNet buckets by perplexity
terciles). At 100 TB the textbook tools are both wrong:
``approxQuantile`` is approximate (the cut moves between runs), and an
exact ``ORDER BY ... LIMIT k`` is the global sort this repo bans. The
exact, sort-free alternative is a two-phase counting select — the
histogram form of distributed quickselect:

1. **Coarse pass**: one hash aggregate of counts per
   ``score DIV 2^coarse_bits`` bucket. The cumulative walk (driver
   side, summary rows) locates the bucket containing the target rank.
2. **Exact pass**: one hash aggregate of counts per DISTINCT score
   *inside that one bucket* (bounded by construction: <= 2^coarse_bits
   distinct fp6 values). The walk finishes inside it.

Both passes are map-side-combinable aggregates over an integer column;
the collects are summary-sized and bounded a priori — the documented
verification-scale pattern (lmscore/bpe/similarity), here with a hard
2^coarse_bits bound rather than a distributional one.

Threshold semantics (deterministic, tie-safe): with k = floor(q·N)
rows allowed to drop, the threshold t is the score of the (k+1)-th
smallest row; rows with score < t are dropped — always <= k rows, and
boundary TIES ARE KEPT rather than split (splitting a tie requires a
secondary total order and buys nothing a quality filter wants). The
dropped count is exact and reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators._persist import (
    materialize,
)


def value_at_rank(df: DataFrame, col: str, rank: int, *,
                  coarse_bits: int = 20,
                  n_rows: int = None) -> int:
    """Exact ``rank``-th smallest (1-indexed, duplicates counted) of an
    int64 column, in at most two counting passes — no sort, no quantile
    approximation. Raises if ``rank`` exceeds the non-null row count.

    ``n_rows`` (optimization round 8): callers that already know the
    non-null row count (both in-repo callers count first) can pass it;
    when the WHOLE column has <= 2^coarse_bits rows, one pass over the
    distinct values is within the same a-priori collect bound the fine
    pass already promises, so the coarse pass is skipped — one action
    instead of two. The two-pass form remains the scale path.
    """
    return _value_at_rank_with_below(df, col, rank,
                                     coarse_bits=coarse_bits,
                                     n_rows=n_rows)[0]


def _value_at_rank_with_below(df: DataFrame, col: str, rank: int, *,
                              coarse_bits: int = 20,
                              n_rows: int = None) -> tuple:
    """(value at rank, count of rows strictly below that value) — the
    second element falls out of the counting walks for free, so callers
    that need the dropped-row count (quantile_threshold_filter) don't
    pay an extra counting job for it."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    if not 8 <= coarse_bits <= 40:
        raise ValueError(f"coarse_bits must be in [8, 40], got {coarse_bits}")
    v = F.col(col)
    nn = df.where(v.isNotNull())
    below = 0
    if n_rows is not None and int(n_rows) <= (1 << coarse_bits):
        # Single-pass: every distinct value (bounded by n_rows).
        fine = sorted(
            nn.groupBy(v.cast("long").alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect(), key=lambda r: r["_v"])
        remaining = rank
        for r in fine:
            if remaining <= r["_c"]:
                return int(r["_v"]), below
            remaining -= r["_c"]
            below += r["_c"]
        total = sum(r["_c"] for r in fine)
        raise ValueError(f"rank {rank} > non-null rows {total}")
    # floor shift keeps bucket order == value order for negatives too
    # sorts happen DRIVER-side over the collected summary rows (never
    # a Sort stage, even a summary-sized one)
    coarse = sorted(
        nn.groupBy(F.shiftright(v.cast("long"), coarse_bits).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect(), key=lambda r: r["_b"])
    remaining = rank
    bucket = None
    for r in coarse:
        if remaining <= r["_c"]:
            bucket = r["_b"]
            break
        remaining -= r["_c"]
        below += r["_c"]
    if bucket is None:
        total = sum(r["_c"] for r in coarse)
        raise ValueError(f"rank {rank} > non-null rows {total}")
    fine = sorted(
        nn.where(F.shiftright(v.cast("long"), coarse_bits)
                 == F.lit(int(bucket)))
        .groupBy(v.cast("long").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect(), key=lambda r: r["_v"])
    for r in fine:
        if remaining <= r["_c"]:
            return int(r["_v"]), below
        remaining -= r["_c"]
        below += r["_c"]
    raise AssertionError("coarse/fine passes disagree")  # unreachable


def quantile_threshold_filter(df: DataFrame, score_col: str,
                              drop_frac: float, *,
                              coarse_bits: int = 20) -> DataFrame:
    """Keep rows whose int64 ``score_col`` is >= the exact
    ``drop_frac`` lower-quantile threshold (boundary ties kept; NULL
    scores always dropped).

    Output: the surviving rows plus ``threshold`` and ``n_dropped``
    (constant columns — the lineage a filtered corpus must carry to be
    auditable). ``drop_frac`` of 0 keeps everything.
    """
    if not 0.0 <= drop_frac < 1.0:
        raise ValueError(f"drop_frac must be in [0, 1), got {drop_frac}")
    v = F.col(score_col)
    # The counting passes (count, two histogram collects, the dropped
    # count) are separate ACTIONS: without a persist each re-executes
    # the scoring subplan — the _materialize defect class. Persist the
    # NARROW score projection only: at 100 TB caching the full rows
    # would itself be a 100 TB write, while the final keep-filter reads
    # the original frame once with the threshold pushed down.
    nn = materialize(df.select(v.alias(score_col)).where(v.isNotNull()))
    n = nn.count()
    if n == 0:
        raise ValueError(f"no non-null {score_col} rows")
    k = int(drop_frac * n)   # <= n-1 since drop_frac < 1
    # r8: the dropped count is the threshold walk's cumulative count of
    # values strictly below t — no separate counting job needed.
    t, dropped = _value_at_rank_with_below(
        nn, score_col, k + 1, coarse_bits=coarse_bits, n_rows=n)
    return (df.where(v.isNotNull() & (v.cast("long") >= F.lit(t)))
            .withColumn("threshold", F.lit(t).cast("long"))
            .withColumn("n_dropped", F.lit(int(dropped)).cast("long")))


def quantile_threshold_oracle_sql(scored_sql: str, drop_frac: float, *,
                                  score_col: str = "score") -> str:
    """DuckDB replay of :func:`quantile_threshold_filter` as the naive
    sorted selection the two-phase select must be indistinguishable
    from: t = score at rank floor(q·N)+1 ascending."""
    return f"""
WITH d AS ({scored_sql}),
nn AS (SELECT * FROM d WHERE {score_col} IS NOT NULL),
t AS (
    SELECT {score_col} AS thr FROM nn ORDER BY {score_col}
    LIMIT 1 OFFSET (SELECT CAST(floor({drop_frac!r} * count(*)) AS BIGINT)
                    FROM nn)),
drp AS (SELECT count(*) AS nd FROM nn WHERE {score_col} < (SELECT thr FROM t))
SELECT nn.*, (SELECT CAST(thr AS BIGINT) FROM t) AS threshold,
       (SELECT CAST(nd AS BIGINT) FROM drp) AS n_dropped
FROM nn WHERE {score_col} >= (SELECT thr FROM t)
"""
