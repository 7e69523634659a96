"""Mergeable Misra-Gries heavy-hitter tier.

Misra & Gries' frequent-items summary (1982) keeps at most ``k``
counters and guarantees, for a stream of ``n`` items, an estimate
``f - n/(k+1) <= est <= f`` for EVERY item — the deterministic
counterpart of the Count-Min tier next door (one-sided error, no
hash collisions, no probability). Agarwal, Cormode, Huang, Phillips,
Wei & Yi, "Mergeable Summaries" (PODS 2012) proved the summaries merge
without losing the guarantee, which is what makes a TIER possible:
1m summaries re-aggregate to 1h/1d like the rollup cascade.

Merge algebra used here (order-free by construction, so it is safe
under any Spark partitioning AND replayable in SQL): child counters are
summed EXACTLY per (series, coarse bucket, item) — integer sums,
commutative — followed by ONE deterministic compaction:

    d = the (k+1)-th largest count in the bucket (0 if <= k items);
    keep (item, cnt - d) for every cnt > d.

The value at a fixed position of a sorted multiset is well-defined
regardless of tie order, and subtract-and-drop treats tied items
identically — no tie-break ever picks a survivor, so the summary is a
pure function of the input multiset. Cost of the single-compaction
merge vs the paper's pairwise variant: the undercount bound doubles to
``2n/(k+1)`` for cascaded tiers (each child build forfeits at most
``n_child/(k+1)`` — the k+1 counts >= d argument — and the one coarse
compaction forfeits at most ``n/(k+1)`` more); the estimate stays a
strict underestimate. The bound is asserted by a hypothesis property
test against brute-force counts.

Scale shape: one hash aggregate per tier (partial/final combinable
integer counts) + two windows over the SAME (series, bucket) partition
— one shuffle, bucket-bounded partitions, no Python anywhere. The
coarse tier reads only summary rows (<= k per child bucket), never raw
history.

Reference anchor: the items summarized are per-series label values of
the reference's extracted samples (TimeSeriesExtractor.cs sample
stream) — "which users/URLs dominate this series this hour" at 100 TB
without a per-item exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket

#: Output schema of :func:`mg_tier` / :func:`mg_cascade`.
MG_SCHEMA = ("series_key string, bucket_ts timestamp, item string, "
             "mg_cnt bigint")


def _mg_compact(counts: DataFrame, k: int) -> DataFrame:
    """One deterministic MG compaction of exact per-item counts:
    subtract the (k+1)-th largest count, drop the non-positive."""
    part = ["series_key", "bucket_ts"]
    rn = F.row_number().over(
        Window.partitionBy(*part).orderBy(F.col("cnt").desc(), "item"))
    d = F.max(F.when(F.col("_rn") == k + 1, F.col("cnt"))
              .otherwise(F.lit(0))).over(Window.partitionBy(*part))
    return (counts
            .withColumn("_rn", rn)
            .withColumn("_d", d)
            .where(F.col("cnt") > F.col("_d"))
            .select("series_key", "bucket_ts", "item",
                    (F.col("cnt") - F.col("_d")).alias("mg_cnt")))


def mg_tier(samples: DataFrame, tier: str = "1 hour", k: int = 8, *,
            key_col: str = "series_key", ts_col: str = "ts",
            item_col: str = "item") -> DataFrame:
    """Build one Misra-Gries tier from raw rows: exact per-bucket item
    counts (one hash aggregate), then the compaction. Every kept item
    satisfies ``true - n_bucket/(k+1) <= mg_cnt <= true`` within its
    bucket, and any item with frequency > n_bucket/(k+1) survives."""
    counts = (samples
              .where(F.col(item_col).isNotNull())
              .groupBy(F.col(key_col).alias("series_key"),
                       _bucket(ts_col, tier).alias("bucket_ts"),
                       F.col(item_col).cast("string").alias("item"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    return _mg_compact(counts, k)


def mg_cascade(child: DataFrame, tier: str, k: int = 8) -> DataFrame:
    """Re-aggregate a finer MG tier into a coarser one: exact integer
    sum of child counters per item, one compaction. Never touches raw
    data; undercount <= 2 * n_bucket / (k+1) at the coarse tier (module
    docstring)."""
    summed = (child
              .groupBy("series_key",
                       _bucket("bucket_ts", tier).alias("bucket_ts"),
                       "item")
              .agg(F.sum("mg_cnt").alias("cnt")))
    return _mg_compact(summed, k)


def mg_oracle_sql(table: str = "events", *, k: int = 8,
                  fine_unit: str = "hour", coarse_unit: str = "day",
                  series_expr: str = "event_type", ts_col: str = "ts",
                  item_expr: str = "CAST(user_id AS VARCHAR)") -> str:
    """DuckDB ground truth for the fine->coarse MG chain: the identical
    count -> (k+1)-th-largest subtract -> sum -> subtract algebra, all
    integers. Kept beside the impl."""
    def compact(src: str) -> str:
        return f"""
    SELECT series_key, bucket_ts, item, cnt - d AS mg_cnt FROM (
        SELECT *, max(CASE WHEN rn = {k + 1} THEN cnt ELSE 0 END)
                      OVER (PARTITION BY series_key, bucket_ts) AS d
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY series_key, bucket_ts
                ORDER BY cnt DESC, item) AS rn
            FROM {src})) WHERE cnt > d"""

    fine_counts = f"""(
    SELECT {series_expr} AS series_key,
           date_trunc('{fine_unit}', {ts_col}) AS bucket_ts,
           {item_expr} AS item, count(*) AS cnt
    FROM {table} WHERE {item_expr} IS NOT NULL
    GROUP BY 1, 2, 3)"""
    coarse_counts = f"""(
    SELECT series_key, date_trunc('{coarse_unit}', bucket_ts) AS bucket_ts,
           item, sum(mg_cnt) AS cnt
    FROM fine GROUP BY 1, 2, 3)"""
    return f"""
WITH fine AS ({compact(fine_counts)})
SELECT series_key, bucket_ts, item, CAST(mg_cnt AS BIGINT) AS mg_cnt
FROM ({compact(coarse_counts)})
"""
