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


def _mg_compact(counts: DataFrame, k: int, extra_cols=()) -> DataFrame:
    """One deterministic MG compaction of exact per-item counts:
    subtract the (k+1)-th largest count, drop the non-positive.
    ``extra_cols`` pass through (columns functionally determined by the
    (series, bucket) partition, e.g. ``n_buckets``)."""
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
                    (F.col("cnt") - F.col("_d")).alias("mg_cnt"),
                    *extra_cols))


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


def mg_over_time(tier: DataFrame, k_buckets: int, k: int = 8, *,
                 min_buckets: int = 1) -> DataFrame:
    """Sliding heavy hitters: per (series, bucket), the MG merge of the
    trailing ``k_buckets`` PRESENT buckets' summaries — "which items
    dominated the last k hours, hourly" from summary rows alone.
    Completes the sliding-sketch family next to ``hll_over_time``
    (distincts), ``cm_over_time`` (frequencies) and
    ``tdigest_over_time`` (quantiles), with the same
    present-bucket-INDEX window semantics and ``n_buckets`` gate (a
    per-item ROWS frame would silently reach past the window where an
    item is absent from an intermediate bucket — the documented r6
    lesson).

    Same fan-out shape as ``cm_over_time``: summary rows (<= k per
    bucket) fan to the <= k_buckets later present-bucket indices, exact
    integer counter sums per item per window, then ONE compaction per
    output bucket. Undercount vs the window's true counts is bounded by
    the window's child forfeits plus the one compaction — <= 2·n_win/
    (k+1), the module's cascade bound. Output: MG_SCHEMA + ``n_buckets``.
    """
    if k_buckets < 1:
        raise ValueError(f"k_buckets must be >= 1, got {k_buckets}")
    if min_buckets < 1:
        raise ValueError(f"min_buckets must be >= 1, got {min_buckets}")
    b = (tier.select("series_key", "bucket_ts").distinct()
         .withColumn("_i", F.row_number().over(
             Window.partitionBy("series_key").orderBy("bucket_ts"))))
    fan = (tier.join(b, ["series_key", "bucket_ts"])
           .select("series_key", "item", "mg_cnt",
                   F.explode(F.sequence(
                       F.col("_i"),
                       F.col("_i") + F.lit(k_buckets - 1))).alias("_ti")))
    tgt = b.select("series_key", F.col("bucket_ts").alias("_tbt"),
                   F.col("_i").alias("_ti"),
                   F.least(F.col("_i"), F.lit(k_buckets))
                   .alias("n_buckets"))
    summed = (fan.join(tgt, ["series_key", "_ti"])
              .where(F.col("n_buckets") >= min_buckets)
              .groupBy("series_key", F.col("_tbt").alias("bucket_ts"),
                       "item", "n_buckets")
              .agg(F.sum("mg_cnt").alias("cnt")))
    return _mg_compact(summed, k, extra_cols=("n_buckets",))


def mg_over_time_oracle_sql(table: str = "events", *, k: int = 8,
                            k_buckets: int = 6, unit: str = "hour",
                            series_expr: str = "event_type",
                            ts_col: str = "ts",
                            item_expr: str = "CAST(user_id AS VARCHAR)"
                            ) -> str:
    """DuckDB ground truth for :func:`mg_over_time` over a from-raw
    fine tier: per-bucket MG build, the same present-bucket-index
    fan-out + integer sums, one compaction per window. Kept beside
    the impl."""
    fine_counts = f"""(
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {item_expr} AS item, count(*) AS cnt
    FROM {table} WHERE {item_expr} IS NOT NULL
    GROUP BY 1, 2, 3)"""
    summed = f"""(
    SELECT f.series_key, b2.bucket_ts, f.item,
           CAST(least(b2.i, {k_buckets}) AS INT) AS n_buckets,
           CAST(sum(f.mg_cnt) AS BIGINT) AS cnt
    FROM (SELECT t.*, br.i + r.range AS ti
          FROM fine t JOIN b br USING (series_key, bucket_ts)
          CROSS JOIN range(0, {k_buckets}) r) f
    JOIN b b2 ON b2.series_key = f.series_key AND b2.i = f.ti
    GROUP BY 1, 2, 3, 4)"""
    compacted = _compact_sql(summed, k).replace(
        "SELECT series_key, bucket_ts, item, cnt - d AS mg_cnt",
        "SELECT series_key, bucket_ts, item, cnt - d AS mg_cnt, "
        "n_buckets", 1)
    return f"""
WITH fine AS ({_compact_sql(fine_counts, k)}),
b AS (
    SELECT series_key, bucket_ts,
           row_number() OVER (PARTITION BY series_key
                              ORDER BY bucket_ts) AS i
    FROM (SELECT DISTINCT series_key, bucket_ts FROM fine))
SELECT series_key, bucket_ts, item, CAST(mg_cnt AS BIGINT) AS mg_cnt,
       n_buckets
FROM ({compacted})
"""


def write_mg_partials_stream(samples_stream: DataFrame, output_path: str,
                             tier: str = "1 hour", k: int = 8, *,
                             checkpoint_dir: str,
                             key_col: str = "series_key",
                             ts_col: str = "ts",
                             item_col: str = "item"):
    """Streaming face of the MG tier (the partial-log pattern of
    ``refresh.write_partials_stream``): each micro-batch appends its own
    COMPACTED summary — at most k rows per (series, bucket) per batch,
    so what persists is bounded summary state, never raw per-item
    counts — stamped with the batch id; nothing rewrites previous
    batches, and a crash-replayed batch id rewrites exactly its own
    directory with identical content (idempotent replay). The tier
    materializes at read (:func:`read_merged_mg`) by exact counter sums
    + one compaction; because per-batch builds forfeit at most
    ``n_batch/(k+1)`` each and the read compaction at most ``n/(k+1)``,
    the merged estimate keeps the module's ``2n/(k+1)`` undercount
    bound however the stream was micro-batched.

    Returns the started StreamingQuery."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        parts = mg_tier(batch_df, tier, k, key_col=key_col,
                        ts_col=ts_col, item_col=item_col)
        (parts.withColumn("p_batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(f"{output_path}/b{batch_id:05d}"))

    return (samples_stream.writeStream
            .foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def read_merged_mg(spark, output_path: str, k: int = 8) -> DataFrame:
    """Materialize the MG tier from the partial log: exact integer sum
    of every live batch's counters per (series, bucket, item), one
    compaction — the same merge algebra as :func:`mg_cascade`."""
    from json_time_series_extractor_spark.operators.refresh import (
        _log_dirs)

    live, _, _ = _log_dirs(spark, output_path)
    parts = spark.read.parquet(*live)
    summed = (parts.groupBy("series_key", "bucket_ts", "item")
              .agg(F.sum("mg_cnt").alias("cnt")))
    return _mg_compact(summed, k)


def compact_mg_partials(spark, output_path: str) -> int:
    """Fold the live MG partial directories into one compacted
    generation (``c<highest folded id>``), crash-safe by supersession —
    the same temp-write + ONE atomic rename contract as
    ``refresh.compact_partials`` (readers see either the old or the new
    view, never a partial one; debris sweeps on the next call).

    The fold is the merge algebra's ASSOCIATIVE half only — exact
    integer counter sums per (series, bucket, item), NO k-compaction at
    rest — so :func:`read_merged_mg` returns the bit-identical summary
    before and after any compaction schedule (a k-compaction at rest
    would be a valid MG merge but would make the read depend on WHEN
    compaction ran). The fold still bounds state: per-key duplicates
    across batches collapse, so a generation holds at most the distinct
    surviving keys instead of #batches × k rows; the k-bound itself is
    applied at read. Returns the number of directories folded."""
    from json_time_series_extractor_spark.operators.refresh import (
        _log_dirs)
    from json_time_series_extractor_spark.plans.pipeline import hadoop_fs

    live, _, stale = _log_dirs(spark, output_path)
    fs, _ = hadoop_fs(spark, output_path)
    for p in stale:
        _, hp = hadoop_fs(spark, p)
        fs.delete(hp, True)
    if len(live) < 2:
        return 0
    hi = max(int(p.rsplit("/", 1)[1][1:]) for p in live)
    tmp = f"{output_path}/_compact_tmp"
    (spark.read.parquet(*live)
     .groupBy("series_key", "bucket_ts", "item")
     .agg(F.sum("mg_cnt").alias("mg_cnt"),
          F.max("p_batch").alias("p_batch"))
     .write.mode("overwrite").parquet(tmp))
    _, src = hadoop_fs(spark, tmp)
    _, dst = hadoop_fs(spark, f"{output_path}/c{hi:05d}")
    fs.rename(src, dst)
    _, _, stale = _log_dirs(spark, output_path)
    for p in stale:
        _, hp = hadoop_fs(spark, p)
        fs.delete(hp, True)
    return len(live)


def _compact_sql(src: str, k: int) -> str:
    """DuckDB twin of :func:`_mg_compact` over a (series_key, bucket_ts,
    item, cnt) relation. Kept beside the impl."""
    return f"""
    SELECT series_key, bucket_ts, item, cnt - d AS mg_cnt FROM (
        SELECT *, max(CASE WHEN rn = {k + 1} THEN cnt ELSE 0 END)
                      OVER (PARTITION BY series_key, bucket_ts) AS d
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY series_key, bucket_ts
                ORDER BY cnt DESC, item) AS rn
            FROM {src})) WHERE cnt > d"""


def mg_stream_oracle_sql(table: str = "events", *, k: int = 8,
                         unit: str = "hour",
                         series_expr: str = "event_type",
                         ts_col: str = "ts",
                         item_expr: str = "CAST(user_id AS VARCHAR)",
                         late_pred: str = "event_id % 20 = 7") -> str:
    """DuckDB ground truth for the two-micro-batch streaming run: each
    batch's compaction replayed on the same predicate split, then the
    read-side sum + compaction. The merge algebra is commutative, so
    only the row PARTITION matters, not batch order."""
    def batch_counts(pred: str) -> str:
        return f"""(
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {item_expr} AS item, count(*) AS cnt
    FROM {table} WHERE ({pred}) AND {item_expr} IS NOT NULL
    GROUP BY 1, 2, 3)"""

    merged = f"""(
    SELECT series_key, bucket_ts, item, sum(mg_cnt) AS cnt
    FROM (SELECT * FROM b0 UNION ALL SELECT * FROM b1)
    GROUP BY 1, 2, 3)"""
    return f"""
WITH b0 AS ({_compact_sql(batch_counts(f"NOT ({late_pred})"), k)}),
b1 AS ({_compact_sql(batch_counts(late_pred), k)})
SELECT series_key, bucket_ts, item, CAST(mg_cnt AS BIGINT) AS mg_cnt
FROM ({_compact_sql(merged, k)})
"""


def mg_oracle_sql(table: str = "events", *, k: int = 8,
                  fine_unit: str = "hour", coarse_unit: str = "day",
                  series_expr: str = "event_type", ts_col: str = "ts",
                  item_expr: str = "CAST(user_id AS VARCHAR)") -> str:
    """DuckDB ground truth for the fine->coarse MG chain: the identical
    count -> (k+1)-th-largest subtract -> sum -> subtract algebra, all
    integers. Kept beside the impl."""
    def compact(src: str) -> str:
        return _compact_sql(src, k)

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
