"""Incremental continuous-aggregate refresh with invalidation.

TimescaleDB's continuous aggregates stay correct under late-arriving
data through an *invalidation log*: late raw rows mark their (series,
bucket) dirty, and a refresh recomputes ONLY the dirty buckets, merging
them into the standing tier. This module is that engine re-expressed
Spark-first, with one stronger property: because every tier statistic
here is **exactly mergeable** (integer fixed-point sums, min/max,
count, lexicographic-struct last), the refresh never has to touch raw
history at all — it folds the late batch's partial aggregates into the
existing tier rows and the result is bit-identical to a full recompute
over (on-time ∪ late), regardless of how the data was split or
partitioned.

Exactness design (why ``sum`` is not a double): double sums are
accumulation-order dependent, so ``sum(base) + sum(late)`` can differ
from ``sum(all)`` by an ulp — fatal for an "equals full recompute"
contract. Values are quantized to 1e-6 fixed point **per sample**
(``floor(v * 1e6 + 0.5)`` as int64) and summed as integers: exact,
associative, commutative, map-side combinable. int64 headroom: with
|v| ≤ 1e9 the per-sample magnitude is ≤ 1e15, leaving ~9e3 such samples
per bucket before overflow at the absolute worst case and ~1.8e13 for
metric-scale values; Spark ANSI mode fails loudly on overflow rather
than wrapping.

Scale shape (the part that matters at 100 TB): the standing tier is
huge; the late batch is tiny. The plan therefore never shuffles or
rewrites the tier wholesale:

- late batch → one partial aggregate (tiny: one row per dirty bucket);
- ``existing ⟕anti broadcast(dirty-keys)`` — untouched tier rows pass
  through with NO shuffle of the big side (broadcast anti join);
- ``existing ⋉semi broadcast(dirty-keys)`` — the handful of tier rows
  being revised (broadcast semi join);
- touched-rows ⟗ late-partials is a join of two TINY frames, then a
  column-wise merge.

On a real deployment the union(untouched, merged) is a MERGE INTO the
tier table with partition pruning on ``bucket_ts`` — only dirty
partitions are rewritten; the anti/semi pair is the local-mode
equivalent that keeps the same no-big-shuffle property.

Reference anchor: the rolled-up points this tier carries are the ones
the reference's extracted samples feed (TimeSeriesExtractor.cs sample
stream); the refresh contract guarantees those points stay exact when
web-crawl pages arrive out of order by days — the norm, not the
exception, for WARC data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket

#: Output schema (DDL) of :func:`rollup_mergeable` / :func:`refresh_rollup`
#: minus the ``refreshed`` flag the refresh adds.
MERGEABLE_SCHEMA = (
    "series_key string, bucket_ts timestamp, min double, max double, "
    "sum_fp6 bigint, cnt bigint, last double, last_ts timestamp"
)

_MERGE_COLS = ("min", "max", "sum_fp6", "cnt", "last", "last_ts")


def _fp6(v: Column) -> Column:
    return F.floor(v * 1e6 + F.lit(0.5)).cast("long")


def rollup_mergeable(
    samples: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """One tier of exactly-mergeable per-bucket state:
    (series_key, bucket_ts, min, max, sum_fp6, cnt, last, last_ts).

    ``sum_fp6`` is the int64 sum of 1e-6-quantized values (exact,
    order-independent); ``last`` is the value at the lexicographic
    (ts, value) maximum, so exact-timestamp ties are deterministic and
    merge-stable. One hash aggregate, no Python, no windows.
    """
    v = F.col(value_col)
    return (samples
            .where(v.isNotNull())
            .groupBy(F.col(key_col).alias("series_key"),
                     _bucket(ts_col, tier).alias("bucket_ts"))
            .agg(F.min(v).alias("min"),
                 F.max(v).alias("max"),
                 F.sum(_fp6(v)).alias("sum_fp6"),
                 F.count(v).alias("cnt"),
                 F.max(F.struct(F.col(ts_col).alias("t"), v.alias("v")))
                 .alias("_l"))
            .select("series_key", "bucket_ts", "min", "max", "sum_fp6",
                    "cnt", F.col("_l.v").alias("last"),
                    F.col("_l.t").alias("last_ts")))


def rollup_mergeable_cascade(child: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer :func:`rollup_mergeable` tier into a
    coarser one — BIT-exact (unlike the double-sum cascade in
    ``operators/rollup.py``, whose mean drifts by accumulation order):
    integer sums, min/max, and the lexicographic (last_ts, last) max
    are all order-free, so 1m→1h→1d re-aggregation equals a direct
    build from raw at every tier, and the refresh/partial-log
    machinery composes with cascades freely."""
    return (child
            .groupBy("series_key",
                     _bucket("bucket_ts", tier).alias("bucket_ts"))
            .agg(F.min("min").alias("min"),
                 F.max("max").alias("max"),
                 F.sum("sum_fp6").alias("sum_fp6"),
                 F.sum("cnt").alias("cnt"),
                 F.max(F.struct(F.col("last_ts").alias("t"),
                                F.col("last").alias("v"))).alias("_l"))
            .select("series_key", "bucket_ts", "min", "max", "sum_fp6",
                    "cnt", F.col("_l.v").alias("last"),
                    F.col("_l.t").alias("last_ts")))


def invalidated_buckets(
    late_samples: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """The invalidation log a late batch implies: the distinct
    (series_key, bucket_ts) pairs whose tier rows are now stale."""
    return (late_samples
            .where(F.col(value_col).isNotNull())
            .select(F.col(key_col).alias("series_key"),
                    _bucket(ts_col, tier).alias("bucket_ts"))
            .distinct())


def refresh_rollup(
    existing: DataFrame,
    late_samples: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Fold a late batch into a standing :func:`rollup_mergeable` tier.

    Returns the refreshed tier plus a ``refreshed`` flag (true on every
    bucket the late batch invalidated, including brand-new buckets).
    Bit-identical to ``rollup_mergeable(on_time ∪ late)`` by
    construction — every statistic merges exactly.

    Plan shape: the big ``existing`` side flows only through broadcast
    anti/semi joins (never shuffled); all real joins are between frames
    no larger than the dirty-bucket count.
    """
    keys = ["series_key", "bucket_ts"]
    late = rollup_mergeable(late_samples, tier, key_col=key_col,
                            ts_col=ts_col, value_col=value_col)
    dirty = F.broadcast(late.select(*keys))
    untouched = (existing.join(dirty, keys, "left_anti")
                 .withColumn("refreshed", F.lit(False)))
    touched = existing.join(dirty, keys, "left_semi")
    a, b = touched.alias("a"), late.alias("b")
    # touched ⊆ dirty and late == dirty on keys, so a right-outer keeps
    # exactly the dirty set (merged where the bucket existed, the late
    # partial alone where it is new). Both sides are dirty-sized; a
    # right-outer BroadcastHashJoin builds the LEFT side, so the hint
    # goes on `a` (broadcasting `b` is unsupported for this join type).
    j = F.broadcast(a).join(b, keys, "right_outer")
    b_struct = F.struct(F.col("b.last_ts").alias("t"),
                        F.col("b.last").alias("v"))
    # a NULL left side surfaces as struct(NULL, NULL), whose ordering vs
    # a real struct is engine lore — branch on it explicitly instead.
    last_pick = F.when(F.col("a.last_ts").isNull(), b_struct).otherwise(
        F.greatest(F.struct(F.col("a.last_ts").alias("t"),
                            F.col("a.last").alias("v")), b_struct))
    merged = j.select(
        *keys,
        F.least(F.col("a.min"), F.col("b.min")).alias("min"),
        F.greatest(F.col("a.max"), F.col("b.max")).alias("max"),
        (F.coalesce(F.col("a.sum_fp6"), F.lit(0))
         + F.col("b.sum_fp6")).alias("sum_fp6"),
        (F.coalesce(F.col("a.cnt"), F.lit(0)) + F.col("b.cnt")).alias("cnt"),
        last_pick["v"].alias("last"),
        last_pick["t"].alias("last_ts"),
        F.lit(True).alias("refreshed"))
    return untouched.unionByName(merged)


def refresh_rollup_recompute(
    existing: DataFrame,
    raw_current: DataFrame,
    invalidated: DataFrame,
    tier: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Refresh under DELETES/UPDATES: fold-in (:func:`refresh_rollup`)
    only works for appends — min/max/last are not delete-invertible —
    so modified buckets are RECOMPUTED from the current raw data (what
    TimescaleDB's refresh actually does for its invalidation ranges).

    ``invalidated`` is the (series_key, bucket_ts) log of buckets whose
    raw rows changed (from :func:`invalidated_buckets` over the deleted
    + inserted rows). Buckets left EMPTY by the deletion disappear from
    the tier (a recompute over zero rows produces no row — exactly the
    full-recompute semantics).

    Scale shape: the tier passes through a broadcast anti join
    (untouched rows, never shuffled); raw history is filtered to dirty
    buckets by a broadcast semi join on (key, bucket) BEFORE its one
    hash aggregate — on a bucket_ts-partitioned raw table that filter
    is partition pruning, so the recompute reads only dirty partitions,
    not 100 TB.
    """
    keys = ["series_key", "bucket_ts"]
    dirty = F.broadcast(invalidated.select(*keys))
    untouched = (existing.join(dirty, keys, "left_anti")
                 .withColumn("refreshed", F.lit(False)))
    raw_keyed = raw_current.select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value_double"),
        _bucket(ts_col, tier).alias("bucket_ts"))
    dirty_raw = raw_keyed.join(dirty, keys, "left_semi")
    recomputed = (rollup_mergeable(dirty_raw, tier)
                  .withColumn("refreshed", F.lit(True)))
    return untouched.unionByName(recomputed)


def write_partials_stream(samples_stream: DataFrame, output_path: str,
                          tier: str = "1 minute", *,
                          checkpoint_dir: str,
                          key_col: str = "series_key",
                          ts_col: str = "ts",
                          value_col: str = "value_double"):
    """Streaming face of the incremental refresh: each micro-batch
    appends its buckets' PARTIAL aggregates (one
    :func:`rollup_mergeable` pass over the batch, stamped with the
    batch id); nothing ever rewrites previous batches' rows. Because
    every statistic is exactly mergeable, the tier materializes at
    read time (:func:`read_merged_tier`) — bit-identical to a batch
    rollup over everything that has arrived, however the stream was
    micro-batched.

    Exactly-once: a crash-replayed batch id rewrites exactly its own
    ``b<batch_id>`` directory with identical content (the engine
    replays the same data), so replay is idempotent — the same
    batch-id-versioned contract as plans/pipeline.py checkpoints.
    Compaction is the batch operator: fold old partials with
    :func:`refresh_rollup` (or re-aggregate with the same merge
    expressions) whenever the partial count per bucket grows.

    Returns the started StreamingQuery.
    """
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        parts = rollup_mergeable(batch_df, tier, key_col=key_col,
                                 ts_col=ts_col, value_col=value_col)
        (parts.withColumn("p_batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(f"{output_path}/b{batch_id:05d}"))

    return (samples_stream.writeStream
            .foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def _log_dirs(spark, output_path: str):
    """(live_paths, compacted_hi, stale_paths) for a partial log.

    Layout contract: ``b<id>`` = one micro-batch's partials;
    ``c<id>`` = a compacted generation superseding every ``b``/``c``
    with id <= its own. Readers take the HIGHEST ``c`` plus all ``b``
    above it — anything below is stale debris a crashed compaction may
    have left and is ignored (then lazily deleted by the next
    compaction)."""
    import re

    from json_time_series_extractor_spark.plans.pipeline import hadoop_fs

    fs, root = hadoop_fs(spark, output_path)
    b, c = [], []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            m = re.fullmatch(r"([bc])(\d+)", name)
            if m:
                (b if m.group(1) == "b" else c).append(
                    (int(m.group(2)), name))
    hi = max(c)[0] if c else None
    live = ([f"{output_path}/{max(c)[1]}"] if c else []) + \
        [f"{output_path}/{n}" for i, n in sorted(b)
         if hi is None or i > hi]
    stale = [f"{output_path}/{n}" for i, n in b if hi is not None
             and i <= hi] + \
        [f"{output_path}/{n}" for i, n in c if i != hi]
    return live, hi, stale


def _merge_partials(parts: DataFrame) -> DataFrame:
    return (parts
            .groupBy("series_key", "bucket_ts")
            .agg(F.min("min").alias("min"),
                 F.max("max").alias("max"),
                 F.sum("sum_fp6").alias("sum_fp6"),
                 F.sum("cnt").alias("cnt"),
                 F.max(F.struct(F.col("last_ts").alias("t"),
                                F.col("last").alias("v"))).alias("_l"),
                 F.max("p_batch").alias("p_batch"))
            .select("series_key", "bucket_ts", "min", "max", "sum_fp6",
                    "cnt", F.col("_l.v").alias("last"),
                    F.col("_l.t").alias("last_ts"), "p_batch"))


def compact_partials(spark, output_path: str) -> int:
    """Fold the live partial directories into one compacted generation
    (``c<highest folded id>`` — ``p_batch`` is folded as MAX so the
    ``refreshed`` flag survives). Exact by the same merge algebra as
    :func:`read_merged_tier`; returns the number of directories folded.

    Crash-safe by supersession, not deletion order: the generation is
    written to a temp dir invisible to readers, then ONE atomic rename
    publishes it; the folded inputs become stale debris that readers
    already ignore (see :func:`_log_dirs`) and the next compaction
    deletes. A crash at any step leaves either the old view or the new
    view — never a partial one. (On Iceberg this whole function is
    RewriteDataFiles/MERGE; this is the filesystem-only equivalent.)
    """
    from json_time_series_extractor_spark.plans.pipeline import hadoop_fs

    live, _, stale = _log_dirs(spark, output_path)
    fs, _ = hadoop_fs(spark, output_path)
    for p in stale:  # debris from earlier generations: superseded
        _, hp = hadoop_fs(spark, p)
        fs.delete(hp, True)
    if len(live) < 2:
        return 0
    hi = max(int(p.rsplit("/", 1)[1][1:]) for p in live)
    tmp = f"{output_path}/_compact_tmp"
    _merge_partials(spark.read.parquet(*live)) \
        .write.mode("overwrite").parquet(tmp)
    _, src = hadoop_fs(spark, tmp)
    _, dst = hadoop_fs(spark, f"{output_path}/c{hi:05d}")
    fs.rename(src, dst)
    # the fold's inputs are superseded the instant the rename lands;
    # deleting them now is cleanup, not correctness — a crash here
    # leaves debris the next call sweeps
    _, _, stale = _log_dirs(spark, output_path)
    for p in stale:
        _, hp = hadoop_fs(spark, p)
        fs.delete(hp, True)
    return len(live)


def read_merged_tier(spark, output_path: str) -> DataFrame:
    """Materialize the tier from the partial log: one hash aggregate
    merging every live batch/generation's partials per (series,
    bucket) — the same exact-merge algebra as :func:`refresh_rollup`.
    ``refreshed`` is true for buckets that received contributions
    after the initial batch (the streaming analog of the invalidation
    flag)."""
    live, _, _ = _log_dirs(spark, output_path)
    merged = _merge_partials(spark.read.parquet(*live))
    return merged.withColumn("refreshed", F.col("p_batch") > 0) \
        .drop("p_batch")


def realtime_rollup(
    tier: DataFrame,
    raw: DataFrame,
    watermark,
    tier_interval: str = "1 minute",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """TimescaleDB-style *real-time continuous aggregate*: serve closed
    buckets from the materialized ``tier`` and aggregate the raw tail
    past the materialization ``watermark`` on the fly, so queries see
    up-to-the-second results without waiting for the next refresh.

    Exactness: the watermark is floored to the tier's epoch-aligned
    bucket grid INSIDE the plan, the tier is filtered to
    ``bucket_ts < aligned`` and raw to ``ts >= aligned`` — the two
    sides cover disjoint, gap-free bucket ranges, and every statistic
    is exactly mergeable, so the union is bit-identical to
    ``rollup_mergeable(all raw)`` for ANY watermark (including one
    before / after all data: either side may be empty).

    Scale shape: no joins at all. Both filters are partition pruning on
    a ``bucket_ts``- / ``ts``-partitioned table — the tier scan reads
    only closed partitions, the raw scan only the tail past the
    watermark (hours, not the 100 TB of history) — and the tail's one
    hash aggregate is partial/final combinable. ``materialized`` flags
    which side served each bucket (a bucket on the wrong side breaks
    the full-recompute oracle hash).

    Reference anchor: the tier rows carry the same rolled-up points the
    reference's extracted samples feed (TimeSeriesExtractor.cs sample
    stream); this is the read-path completion of :func:`refresh_rollup`
    (the write path).
    """
    from json_time_series_extractor_spark.operators.gapfill import (
        _epoch_floor, _interval_seconds)

    secs = _interval_seconds(tier_interval)
    aligned = _epoch_floor(F.lit(watermark).cast("timestamp"), secs)
    closed = (tier
              .where(F.col("bucket_ts") < aligned)
              .select("series_key", "bucket_ts", *_MERGE_COLS)
              .withColumn("materialized", F.lit(True)))
    fresh = (rollup_mergeable(
        raw.where(F.col(ts_col).cast("timestamp") >= aligned),
        tier_interval, key_col=key_col, ts_col=ts_col,
        value_col=value_col)
        .withColumn("materialized", F.lit(False)))
    return closed.unionByName(fresh)


def refresh_oracle_sql(table: str = "events", *, unit: str = "minute",
                       series_expr: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value",
                       late_pred: str = "event_id % 20 = 7") -> str:
    """DuckDB ground truth for the refresh contract: the FULL recompute
    over all rows (per-sample fixed-point sums, lexicographic last) with
    ``refreshed`` derived from the same late-row predicate the Spark
    query uses to split the batch. Any merge error — a bucket missed by
    the invalidation log, a double-counted sum, a lost last — breaks
    the hash."""
    return f"""
SELECT {series_expr} AS series_key,
       date_trunc('{unit}', {ts_col}) AS bucket_ts,
       min({value_col}) AS min,
       max({value_col}) AS max,
       CAST(sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_fp6,
       count({value_col}) AS cnt,
       first({value_col} ORDER BY {ts_col} DESC, {value_col} DESC) AS last,
       max({ts_col}) AS last_ts,
       bool_or({late_pred}) AS refreshed
FROM {table}
WHERE {value_col} IS NOT NULL
GROUP BY 1, 2
"""
