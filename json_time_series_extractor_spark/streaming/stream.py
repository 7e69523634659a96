"""Structured Streaming wrapper for the extract -> rollup pipeline.

The engine is batch-first (the north rule asks for batch + resumable
checkpoints); streaming is a thin shell that reuses the exact same
operators — ``extract_samples`` (mapInPandas works unchanged on streaming
DataFrames) and the same aggregate expressions as ``operators.rollup`` —
with a watermark for late data. Late rows beyond the watermark are dropped
by Spark; the watermark column is the sample timestamp.

``last`` uses ``max_by(value, ts)`` which is supported in streaming
aggregations; the tier cascade applies downstream of the sink in batch,
OR — since round 6 — live inside one streaming query via
:func:`streaming_rollup_tiers` (chained time-window aggregations,
supported natively by Spark 3.5+/4.x multiple-stateful-operator
support: the fine tier's window column carries event time forward via
``window_time``, and both tiers' state is tracked under one watermark).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from json_time_series_extractor_spark.core.options import ExtractorOptions
from json_time_series_extractor_spark.operators.extract import extract_samples

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string")


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    """File-based streaming source over a pages directory (parquet).
    On a real deployment this is Kafka/Kinesis with the same schema."""
    return (spark.readStream
            .schema(PAGES_DDL)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path))


def streaming_rollup(pages_stream: DataFrame,
                     options: Union[ExtractorOptions, dict, None],
                     tier: str = "1 minute",
                     watermark: str = "10 minutes") -> DataFrame:
    """extract -> watermark -> tumbling-window rollup, append-mode ready."""
    samples = extract_samples(pages_stream, options)
    v = F.col("value_double")
    return (samples
            .where(v.isNotNull())
            .withWatermark("ts", watermark)
            .groupBy("series_key", F.window("ts", tier))
            .agg(F.min(v).alias("min"),
                 F.max(v).alias("max"),
                 F.sum(v).alias("sum"),
                 F.count(v).alias("count"),
                 (F.sum(v) / F.count(v)).alias("mean"),
                 F.max_by(v, F.col("ts")).alias("last"),
                 F.max("ts").alias("last_ts"))
            .select("series_key", F.col("window.start").alias("bucket_ts"),
                    "min", "max", "sum", "count", "mean", "last", "last_ts"))


def streaming_rollup_tiers(sample_stream: DataFrame,
                           tiers: tuple = ("1 minute", "1 hour"),
                           watermark: str = "10 minutes",
                           value_col: str = "value_double",
                           deterministic_last: bool = False) -> DataFrame:
    """Streaming-to-streaming tier cascade in ONE query (round 6):
    raw samples -> tiers[0] windowed rollup -> tiers[1] merge -> ... ,
    all chained inside a single append-mode streaming plan.

    Closes the boundary the shell previously documented as out of
    scope: Spark 3.5+/4.x supports multiple stateful operators in
    append mode, and chained tumbling-window aggregations in
    particular — the fine tier's ``window`` struct carries event time
    downstream (re-derived with ``window_time``, which is
    watermark-aware: it evaluates to ``window.end - 1µs``, so a closed
    1m window lands in exactly one 1h window), and the engine tracks
    every tier's state under the single watermark. A coarse window
    emits once the watermark passes its end, by which point every
    constituent fine window has closed and merged.

    The merge algebra is ``rollup.rollup_cascade``'s, unchanged:
    min of mins / max of maxes / sum of sums / sum of counts /
    ``max_by(last, last_ts)`` (fine buckets have pairwise-distinct
    ``last_ts``, so the merge is deterministic) — which is why a
    streamed coarse tier equals a batch cascade over the same rows.
    ``mean`` is derived terminally from the merged sum/count.

    ``deterministic_last`` mirrors ``rollup.rollup``'s flag for the
    raw tier (max-of-struct tie-break on equal timestamps; needed for
    oracle-exact comparison, costs a SortAggregate on the fine tier).
    """
    if not tiers:
        raise ValueError("tiers must name at least one window size")
    v = F.col(value_col)
    if deterministic_last:
        last0 = F.max(F.struct(F.col("ts").alias("t"), v.alias("v")))["v"]
    else:
        last0 = F.max_by(v, F.col("ts"))
    cur = (sample_stream
           .where(v.isNotNull())
           .withWatermark("ts", watermark)
           .groupBy("series_key", F.window("ts", tiers[0]))
           .agg(F.min(v).alias("min"),
                F.max(v).alias("max"),
                F.sum(v).alias("sum"),
                F.count(v).alias("count"),
                last0.alias("last"),
                F.max("ts").alias("last_ts")))
    for tier in tiers[1:]:
        cur = (cur
               .groupBy("series_key",
                        F.window(F.window_time("window"), tier))
               .agg(F.min("min").alias("min"),
                    F.max("max").alias("max"),
                    F.sum("sum").alias("sum"),
                    F.sum("count").alias("count"),
                    F.max_by("last", "last_ts").alias("last"),
                    F.max("last_ts").alias("last_ts")))
    return cur.select(
        "series_key", F.col("window.start").alias("bucket_ts"),
        "min", "max", "sum", "count",
        (F.col("sum") / F.col("count")).alias("mean"),
        "last", "last_ts")


def run_to_memory_sink(rollup_stream: DataFrame, query_name: str,
                       checkpoint_dir: Optional[str] = None):
    """Drive a streaming rollup to a memory sink synchronously (tests /
    smoke); returns the StreamingQuery after draining available input."""
    writer = (rollup_stream.writeStream
              .outputMode("append")
              .format("memory")
              .queryName(query_name))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.processAllAvailable()
    return query


def streaming_histogram(sample_stream: DataFrame,
                        bounds: tuple,
                        tier: str = "1 hour",
                        watermark: str = "10 minutes",
                        value_col: str = "value_double") -> DataFrame:
    """Watermarked streaming version of ``rollup.rollup_histogram``:
    per (series, window) explicit-bounds bin counts, append-mode ready.

    Emits the SAME mergeable state shape as the batch operator (hist
    array<long> + cnt), so a batch ``histogram_cascade`` consumes the
    streamed fine tier unchanged — the streaming/batch tier handoff
    needs no reshaping. Pure built-in aggregates (sum of CASE), no
    Python, no custom state store."""
    bl = list(bounds)
    if not bl or bl != sorted(bl) or len(set(bl)) != len(bl):
        raise ValueError(
            f"histogram bounds must be non-empty and strictly "
            f"increasing, got {bl}")
    v = F.col(value_col)
    barr = F.array(*[F.lit(float(b)) for b in bl])
    idx = F.size(F.filter(barr, lambda b: v >= b))
    hist = F.array(*[
        F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0)))
        .cast("long") for i in range(len(bl) + 1)])
    return (sample_stream
            .where(v.isNotNull())
            .withWatermark("ts", watermark)
            .groupBy("series_key", F.window("ts", tier))
            .agg(hist.alias("hist"), F.count(v).alias("cnt"))
            .select("series_key", F.col("window.start").alias("bucket_ts"),
                    "hist", "cnt"))


def streaming_tdigest(sample_stream: DataFrame,
                      tier: str = "1 hour",
                      watermark: str = "10 minutes",
                      delta: int = 100,
                      value_col: str = "value_double") -> DataFrame:
    """Watermarked streaming version of ``tdigest.rollup_tdigest``:
    one t-digest sketch row per closed (series, window), append-mode
    ready.

    Same two-stage shape as batch — a built-in streaming aggregate
    collects the bucket's sorted values (state bounded by the bucket,
    exactly what the batch hash aggregate holds), then the SAME
    ``digest_build_fn`` mapInPandas kernel sketches whole Arrow batches
    of closed windows. Because the kernel and the sorted input are
    identical, streamed sketches are bit-identical to the batch tier on
    the same bucket contents, and ``tdigest_cascade`` /
    ``tdigest_quantiles`` consume them unchanged (the streaming/batch
    tier handoff needs no reshaping)."""
    from json_time_series_extractor_spark.operators.tdigest import (
        TDIGEST_SCHEMA, digest_build_fn)

    v = F.col(value_col)
    grouped = (sample_stream
               .where(v.isNotNull() & ~F.isnan(v.cast("double")))
               .withWatermark("ts", watermark)
               .groupBy("series_key", F.window("ts", tier))
               .agg(F.sort_array(F.collect_list(v.cast("double")))
                    .alias("_vals"))
               .select("series_key",
                       F.col("window.start").alias("bucket_ts"), "_vals"))
    return grouped.mapInPandas(digest_build_fn(delta), TDIGEST_SCHEMA)


def streaming_hll(sample_stream: DataFrame,
                  tier: str = "1 hour",
                  watermark: str = "10 minutes",
                  key_col: str = "key",
                  register_bits: int = 9) -> DataFrame:
    """Watermarked streaming version of ``hll.hll_rollup``: live
    distinct-count registers per closed (series, window) — the "unique
    visitors per window" streaming staple — append-mode ready.

    One built-in streaming aggregate: register index and rank come from
    the SAME expressions as the batch tier (``hll.hll_reg_rank``), the
    state per group is one int (MAX rank), and late rows within the
    watermark merge by MAX exactly like the batch cascade. Streamed
    registers are therefore definitionally identical to batch registers
    over the same rows, and ``hll_cascade`` / ``hll_estimate`` consume
    them unchanged."""
    from json_time_series_extractor_spark.operators.hll import (
        hll_reg_rank)

    reg, rank = hll_reg_rank(F.col(key_col), register_bits)
    return (sample_stream
            .where(F.col(key_col).isNotNull())
            .withWatermark("ts", watermark)
            .groupBy("series_key", F.window("ts", tier),
                     reg.cast("int").alias("reg"))
            .agg(F.max(rank).alias("max_rank"))
            .select("series_key",
                    F.col("window.start").alias("bucket_ts"),
                    "reg", "max_rank"))


def streaming_cm(sample_stream: DataFrame,
                 tier: str = "1 hour",
                 watermark: str = "10 minutes",
                 key_col: str = "key",
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Watermarked streaming version of ``cmsketch.cm_rollup``: live
    Count-Min frequency registers per closed (series, window) — "how
    hot is key k this hour", answerable the moment the window closes —
    append-mode ready.

    The depth probe rows explode STATELESSLY before the watermarked
    aggregate (explode adds no state), then ONE built-in streaming
    COUNT per (series, window, cm_row, cm_bucket); late rows within the
    watermark merge additively exactly like the batch ``cm_cascade``
    SUM. Bucket indices come from the SAME ``_cm_bucket`` expressions
    as the batch tier, so streamed registers are definitionally
    identical to batch registers over the same rows, and
    ``cm_cascade`` / ``cm_estimate`` consume them unchanged
    (``cm_estimate``'s parameter stamp included)."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        _check_params, _cm_bucket, _stamp_params)

    _check_params(depth, width)
    key = F.col(key_col)
    rows = F.array(*[
        F.struct(F.lit(j).alias("r"),
                 _cm_bucket(key, j, width).alias("b"))
        for j in range(depth)])
    out = (sample_stream
           .where(key.isNotNull())
           .withWatermark("ts", watermark)
           .select("series_key", "ts", F.explode(rows).alias("_rb"))
           .groupBy("series_key", F.window("ts", tier),
                    F.col("_rb.r").alias("cm_row"),
                    F.col("_rb.b").alias("cm_bucket"))
           .agg(F.count(F.lit(1)).alias("cnt"))
           .select("series_key",
                   F.col("window.start").alias("bucket_ts"),
                   "cm_row", "cm_bucket", "cnt"))
    return out.withColumn(
        "cnt", _stamp_params(F.col("cnt"), depth, width))

def streaming_bloom(sample_stream: DataFrame,
                    tier: str = "1 hour",
                    watermark: str = "10 minutes",
                    key_col: str = "key",
                    k: int = 4, m: int = 1 << 16) -> DataFrame:
    """Watermarked streaming version of ``bloom.bloom_rollup``: live
    membership bit rows per closed (series, window) — "was key X seen
    this hour", probe-able the moment the window closes; completes the
    streaming sketch family (rollup/histogram/t-digest/HLL/CM/Bloom).

    The k bit positions explode STATELESSLY before the watermarked
    aggregate, then ONE built-in streaming aggregate per (series,
    window, bit) — the group's entire state is its existence, so late
    rows within the watermark merge by set-union exactly like the
    batch ``bloom_cascade``. Bit positions come from the SAME
    ``_bloom_bit`` expressions as the batch tier, so streamed bit rows
    are definitionally identical to batch bit rows over the same rows,
    and ``bloom_cascade`` / ``bloom_probe`` / ``bloom_prefilter``
    consume them unchanged (``bloom_probe``'s parameter stamp
    included).
    """
    from json_time_series_extractor_spark.operators.bloom import (
        _bloom_bit, _check_params, _stamp_params)

    _check_params(k, m)
    key = F.col(key_col)
    bits = F.array(*[_bloom_bit(key, j, m) for j in range(k)])
    out = (sample_stream
           .where(key.isNotNull())
           .withWatermark("ts", watermark)
           .select("series_key", "ts", F.explode(bits).alias("bit"))
           .groupBy("series_key", F.window("ts", tier), "bit")
           .agg(F.count(F.lit(1)).alias("_n"))
           .select("series_key",
                   F.col("window.start").alias("bucket_ts"), "bit"))
    return out.withColumn("bit", _stamp_params(F.col("bit"), k, m))


def streaming_lww(version_stream: DataFrame,
                  watermark: str = "10 minutes",
                  ts_col: str = "ts") -> DataFrame:
    """Watermarked streaming face of
    :func:`operators.ingest.dedup_ingest_lww` — out-of-order upsert
    reconciliation AS the data arrives.

    This is deliberately the SAME function applied to a watermarked
    stream: the LWW winner is a ``max(struct(ingest_ts, seq, value))``
    — associative, commutative and ORDER-INDEPENDENT — so Spark's
    built-in streaming aggregation merges late redeliveries/corrections
    within the watermark into exactly the batch winner, regardless of
    micro-batch boundaries; ``n_versions`` merges additively. The
    group key includes the raw event-time column itself (supported
    watermark form: state for a (series, ts) key is evicted once the
    watermark passes ts), so append mode emits each key's final winner
    exactly once.

    Corrections arriving AFTER the watermark are dropped by the
    engine — the documented streaming-vs-batch divergence every
    watermarked operator here shares (the batch refresh path is the
    reconciliation story for those).
    """
    from json_time_series_extractor_spark.operators.ingest import (
        dedup_ingest_lww,
    )

    return dedup_ingest_lww(
        version_stream.withWatermark(ts_col, watermark))
