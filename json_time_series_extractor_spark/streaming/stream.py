"""Structured Streaming wrapper for the extract -> rollup pipeline.

The engine is batch-first (the north rule asks for batch + resumable
checkpoints); streaming is a thin shell that reuses the exact same
operators — ``extract_samples`` (mapInPandas works unchanged on streaming
DataFrames) and the same aggregate expressions as ``operators.rollup`` —
with a watermark for late data. Late rows beyond the watermark are dropped
by Spark; the watermark column is the sample timestamp.

``last`` uses ``max_by(value, ts)`` which is supported in streaming
aggregations; the tier cascade applies downstream of the sink in batch
(streaming-to-streaming cascades would need multiple queries sharing a
sink — out of scope for the shell).
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
