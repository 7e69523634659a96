"""Time-weighted average per tier bucket (TimescaleDB ``time_weight``
LOCF semantics, re-expressed relationally).

A plain ``avg`` over irregular samples over-weights bursts. The
time-weighted average integrates the LOCF step curve: each sample's value
holds from its timestamp until the next sample, and a bucket's TWA is

    sum(value * overlap(hold_interval, bucket)) / sum(overlap)

over every hold interval that intersects the bucket. The series' last
sample holds nothing (the integral ends at the last observation, like
TimescaleDB's ``time_weight('LOCF', ...)`` without an explicit range).

Plan shape (all stock Catalyst, no Python):

1. ``lead(ts)`` per series -> hold interval [ts, next_ts);
2. ``sequence(bucket(ts), bucket(next_ts), tier)`` + ``explode`` fans the
   interval out over the buckets it crosses — the fan-out is bounded by
   interval length / tier, and long idle holds produce rows only for the
   buckets they actually cover (never a dense calendar);
3. per (series, bucket): sum(v * overlap) / sum(overlap).

Scale note: the ``lead`` window is per series — the same exposure (and
the same segment-partitioned fix, if ever needed) as gap-fill; unlike
gap-fill the downstream work is one hash aggregate, no further windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _epoch_floor,
    _interval_seconds,
)


def time_weighted_avg(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """(series_key, bucket_ts, twa, covered_seconds) per tier bucket."""
    tier_s = _interval_seconds(tier)
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("_ts"),
        v.alias("_v"))

    w = Window.partitionBy("series_key").orderBy("_ts", "_v")
    held = (s.withColumn("_next", F.lead("_ts").over(w))
            .where(F.col("_next").isNotNull()
                   & (F.col("_next") > F.col("_ts"))))

    def bstart(col):
        return _epoch_floor(col, tier_s)

    spans = held.select(
        "series_key", "_ts", "_next", "_v",
        F.explode(F.sequence(bstart(F.col("_ts")), bstart(F.col("_next")),
                             F.expr(f"interval {tier}")))
        .alias("bucket_ts"))

    b_lo = F.col("bucket_ts")
    b_hi = F.col("bucket_ts") + F.expr(f"interval {tier}")

    def micros(col):
        # unix_micros requires TIMESTAMP; parquet event times arrive as
        # TIMESTAMP_NTZ — cast is a reinterpretation under a UTC session.
        return F.unix_micros(col.cast("timestamp"))

    # Sub-second precision matters: overlap in fractional seconds via
    # microsecond-precision unix timestamps.
    overlap = (
        F.least(micros(F.col("_next")), micros(b_hi))
        - F.greatest(micros(F.col("_ts")), micros(b_lo))
    ) / F.lit(1_000_000.0)

    return (spans
            .select("series_key", "bucket_ts", "_v",
                    overlap.alias("_w"))
            .where(F.col("_w") > 0)
            .groupBy("series_key", "bucket_ts")
            .agg((F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"))
                 .alias("twa"),
                 F.sum("_w").alias("covered_seconds")))
