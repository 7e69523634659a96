"""Counter-rate operators: reset-aware increase / per-second rate.

PromQL-style counter semantics over the sample stream: a counter only
goes up; a drop means the process restarted and the counter restarted
from ~0, so the post-reset value itself is the increase since the reset.
Per sample (ordered by ts within a series):

    delta   = value - lag(value)
    contrib = 0        when delta is null (first sample: no baseline)
              delta    when delta >= 0
              value    when delta < 0  (reset)

``increase`` per (series, bucket) = sum of its samples' contributions;
``rate`` = increase / bucket seconds.

Scale note — same skew exposure as gap-fill: the lag window is per
series, so a hot series is one window partition. The default here is the
SEGMENT-PARTITIONED plan (the two-pass carry from gapfill's playbook):
within-day lag windows bounded to (series, day), plus each day's first
sample taking its baseline from the previous day's last value via a tiny
per-day summary table — result-identical to the whole-series window,
which remains available as ``segment=None`` for small series.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _epoch_floor,
    _interval_seconds,
)
from json_time_series_extractor_spark.operators.rollup import _bucket


def _contrib(delta, value):
    return (F.when(delta.isNull(), F.lit(0.0))
            .when(delta >= 0, delta)
            .otherwise(value))


def counter_increase(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """(series_key, bucket_ts, increase, n_samples) per tier bucket."""
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("_ts"),
        v.alias("_v"))

    if segment is None:
        w = Window.partitionBy("series_key").orderBy("_ts", "_v")
        delta = F.col("_v") - F.lag("_v").over(w)
        contrib = _contrib(delta, F.col("_v"))
        return (s.select("series_key",
                         _bucket("_ts", tier).alias("bucket_ts"),
                         contrib.alias("_c"))
                .groupBy("series_key", "bucket_ts")
                .agg(F.sum("_c").alias("increase"),
                     F.count(F.lit(1)).alias("n_samples")))

    seg_s = _interval_seconds(segment)
    s = s.select("series_key", "_ts", "_v",
                 _epoch_floor(F.col("_ts"), seg_s).alias("_seg"))

    # Within-segment lag: bounded (series, day) window partitions.
    in_seg = Window.partitionBy("series_key", "_seg").orderBy("_ts", "_v")
    delta = F.col("_v") - F.lag("_v").over(in_seg)

    # Cross-segment baseline: each segment's first sample takes its delta
    # from the PREVIOUS segment's last value — computed on the per-segment
    # summary (one row per series-day), so the only whole-series window
    # runs over days, not samples. max/min of (ts, v) structs pick the
    # segment's last/first sample with the same (ts, value) tie-break as
    # the lag ordering.
    summary = (s.groupBy("series_key", "_seg")
               .agg(F.max(F.struct(F.col("_ts").alias("t"),
                                   F.col("_v").alias("v")))["v"]
                    .alias("_seg_last")))
    carry_w = Window.partitionBy("series_key").orderBy("_seg")
    carry = summary.select(
        "series_key", "_seg",
        F.lag("_seg_last").over(carry_w).alias("_prev_last"))

    first_in_seg = F.row_number().over(in_seg) == 1
    joined = s.join(carry, ["series_key", "_seg"], "left")
    eff_delta = F.when(first_in_seg,
                       F.when(F.col("_prev_last").isNotNull(),
                              F.col("_v") - F.col("_prev_last"))) \
                 .otherwise(delta)
    contrib = _contrib(eff_delta, F.col("_v"))
    return (joined.select("series_key",
                          _bucket("_ts", tier).alias("bucket_ts"),
                          contrib.alias("_c"))
            .groupBy("series_key", "bucket_ts")
            .agg(F.sum("_c").alias("increase"),
                 F.count(F.lit(1)).alias("n_samples")))


def counter_rate(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """increase / bucket-seconds: (series_key, bucket_ts, increase, rate,
    n_samples)."""
    inc = counter_increase(samples, tier, key_col=key_col, ts_col=ts_col,
                           value_col=value_col, segment=segment)
    return inc.withColumn(
        "rate", F.col("increase") / F.lit(float(_interval_seconds(tier))))
