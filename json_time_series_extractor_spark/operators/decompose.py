"""Classical additive seasonal decomposition over a rollup tier.

x_t = trend + seasonal + residual — the statsmodels
``seasonal_decompose(model='additive')`` construction, re-expressed as
exact window/aggregate algebra:

- **trend**: the standard 2×p centered moving average for even period
  p (half-weight endpoints). Multiplying through by 2p keeps it
  integral:  2p·T_t = 2·Σx − x_{t−p/2} − x_{t+p/2} over the RANGE
  frame [t − p/2·tier, t + p/2·tier]; defined only when all p+1 grid
  buckets are present (a gap anywhere in the frame disables the
  estimate rather than silently averaging fewer points — RANGE frames
  on the epoch axis make absence detectable as count < p+1).
- **seasonal**: the per-phase mean of the detrended series, phase =
  (epoch DIV tier) mod p. Detrended values stay integral at 2p-scale
  (D_t = 2p·x_t − 2p·T_t), so the phase means are exact rational pairs
  (Σ D, count). Deviation from statsmodels, documented: the seasonal
  indices are NOT re-centered to sum to zero — centering divides by
  p unequal phase counts and re-introduces cross-engine float order;
  the detrended phase means already sum to ~0 by construction.
- **residual**: x − trend − seasonal.

Determinism design (trend.py doctrine): x is 1e-6 fixed point; every
aggregate is integer; the float tail is fixed-shape —

    trend    = tt / (2p·1e6)                      (one division)
    seasonal = num / ((2p·1e6) · cnt)             (one multiply, one div)
    residual = x/1e6 − trend − seasonal           (one div, two subs)

identical literals and op order on the DuckDB side, hence
bit-reproducible.

Scale shape: one rollup-profile hash aggregate (bucket reduction), one
window per series (tier-sized partitions, RANGE frame of p+1 rows),
one summary-sized phase aggregate, one broadcast-sized join back. No
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _interval_seconds,
)
from json_time_series_extractor_spark.operators.rollup import _bucket


def seasonal_decompose(
    samples: DataFrame,
    tier: str = "1 hour",
    period: int = 24,
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Additive decomposition of each series' per-bucket LAST values.

    Output: (series_key, bucket_ts, x_fp6, phase, trend, seasonal,
    residual, defined). ``defined`` marks rows with a full centered
    window; undefined rows carry NULL trend/residual (their seasonal
    is still reported when the phase has any defined rows elsewhere).
    """
    if period < 2 or period % 2 != 0:
        raise ValueError(f"period must be even and >= 2, got {period}")
    secs = _interval_seconds(tier)
    half = period // 2
    v = F.col(value_col)
    b = (samples
         .where(v.isNotNull())
         .groupBy(F.col(key_col).alias("series_key"),
                  _bucket(ts_col, tier).alias("bucket_ts"))
         .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                             v.alias("v"))).alias("_l"))
         .select("series_key", "bucket_ts",
                 F.floor(F.col("_l.v") * 1e6 + F.lit(0.5))
                 .cast("long").alias("_x"))
         .withColumn("_ep", F.unix_timestamp("bucket_ts"))
         .withColumn("phase",
                     F.expr(f"(_ep DIV {secs}) % {int(period)}")
                     .cast("int")))
    w = (Window.partitionBy("series_key").orderBy("_ep")
         .rangeBetween(-half * secs, half * secs))
    ww = (b
          .withColumn("_cnt", F.count(F.lit(1)).over(w))
          .withColumn("_s", F.sum("_x").over(w))
          .withColumn("_xf", F.min(F.struct("_ep", "_x")).over(w)["_x"])
          .withColumn("_xl", F.max(F.struct("_ep", "_x")).over(w)["_x"])
          .withColumn("defined", F.col("_cnt") == period + 1)
          .withColumn("_tt", F.when(
              F.col("defined"),
              2 * F.col("_s") - F.col("_xf") - F.col("_xl"))))
    d = ww.withColumn(
        "_d", F.when(F.col("defined"),
                     F.lit(2 * period) * F.col("_x") - F.col("_tt")))
    ph = (d.groupBy("series_key", "phase")
          .agg(F.sum("_d").alias("_num"),
               F.count("_d").alias("_pcnt")))
    scale = float(2 * period) * 1e6
    j = d.join(ph, ["series_key", "phase"])
    trend = F.col("_tt").cast("double") / F.lit(scale)
    seasonal = F.when(
        F.col("_pcnt") > 0,
        F.col("_num").cast("double")
        / (F.lit(scale) * F.col("_pcnt").cast("double")))
    residual = (F.col("_x").cast("double") / F.lit(1e6)
                - trend - seasonal)
    return j.select(
        "series_key", "bucket_ts", F.col("_x").alias("x_fp6"), "phase",
        F.when(F.col("defined"), trend).alias("trend"),
        seasonal.alias("seasonal"),
        F.when(F.col("defined"), residual).alias("residual"),
        "defined")


def seasonal_decompose_oracle_sql(
    table: str = "events", *, unit: str = "hour", period: int = 24,
    series_expr: str = "event_type", ts_col: str = "ts",
    value_col: str = "value", sentinel: float = -9.0e9) -> str:
    """DuckDB replay of :func:`seasonal_decompose` (+ the query
    wrapper's quant6/sentinel): identical RANGE frame, arg_min/arg_max
    endpoints, integer 2p-scale algebra and IEEE tail."""
    secs = {"minute": 60, "hour": 3600, "day": 86400}[unit]
    half, p2 = period // 2, 2 * period
    scale = float(p2) * 1e6
    return f"""
WITH b AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           CAST(floor(first({value_col} ORDER BY {ts_col} DESC,
                            {value_col} DESC) * 1e6 + 0.5)
                AS BIGINT) AS x
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
e AS (
    SELECT *, CAST(epoch(bucket_ts) AS BIGINT) AS ep,
           CAST((CAST(epoch(bucket_ts) AS BIGINT) // {secs})
                % {period} AS INT) AS phase
    FROM b),
w AS (
    SELECT series_key, bucket_ts, x, ep, phase,
           count(*) OVER win AS cnt,
           CAST(sum(x) OVER win AS BIGINT) AS s,
           arg_min(x, ep) OVER win AS xf,
           arg_max(x, ep) OVER win AS xl
    FROM e
    WINDOW win AS (PARTITION BY series_key ORDER BY ep
                   RANGE BETWEEN {half * secs} PRECEDING
                   AND {half * secs} FOLLOWING)),
t AS (
    SELECT series_key, bucket_ts, x, phase,
           cnt = {period + 1} AS defined,
           CASE WHEN cnt = {period + 1}
                THEN 2 * s - xf - xl END AS tt
    FROM w),
d AS (
    SELECT *, CASE WHEN defined THEN {p2} * x - tt END AS dd FROM t),
ph AS (
    SELECT series_key, phase,
           CAST(sum(dd) AS BIGINT) AS num,
           CAST(count(dd) AS BIGINT) AS pcnt
    FROM d GROUP BY 1, 2),
f AS (
    SELECT d.series_key, d.bucket_ts, d.x, d.phase, d.defined,
           CAST(d.tt AS DOUBLE) / {scale!r} AS trend,
           CASE WHEN ph.pcnt > 0 THEN
               CAST(ph.num AS DOUBLE)
               / ({scale!r} * CAST(ph.pcnt AS DOUBLE)) END AS seasonal
    FROM d JOIN ph USING (series_key, phase))
SELECT series_key, bucket_ts, x AS x_fp6, phase, defined,
       CAST(floor(COALESCE(CASE WHEN defined THEN trend END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS trend,
       CAST(floor(COALESCE(seasonal, CAST({sentinel!r} AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT) AS seasonal,
       CAST(floor(COALESCE(
           CASE WHEN defined THEN
               CAST(x AS DOUBLE) / 1e6 - trend - seasonal END,
           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS residual
FROM f
"""
