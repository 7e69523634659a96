"""Per-bucket linear trend: PromQL ``deriv()`` / ``predict_linear()``
as a tier aggregate.

For every (series, tumbling bucket), a simple least-squares line fit of
value against time, yielding the per-second slope (``deriv``), the
intercept at the bucket start, and the extrapolated value at the bucket
end (``predict_linear`` with the horizon = the tier width) — the
primitives behind "disk full in 4h"-style alert rules.

Determinism design (the reason this is not a naive ``covar_pop/var_pop``
one-liner): float accumulation order differs between engines and between
partial-aggregate merge orders, so all five sufficient statistics are
accumulated EXACTLY —

- x = whole seconds since the bucket start (integer, bounded by the
  tier width, so x² never overflows),
- y = value quantized to 1e-6 fixed point (integer),
- n, Σx, Σy, Σxy, Σx² summed as decimal(38,0) (Spark) — exact integers,
  order-independent, and map-side combinable like any sum.

The closed forms then perform exactly TWO float operations each
(one integer→double conversion pair + one division):

    slope_fp6  = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)        [fp6-units / s]
    icpt_fp6   = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)      [fp6-units]

making the result bit-reproducible across engines, partitionings, and
retries. Degenerate fits (n < 2, or every sample in the same second)
have a zero denominator and emit NULL with ``fit_ok = false``.

Scale shape: one hash aggregate on (series_key, bucket) — the same
first-shuffle profile as :func:`operators.rollup.rollup`; partials
combine map-side; no windows, no Python. The per-bucket statistics are
sum-mergeable, so re-aggregation (e.g. union of incremental partitions)
is exact; merging to a COARSER tier is not offered because x is
bucket-relative.

Bounds: |value| must stay below ~1e8 for the Σxy terms to fit the
decimal path at the 1-day tier without precision clamping — comfortably
true for metric streams; validated nowhere because decimal overflow in
Spark ANSI mode fails loudly rather than silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _interval_seconds,
)
from json_time_series_extractor_spark.operators.rollup import _bucket

_DEC = "decimal(38,0)"


def rollup_linear_trend(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Least-squares line per (series, tier bucket).

    Output: (series_key, bucket_ts, n, slope_per_s, intercept,
    predict_end, fit_ok) — slope in value-units/second, intercept at
    the bucket start, predict_end the fitted value extrapolated to the
    bucket's end (PromQL ``predict_linear(v[tier], tier)`` anchored at
    the bucket start). NULL trend columns when ``fit_ok`` is false.
    """
    v = F.col(value_col)
    b = _bucket(ts_col, tier)
    base = (samples
            .where(v.isNotNull())
            .select(F.col(key_col).alias("series_key"),
                    b.alias("bucket_ts"),
                    # .cast("timestamp"): parquet TIMESTAMP_NTZ is not
                    # accepted by unix_micros; the ts and bucket casts
                    # shift identically, so the difference is invariant.
                    (F.unix_micros(F.col(ts_col).cast("timestamp"))
                     - F.unix_micros(b.cast("timestamp"))).alias("_dus"),
                    F.floor(v * 1e6 + 0.5).cast("long").alias("_y")))
    base = base.withColumn("_x", F.expr("_dus div 1000000"))
    xd = F.col("_x").cast(_DEC)
    yd = F.col("_y").cast(_DEC)
    agg = (base.groupBy("series_key", "bucket_ts")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(xd).alias("_sx"),
                F.sum(yd).alias("_sy"),
                F.sum(xd * xd).alias("_sxx"),
                F.sum(xd * yd).alias("_sxy")))
    n = F.col("n").cast(_DEC)
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num_s = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    num_i = F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    fit_ok = den > 0
    # fp6 → value units: divide the (exact) ratio once by 1e6. Two float
    # ops total per output — identical IEEE sequence in any engine.
    slope = (num_s.cast("double") / den.cast("double")) / F.lit(1e6)
    icpt = (num_i.cast("double") / den.cast("double")) / F.lit(1e6)
    horizon = float(_interval_seconds(tier))
    pred = icpt + slope * F.lit(horizon)
    return agg.select(
        "series_key", "bucket_ts", "n",
        F.when(fit_ok, slope).alias("slope_per_s"),
        F.when(fit_ok, icpt).alias("intercept"),
        F.when(fit_ok, pred).alias("predict_end"),
        fit_ok.alias("fit_ok"))


def linear_trend_oracle_sql(table: str, *, unit: str = "hour",
                            series_expr: str = "event_type",
                            ts_col: str = "ts",
                            value_col: str = "value",
                            horizon_s: float = 3600.0,
                            sentinel: float = -9.0e9) -> str:
    """DuckDB recomputation of :func:`rollup_linear_trend` (+ the query
    wrapper's quant6/sentinel coalescing): HUGEINT sufficient statistics
    mirror the decimal(38,0) exact path, then the same two-float-op
    closed forms. Kept beside the implementation so a semantics change
    updates both together."""
    return f"""
WITH s AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           (epoch_us({ts_col}) - epoch_us(date_trunc('{unit}', {ts_col})))
               // 1000000 AS x,
           CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT) AS y
    FROM {table} WHERE {value_col} IS NOT NULL),
a AS (
    SELECT series_key, bucket_ts,
           count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(x AS HUGEINT) * y) AS sxy
    FROM s GROUP BY 1, 2),
f AS (
    SELECT series_key, bucket_ts, n,
           n * sxx - sx * sx AS den,
           n * sxy - sx * sy AS num_s,
           sy * sxx - sx * sxy AS num_i
    FROM a),
t AS (
    SELECT series_key, bucket_ts, n, den > 0 AS fit_ok,
           CAST(num_s AS DOUBLE) / CAST(den AS DOUBLE) / 1e6 AS slope,
           CAST(num_i AS DOUBLE) / CAST(den AS DOUBLE) / 1e6 AS icpt
    FROM f)
SELECT series_key, bucket_ts, n, fit_ok,
       CAST(floor(COALESCE(CASE WHEN fit_ok THEN slope END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS slope_per_s,
       CAST(floor(COALESCE(CASE WHEN fit_ok THEN icpt END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS intercept,
       CAST(floor(COALESCE(CASE WHEN fit_ok
                           THEN icpt + slope * CAST({horizon_s!r} AS DOUBLE)
                           END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS predict_end
FROM t
"""
