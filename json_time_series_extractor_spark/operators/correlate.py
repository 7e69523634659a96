"""Rolling cross-series correlation: Pearson r (and population
covariance) between pairs of series over a trailing bucket window.

The ops-analytics primitive behind "does error rate track latency?"
dashboards (PromQL has no corr(); TimescaleDB ships ``corr`` as a
hyperfunction over time buckets). Semantics here: each series is
reduced to its deterministic per-bucket LAST value (lexicographic
(ts, value) max — the same tie rule as the rollup tiers), pairs are
aligned on buckets where BOTH series have a value (inner alignment),
and r is computed over the trailing ``window_buckets`` aligned buckets
ending at each bucket.

Determinism design (same doctrine as :mod:`operators.trend`): float
accumulation order differs across engines/partitionings, so the five
sufficient statistics are accumulated EXACTLY — values quantized to
1e-6 fixed point (int64), then n, Σx, Σy, Σxy, Σx², Σy² summed as
decimal(38,0) over the window frame. The closed forms then run a fixed
handful of IEEE double ops:

    num = nΣxy − ΣxΣy          dx = nΣx² − (Σx)²     dy = nΣy² − (Σy)²
    r   = num / sqrt(dx · dy)   cov_pop = num / n²

with dx·dy multiplied in DOUBLE (the exact product can exceed 38
decimal digits). Degenerate windows (n < 2, or a constant series →
dx·dy = 0) emit NULL with ``defined = false``.

Scale shape: one hash aggregate per series reduction (the rollup
shuffle), two broadcast-assisted equi-joins against the tiny pair
list, then ONE window partitioned by (key_a, key_b) whose partition
size is bounded by buckets-per-pair (8.8k/year at 1h) — the same
bounded-window profile as the sliding-sketch operators. No Python.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket

_DEC = "decimal(38,0)"


def rolling_correlation(
    samples: DataFrame,
    pairs: Sequence[Tuple[str, str]],
    tier: str = "1 hour",
    window_buckets: int = 24,
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Trailing-window Pearson correlation for each series pair.

    Output: (key_a, key_b, bucket_ts, n, corr, cov_pop, defined) —
    ``n`` aligned buckets in the trailing window, ``corr``/``cov_pop``
    NULL when ``defined`` is false. ``corr`` is computed on the
    1e-6-quantized per-bucket last values; quantization cancels in r
    up to the two final float ops, so the result is bit-reproducible.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    spark = samples.sparkSession
    v = F.col(value_col)
    buckets = (samples
               .where(v.isNotNull())
               .groupBy(F.col(key_col).alias("series_key"),
                        _bucket(ts_col, tier).alias("bucket_ts"))
               .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                                   v.alias("v"))).alias("_l"))
               .select("series_key", "bucket_ts",
                       F.floor(F.col("_l.v") * 1e6 + F.lit(0.5))
                       .cast("long").alias("_fp6")))
    pair_df = spark.createDataFrame(list(pairs), "key_a string, key_b string")
    a = (buckets.join(F.broadcast(pair_df),
                      buckets["series_key"] == pair_df["key_a"])
         .select("key_a", "key_b", "bucket_ts",
                 F.col("_fp6").alias("_x")))
    b = buckets.select(F.col("series_key").alias("key_b"), "bucket_ts",
                       F.col("_fp6").alias("_y"))
    aligned = a.join(b, ["key_b", "bucket_ts"])
    w = (Window.partitionBy("key_a", "key_b").orderBy("bucket_ts")
         .rowsBetween(-(window_buckets - 1), 0))
    xd, yd = F.col("_x").cast(_DEC), F.col("_y").cast(_DEC)
    stats = aligned.select(
        "key_a", "key_b", "bucket_ts",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(xd).over(w).alias("_sx"),
        F.sum(yd).over(w).alias("_sy"),
        F.sum(xd * yd).over(w).alias("_sxy"),
        F.sum(xd * xd).over(w).alias("_sxx"),
        F.sum(yd * yd).over(w).alias("_syy"))
    n = F.col("n").cast(_DEC)
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    defined = (F.col("n") >= 2) & (dx > 0) & (dy > 0)
    corr = (num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")))
    # cov in value units: the two 1e6 quantization factors divide out
    cov = (num.cast("double") / (n * n).cast("double")) / F.lit(1e12)
    return stats.select(
        "key_a", "key_b", "bucket_ts", "n",
        F.when(defined, corr).alias("corr"),
        F.when(defined, cov).alias("cov_pop"),
        defined.alias("defined"))


def rolling_correlation_oracle_sql(
    table: str = "events", *, unit: str = "hour",
    window_buckets: int = 24, series_expr: str = "event_type",
    ts_col: str = "ts", value_col: str = "value",
    pairs_sql: str = "VALUES ('click', 'view'), ('click', 'error')",
    sentinel: float = -9.0e9,
) -> str:
    """DuckDB recomputation of :func:`rolling_correlation` (+ the query
    wrapper's quant6/sentinel coalescing): HUGEINT window sums mirror
    the decimal(38,0) exact path, identical ROWS frame, identical IEEE
    tail. Kept beside the implementation so they evolve together."""
    k = window_buckets - 1
    return f"""
WITH b AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           CAST(floor(first({value_col} ORDER BY {ts_col} DESC,
                            {value_col} DESC) * 1e6 + 0.5)
                AS BIGINT) AS fp6
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
p AS (SELECT * FROM ({pairs_sql}) AS t(key_a, key_b)),
al AS (
    SELECT p.key_a, p.key_b, x.bucket_ts,
           CAST(x.fp6 AS HUGEINT) AS x, CAST(y.fp6 AS HUGEINT) AS y
    FROM p
    JOIN b x ON x.series_key = p.key_a
    JOIN b y ON y.series_key = p.key_b AND y.bucket_ts = x.bucket_ts),
s AS (
    SELECT key_a, key_b, bucket_ts,
           count(*) OVER w AS n,
           sum(x) OVER w AS sx, sum(y) OVER w AS sy,
           sum(x * y) OVER w AS sxy,
           sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
    FROM al
    WINDOW w AS (PARTITION BY key_a, key_b ORDER BY bucket_ts
                 ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)),
f AS (
    SELECT key_a, key_b, bucket_ts, n,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS dx,
           n * syy - sy * sy AS dy
    FROM s),
t AS (
    SELECT key_a, key_b, bucket_ts, n,
           n >= 2 AND dx > 0 AND dy > 0 AS defined,
           CAST(num AS DOUBLE)
               / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) AS corr,
           CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) / 1e12 AS cov_pop
    FROM f)
SELECT key_a, key_b, bucket_ts, CAST(n AS BIGINT) AS n, defined,
       CAST(floor(COALESCE(CASE WHEN defined THEN corr END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS corr,
       CAST(floor(COALESCE(CASE WHEN defined THEN cov_pop END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS cov_pop
FROM t
"""
