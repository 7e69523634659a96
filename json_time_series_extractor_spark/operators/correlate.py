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


def series_acf(
    samples: DataFrame,
    tier: str = "1 hour",
    max_lag: int = 6,
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Per-series sample autocorrelation r_k at bucket lags 1..max_lag.

    The seasonality probe behind "does this metric repeat daily?":
    each series is reduced to its deterministic per-bucket LAST value
    (the rolling_correlation reduction), and for every lag k the
    co-present GRID pairs (x at bucket t, x at bucket t + k·tier) feed
    the standard sample ACF with the series-global mean,

        r_k = Σ (x_t − x̄)(x_{t+k} − x̄)  /  Σ (x_t − x̄)²

    Gaps pair with nothing (grid alignment, not present-row offset —
    an absent hour must not let midnight correlate with 2am at lag 1).

    Determinism design (the trend.py doctrine): x is 1e-6 fixed point;
    per-series Σx, Σx² and per-(series, lag) m, Σx_a·x_b, Σx_a, Σx_b
    accumulate as decimal(38,0); multiplying num and den through by n²
    keeps everything integer until ONE double division:

        n²·num_k = n²Σab − n·Σx·(Σa + Σb) + m_k·(Σx)²
        n²·den   = n²Σx² − n·(Σx)²

    bit-reproducible across engines/partitionings. Bound: |value| ≲
    1e5 with ≲1e4 buckets/series keeps every term under 38 digits
    (ANSI mode fails loudly beyond). Undefined rows (m_k = 0 pairs, or
    a constant series → den = 0) emit NULL with ``defined = false``.

    Scale shape: one rollup-profile hash aggregate (bucket reduction),
    one tiny per-series aggregate, one equi-join of the tier against
    itself shifted by k (fan-out = max_lag, join key (series, bucket)
    — skew bounded by buckets-per-series), one final hash aggregate on
    (series, lag). No windows over raw rows, no Python.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    from json_time_series_extractor_spark.operators.gapfill import (
        _interval_seconds,
    )

    secs = _interval_seconds(tier)
    v = F.col(value_col)
    b = (samples
         .where(v.isNotNull())
         .groupBy(F.col(key_col).alias("series_key"),
                  _bucket(ts_col, tier).alias("bucket_ts"))
         .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                             v.alias("v"))).alias("_l"))
         .select("series_key", "bucket_ts",
                 F.floor(F.col("_l.v") * 1e6 + F.lit(0.5))
                 .cast("long").alias("_x")))
    xd = F.col("_x").cast(_DEC)
    stats = (b.groupBy("series_key")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(xd).alias("_sx"),
                  F.sum(xd * xd).alias("_sxx")))
    lags = F.explode(F.array(*[F.lit(k) for k in
                               range(1, max_lag + 1)])).alias("lag")
    a = (b.select("series_key", "bucket_ts", F.col("_x").alias("_xa"))
         .select("*", lags)
         .withColumn("_tgt", F.expr(f"bucket_ts + make_interval("
                                    f"0, 0, 0, 0, 0, 0, lag * {secs})")))
    bb = b.select("series_key", F.col("bucket_ts").alias("_tgt"),
                  F.col("_x").alias("_xb"))
    ad, bd_ = F.col("_xa").cast(_DEC), F.col("_xb").cast(_DEC)
    pairs = (a.join(bb, ["series_key", "_tgt"])
             .groupBy("series_key", "lag")
             .agg(F.count(F.lit(1)).alias("m"),
                  F.sum(ad * bd_).alias("_sab"),
                  F.sum(ad).alias("_sa"),
                  F.sum(bd_).alias("_sb")))
    # LEFT from the lag skeleton so short series still emit undefined
    # rows for every requested lag (grid completeness).
    skel = stats.select("*", lags)
    j = skel.join(pairs, ["series_key", "lag"], "left")
    n = F.col("n").cast(_DEC)
    m = F.coalesce(F.col("m"), F.lit(0)).cast(_DEC)
    sab = F.coalesce(F.col("_sab"), F.lit(0)).cast(_DEC)
    sa = F.coalesce(F.col("_sa"), F.lit(0)).cast(_DEC)
    sb = F.coalesce(F.col("_sb"), F.lit(0)).cast(_DEC)
    num = n * n * sab - n * F.col("_sx") * (sa + sb) \
        + m * F.col("_sx") * F.col("_sx")
    den = n * n * F.col("_sxx") - n * F.col("_sx") * F.col("_sx")
    defined = (m > 0) & (den > 0)
    acf = num.cast("double") / den.cast("double")
    return j.select(
        "series_key", "lag",
        F.col("n").cast("long").alias("n"),
        F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("m_pairs"),
        F.when(defined, acf).alias("acf"),
        defined.alias("defined"))


def series_acf_oracle_sql(
    table: str = "events", *, unit: str = "hour", max_lag: int = 6,
    series_expr: str = "event_type", ts_col: str = "ts",
    value_col: str = "value", sentinel: float = -9.0e9,
) -> str:
    """DuckDB recomputation of :func:`series_acf` (+ the query
    wrapper's quant6/sentinel): HUGEINT arithmetic mirrors the decimal
    exact path — identical bucket reduction, grid-shift pairing, and
    IEEE tail."""
    secs = {"minute": 60, "hour": 3600, "day": 86400}[unit]
    return f"""
WITH b AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           CAST(CAST(floor(first({value_col} ORDER BY {ts_col} DESC,
                           {value_col} DESC) * 1e6 + 0.5)
                AS BIGINT) AS HUGEINT) AS x
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
st AS (
    SELECT series_key, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
    FROM b GROUP BY 1),
lg AS (SELECT unnest(generate_series(1, {max_lag})) AS lag),
pr AS (
    SELECT a.series_key, l.lag, count(*) AS m,
           sum(a.x * c.x) AS sab, sum(a.x) AS sa, sum(c.x) AS sb
    FROM b a
    CROSS JOIN lg l
    JOIN b c ON c.series_key = a.series_key
            AND c.bucket_ts = a.bucket_ts
                             + INTERVAL 1 SECOND * (l.lag * {secs})
    GROUP BY 1, 2),
j AS (
    SELECT st.series_key, lg.lag, st.n,
           COALESCE(pr.m, 0) AS m,
           COALESCE(pr.sab, 0) AS sab,
           COALESCE(pr.sa, 0) AS sa, COALESCE(pr.sb, 0) AS sb,
           st.sx, st.sxx
    FROM st CROSS JOIN lg
    LEFT JOIN pr ON pr.series_key = st.series_key AND pr.lag = lg.lag),
f AS (
    SELECT series_key, lag, n, m,
           n * n * sab - n * sx * (sa + sb) + m * sx * sx AS num,
           n * n * sxx - n * sx * sx AS den
    FROM j)
SELECT series_key, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
       CAST(m AS BIGINT) AS m_pairs,
       m > 0 AND den > 0 AS defined,
       CAST(floor(COALESCE(
                CASE WHEN m > 0 AND den > 0
                     THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END,
                CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS acf
FROM f
"""
