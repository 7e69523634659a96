"""Rolling z-score anomaly detection over a rollup tier.

For every (series, bucket) row, compare an integer bucket metric (by
default the sample ``count`` — traffic volume) against the trailing
``k_buckets`` PRESENT buckets of that series: z = (v − μ) / σ over the
self-excluded window, flagging |z| > threshold. The self-exclusion
matters: a spike inside its own baseline dilutes μ and σ and hides
itself.

Determinism design (same playbook as ``operators/trend.py``): the
window accumulates n, Σv, Σv² exactly (decimal(38,0) — order
independent), and the float path is fixed-shape:

    var = (nΣv² − (Σv)²) / n²      — exact integer numerator/denominator,
                                      ONE double division
    z   = (n·v − Σv) / (n · √var)  — exact integer numerator, one
                                      multiply, one sqrt, one division

√ is correctly rounded IEEE, so z is bit-reproducible across engines,
partitionings, and retries. Degenerate windows (fewer than
``min_buckets`` trailing rows, or zero variance) emit NULL z with
``scored = false``.

Scale shape: one bounded row-frame window per series over TIER rows
(one row per present bucket — summary-sized partitions, the same
profile as ``rolling_over_time``); no Python, no extra shuffle beyond
the window's hash partitioning on series_key. Gap-fill first if absent
buckets should count as zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(38,0)"


def detect_anomalies(rollup_df: DataFrame, k_buckets: int = 24, *,
                     value_col: str = "count",
                     threshold: float = 3.0,
                     min_buckets: int = 6) -> DataFrame:
    """Score each tier row against its trailing window.

    ``value_col`` must be integral (counts; quantize floats to fixed
    point first — exactness of the window sums is what makes the score
    engine-deterministic). Output: input columns + ``n_window``,
    ``z`` (NULL when unscored), ``scored``, ``is_anomaly`` (false when
    unscored — an unscorable row is not evidence of an anomaly).
    """
    if k_buckets < 2:
        raise ValueError(f"k_buckets must be >= 2, got {k_buckets}")
    if min_buckets < 2:
        raise ValueError(f"min_buckets must be >= 2, got {min_buckets}")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(-k_buckets, -1))
    v = F.col(value_col).cast(_DEC)
    n = F.count(F.col(value_col)).over(w)
    sv = F.sum(v).over(w)
    svv = F.sum(v * v).over(w)
    out = (rollup_df
           .withColumn("_n", n)
           .withColumn("_sv", sv)
           .withColumn("_svv", svv))
    nd = F.col("_n").cast(_DEC)
    var_num = nd * F.col("_svv") - F.col("_sv") * F.col("_sv")
    scored = (F.col("_n") >= min_buckets) & (var_num > 0)
    std = F.sqrt(var_num.cast("double")
                 / (nd * nd).cast("double"))
    z_num = nd * F.col(value_col).cast(_DEC) - F.col("_sv")
    z = z_num.cast("double") / (F.col("_n").cast("double") * std)
    return (out
            .withColumn("n_window", F.col("_n"))
            .withColumn("z", F.when(scored, z))
            .withColumn("scored", scored)
            .withColumn("is_anomaly",
                        F.when(scored, F.abs(F.col("z"))
                               > F.lit(float(threshold)))
                        .otherwise(F.lit(False)))
            .drop("_n", "_sv", "_svv"))


def detect_anomalies_mad(rollup_df: DataFrame, k_buckets: int = 24, *,
                         value_col: str = "count", k: int = 3,
                         min_buckets: int = 6) -> DataFrame:
    """Robust (median/MAD) twin of :func:`detect_anomalies`: flag rows
    whose deviation from the trailing-window MEDIAN exceeds ``k`` times
    the window's median absolute deviation. Unlike the z-score, one
    prior outlier in the baseline barely moves this detector (the
    median has a 50% breakdown point vs the mean's 0%) — the standard
    robust alternative (Leys et al. 2013).

    Exactness for free: on an integral ``value_col`` every quantity —
    lower median (sorted element ⌈n/2⌉), MAD, deviation, the k·MAD
    comparison — is pure integer arithmetic; there is no float anywhere
    to drift. A zero MAD (≥half the window identical) flags ANY nonzero
    deviation, the textbook degenerate-MAD behavior.

    Scale shape: same self-excluded bounded row frame as the z-score
    detector; the window materializes ≤ ``k_buckets`` int64s per row
    (``collect_list`` over the frame) — O(W) state, summary-sized
    partitions, no Python.

    Output: input columns + ``n_window``, ``med``, ``mad``, ``dev``
    (−1 when unscored), ``scored``, ``is_outlier``.
    """
    if k_buckets < 2:
        raise ValueError(f"k_buckets must be >= 2, got {k_buckets}")
    if min_buckets < 2:
        raise ValueError(f"min_buckets must be >= 2, got {min_buckets}")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(-k_buckets, -1))
    v = F.col(value_col).cast("long")
    out = rollup_df.withColumn("_a", F.collect_list(v).over(w))
    n = F.size("_a")
    mid = F.expr("CAST((size(_a) + 1) DIV 2 AS INT)")
    med = F.element_at(F.sort_array("_a"), mid)
    mad = F.element_at(
        F.sort_array(F.transform(
            F.col("_a"), lambda e: F.abs(e - F.col("_med")))), mid)
    out = (out
           .withColumn("_n", n)
           .withColumn("_med", F.when(n > 0, med))
           .withColumn("_mad", F.when(n > 0, mad)))
    scored = F.col("_n") >= min_buckets
    dev = F.abs(v - F.col("_med"))
    sent = F.lit(-1).cast("long")
    return (out
            .withColumn("n_window", F.col("_n").cast("long"))
            .withColumn("med", F.when(scored, F.col("_med"))
                        .otherwise(sent))
            .withColumn("mad", F.when(scored, F.col("_mad"))
                        .otherwise(sent))
            .withColumn("dev", F.when(scored, dev).otherwise(sent))
            .withColumn("scored", scored)
            .withColumn("is_outlier",
                        F.when(scored, dev > F.lit(int(k)) * F.col("_mad"))
                        .otherwise(F.lit(False)))
            .drop("_a", "_n", "_med", "_mad"))


def anomaly_mad_oracle_sql(table: str, *, unit: str = "hour",
                           series_expr: str = "event_type",
                           ts_col: str = "ts", value_col: str = "value",
                           k_buckets: int = 24, k: int = 3,
                           min_buckets: int = 6) -> str:
    """DuckDB replay of :func:`detect_anomalies_mad` over a from-raw
    count tier: identical frame, identical lower-median/MAD integer
    arithmetic (1-based sorted-list indexing both sides)."""
    return f"""
WITH c AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           count({value_col}) AS v
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
w AS (
    SELECT series_key, bucket_ts, v,
           list(v) OVER (PARTITION BY series_key ORDER BY bucket_ts
                         ROWS BETWEEN {k_buckets} PRECEDING
                         AND 1 PRECEDING) AS a
    FROM c),
m AS (
    -- an empty frame yields NULL (not []) from list() in DuckDB
    SELECT series_key, bucket_ts, v, coalesce(len(a), 0) AS n,
           list_sort(a)[(coalesce(len(a), 0) + 1) // 2] AS med, a
    FROM w),
d AS (
    SELECT series_key, bucket_ts, v, n, med,
           list_sort(list_transform(a, e -> abs(e - med)))
               [(n + 1) // 2] AS mad
    FROM m)
SELECT series_key, bucket_ts, CAST(v AS BIGINT) AS v,
       CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= {min_buckets} THEN CAST(med AS BIGINT)
            ELSE -1 END AS med,
       CASE WHEN n >= {min_buckets} THEN CAST(mad AS BIGINT)
            ELSE -1 END AS mad,
       CASE WHEN n >= {min_buckets} THEN CAST(abs(v - med) AS BIGINT)
            ELSE -1 END AS dev,
       n >= {min_buckets} AS scored,
       COALESCE(CASE WHEN n >= {min_buckets}
                THEN abs(v - med) > {k} * mad END, false) AS is_outlier
FROM d
"""


def anomaly_oracle_sql(table: str, *, unit: str = "hour",
                       series_expr: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       k_buckets: int = 24, threshold: float = 3.0,
                       min_buckets: int = 6,
                       sentinel: float = -9.0e9) -> str:
    """DuckDB replay of count-metric anomaly scoring over a from-raw
    tier (+ the query wrapper's quant6/sentinel): HUGEINT window sums
    mirror the decimal exact path, then the identical float shape."""
    return f"""
WITH c AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           count({value_col}) AS v
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
w AS (
    SELECT series_key, bucket_ts, v,
           count(v) OVER win AS n,
           sum(CAST(v AS HUGEINT)) OVER win AS sv,
           sum(CAST(v AS HUGEINT) * v) OVER win AS svv
    FROM c
    WINDOW win AS (PARTITION BY series_key ORDER BY bucket_ts
                   ROWS BETWEEN {k_buckets} PRECEDING
                   AND 1 PRECEDING)),
s AS (
    SELECT series_key, bucket_ts, v, n,
           n >= {min_buckets} AND n * svv - sv * sv > 0 AS scored,
           CAST(n * v - sv AS DOUBLE)
           / (CAST(n AS DOUBLE)
              * sqrt(CAST(n * svv - sv * sv AS DOUBLE)
                     / CAST(n * n AS DOUBLE))) AS z
    FROM w)
SELECT series_key, bucket_ts, CAST(v AS BIGINT) AS v,
       CAST(n AS BIGINT) AS n_window, scored,
       CAST(floor(COALESCE(CASE WHEN scored THEN z END,
                           CAST({sentinel!r} AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS z,
       COALESCE(CASE WHEN scored
                THEN abs(z) > CAST({threshold!r} AS DOUBLE) END,
                false) AS is_anomaly
FROM s
"""
