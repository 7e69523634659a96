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


def detect_changepoints_cusum(rollup_df: DataFrame, *,
                              value_col: str = "count",
                              kappa_div: int = 2,
                              h_mult: int = 5) -> DataFrame:
    """Two-sided CUSUM changepoint scan (Page 1954) over a rollup tier.

    For every (series, bucket) row, the classic alarm statistics

        S⁺_t = max(0, S⁺_{t−1} + (v_t − μ − κ))     (upward shift)
        S⁻_t = max(0, S⁻_{t−1} − (v_t − μ + κ))     (downward shift)

    with a ROBUST per-series baseline: μ = lower median of the series'
    bucket values and κ = MAD DIV ``kappa_div`` (slack), alarm when
    either side exceeds h = ``h_mult`` · MAD — the standard
    "half-sigma slack, five-sigma decision interval" tuning expressed
    in integer MAD units. This is the retrospective scan form (the
    whole tier is visible), which is exactly how a batch engine audits
    a stored metric history for level shifts.

    The recursion is NOT evaluated recursively: max(0, ·) chains are
    the drawup/drawdown of the slack-adjusted cumsum walk,

        S⁺_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} (v_i − μ − κ)
        S⁻_t = max(0, max_{j≤t} Q_j) − Q_t,   Q_t = Σ_{i≤t} (v_i − μ + κ)

    so the whole operator is two running-frame windows over pure
    integer columns — no Python, no recursion, and (same doctrine as
    :func:`detect_anomalies_mad`) no float exists anywhere to drift:
    the output is bit-exact by construction. int64 bounds: |P_t| ≤
    buckets-per-series · max|v − μ ∓ κ| — ~1e13 headroom at any real
    tier; Spark ANSI mode fails loudly if ever exceeded.

    Scale shape: one summary-sized hash aggregate per series (the
    sorted value list for median/MAD — bounded by buckets-per-series,
    the same state bound as the MAD window), one equi-join of the tier
    against that one-row-per-series frame (AQE-broadcast at real
    cardinalities), then one window partitioned by series. Zero MAD
    (≥ half the buckets identical) makes κ = 0 and h = 0 — any
    deviation alarms — flagged via ``scored = false`` like the MAD
    detector's degenerate case.

    Output: input columns + ``mu``, ``mad``, ``s_pos``, ``s_neg``,
    ``alarm``, ``scored``.
    """
    if kappa_div < 1:
        raise ValueError(f"kappa_div must be >= 1, got {kappa_div}")
    if h_mult < 1:
        raise ValueError(f"h_mult must be >= 1, got {h_mult}")
    v = F.col(value_col).cast("long")
    stats = (rollup_df
             .groupBy("series_key")
             .agg(F.sort_array(F.collect_list(v)).alias("_a"))
             .withColumn("_mid", F.expr("CAST((size(_a) + 1) DIV 2 AS INT)"))
             .withColumn("mu", F.element_at("_a", F.col("_mid")))
             .withColumn("mad", F.element_at(
                 F.sort_array(F.transform(
                     F.col("_a"), lambda e: F.abs(e - F.col("mu")))),
                 F.col("_mid")))
             .select("series_key", "mu", "mad"))
    joined = (rollup_df.join(stats, "series_key")
              .withColumn("_k", F.expr(f"mad DIV {int(kappa_div)}"))
              .withColumn("_h", F.lit(int(h_mult)) * F.col("mad")))
    run = (Window.partitionBy("series_key").orderBy("bucket_ts")
           .rowsBetween(Window.unboundedPreceding, 0))
    p = F.sum(v - F.col("mu") - F.col("_k")).over(run)
    q = F.sum(v - F.col("mu") + F.col("_k")).over(run)
    out = (joined
           .withColumn("_p", p)
           .withColumn("_q", q)
           .withColumn("s_pos", F.col("_p")
                       - F.least(F.lit(0).cast("long"),
                                 F.min("_p").over(run)))
           .withColumn("s_neg", F.greatest(F.lit(0).cast("long"),
                                           F.max("_q").over(run))
                       - F.col("_q")))
    scored = F.col("mad") > 0
    return (out
            .withColumn("alarm", scored & ((F.col("s_pos") > F.col("_h"))
                                           | (F.col("s_neg") > F.col("_h"))))
            .withColumn("scored", scored)
            .drop("_k", "_h", "_p", "_q"))


def cusum_oracle_sql(table: str, *, unit: str = "hour",
                     series_expr: str = "event_type",
                     ts_col: str = "ts", value_col: str = "value",
                     kappa_div: int = 2, h_mult: int = 5) -> str:
    """DuckDB replay of :func:`detect_changepoints_cusum` over a
    from-raw count tier: identical median/MAD integer arithmetic,
    identical drawup/drawdown closed form (integer window sums both
    sides — no float anywhere)."""
    return f"""
WITH c AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           count({value_col}) AS v
    FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
st AS (
    SELECT series_key, list_sort(list(v)) AS a,
           (count(*) + 1) // 2 AS mid
    FROM c GROUP BY 1),
mm AS (
    SELECT series_key, a[mid] AS mu,
           list_sort(list_transform(a, e -> abs(e - a[mid])))[mid] AS mad
    FROM st),
j AS (
    SELECT c.series_key, c.bucket_ts, c.v, mm.mu, mm.mad,
           mm.mad // {int(kappa_div)} AS k, {int(h_mult)} * mm.mad AS h
    FROM c JOIN mm USING (series_key)),
pq AS (
    SELECT series_key, bucket_ts, v, mu, mad, h,
           sum(v - mu - k) OVER run AS p,
           sum(v - mu + k) OVER run AS q
    FROM j
    WINDOW run AS (PARTITION BY series_key ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
w AS (
    SELECT series_key, bucket_ts, v, mu, mad, h, p, q,
           min(p) OVER run AS minp,
           max(q) OVER run AS maxq
    FROM pq
    WINDOW run AS (PARTITION BY series_key ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT series_key, bucket_ts, CAST(v AS BIGINT) AS v,
       CAST(mu AS BIGINT) AS mu, CAST(mad AS BIGINT) AS mad,
       CAST(p - least(0, minp) AS BIGINT) AS s_pos,
       CAST(greatest(0, maxq) - q AS BIGINT) AS s_neg,
       mad > 0 AND (p - least(0, minp) > h
                    OR greatest(0, maxq) - q > h) AS alarm,
       mad > 0 AS scored
FROM w
"""


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
