"""SLO error-budget burn rate with multiwindow alerting.

The Google SRE workbook's production alert rule: alert when the error
ratio burns the budget at >= ``threshold``× the sustainable rate over
BOTH a long window (catches slow burns, suppresses blips) and a short
window (makes the alert reset quickly once the incident ends):

    burn_W = (errors_W / requests_W) / (1 − slo_target)
    alert  = burn_long > threshold AND burn_short > threshold

Windows are TIME-based (RANGE frames over the bucket epoch), not
row-based: traffic gaps must widen the denominator's time span, not
silently shrink it to the nearest present rows.

Determinism design: request/error counts are integers; the rolling
window sums are exact; the two float divisions at the end are
fixed-shape IEEE ops on exactly-agreed integers (the trend.py
doctrine), so burn rates are bit-reproducible across engines,
partitionings and retries. Zero-traffic windows are unscored
(``scored = false``), not zero-burn — no data is not good news.

Scale shape: one rollup-profile hash aggregate (per-service 1m tier:
requests, errors), then ONE window partitioned by service whose
partition is tier-sized (1,440 rows/day/service). No Python, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _interval_seconds,
)
from json_time_series_extractor_spark.operators.rollup import _bucket


def slo_burn_rate(
    events: DataFrame,
    *,
    service_col: str = "service",
    ts_col: str = "ts",
    is_error_col: str = "is_error",
    tier: str = "1 minute",
    short_window: str = "1 hour",
    long_window: str = "6 hours",
    slo_target: float = 0.999,
    threshold: float = 6.0,
) -> DataFrame:
    """Per-(service, tier bucket) multiwindow burn rates + alert flag.

    ``is_error_col`` is boolean. Output: (service, bucket_ts, requests,
    errors, req_short, err_short, req_long, err_long, burn_short,
    burn_long — NULL when the window saw no traffic —, scored, alert).
    ``alert`` is false when unscored.
    """
    if not 0.0 < slo_target < 1.0:
        raise ValueError(f"slo_target must be in (0,1), got {slo_target}")
    s_secs = _interval_seconds(short_window)
    l_secs = _interval_seconds(long_window)
    t_secs = _interval_seconds(tier)
    if not t_secs <= s_secs < l_secs:
        raise ValueError("need tier <= short_window < long_window")
    budget = 1.0 - slo_target
    tiered = (events
              .groupBy(F.col(service_col).alias("service"),
                       _bucket(ts_col, tier).alias("bucket_ts"))
              .agg(F.count(F.lit(1)).alias("requests"),
                   F.sum(F.col(is_error_col).cast("long"))
                   .alias("errors"))
              .withColumn("_ep", F.unix_timestamp("bucket_ts")))

    def frame(secs: int):
        # trailing time window INCLUDING the current bucket: buckets
        # whose start lies in (t - secs, t] — i.e. the last secs/t_secs
        # bucket slots on the epoch axis.
        return (Window.partitionBy("service").orderBy("_ep")
                .rangeBetween(-(secs - t_secs), 0))

    out = tiered
    for tag, secs in (("short", s_secs), ("long", l_secs)):
        w = frame(secs)
        out = (out
               .withColumn(f"req_{tag}", F.sum("requests").over(w))
               .withColumn(f"err_{tag}", F.sum("errors").over(w)))
    burns = {}
    for tag in ("short", "long"):
        ratio = (F.col(f"err_{tag}").cast("double")
                 / F.col(f"req_{tag}").cast("double"))
        burns[tag] = F.when(F.col(f"req_{tag}") > 0,
                            ratio / F.lit(float(budget)))
    scored = (F.col("req_short") > 0) & (F.col("req_long") > 0)
    alert = F.when(
        scored,
        (burns["short"] > F.lit(float(threshold)))
        & (burns["long"] > F.lit(float(threshold)))).otherwise(F.lit(False))
    return out.select(
        "service", "bucket_ts", "requests", "errors",
        "req_short", "err_short", "req_long", "err_long",
        burns["short"].alias("burn_short"),
        burns["long"].alias("burn_long"),
        scored.alias("scored"), alert.alias("alert"))


def slo_oracle_sql(table: str = "events", *,
                   service_expr: str = "user_id % 3",
                   ts_col: str = "ts",
                   is_error_expr: str = "event_type = 'error'",
                   tier_unit: str = "minute",
                   short_secs: int = 3600, long_secs: int = 21600,
                   tier_secs: int = 60,
                   slo_target: float = 0.999, threshold: float = 6.0,
                   sentinel: float = -9.0e9) -> str:
    """DuckDB replay of :func:`slo_burn_rate` (+ the query wrapper's
    quant6/sentinel): identical RANGE frames on the epoch axis,
    identical integer sums and IEEE tail."""
    budget = 1.0 - slo_target
    return f"""
WITH t AS (
    SELECT {service_expr} AS service,
           date_trunc('{tier_unit}', {ts_col}) AS bucket_ts,
           count(*) AS requests,
           CAST(sum(CASE WHEN {is_error_expr} THEN 1 ELSE 0 END)
                AS BIGINT) AS errors
    FROM {table} GROUP BY 1, 2),
e AS (SELECT *, epoch(bucket_ts) AS ep FROM t),
w AS (
    SELECT service, bucket_ts, requests, errors,
           CAST(sum(requests) OVER ws AS BIGINT) AS req_short,
           CAST(sum(errors) OVER ws AS BIGINT) AS err_short,
           CAST(sum(requests) OVER wl AS BIGINT) AS req_long,
           CAST(sum(errors) OVER wl AS BIGINT) AS err_long
    FROM e
    WINDOW ws AS (PARTITION BY service ORDER BY ep
                  RANGE BETWEEN {short_secs - tier_secs} PRECEDING
                  AND CURRENT ROW),
           wl AS (PARTITION BY service ORDER BY ep
                  RANGE BETWEEN {long_secs - tier_secs} PRECEDING
                  AND CURRENT ROW)),
b AS (
    SELECT *,
           CASE WHEN req_short > 0 THEN
               (CAST(err_short AS DOUBLE) / CAST(req_short AS DOUBLE))
               / {budget!r} END AS burn_short,
           CASE WHEN req_long > 0 THEN
               (CAST(err_long AS DOUBLE) / CAST(req_long AS DOUBLE))
               / {budget!r} END AS burn_long,
           req_short > 0 AND req_long > 0 AS scored
    FROM w)
SELECT service, bucket_ts, requests, errors,
       req_short, err_short, req_long, err_long,
       CAST(floor(COALESCE(burn_short, CAST({sentinel!r} AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT) AS burn_short,
       CAST(floor(COALESCE(burn_long, CAST({sentinel!r} AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT) AS burn_long,
       scored,
       COALESCE(CASE WHEN scored THEN
                burn_short > {threshold!r} AND burn_long > {threshold!r}
                END, false) AS alert
FROM b
"""
