"""Holt double exponential smoothing over a rollup tier (PromQL
``holt_winters()`` analog — level + trend, no seasonality).

Standard Holt (1957) linear method per series over its PRESENT tier
buckets, ordered by bucket time and indexed i = 1..n:

    level_2 = v_2                  trend_2 = v_2 - v_1        (seed)
    level_i = sf*v_i + (1-sf)*(level_{i-1} + trend_{i-1})     i >= 3
    trend_i = tf*(level_i - level_{i-1}) + (1-tf)*trend_{i-1}

The i = 2 seed avoids lookahead so the recurrence is a pure forward
scan (and a pure recursive-CTE in the SQL oracle). Rows before the
seed (i = 1, and every row of a single-bucket series) emit NULL with
``scored = false``.

Determinism design (house playbook, cf. ``anomaly.py``/``trend.py``):
the input is an exact integer bucket metric (count) cast to double, and
every step is a FIXED float shape —

    m1 = sf*v;  a1 = level+trend;  m2 = csf*a1;  level' = m1+m2
    d = level'-level;  m3 = tf*d;  m4 = ctf*trend;  trend' = m3+m4

with ``csf = 1-sf`` / ``ctf = 1-tf`` pre-computed in Python so both
engines consume ONE identical literal. Each op is a single IEEE-754
binary64 operation in both engines, so level/trend are bit-reproducible
and survive the type-strict value hash after fixed-point quantization.

Scale shape: the recurrence is inherently sequential per series, so it
runs in ``applyInPandas`` — but over TIER rows (one row per present
bucket: a year of 1h buckets is <9k rows), never raw samples. One hash
shuffle on series_key; group size is bounded by the tier's bucket
count, and series count is the parallelism — the same summary-sized
profile as ``rolling_over_time``/``downsample_lttb``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

HOLT_SCHEMA = StructType([
    StructField("series_key", StringType()),
    StructField("bucket_ts", TimestampType()),
    StructField("v", LongType()),
    StructField("smoothed", DoubleType()),
    StructField("trend", DoubleType()),
    StructField("scored", BooleanType()),
])


def holt_winters(rollup_df: DataFrame, sf: float = 0.3,
                 tf: float = 0.1, *,
                 value_col: str = "count") -> DataFrame:
    """Smooth each series' tier metric; see module docstring.

    ``rollup_df``: (series_key, bucket_ts, <value_col>) tier rows;
    ``value_col`` must be integral for cross-engine determinism.
    Output: (series_key, bucket_ts, v, smoothed, trend, scored).
    """
    if not (0.0 < sf < 1.0) or not (0.0 < tf < 1.0):
        raise ValueError(
            f"smoothing/trend factors must be in (0, 1), got "
            f"sf={sf!r} tf={tf!r}")
    csf, ctf = 1.0 - sf, 1.0 - tf

    src = rollup_df.select(
        "series_key", "bucket_ts",
        rollup_df[value_col].cast("long").alias("v"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        vs = [float(x) for x in pdf["v"]]
        n = len(vs)
        smoothed = [None] * n
        trend = [None] * n
        if n >= 2:
            level, tr = vs[1], vs[1] - vs[0]
            smoothed[1], trend[1] = level, tr
            for i in range(2, n):
                m1 = sf * vs[i]
                a1 = level + tr
                m2 = csf * a1
                new_level = m1 + m2
                d = new_level - level
                m3 = tf * d
                m4 = ctf * tr
                tr = m3 + m4
                level = new_level
                smoothed[i], trend[i] = level, tr
        return pd.DataFrame({
            "series_key": pdf["series_key"].to_numpy(),
            "bucket_ts": pdf["bucket_ts"].to_numpy(),
            "v": pdf["v"].to_numpy(),
            "smoothed": pd.array(smoothed, dtype="float64"),
            "trend": pd.array(trend, dtype="float64"),
            "scored": [s is not None for s in smoothed],
        })

    return src.groupBy("series_key").applyInPandas(run, HOLT_SCHEMA)


def holt_oracle_sql(samples_sql: str, tier_trunc: str, sf: float,
                    tf: float) -> str:
    """DuckDB replay of the exact recurrence via a recursive CTE.

    ``samples_sql``: subquery yielding (series_key, ts); the tier
    metric is count(*). The recursive step repeats the level expression
    for the trend term — recomputation of the identical IEEE ops, not a
    divergence. Kept beside the implementation so both stay in sync.
    """
    csf, ctf = repr(1.0 - sf), repr(1.0 - tf)
    sf_, tf_ = repr(float(sf)), repr(float(tf))
    lvl = (f"CAST({sf_} AS DOUBLE)*b.v "
           f"+ CAST({csf} AS DOUBLE)*(r.level + r.trend)")
    return f"""
WITH RECURSIVE b AS (
    SELECT series_key, bucket_ts, CAST(count(*) AS DOUBLE) AS v,
           CAST(row_number() OVER (PARTITION BY series_key
                                   ORDER BY bucket_ts) AS BIGINT) AS i
    FROM (SELECT series_key, date_trunc('{tier_trunc}', ts) AS bucket_ts
          FROM ({samples_sql}))
    GROUP BY 1, 2),
rec AS (
    SELECT b2.series_key, CAST(2 AS BIGINT) AS i,
           b2.v AS level, b2.v - b1.v AS trend
    FROM b b2 JOIN b b1 ON b1.series_key = b2.series_key
                        AND b1.i = 1 AND b2.i = 2
    UNION ALL
    SELECT b.series_key, b.i,
           {lvl} AS level,
           CAST({tf_} AS DOUBLE)*(({lvl}) - r.level)
               + CAST({ctf} AS DOUBLE)*r.trend AS trend
    FROM rec r JOIN b ON b.series_key = r.series_key AND b.i = r.i + 1)
SELECT b.series_key, b.bucket_ts, CAST(b.v AS BIGINT) AS v,
       CAST(floor(COALESCE(rec.level, -9.0e9) * 1000000 + 0.5)
            AS BIGINT) AS smoothed,
       CAST(floor(COALESCE(rec.trend, -9.0e9) * 1000000 + 0.5)
            AS BIGINT) AS trend,
       rec.i IS NOT NULL AS scored
FROM b LEFT JOIN rec ON rec.series_key = b.series_key AND rec.i = b.i
"""

HOLT_SEASONAL_SCHEMA = StructType([
    StructField("series_key", StringType()),
    StructField("bucket_ts", TimestampType()),
    StructField("v", LongType()),
    StructField("level", DoubleType()),
    StructField("trend", DoubleType()),
    StructField("season", DoubleType()),
    StructField("scored", BooleanType()),
])


def holt_winters_seasonal(rollup_df: DataFrame, sf: float = 0.3,
                          tf: float = 0.1, gf: float = 0.2,
                          period: int = 24, *,
                          value_col: str = "count") -> DataFrame:
    """Additive triple exponential smoothing (Holt-Winters 1960) per
    series over PRESENT tier buckets indexed i = 1..n — level + trend +
    a ``period``-length seasonal cycle (24 on an hourly tier = daily
    seasonality), the full method PromQL's double-only
    ``holt_winters()`` stops short of.

    Lookahead-free seed at i = p (= ``period``), deliberately as simple
    as the double method's ``level_2 = v_2`` seed so every value is a
    fixed IEEE shape (no mean over a season — cross-engine summation
    order would bite):

        level_p  = v_p
        trend_p  = (v_p - v_1) / (p - 1)
        season_j = v_j - v_p          (j = 1..p; season_p = 0)

    and for i > p, with s_old = season_{i-p}:

        level_i  = sf*(v_i - s_old) + (1-sf)*(level + trend)
        trend_i  = tf*(level_i - level) + (1-tf)*trend
        season_i = gf*(v_i - level_i) + (1-gf)*s_old

    written as single-op steps with (1-sf)/(1-tf)/(1-gf) pre-computed
    literals (the :func:`holt_winters` determinism design) so the SQL
    oracle's recursive CTE — which carries the p seasonal components as
    a LIST column, shifting one per step — replays bit-for-bit. Rows
    before the seed emit NULLs with ``scored = false``; series shorter
    than p are fully unscored.

    Scale shape: identical to :func:`holt_winters` — the sequential
    recurrence runs in ``applyInPandas`` over TIER rows (state is the
    p-vector, not the data), one series_key shuffle, group size bounded
    by the tier's bucket count.
    """
    for name, f in (("sf", sf), ("tf", tf), ("gf", gf)):
        if not (0.0 < f < 1.0):
            raise ValueError(
                f"smoothing factors must be in (0, 1), got {name}={f!r}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    csf, ctf, cgf = 1.0 - sf, 1.0 - tf, 1.0 - gf
    p = int(period)

    src = rollup_df.select(
        "series_key", "bucket_ts",
        rollup_df[value_col].cast("long").alias("v"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        vs = [float(x) for x in pdf["v"]]
        n = len(vs)
        level_o = [None] * n
        trend_o = [None] * n
        season_o = [None] * n
        if n >= p:
            level = vs[p - 1]
            tr = (vs[p - 1] - vs[0]) / (p - 1)
            seasons = [vs[j] - vs[p - 1] for j in range(p)]
            level_o[p - 1], trend_o[p - 1] = level, tr
            season_o[p - 1] = seasons[p - 1]  # 0.0 by construction
            for i in range(p, n):
                s_old = seasons[i - p]
                u = vs[i] - s_old
                m1 = sf * u
                a1 = level + tr
                m2 = csf * a1
                new_level = m1 + m2
                d = new_level - level
                m3 = tf * d
                m4 = ctf * tr
                tr = m3 + m4
                w = vs[i] - new_level
                m5 = gf * w
                m6 = cgf * s_old
                s_new = m5 + m6
                seasons.append(s_new)
                level = new_level
                level_o[i], trend_o[i], season_o[i] = level, tr, s_new
        return pd.DataFrame({
            "series_key": pdf["series_key"].to_numpy(),
            "bucket_ts": pdf["bucket_ts"].to_numpy(),
            "v": pdf["v"].to_numpy(),
            "level": pd.array(level_o, dtype="float64"),
            "trend": pd.array(trend_o, dtype="float64"),
            "season": pd.array(season_o, dtype="float64"),
            "scored": [x is not None for x in level_o],
        })

    return src.groupBy("series_key").applyInPandas(
        run, HOLT_SEASONAL_SCHEMA)


def holt_seasonal_oracle_sql(samples_sql: str, tier_trunc: str,
                             sf: float, tf: float, gf: float,
                             period: int) -> str:
    """DuckDB replay of :func:`holt_winters_seasonal` — the recursive
    CTE carries the p seasonal components as a LIST column: the head is
    always season_{i-p}, each step drops it and appends the new one.
    The level expression repeats verbatim in the trend/season terms
    (identical IEEE op recomputation, the :func:`holt_oracle_sql`
    trick). Kept beside the implementation so both stay in sync."""
    p = int(period)
    sf_, tf_, gf_ = repr(float(sf)), repr(float(tf)), repr(float(gf))
    csf, ctf, cgf = (repr(1.0 - sf), repr(1.0 - tf), repr(1.0 - gf))
    lvl = (f"CAST({sf_} AS DOUBLE)*(b.v - r.seasons[1]) "
           f"+ CAST({csf} AS DOUBLE)*(r.level + r.trend)")
    return f"""
WITH RECURSIVE b AS (
    SELECT series_key, bucket_ts, CAST(count(*) AS DOUBLE) AS v,
           CAST(row_number() OVER (PARTITION BY series_key
                                   ORDER BY bucket_ts) AS BIGINT) AS i
    FROM (SELECT series_key, date_trunc('{tier_trunc}', ts) AS bucket_ts
          FROM ({samples_sql}))
    GROUP BY 1, 2),
vp AS (
    SELECT series_key,
           max(CASE WHEN i = {p} THEN v END) AS vp,
           max(CASE WHEN i = 1 THEN v END) AS v1
    FROM b WHERE i <= {p} GROUP BY 1
    HAVING count(*) >= {p}),
seed AS (
    SELECT b.series_key, CAST({p} AS BIGINT) AS i,
           vp.vp AS level,
           (vp.vp - vp.v1) / CAST({float(p - 1)!r} AS DOUBLE) AS trend,
           list(b.v - vp.vp ORDER BY b.i) AS seasons
    FROM b JOIN vp USING (series_key) WHERE b.i <= {p}
    GROUP BY 1, 2, vp.vp, vp.v1),
rec AS (
    SELECT series_key, i, level, trend, seasons FROM seed
    UNION ALL
    SELECT b.series_key, b.i,
           {lvl} AS level,
           CAST({tf_} AS DOUBLE)*(({lvl}) - r.level)
               + CAST({ctf} AS DOUBLE)*r.trend AS trend,
           list_concat(
               r.seasons[2:],
               [CAST({gf_} AS DOUBLE)*(b.v - ({lvl}))
                + CAST({cgf} AS DOUBLE)*r.seasons[1]]) AS seasons
    FROM rec r JOIN b ON b.series_key = r.series_key AND b.i = r.i + 1)
SELECT b.series_key, b.bucket_ts, CAST(b.v AS BIGINT) AS v,
       CAST(floor(COALESCE(rec.level, -9.0e9) * 1000000 + 0.5)
            AS BIGINT) AS level,
       CAST(floor(COALESCE(rec.trend, -9.0e9) * 1000000 + 0.5)
            AS BIGINT) AS trend,
       CAST(floor(COALESCE(rec.seasons[{p}], -9.0e9) * 1000000 + 0.5)
            AS BIGINT) AS season,
       rec.i IS NOT NULL AS scored
FROM b LEFT JOIN rec ON rec.series_key = b.series_key AND rec.i = b.i
"""
