"""Visualization downsampling — largest-triangle-three-buckets (LTTB),
parallel bucket-mean-anchor variant.

TimescaleDB ships ``lttb()`` as a hyperfunction; the classic algorithm
(Steinarsson, "Downsampling Time Series for Visual Representation",
U. Iceland 2013) is SEQUENTIAL: each bucket's pick forms a triangle
with the PREVIOUSLY SELECTED point. That chain is inherently serial per
series, so this engine implements the standard parallel relaxation:
the triangle anchors are the neighbouring buckets' mean points instead
of the previous selection. Every bucket then picks independently —
one hash aggregate — while retaining LTTB's visual property (keep the
point that deviates most from the local trend). The first/last buckets
keep the series' true first/last points, as in the original.

Determinism / oracle contract: bucket-mean anchors are quantized to
1e-6 BEFORE the area math (cross-engine float summation order differs;
quantized anchors + identical IEEE expression order make every area
bit-identical in Spark and DuckDB), and the per-bucket pick is the
lexicographic min of (ordering, ts, value) — exact-tie deterministic.

Scale shape: one aggregate to build the per-bucket summary (tiny: one
row per series-bucket), a lag/lead window over THAT summary (bounded:
buckets per series, not samples), an equi-join back, and a partial/
final hash aggregate for the pick. No whole-series windows over
samples, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket


def _q6(c: Column) -> Column:
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


def _epoch(c: Column) -> Column:
    """Fractional-second epoch, DuckDB epoch() op order (micros/1e6)."""
    return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)


def downsample_lttb(samples: DataFrame, tier: str = "1 hour", *,
                    key_col: str = "series_key", ts_col: str = "ts",
                    value_col: str = "value_double") -> DataFrame:
    """One representative point per (series, tier bucket).

    Output: (series_key, bucket_ts, ts, value) — the bucket's
    largest-triangle point against the neighbouring buckets' mean
    anchors; first/last buckets keep the series' first/last samples.
    """
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("_ts"), v.alias("_v"),
        _bucket(ts_col, tier).alias("bucket_ts"))

    summ = (s.groupBy("series_key", "bucket_ts")
            .agg(_q6(F.avg(_epoch(F.col("_ts")))).alias("_tm"),
                 _q6(F.avg("_v")).alias("_vm")))
    w = Window.partitionBy("series_key").orderBy("bucket_ts")
    nbr = summ.select(
        "series_key", "bucket_ts",
        F.lag("_tm").over(w).alias("_tp"), F.lag("_vm").over(w).alias("_vp"),
        F.lead("_tm").over(w).alias("_tn"),
        F.lead("_vm").over(w).alias("_vn"))

    j = s.join(nbr, ["series_key", "bucket_ts"])
    t = _epoch(F.col("_ts"))
    area = F.abs((F.col("_tp") - F.col("_tn")) * (F.col("_v") - F.col("_vp"))
                 - (F.col("_tp") - t) * (F.col("_vn") - F.col("_vp")))
    # Ordering scalar: first bucket -> min ts, last bucket -> max ts,
    # interior -> max area; uniform (ord, ts, value) lexicographic min.
    ordv = F.when(F.col("_tp").isNull(), t) \
        .when(F.col("_tn").isNull(), -t) \
        .otherwise(-area)
    pick = (j.groupBy("series_key", "bucket_ts")
            .agg(F.min(F.struct(ordv.alias("o"),
                                F.col("_ts").alias("t"),
                                F.col("_v").alias("v"))).alias("_s")))
    return pick.select("series_key", "bucket_ts",
                       F.col("_s.t").alias("ts"),
                       F.col("_s.v").alias("value"))


def downsample_m4(samples: DataFrame, tier: str = "1 hour", *,
                  key_col: str = "series_key", ts_col: str = "ts",
                  value_col: str = "value_double") -> DataFrame:
    """M4 visualization aggregation (Jugel et al., VLDB 2014): per
    (series, tier bucket) keep the four pixel-defining samples — first,
    last (by time) and min, max (by value) — which render a line chart
    pixel-identically to the raw series at one bucket per pixel column.

    Output: (series_key, bucket_ts, n, first_ts, first_v, min_ts, min_v,
    max_ts, max_v, last_ts, last_v).

    Determinism: every pick is a lexicographic struct min/max —
    first/last order by (ts, value), min/max by (value, ts) — so exact
    ties resolve identically in any engine and under any partitioning.
    Values pass through untouched (no accumulation), so no quantization
    is needed anywhere.

    Scale shape: ONE hash aggregate on (series_key, bucket) with
    map-side partial combine — the same first-shuffle profile as the
    rollup tier, no windows over raw samples, no Python. The four picks
    are min/max-mergeable, so M4 summaries re-aggregate exactly under
    incremental/union refresh (unlike LTTB, which is not mergeable).
    """
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("_ts"), v.alias("_v"),
        _bucket(ts_col, tier).alias("bucket_ts"))
    t_then_v = F.struct(F.col("_ts").alias("t"), F.col("_v").alias("v"))
    v_then_t = F.struct(F.col("_v").alias("v"), F.col("_ts").alias("t"))
    agg = (s.groupBy("series_key", "bucket_ts")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min(t_then_v).alias("_f"), F.max(t_then_v).alias("_l"),
                F.min(v_then_t).alias("_lo"), F.max(v_then_t).alias("_hi")))
    return agg.select(
        "series_key", "bucket_ts", "n",
        F.col("_f.t").alias("first_ts"), F.col("_f.v").alias("first_v"),
        F.col("_lo.t").alias("min_ts"), F.col("_lo.v").alias("min_v"),
        F.col("_hi.t").alias("max_ts"), F.col("_hi.v").alias("max_v"),
        F.col("_l.t").alias("last_ts"), F.col("_l.v").alias("last_v"))


def m4_oracle_sql(table: str, *, series_expr: str, ts_col: str,
                  value_col: str, unit: str = "hour") -> str:
    """DuckDB recomputation of :func:`downsample_m4` — the same four
    lexicographic picks expressed as row_number orderings (DuckDB's
    min/max over STRUCT is not guaranteed field-lexicographic, so the
    oracle spells the ordering out). Kept beside the implementation so
    they evolve together."""
    return f"""
WITH s AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {ts_col} AS ts, {value_col} AS v
    FROM {table} WHERE {value_col} IS NOT NULL),
r AS (
    SELECT series_key, bucket_ts, ts, v,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY ts, v) AS rf,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY ts DESC, v DESC) AS rl,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY v, ts) AS rlo,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY v DESC, ts DESC) AS rhi
    FROM s)
SELECT series_key, bucket_ts, count(*) AS n,
       max(CASE WHEN rf = 1 THEN ts END) AS first_ts,
       max(CASE WHEN rf = 1 THEN v END) AS first_v,
       max(CASE WHEN rlo = 1 THEN ts END) AS min_ts,
       max(CASE WHEN rlo = 1 THEN v END) AS min_v,
       max(CASE WHEN rhi = 1 THEN ts END) AS max_ts,
       max(CASE WHEN rhi = 1 THEN v END) AS max_v,
       max(CASE WHEN rl = 1 THEN ts END) AS last_ts,
       max(CASE WHEN rl = 1 THEN v END) AS last_v
FROM r GROUP BY 1, 2
"""


def lttb_oracle_sql(table: str, *, series_expr: str, ts_col: str,
                    value_col: str, unit: str = "hour") -> str:
    """DuckDB recomputation of :func:`downsample_lttb` — same quantized
    anchors, same IEEE area expression, same (ord, ts, value) ordering
    via row_number. Kept beside the implementation so they evolve
    together."""
    return f"""
WITH s AS (
    SELECT {series_expr} AS series_key,
           date_trunc('{unit}', {ts_col}) AS bucket_ts,
           {ts_col} AS ts, {value_col} AS v
    FROM {table} WHERE {value_col} IS NOT NULL),
summ AS (
    SELECT series_key, bucket_ts,
           floor(avg(epoch(ts)) * 1000000 + 0.5) / 1000000 AS tm,
           floor(avg(v) * 1000000 + 0.5) / 1000000 AS vm
    FROM s GROUP BY 1, 2),
nbr AS (
    SELECT series_key, bucket_ts,
           lag(tm) OVER w AS tp, lag(vm) OVER w AS vp,
           lead(tm) OVER w AS tn, lead(vm) OVER w AS vn
    FROM summ
    WINDOW w AS (PARTITION BY series_key ORDER BY bucket_ts)),
j AS (
    SELECT s.series_key, s.bucket_ts, s.ts, s.v,
           CASE WHEN n.tp IS NULL THEN epoch(s.ts)
                WHEN n.tn IS NULL THEN -epoch(s.ts)
                ELSE -abs((n.tp - n.tn) * (s.v - n.vp)
                          - (n.tp - epoch(s.ts)) * (n.vn - n.vp))
           END AS o
    FROM s JOIN nbr n USING (series_key, bucket_ts)),
r AS (
    SELECT series_key, bucket_ts, ts, v,
           row_number() OVER (PARTITION BY series_key, bucket_ts
                              ORDER BY o, ts, v) AS rk
    FROM j)
SELECT series_key, bucket_ts, ts, v AS value
FROM r WHERE rk = 1
"""
