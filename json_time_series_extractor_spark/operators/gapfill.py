"""Gap-fill over rollup tiers: LOCF and linear interpolation.

Both are expressed with stock Catalyst primitives:

1. Build the dense per-series bucket grid with
   ``sequence(min_bucket, max_bucket, interval)`` + ``explode`` — generated
   distributed, sized per series (never a driver-side loop or a global
   calendar cross-join).
2. Left-join the rollup onto the grid on (series_key, bucket_ts). The join
   keys share the partitioning of the rollup output, and AQE picks
   broadcast when the grid is small.
3. Fill with window functions over each series ordered by bucket:
   - LOCF: ``last(value, ignorenulls) over (unbounded preceding .. current)``
   - linear: previous/next known (bucket, value) pairs via
     ``last/first ignorenulls`` + slope arithmetic; buckets outside the
     known range stay null (standard ``interpolate`` semantics — LOCF is
     the operator that extends the last value forward).

Scale notes: the window is partitioned by series_key — no global sort. A
single series' grid must fit a partition, which holds for any realistic
retention (e.g. 1-minute buckets x 90 days = 130k rows/series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _grid(rollup_df: DataFrame, interval: str) -> DataFrame:
    return (
        rollup_df
        .groupBy("series_key")
        .agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
        .select(
            "series_key",
            # explode_outer: plain explode would add a Generate pre-filter
            # that re-evaluates the sequence() twice more per series.
            F.explode_outer(F.expr(f"sequence(_lo, _hi, interval {interval})"))
            .alias("bucket_ts"))
    )


_INTERVAL_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(spec: str) -> int:
    """'1 day' / '15 minutes' -> seconds (fixed-length units only)."""
    num, unit = spec.strip().split()
    return int(num) * _INTERVAL_UNIT_SECONDS[unit.lower()]


def _epoch_floor(col, seconds: int):
    """Truncate a timestamp column to the epoch-aligned ``seconds`` grid —
    identical to ``window(col, interval).start`` for fixed-length
    intervals, usable multiple times in one expression (window() is not).
    Shared by gap-fill segmentation, counter-rate carry and TWA buckets."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col) / seconds) * seconds)


def _require_divides(interval: str, segment: str) -> None:
    """Partitioned gap-fill builds each segment's bucket grid as
    sequence(seg_start, seg_start + segment - interval, interval): a
    non-dividing interval would misalign the per-segment grid ends
    (sequence with start > stop throws; earlier buckets silently drift)."""
    i_s, s_s = _interval_seconds(interval), _interval_seconds(segment)
    if s_s % i_s != 0:
        raise ValueError(
            f"interval {interval!r} must evenly divide segment {segment!r} "
            f"({s_s} % {i_s} != 0) for segment-partitioned gap-fill")


def _aligned_bounds(r: DataFrame, interval: str) -> DataFrame:
    """Per-series (min, max) bucket with ``_lo`` validated epoch-aligned to
    ``interval``. The segment-partitioned variants restart each segment's
    grid at epoch-aligned segment starts, so they only reproduce
    ``sequence(_lo, _hi, interval)`` when ``_lo`` itself lies on the epoch
    interval grid — always true of rollup output (bucket_ts are window
    starts) but not of arbitrary input, e.g. gap-filling at an interval
    coarser than the rollup tier. Fails loudly instead of drifting."""
    i_s = _interval_seconds(interval)
    bounds = (r.groupBy("series_key")
              .agg(F.min("bucket_ts").alias("_lo"),
                   F.max("bucket_ts").alias("_hi")))
    # Microsecond precision: unix_timestamp truncates to seconds, which
    # would wave sub-second-offset bucket grids through the check.
    aligned = (F.unix_micros(F.col("_lo").cast("timestamp"))
               % F.lit(i_s * 1_000_000) == 0)
    # One row per series — the check is free relative to the grid explode.
    return bounds.select(
        "series_key",
        F.when(aligned, F.col("_lo")).otherwise(F.raise_error(F.concat(
            F.lit(f"segment-partitioned gap-fill at interval {interval!r} "
                  "requires epoch-aligned bucket_ts; series "),
            F.col("series_key").cast("string"),
            F.lit(" starts at "),
            F.col("_lo").cast("string")))).alias("_lo"),
        "_hi")


def gapfill_locf(rollup_df: DataFrame, interval: str = "1 minute",
                 value_col: str = "mean") -> DataFrame:
    """Dense grid with last-observation-carried-forward values.

    Output: (series_key, bucket_ts, value, filled) where ``filled`` marks
    grid buckets that had no data.
    """
    grid = _grid(rollup_df, interval)
    joined = grid.join(
        rollup_df.select("series_key", "bucket_ts",
                         F.col(value_col).alias("_v")),
        on=["series_key", "bucket_ts"], how="left")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        "series_key", "bucket_ts",
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.col("_v").isNull().alias("filled"),
    )


def gapfill_locf_stale(rollup_df: DataFrame, interval: str = "1 minute",
                       value_col: str = "mean",
                       max_stale_buckets: int = 5) -> DataFrame:
    """LOCF with a staleness bound — PromQL's lookback rule (a series
    with no sample in the last 5 minutes is STALE and yields no value,
    instead of carrying the last value forever): the carry expires
    ``max_stale_buckets`` buckets after the last observation.

    Output: (series_key, bucket_ts, value, filled, stale) — ``value``
    NULL once stale; ``stale`` true on filled buckets whose carry
    expired (or that precede the first observation). Same plan shape
    as :func:`gapfill_locf` plus one more running-max window column
    (the last-seen bucket) over the identical partitioning.
    """
    if max_stale_buckets < 1:
        raise ValueError(
            f"max_stale_buckets must be >= 1, got {max_stale_buckets}")
    grid = _grid(rollup_df, interval)
    joined = grid.join(
        rollup_df.select("series_key", "bucket_ts",
                         F.col(value_col).alias("_v")),
        on=["series_key", "bucket_ts"], how="left")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    horizon_us = max_stale_buckets * _interval_seconds(interval) * 1_000_000
    carried = F.last("_v", ignorenulls=True).over(w)
    last_seen = F.max(
        F.when(F.col("_v").isNotNull(), F.col("bucket_ts"))).over(w)
    fresh = (F.unix_micros(F.col("bucket_ts").cast("timestamp"))
             - F.unix_micros(last_seen.cast("timestamp"))
             <= F.lit(horizon_us))
    return joined.select(
        "series_key", "bucket_ts",
        F.when(fresh, carried).alias("value"),
        F.col("_v").isNull().alias("filled"),
        (F.col("_v").isNull()
         & ~F.coalesce(fresh, F.lit(False))).alias("stale"))


def gapfill_locf_partitioned(rollup_df: DataFrame,
                             interval: str = "1 minute",
                             value_col: str = "mean",
                             segment: str = "1 day") -> DataFrame:
    """LOCF gap-fill whose window partitions are (series, segment) instead
    of whole series — result-identical to :func:`gapfill_locf`.

    :func:`gapfill_locf` puts an entire series' grid in one window
    partition; at warehouse scale a multi-year 1-minute series is millions
    of rows in a single task. This variant bounds every partition to one
    ``segment`` (default: 1 day = 1440 rows) with a classic two-pass carry:

    1. per (series, segment): the segment's last observed value — a tiny
       summary table (one row per series-day);
    2. LOCF over the *summaries* (window partitioned by series over days —
       thousands of rows, not millions) gives each segment its carry-in;
    3. per (series, segment): dense bucket grid + within-segment LOCF,
       seeded by the carry-in for buckets before the segment's first
       observation.
    """
    r = rollup_df.select("series_key", "bucket_ts",
                         F.col(value_col).alias("_v"))
    seg_s = _interval_seconds(segment)
    _require_divides(interval, segment)

    def seg_start(col):
        return _epoch_floor(col, seg_s)

    bounds = _aligned_bounds(r, interval)
    seg_grid = bounds.select(
        "series_key", "_lo", "_hi",
        F.explode_outer(F.sequence(
            seg_start(F.col("_lo")), seg_start(F.col("_hi")),
            F.expr(f"interval {segment}")))
        .alias("_seg"))

    # Nulls excluded BEFORE the summary: gapfill_locf's carry window skips
    # nulls (ignorenulls), so a segment whose latest bucket holds null must
    # contribute its latest NON-null value, not null.
    summary = (r.where(F.col("_v").isNotNull())
               .groupBy("series_key", seg_start(F.col("bucket_ts"))
                        .alias("_seg"))
               .agg(F.max(F.struct(F.col("bucket_ts").alias("t"),
                                   F.col("_v").alias("v")))["v"]
                    .alias("_seg_last")))

    carry_w = (Window.partitionBy("series_key").orderBy("_seg")
               .rowsBetween(Window.unboundedPreceding, -1))
    with_carry = (seg_grid
                  .join(summary, ["series_key", "_seg"], "left")
                  .withColumn("_carry",
                              F.last("_seg_last", ignorenulls=True)
                              .over(carry_w)))

    buckets = with_carry.select(
        "series_key", "_seg", "_carry",
        F.explode_outer(F.expr(
            f"sequence(greatest(_seg, _lo), "
            f"least(_seg + interval {segment} - interval {interval}, _hi), "
            f"interval {interval})")).alias("bucket_ts"))

    joined = buckets.join(r, ["series_key", "bucket_ts"], "left")
    in_seg = (Window.partitionBy("series_key", "_seg").orderBy("bucket_ts")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        "series_key", "bucket_ts",
        F.coalesce(F.last("_v", ignorenulls=True).over(in_seg),
                   F.col("_carry")).alias("value"),
        F.col("_v").isNull().alias("filled"),
    )


def gapfill_linear_partitioned(rollup_df: DataFrame,
                               interval: str = "1 minute",
                               value_col: str = "mean",
                               segment: str = "1 day") -> DataFrame:
    """Linear-interpolation gap-fill with (series, segment)-bounded window
    partitions — result-identical to :func:`gapfill_linear`.

    Like :func:`gapfill_locf_partitioned` but the carry is bidirectional:
    each segment needs the nearest known point *before* it (from earlier
    segments) and *after* it (from later segments). Both carries come from
    the per-segment summary table (first/last known (ts, value) per
    segment — one row per series-day), so the only whole-series windows run
    over summaries, never over the dense grid.
    """
    r = rollup_df.select("series_key", "bucket_ts",
                         F.col(value_col).alias("_v"))
    seg_s = _interval_seconds(segment)
    _require_divides(interval, segment)

    def seg_start(col):
        return _epoch_floor(col, seg_s)

    bounds = _aligned_bounds(r, interval)
    seg_grid = bounds.select(
        "series_key", "_lo", "_hi",
        F.explode_outer(F.sequence(
            seg_start(F.col("_lo")), seg_start(F.col("_hi")),
            F.expr(f"interval {segment}")))
        .alias("_seg"))

    known = r.where(F.col("_v").isNotNull())
    pt = F.struct(F.col("bucket_ts").alias("t"), F.col("_v").alias("v"))
    summary = (known.groupBy("series_key", seg_start(F.col("bucket_ts"))
                            .alias("_seg"))
               .agg(F.min(pt).alias("_first_pt"),
                    F.max(pt).alias("_last_pt")))

    prev_w = (Window.partitionBy("series_key").orderBy("_seg")
              .rowsBetween(Window.unboundedPreceding, -1))
    next_w = (Window.partitionBy("series_key").orderBy(F.col("_seg").desc())
              .rowsBetween(Window.unboundedPreceding, -1))
    with_carry = (seg_grid
                  .join(summary, ["series_key", "_seg"], "left")
                  .withColumn("_prev_carry",
                              F.last("_last_pt", ignorenulls=True)
                              .over(prev_w))
                  .withColumn("_next_carry",
                              F.last("_first_pt", ignorenulls=True)
                              .over(next_w)))

    buckets = with_carry.select(
        "series_key", "_seg", "_prev_carry", "_next_carry",
        F.explode_outer(F.expr(
            f"sequence(greatest(_seg, _lo), "
            f"least(_seg + interval {segment} - interval {interval}, _hi), "
            f"interval {interval})")).alias("bucket_ts"))

    joined = buckets.join(r, ["series_key", "bucket_ts"], "left")
    past = (Window.partitionBy("series_key", "_seg").orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    future = (Window.partitionBy("series_key", "_seg")
              .orderBy(F.col("bucket_ts").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    known_pt = F.when(F.col("_v").isNotNull(),
                      F.struct(F.col("bucket_ts").alias("t"),
                               F.col("_v").alias("v")))
    prev_pt = F.coalesce(F.last(known_pt, ignorenulls=True).over(past),
                         F.col("_prev_carry"))
    next_pt = F.coalesce(F.last(known_pt, ignorenulls=True).over(future),
                         F.col("_next_carry"))

    t = F.unix_timestamp("bucket_ts")
    t0 = F.unix_timestamp(prev_pt["t"])
    t1 = F.unix_timestamp(next_pt["t"])
    interpolated = (
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .when(prev_pt.isNotNull() & next_pt.isNotNull(),
              prev_pt["v"] + (next_pt["v"] - prev_pt["v"])
              * (t - t0) / (t1 - t0))
        .otherwise(F.lit(None)))

    return joined.select(
        "series_key", "bucket_ts",
        interpolated.alias("value"),
        F.col("_v").isNull().alias("filled"),
    )


def gapfill_linear(rollup_df: DataFrame, interval: str = "1 minute",
                   value_col: str = "mean") -> DataFrame:
    """Dense grid with linear interpolation between neighbouring known
    points; leading/trailing buckets (no neighbour on one side) stay null.
    """
    grid = _grid(rollup_df, interval)
    joined = grid.join(
        rollup_df.select("series_key", "bucket_ts",
                         F.col(value_col).alias("_v")),
        on=["series_key", "bucket_ts"], how="left")

    # Both "previous known" and "next known" are running (unbounded
    # PRECEDING) frames — the next-known side simply orders descending.
    # An unbounded-FOLLOWING frame would be O(n^2) per partition in Spark
    # (the frame is re-scanned per row); the running frame is O(n).
    past = (Window.partitionBy("series_key").orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    future = (Window.partitionBy("series_key")
              .orderBy(F.col("bucket_ts").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    known_ts = F.when(F.col("_v").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("_v", ignorenulls=True).over(past)
    prev_t = F.last(known_ts, ignorenulls=True).over(past)
    next_v = F.last("_v", ignorenulls=True).over(future)
    next_t = F.last(known_ts, ignorenulls=True).over(future)

    t = F.unix_timestamp("bucket_ts")
    t0 = F.unix_timestamp(prev_t)
    t1 = F.unix_timestamp(next_t)

    interpolated = (
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .when(prev_v.isNotNull() & next_v.isNotNull(),
              prev_v + (next_v - prev_v) * (t - t0) / (t1 - t0))
        .otherwise(F.lit(None)))

    return joined.select(
        "series_key", "bucket_ts",
        interpolated.alias("value"),
        F.col("_v").isNull().alias("filled"),
    )


def absent_buckets(rollup_df: DataFrame,
                   interval: str = "1 hour") -> DataFrame:
    """PromQL ``absent_over_time()`` per-bucket analog: the buckets in
    which a series emitted NOTHING, with gap run-length metadata — the
    staleness/outage signal ("this host stopped reporting for 6h").

    Semantics: the grid spans each series' own [min, max] observed
    bucket (the gap-fill convention — leading/trailing absence is
    undefined without an external roster). Output is SPARSE: one row
    per ABSENT grid bucket, with ``gap_id`` (per-series ordinal of the
    gap run), ``gap_pos`` (1-based position inside the run) and
    ``gap_len`` (total run length) — consumers alert on
    ``gap_len >= k`` for k-consecutive-missing staleness.

    Scale shape: the same per-series grid explode as gap-fill (bounded
    by the series' bucket span over TIER rows), a broadcastable-small
    left join back to present buckets, and two windows over grid rows
    — summary-sized partitions throughout; all integers, so the result
    is engine-exact.
    """
    grid = _grid(rollup_df, interval)
    present = rollup_df.select(
        "series_key", "bucket_ts", F.lit(True).alias("_p"))
    j = grid.join(present, ["series_key", "bucket_ts"], "left")
    # Consecutive absent buckets share a run: count of PRESENT rows so
    # far (running, O(n)) is constant inside a run and bumps at each
    # present row.
    run = (Window.partitionBy("series_key").orderBy("bucket_ts")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = (j.withColumn("_run", F.count("_p").over(run))
              .where(F.col("_p").isNull()))
    inrun = Window.partitionBy("series_key", "_run")
    gap_ord = Window.partitionBy("series_key").orderBy("_run")
    return (marked.select(
        "series_key", "bucket_ts",
        F.dense_rank().over(gap_ord).alias("gap_id"),
        F.row_number().over(inrun.orderBy("bucket_ts")).alias("gap_pos"),
        F.count(F.lit(1)).over(inrun).alias("gap_len")))


def absent_oracle_sql(samples_sql: str, unit: str) -> str:
    """DuckDB replay: per-series generate_series grid between observed
    min/max, anti-flag via left join, identical running-count run ids.
    Kept beside the implementation so both stay in sync."""
    return f"""
WITH p AS (
    SELECT series_key, date_trunc('{unit}', ts) AS bucket_ts
    FROM ({samples_sql}) GROUP BY 1, 2),
g AS (
    SELECT series_key,
           unnest(generate_series(min(bucket_ts), max(bucket_ts),
                                  INTERVAL 1 {unit})) AS bucket_ts
    FROM p GROUP BY series_key),
m AS (
    SELECT g.series_key, g.bucket_ts, p.bucket_ts IS NOT NULL AS _p,
           count(CASE WHEN p.bucket_ts IS NOT NULL THEN 1 END)
               OVER (PARTITION BY g.series_key ORDER BY g.bucket_ts
                     ROWS UNBOUNDED PRECEDING) AS _run
    FROM g LEFT JOIN p USING (series_key, bucket_ts))
SELECT series_key, bucket_ts,
       CAST(dense_rank() OVER (PARTITION BY series_key ORDER BY _run)
            AS BIGINT) AS gap_id,
       CAST(row_number() OVER (PARTITION BY series_key, _run
                               ORDER BY bucket_ts) AS BIGINT) AS gap_pos,
       CAST(count(*) OVER (PARTITION BY series_key, _run)
            AS BIGINT) AS gap_len
FROM m WHERE NOT _p
"""

def absent_buckets_partitioned(rollup_df: DataFrame,
                               interval: str = "1 hour",
                               segment: str = "30 days") -> DataFrame:
    """:func:`absent_buckets` with every window bounded — result-identical.

    The global variant's running present-count window puts a series'
    ENTIRE grid in one window partition: fine at the 1h tier (<=8.8k
    rows/series/year) but a multi-year 1-minute series is ~525k rows on
    one task. This variant bounds the hot path the same way
    :func:`gapfill_locf_partitioned` does, with a two-level summary
    cascade instead of whole-series windows:

    1. per (series, segment): grid explode + left anti-flag join + a
       running present count — window partitions of at most
       segment/interval rows;
    2. per series over SEGMENTS: cumulative present-count carry-in (one
       row per series-segment — the summary table);
    3. ``_run`` = carry + within-segment count reproduces the global
       running count exactly, so runs are keyed identically;
    4. per series over GAPS: runs collapse to ONE ROW each via a hash
       aggregate (min bucket = run start, count = ``gap_len``), and
       ``gap_id`` is a row_number over that per-gap summary — the only
       per-series window left, sized by the number of OUTAGES, not
       buckets;
    5. ``gap_pos`` is pure arithmetic: a run is consecutive by
       construction, so position = (bucket - run_start)/interval + 1 —
       no per-run window at all (the global variant's row_number over a
       run would put a months-long outage in one task).
    """
    seg_s = _interval_seconds(segment)
    i_s = _interval_seconds(interval)
    _require_divides(interval, segment)

    r = rollup_df.select("series_key", "bucket_ts")
    bounds = _aligned_bounds(r, interval)
    seg_grid = bounds.select(
        "series_key", "_lo", "_hi",
        F.explode_outer(F.sequence(
            _epoch_floor(F.col("_lo"), seg_s),
            _epoch_floor(F.col("_hi"), seg_s),
            F.expr(f"interval {segment}"))).alias("_seg"))
    buckets = seg_grid.select(
        "series_key", "_seg",
        F.explode_outer(F.expr(
            f"sequence(greatest(_seg, _lo), "
            f"least(_seg + interval {segment} - interval {interval}, _hi), "
            f"interval {interval})")).alias("bucket_ts"))

    present = rollup_df.select(
        "series_key", "bucket_ts", F.lit(True).alias("_p"))
    j = buckets.join(present, ["series_key", "bucket_ts"], "left")

    # 1. Within-segment running present count (bounded partitions).
    in_seg = (Window.partitionBy("series_key", "_seg").orderBy("bucket_ts")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    j = j.withColumn("_rin", F.count("_p").over(in_seg))

    # 2. Carry-in: present buckets in all EARLIER segments (summary rows).
    seg_sum = (j.groupBy("series_key", "_seg")
               .agg(F.count("_p").alias("_pc")))
    carry_w = (Window.partitionBy("series_key").orderBy("_seg")
               .rowsBetween(Window.unboundedPreceding, -1))
    seg_sum = seg_sum.withColumn(
        "_carry", F.coalesce(F.sum("_pc").over(carry_w), F.lit(0)))

    # 3. Global-equivalent run key; keep only absent buckets.
    absent = (j.join(seg_sum.select("series_key", "_seg", "_carry"),
                     ["series_key", "_seg"])
              .where(F.col("_p").isNull())
              .select("series_key", "bucket_ts",
                      (F.col("_carry") + F.col("_rin")).alias("_run")))

    # 4. One row per gap (hash aggregate — hot runs collapse map-side),
    #    then the only per-series window runs over gap summaries.
    runs = (absent.groupBy("series_key", "_run")
            .agg(F.min("bucket_ts").alias("_t0"),
                 F.count(F.lit(1)).alias("gap_len")))
    gap_w = Window.partitionBy("series_key").orderBy("_t0")
    runs = runs.withColumn("gap_id", F.row_number().over(gap_w))

    # 5. Join back; position inside the (consecutive) run is arithmetic.
    return (absent.join(runs, ["series_key", "_run"])
            .select(
                "series_key", "bucket_ts", "gap_id",
                ((F.unix_timestamp("bucket_ts")
                  - F.unix_timestamp("_t0")) / F.lit(i_s) + 1)
                .cast("int").alias("gap_pos"),
                "gap_len"))
