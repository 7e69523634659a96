"""As-of join — the time-series join Spark lacks as a builtin.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row at-or-before its timestamp within the same key (optionally
bounded by a tolerance) — TimescaleDB/kdb/pandas ``merge_asof`` semantics.

Construction is the union-and-carry plan, not a range join:

1. union the two inputs with a source tag (right rows sort *before* left
   rows at equal timestamps, so ties match, like ``ASOF JOIN ... ON
   r.ts <= l.ts``);
2. one window per key ordered by (ts, tag) carrying the last right-side
   payload forward;
3. keep only left rows.

Cost: one shuffle on the key + a linear window pass — versus a range join,
which Spark would plan as a broadcast-nested-loop or an inequality
sort-merge that re-scans right candidates per left row. The same carry
trick underlies the gap-fill operators; at warehouse scale the window
partitions bound by (key, segment) the same way (see
``gapfill.gapfill_locf_partitioned``) if single keys outgrow a partition.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _epoch_floor,
    _interval_seconds,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "series_key",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[str] = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns ``{prefix}<value_col>`` from the
    matching right row in the same key (ties match), plus ``{prefix}ts``;
    nulls when no right row qualifies. ``direction``: ``"backward"`` —
    latest right row with ``right.ts <= left.ts`` (the default, kdb/
    pandas ``merge_asof`` semantics); ``"forward"`` — earliest right row
    with ``right.ts >= left.ts`` (the same carry scanned in descending
    time); ``"nearest"`` — whichever of the two is closer, ties to
    backward. ``tolerance`` (e.g. ``"15 minutes"``) nulls matches farther
    than that from ``left.ts`` on the matching side. Left schema passes
    through unchanged.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in (key_col, right_ts)]

    # The right payload rides as ONE struct so the carry picks a whole
    # right row atomically — per-column last(ignorenulls) would pair
    # column values from DIFFERENT right rows whenever a right value is
    # null (a frankenrow), and stale columns could outlive the tolerance.
    r_struct = F.struct(F.col(right_ts).alias("_rt"),
                        *[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right.select(r_struct).schema[0].dataType)
        .alias("_r"))
    r_tag = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"))

    # Right rows order before left rows at equal _t (tag 0 < 1): ties match.
    # Orderable value columns complete the total order so duplicate right
    # (key, ts) rows resolve deterministically (largest payload wins) —
    # resume replays must re-produce identical rows for lineage checksums.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    tiebreak = [F.col("_r")[c] for c in value_cols
                if _orderable(right.schema[c].dataType)]
    # Backward scans time ascending; forward scans descending (the carry
    # then holds the EARLIEST right row at-or-after). Both order right
    # rows (tag 0) before left at equal _t so ties match, and both leave
    # the largest duplicate-right payload last in scan order.
    w_back = (Window.partitionBy("_k")
              .orderBy("_t", "_is_left", *tiebreak)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy("_k")
             .orderBy(F.col("_t").desc(), "_is_left", *tiebreak)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned = l_tag.unionByName(r_tag)
    carry_cols = ["_is_left", "_l", "_t"]
    if direction in ("backward", "nearest"):
        carry_cols.append(
            F.last("_r", ignorenulls=True).over(w_back).alias("_mb"))
    if direction in ("forward", "nearest"):
        carry_cols.append(
            F.last("_r", ignorenulls=True).over(w_fwd).alias("_mf"))
    carried = unioned.select(*carry_cols)

    def _tol_ok(m, side: str):
        if not tolerance:
            return m.isNotNull()
        t_us = F.unix_micros(F.col("_t").cast("timestamp"))
        dist = F.abs(F.unix_micros(m["_rt"].cast("timestamp")) - t_us)
        # Interval arithmetic is calendar-aware, so the bound in micros is
        # side-specific: backward measures [t - tolerance, t], forward
        # [t, t + tolerance] — they differ for month-length tolerances.
        if side == "backward":
            bound = t_us - F.unix_micros(
                (F.col("_t") - F.expr(f"interval {tolerance}"))
                .cast("timestamp"))
        else:
            bound = F.unix_micros(
                (F.col("_t") + F.expr(f"interval {tolerance}"))
                .cast("timestamp")) - t_us
        return m.isNotNull() & (dist <= bound)

    if direction == "backward":
        match = F.when(_tol_ok(F.col("_mb"), "backward"), F.col("_mb"))
    elif direction == "forward":
        match = F.when(_tol_ok(F.col("_mf"), "forward"), F.col("_mf"))
    else:
        b = F.when(_tol_ok(F.col("_mb"), "backward"), F.col("_mb"))
        f = F.when(_tol_ok(F.col("_mf"), "forward"), F.col("_mf"))
        t = F.unix_micros(F.col("_t").cast("timestamp"))
        db = t - F.unix_micros(b["_rt"].cast("timestamp"))
        df_ = F.unix_micros(f["_rt"].cast("timestamp")) - t
        # Ties (db == df_) go backward, matching pandas merge_asof.
        match = (F.when(b.isNotNull() & (f.isNull() | (db <= df_)), b)
                 .otherwise(f))

    carried = carried.withColumn("_m", match)
    m_ts = F.col("_m")["_rt"]
    keep = F.col("_m").isNotNull()
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.when(keep, m_ts).alias(f"{prefix}ts"))
    out_cols.extend(F.when(keep, F.col("_m")[c]).alias(f"{prefix}{c}")
                    for c in value_cols)
    return carried.where(F.col("_is_left") == 1).select(*out_cols)


def interval_join(events: DataFrame, intervals: DataFrame, *,
                  ts_col: str = "ts", start_col: str = "start_ts",
                  end_col: str = "end_ts",
                  on: Sequence[str] = ("series_key",),
                  bucket: str = "1 day", how: str = "inner",
                  max_span_buckets: int = 4000,
                  on_null_bounds: str = "drop") -> DataFrame:
    """Point-in-interval join: each event row pairs with every interval
    row (same ``on`` keys) whose ``[start, end]`` range contains its
    timestamp (inclusive both ends). ``how``: 'inner' or 'left' (left
    keeps unmatched events with null interval columns).

    Plain Spark would plan the pure range predicate as a nested-loop /
    broadcast-nested-loop join — O(events x intervals) per key at
    corpus scale. This operator makes it an EQUI-join: every interval
    explodes into the epoch-aligned ``bucket`` grid cells it covers
    (cells per interval = span/bucket, guarded by
    ``max_span_buckets``), events bucket map-only, and the join keys
    become (on..., bucket) with the range check as a post-filter. An
    event matches at most one exploded copy of any interval (its own
    bucket), so no dedup pass is needed. Choose ``bucket`` near the
    typical interval length: cost is events + intervals x span/bucket
    rows through one shuffle.

    Intervals with a NULL ``start``/``end`` bound cannot satisfy the
    range predicate, so they match nothing — the exact semantics a SQL
    range join would give (and what Catalyst's IsNotNull constraint
    propagation enforces below the explode regardless of what we emit).
    ``on_null_bounds`` picks the policy: ``'drop'`` (default) skips
    those interval rows, documented here; ``'error'`` validates the
    intervals EAGERLY (one small driver-side action over the intervals
    frame — a lazy ``raise_error`` would be optimized away by the same
    constraint propagation) and raises naming the null bounds.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if on_null_bounds not in ("error", "drop"):
        raise ValueError(f"on_null_bounds must be 'error' or 'drop', "
                         f"got {on_null_bounds!r}")
    overlap = (set(events.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename before joining")
    bsec = _interval_seconds(bucket)
    start, end = F.col(start_col), F.col(end_col)
    null_bounds = start.isNull() | end.isNull()
    if on_null_bounds == "error":
        n_null = intervals.where(null_bounds).count()
        if n_null:
            raise ValueError(
                f"interval_join: {n_null} interval row(s) have a NULL "
                f"{start_col}/{end_col} bound — they can match no "
                f"event; pass on_null_bounds='drop' to skip them")
    else:
        intervals = intervals.where(~null_bounds)
    span_ok = ((end >= start)
               & ((F.unix_micros(end.cast("timestamp"))
                   - F.unix_micros(start.cast("timestamp")))
                  / 1_000_000 / bsec < max_span_buckets))
    grid = F.when(span_ok, F.sequence(
        _epoch_floor(start, bsec), _epoch_floor(end, bsec),
        F.expr(f"INTERVAL {bsec} SECONDS"))) \
        .otherwise(F.raise_error(F.lit(
            f"interval_join: interval empty or wider than "
            f"{max_span_buckets} x {bucket}")))
    iv = intervals.withColumn("_ib", F.explode(grid))
    ev = events.withColumn("_ib", _epoch_floor(F.col(ts_col), bsec))
    cond = [ev[k] == iv[k] for k in on] + [ev["_ib"] == iv["_ib"]] + [
        ev[ts_col] >= iv[start_col], ev[ts_col] <= iv[end_col]]
    joined = ev.join(iv, cond, how)
    out = [ev[c] for c in events.columns] + [
        iv[c] for c in intervals.columns if c not in on]
    return joined.select(*out)
