"""Sessionization: split per-user event streams on inactivity gaps.

The classic web-analytics operator over the events table: a session is a
maximal run of a user's events where consecutive gaps stay under the
timeout. Pure window algebra:

1. per user ordered by (ts, event_id): ``is_new_session`` = first event
   or gap > timeout (lag);
2. session index = running sum of the boundary flags (each user's
   sessions number 1..n in time order);
3. per (user, session): start/end/duration/count aggregates.

Scale note: the window partitions by user — per-user event counts are
human-bounded (the same argument as per-series gap-fill), so no segment
decomposition is needed; the session aggregate is a plain hash agg on
(user, session_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _interval_seconds,
)


def sessionize(events: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    duration_s) per inactivity-gap session. A gap strictly greater than
    ``gap`` starts a new session; ``id_col`` breaks timestamp ties so
    replays label identically."""
    gap_us = _interval_seconds(gap) * 1_000_000

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(prev_us.isNull()
                         | (ts_us - prev_us > gap_us), 1).otherwise(0)
    run = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.sum(new_session).over(run).alias("session_idx"))
    return (marked.groupBy("user_id", "session_idx")
            .agg(F.min("_ts").alias("session_start"),
                 F.max("_ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 ((F.unix_micros(F.max("_ts").cast("timestamp"))
                   - F.unix_micros(F.min("_ts").cast("timestamp")))
                  / F.lit(1_000_000.0)).alias("duration_s")))
