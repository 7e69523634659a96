"""Custom stateful streaming operator: incremental per-series LOCF.

The batch gap-fill (``operators.gapfill``) rebuilds the dense grid from
scratch; in streaming, the grid must extend incrementally as samples
arrive, carrying the last observed value per series across micro-batches.
Spark has no built-in operator for this, so it is expressed with
``applyInPandasWithState`` (GroupState, one state row per series):

- **state** = (last emitted bucket epoch-seconds, last observed value);
- per micro-batch, for each series: sort the new buckets, emit every grid
  bucket from the last state bucket forward, LOCF-filling holes *between*
  micro-batches as well as within one;
- state is updated, never timed out (a production deployment would set a
  TTL tied to the retention horizon so dead series do not accrete state).

The groupBy key is ``series_key``, so state is hash-partitioned exactly
like the rollup shuffle — one extra state store per executor, no driver
involvement, scales with the series cardinality not the row count.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _gather(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    """Concatenate a group's micro-batch frames; empty frame if none.

    With a GroupStateTimeout configured, Spark invokes the update
    function for timed-out keys with NO data — ``rows.iloc[0]`` on the
    param columns would raise IndexError. Callers must early-return on
    ``rows.empty`` before touching any column."""
    pdf_list = [p for p in pdfs if len(p)]
    if not pdf_list:
        return pd.DataFrame()
    return pd.concat(pdf_list, ignore_index=True)


#: Output schema of the stateful LOCF operator.
LOCF_STATE_SCHEMA = "series_key string, bucket_ts timestamp, value double, filled boolean"
#: State: last emitted bucket (epoch seconds) + last observed value.
STATE_SCHEMA = "last_bucket long, last_value double"


def _locf_update(key: Tuple[str],
                 pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    import numpy as np

    rows = _gather(pdfs)
    if rows.empty:  # timeout tick or all-empty batch: state untouched
        yield pd.DataFrame({
            "series_key": pd.Series([], dtype="object"),
            "bucket_ts": pd.Series([], dtype="datetime64[ns]"),
            "value": pd.Series([], dtype="float64"),
            "filled": pd.Series([], dtype="bool"),
        })
        return
    interval = int(rows["interval_s"].iloc[0])
    # Incoming buckets for this series, deduplicated and ordered.
    incoming = (rows[["bucket_s", "value"]]
                .dropna(subset=["bucket_s"])
                .sort_values("bucket_s")
                .groupby("bucket_s", as_index=False).last())

    if state.exists:
        last_bucket, last_value = state.get
    else:
        last_bucket, last_value = None, None

    # Late/replayed buckets (<= the last emitted bucket) are dropped: the
    # append-mode output cannot be retracted, and accepting them would
    # regress the carry state. Upstream should be a watermarked append-mode
    # rollup (each window emitted once, closed); anything later than the
    # watermark is dead-lettered here by design.
    if last_bucket is not None:
        incoming = incoming[incoming["bucket_s"] > last_bucket]
    if incoming.empty:
        # Nothing new (all late, or all-null buckets): leave state as-is.
        yield pd.DataFrame({
            "series_key": pd.Series([], dtype="object"),
            "bucket_ts": pd.Series([], dtype="datetime64[ns]"),
            "value": pd.Series([], dtype="float64"),
            "filled": pd.Series([], dtype="bool"),
        })
        return

    out_bucket: list = []
    out_value: list = []
    out_filled: list = []
    for bucket_s, value in incoming.itertuples(index=False, name=None):
        bucket_s = int(bucket_s)
        if last_bucket is not None:
            # LOCF-fill the hole since the previously emitted bucket.
            for hole in range(int(last_bucket) + interval, bucket_s,
                              interval):
                out_bucket.append(hole)
                out_value.append(last_value)
                out_filled.append(True)
        if not (isinstance(value, float) and np.isnan(value)):
            last_value = float(value)
        out_bucket.append(bucket_s)
        out_value.append(last_value)
        out_filled.append(False)
        last_bucket = bucket_s

    state.update((int(last_bucket), float(last_value)
                  if last_value is not None else None))
    yield pd.DataFrame({
        "series_key": pd.Series([key[0]] * len(out_bucket), dtype="object"),
        "bucket_ts": pd.Series(
            pd.to_datetime(pd.Series(out_bucket, dtype="int64"), unit="s")),
        "value": pd.Series(out_value, dtype="float64"),
        "filled": pd.Series(out_filled, dtype="bool"),
    })


#: Output schema of the stateful counter-increase operator.
RATE_STATE_OUT_SCHEMA = ("series_key string, bucket_ts timestamp, "
                         "increase double, n_samples long")
#: State: last sample (ts micros, value) + the still-open bucket's partial.
RATE_STATE_SCHEMA = ("last_ts_us long, last_value double, "
                     "open_bucket long, open_inc double, open_n long")


def _rate_update(key: Tuple[str],
                 pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    rows = _gather(pdfs)
    if rows.empty:  # timeout tick or all-empty batch: state untouched
        yield pd.DataFrame({
            "series_key": pd.Series([], dtype="object"),
            "bucket_ts": pd.Series([], dtype="datetime64[ns]"),
            "increase": pd.Series([], dtype="float64"),
            "n_samples": pd.Series([], dtype="int64"),
        })
        return
    tier = int(rows["tier_s"].iloc[0])
    incoming = (rows[["ts_us", "value"]]
                .dropna()
                .sort_values(["ts_us", "value"]))

    if state.exists:
        last_ts_us, last_value, open_bucket, open_inc, open_n = state.get
    else:
        last_ts_us = last_value = open_bucket = None
        open_inc, open_n = 0.0, 0

    out_bucket: list = []
    out_inc: list = []
    out_n: list = []
    for ts_us, value in incoming.itertuples(index=False, name=None):
        ts_us, value = int(ts_us), float(value)
        # Late/replayed samples are dead-lettered (append-mode output
        # cannot retract a closed bucket, and regressing the baseline
        # would corrupt later deltas; watermark upstream). "Late" follows
        # the batch operator's (ts, value) total order: equal-ts samples
        # with value >= the last (including exact duplicates, which the
        # batch lag window also counts with delta 0) are processed —
        # batch and streaming agree on duplicate scrape timestamps.
        if last_ts_us is not None and (
                ts_us < last_ts_us
                or (ts_us == last_ts_us and value < last_value)):
            continue
        bucket = (ts_us // 1_000_000) // tier * tier
        if open_bucket is not None and bucket > open_bucket:
            out_bucket.append(open_bucket)
            out_inc.append(open_inc)
            out_n.append(open_n)
            open_inc, open_n = 0.0, 0
        open_bucket = bucket if open_bucket is None else max(open_bucket,
                                                             bucket)
        if last_value is None:
            contrib = 0.0          # first sample of the series: no baseline
        else:
            delta = value - last_value
            contrib = delta if delta >= 0 else value  # reset -> restart
        open_inc += contrib
        open_n += 1
        last_ts_us, last_value = ts_us, value

    if open_bucket is not None:
        state.update((last_ts_us, last_value, int(open_bucket),
                      float(open_inc), int(open_n)))
    yield pd.DataFrame({
        "series_key": pd.Series([key[0]] * len(out_bucket), dtype="object"),
        "bucket_ts": pd.Series(
            pd.to_datetime(pd.Series(out_bucket, dtype="int64"), unit="s")),
        "increase": pd.Series(out_inc, dtype="float64"),
        "n_samples": pd.Series(out_n, dtype="int64"),
    })


def stateful_counter_increase(sample_stream: DataFrame,
                              tier_seconds: int = 3600,
                              value_col: str = "value_double") -> DataFrame:
    """Streaming reset-aware counter increase (see ``operators.rate`` for
    the batch semantics): per series, per tier bucket, the sum of
    non-negative deltas with resets contributing the post-reset value.

    The cross-batch lag (each batch's first delta needs the previous
    batch's last value) and the open bucket's partial sum are the state;
    a bucket's row is emitted exactly once, when a later sample closes it
    (append mode — late samples are dead-lettered like
    :func:`stateful_locf`). The groupBy key is ``series_key``, so state
    partitions like every other per-series operator here.
    """
    from pyspark.sql import functions as F

    tz = sample_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"stateful_counter_increase requires "
            f"spark.sql.session.timeZone=UTC (got {tz!r})")

    prepared = sample_stream.select(
        "series_key",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(int(tier_seconds)).alias("tier_s"))
    return (prepared
            .groupBy("series_key")
            .applyInPandasWithState(
                _rate_update,
                outputStructType=RATE_STATE_OUT_SCHEMA,
                stateStructType=RATE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


#: Output schema of the stateful sessionizer.
SESSION_OUT_SCHEMA = ("user_id long, session_idx long, "
                      "session_start timestamp, session_end timestamp, "
                      "n_events long, duration_s double")
#: State: open session (start/last micros, count) + the session counter.
SESSION_STATE_SCHEMA = ("start_us long, last_us long, n long, "
                        "session_idx long")


def _session_update(key: Tuple[int],
                    pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    rows = _gather(pdfs)
    if rows.empty:  # timeout tick or all-empty batch: state untouched
        yield pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "session_idx": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="datetime64[ns]"),
            "session_end": pd.Series([], dtype="datetime64[ns]"),
            "n_events": pd.Series([], dtype="int64"),
            "duration_s": pd.Series([], dtype="float64"),
        })
        return
    gap_us = int(rows["gap_us"].iloc[0])
    # dropna on ts only: event_id is merely the ordering tie-breaker, and
    # batch sessionize counts null-id events too.
    incoming = (rows[["ts_us", "event_id"]]
                .dropna(subset=["ts_us"])
                .sort_values(["ts_us", "event_id"]))

    if state.exists:
        start_us, last_us, n, session_idx = state.get
    else:
        start_us = last_us = None
        n, session_idx = 0, 0

    closed: list = []
    for ts_us, _eid in incoming.itertuples(index=False, name=None):
        ts_us = int(ts_us)
        if last_us is not None and ts_us < last_us:
            continue  # late event: the session it belonged to is closed
        if last_us is not None and ts_us - last_us > gap_us:
            closed.append((session_idx, start_us, last_us, n))
            start_us, n = ts_us, 0
            session_idx += 1
        if start_us is None:
            start_us, session_idx = ts_us, 1
        n += 1
        last_us = ts_us

    if start_us is not None:
        state.update((int(start_us), int(last_us), int(n),
                      int(session_idx)))
    yield pd.DataFrame({
        "user_id": pd.Series([key[0]] * len(closed), dtype="int64"),
        "session_idx": pd.Series([c[0] for c in closed], dtype="int64"),
        "session_start": pd.to_datetime(
            pd.Series([c[1] for c in closed], dtype="int64"), unit="us"),
        "session_end": pd.to_datetime(
            pd.Series([c[2] for c in closed], dtype="int64"), unit="us"),
        "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
        "duration_s": pd.Series(
            [(c[2] - c[1]) / 1_000_000.0 for c in closed],
            dtype="float64"),
    })


def stateful_sessionize(event_stream: DataFrame,
                        gap_seconds: int = 1800) -> DataFrame:
    """Streaming inactivity-gap sessionization (see ``operators.sessions``
    for the batch semantics): the open session per user lives in state
    across micro-batches and a session row is emitted exactly once, when
    a later event closes it (append mode; events older than the open
    session's last timestamp are dead-lettered like the other stateful
    operators). Input: (user_id, ts, event_id)."""
    from pyspark.sql import functions as F

    tz = event_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"stateful_sessionize requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r})")

    prepared = event_stream.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(int(gap_seconds) * 1_000_000).alias("gap_us"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_update,
                outputStructType=SESSION_OUT_SCHEMA,
                stateStructType=SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stateful_locf(rollup_stream: DataFrame, interval_seconds: int = 60,
                  value_col: str = "mean") -> DataFrame:
    """Streaming LOCF over a (possibly sparse) streaming rollup.

    Input: a streaming DataFrame with (series_key, bucket_ts, <value_col>).
    Output: dense (series_key, bucket_ts, value, filled) — holes between
    observed buckets are emitted with the carried-forward value, including
    holes that span micro-batch boundaries (that cross-batch carry is the
    state).
    """
    from pyspark.sql import functions as F

    # The state kernel round-trips epoch seconds through naive pandas
    # datetimes, which is only identity when the session renders
    # timestamps in UTC (plans.session.get_spark pins this).
    tz = rollup_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"stateful_locf requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): bucket timestamps would shift by the UTC "
            "offset across the Arrow boundary")

    prepared = rollup_stream.select(
        "series_key",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(int(interval_seconds)).alias("interval_s"))
    return (prepared
            .groupBy("series_key")
            .applyInPandasWithState(
                _locf_update,
                outputStructType=LOCF_STATE_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

#: Output schema of the stateful KMV sketch tier.
KMV_OUT_SCHEMA = "series_key string, bucket_ts timestamp, kmv array<long>"
#: State: the open bucket (epoch micros) + its sorted min-k hash array.
KMV_STATE_SCHEMA = "bucket_us long, hashes array<long>"


def _kmv_update(key: Tuple[str],
                pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    from bisect import bisect_left, insort

    rows = _gather(pdfs)
    if rows.empty:  # timeout tick or all-empty batch: state untouched
        yield pd.DataFrame({
            "series_key": pd.Series([], dtype="object"),
            "bucket_ts": pd.Series([], dtype="datetime64[ns]"),
            "kmv": pd.Series([], dtype="object"),
        })
        return
    k = int(rows["k"].iloc[0])
    tier_us = int(rows["tier_s"].iloc[0]) * 1_000_000
    if state.exists:
        bucket_us, hashes = state.get
        hashes = list(hashes)
    else:
        bucket_us, hashes = None, []
    rows = rows.dropna(subset=["ts_us"]).sort_values("ts_us")
    closed = []
    for ts_us, h in zip(rows["ts_us"].astype("int64"),
                        rows["h"].astype("int64")):
        b = int(ts_us) - int(ts_us) % tier_us
        if bucket_us is None:
            bucket_us = b
        elif b > bucket_us:
            closed.append((bucket_us, hashes))
            bucket_us, hashes = b, []
        elif b < bucket_us:
            continue  # dead-letter: bucket already emitted (append mode)
        h = int(h)
        # sorted-distinct insert, capped at the k smallest
        i = bisect_left(hashes, h)
        if i < len(hashes) and hashes[i] == h:
            continue
        if len(hashes) < k:
            insort(hashes, h)
        elif h < hashes[-1]:
            hashes.pop()
            insort(hashes, h)
    state.update((bucket_us, hashes))
    yield pd.DataFrame({
        "series_key": pd.Series([key[0]] * len(closed), dtype="object"),
        "bucket_ts": pd.to_datetime(
            pd.Series([c[0] for c in closed], dtype="int64"), unit="us"),
        "kmv": pd.Series([c[1] for c in closed], dtype="object"),
    })


def stateful_kmv(sample_stream: DataFrame, tier_seconds: int = 3600,
                 k: int = 128, item_col: str = "key") -> DataFrame:
    """Streaming KMV distinct sketch tier (see ``operators.kmv`` for
    the batch semantics and the set-algebra consumers) — the one
    sketch whose streaming build needs CUSTOM ordered state: min-k
    selection is an order statistic, not a commutative built-in
    aggregate the watermarked tiers (HLL/CM/Bloom) get for free, so a
    built-in formulation would carry the full distinct-hash set (exact-
    distinct state, defeating the sketch).

    Item hashes are computed JVM-side with the SAME ``kmv_hash60``
    expression as the batch tier BEFORE the stateful boundary, so
    streamed sketches are definitionally batch sketches; Python only
    maintains the k-smallest-distinct invariant (state per series is
    ONE open bucket + <=k longs). A bucket's sketch is emitted exactly
    once, when a later sample closes it (append mode); samples for
    already-closed buckets are dead-lettered like the other stateful
    operators. Emitted rows feed ``kmv_cascade`` / ``kmv_estimate`` /
    ``kmv_set_ops`` unchanged.
    """
    from pyspark.sql import functions as F

    from json_time_series_extractor_spark.operators.kmv import kmv_hash60

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    tz = sample_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"stateful_kmv requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r})")

    prepared = (sample_stream
                .where(F.col(item_col).isNotNull())
                .select("series_key",
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        .alias("ts_us"),
                        kmv_hash60(F.col(item_col)).alias("h"),
                        F.lit(int(k)).alias("k"),
                        F.lit(int(tier_seconds)).alias("tier_s")))
    return (prepared
            .groupBy("series_key")
            .applyInPandasWithState(
                _kmv_update,
                outputStructType=KMV_OUT_SCHEMA,
                stateStructType=KMV_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
