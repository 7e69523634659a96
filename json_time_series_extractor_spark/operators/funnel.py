"""Ordered multi-step funnel analysis over an event stream.

The classic product-analytics question — "of the users who did A, how
many went on to do B, then C, within T of starting?" — as a
deterministic per-user operator. Semantics are the standard
*first-conversion* funnel:

- ``t1`` = the user's earliest step-1 event;
- ``t_i`` (i >= 2) = the earliest step-i event STRICTLY after
  ``t_(i-1)`` (an exact-timestamp tie does not advance the funnel —
  documented, deterministic);
- with a ``horizon``, every later step must also land within
  ``t1 + horizon`` (anchored at the funnel START, the common product
  definition);
- a missing step leaves that and all later timestamps NULL.

Spark construction: NO per-user sort and no window over raw events —
step 1 is one hash aggregate, each later step is one filtered hash
aggregate joined by user to the previous step's frame (min over a
``ts > prev`` predicate). k steps = k aggregates + (k-1) equi-joins on
``user_id``, every frame after the first bounded by the converting-user
count (monotonically shrinking); at warehouse scale the joins
co-partition on the same user key the sessionizer uses. Everything is
exact timestamp arithmetic — trivially SQL-replayable
(:func:`funnel_oracle_sql`).

Reference anchor: consumes the same extracted event stream the
reference's samples feed (TimeSeriesExtractor.cs); the funnel is the
user-journey analog of the engine's sessionization operator
(``operators/sessions.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _interval_seconds,
)


def funnel_steps(events: DataFrame, steps: Sequence[str], *,
                 horizon: Optional[str] = None,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Per-user first-conversion funnel over ``steps`` (event-type
    values, in order). Output: one row per user who performed step 1 —
    ``(user_id, t1, ..., tk, steps_completed)``.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    horizon_s = _interval_seconds(horizon) if horizon else None
    ev = events.select(F.col(user_col).alias("user_id"),
                       F.col(ts_col).alias("ts"),
                       F.col(type_col).alias("etype"))
    cur = (ev.where(F.col("etype") == steps[0])
           .groupBy("user_id").agg(F.min("ts").alias("t1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("etype") == step) \
            .select("user_id", F.col("ts").alias("_ts"))
        cond = F.col("_ts") > F.col(f"t{i - 1}")
        if horizon_s is not None:
            cond = cond & (F.col("_ts") <= F.col("t1")
                           + F.expr(f"INTERVAL {horizon_s} SECOND"))
        carried = [f"t{j}" for j in range(1, i)]
        cur = (cur.join(nxt, "user_id", "left")
               .groupBy("user_id", *carried)
               .agg(F.min(F.when(cond, F.col("_ts"))).alias(f"t{i}")))
        # a user stalled at step i-1 keeps NULLs for every later step:
        # min(NULL when) is NULL, and the next cond propagates it.
    done = sum(F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
               for i in range(1, len(steps) + 1))
    return cur.select("user_id", *[f"t{i}" for i in
                                   range(1, len(steps) + 1)],
                      done.cast("int").alias("steps_completed"))


def funnel_oracle_sql(table: str, steps: Sequence[str], *,
                      horizon: Optional[str] = None,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> str:
    """DuckDB ground truth: the same chained-min construction as
    chained CTEs. Kept beside the impl."""
    horizon_s = _interval_seconds(horizon) if horizon else None

    def esc(s: str) -> str:
        return s.replace("'", "''")

    parts = [f"""
s1 AS (
    SELECT {user_col} AS user_id, min({ts_col}) AS t1
    FROM {table} WHERE {type_col} = '{esc(steps[0])}'
    GROUP BY 1)"""]
    for i, step in enumerate(steps[1:], start=2):
        carried = ", ".join(f"t{j}" for j in range(1, i))
        within = (f" AND e.{ts_col} <= p.t1 + INTERVAL {horizon_s} SECOND"
                  if horizon_s is not None else "")
        parts.append(f"""
s{i} AS (
    SELECT p.user_id, {carried},
           min(CASE WHEN e.{ts_col} > p.t{i - 1}{within}
                    THEN e.{ts_col} END) AS t{i}
    FROM s{i - 1} p
    LEFT JOIN {table} e
      ON e.{user_col} = p.user_id AND e.{type_col} = '{esc(step)}'
    GROUP BY ALL)""")
    ts_cols = ", ".join(f"t{i}" for i in range(1, len(steps) + 1))
    done = " + ".join(
        f"(CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(1, len(steps) + 1))
    return f"""
WITH {",".join(parts)}
SELECT user_id, {ts_cols}, CAST({done} AS INTEGER) AS steps_completed
FROM s{len(steps)}
"""


def cohort_retention(events: DataFrame, period: str = "1 week", *,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Exact cohort-retention matrix: users cohorted by the period of
    their FIRST event; ``active_users`` = how many of a cohort were
    active ``period_offset`` periods later (the exact ground-truth
    sibling of the KMV-sketch retention tier, ``kmv_retention``).

    Periods are epoch-aligned fixed-length buckets (``_epoch_floor``),
    NOT ``date_trunc('week')`` — ISO-week conventions differ across
    engines (the rollup_calendar_cascade lesson), epoch arithmetic does
    not. ``retention_fp6`` is the exact integer division
    ``active * 1e6 DIV cohort_users`` (no float ratio to drift).

    Plan shape: one hash aggregate on user (firsts), one distinct on
    (user, period) — both map-side combinable — one user-keyed
    equi-join (co-partitioned with the firsts aggregate), one small
    hash aggregate on (cohort, offset), and a broadcast join of the
    cohort sizes. Output rows = cohorts × offsets (tiny at any scale).

    Output: (cohort_ts, period_offset, active_users, cohort_users,
    retention_fp6), offset 0 always present with active == cohort size.
    """
    from json_time_series_extractor_spark.operators.gapfill import (
        _epoch_floor,
    )

    p_s = _interval_seconds(period)
    ev = events.select(F.col(user_col).alias("user_id"),
                       F.col(ts_col).alias("ts"))
    firsts = (ev.groupBy("user_id")
              .agg(_epoch_floor(F.min("ts"), p_s).alias("cohort_ts")))
    activity = (ev.select("user_id",
                          _epoch_floor(F.col("ts"), p_s).alias("p"))
                .distinct())
    j = activity.join(firsts, "user_id")
    offset = ((F.unix_timestamp("p")
               - F.unix_timestamp("cohort_ts")) / p_s).cast("int")
    per = (j.groupBy("cohort_ts", offset.alias("period_offset"))
           .agg(F.count(F.lit(1)).alias("active_users")))
    sizes = (firsts.groupBy("cohort_ts")
             .agg(F.count(F.lit(1)).alias("cohort_users")))
    out = per.join(F.broadcast(sizes), "cohort_ts")
    return out.select(
        "cohort_ts", "period_offset", "active_users", "cohort_users",
        F.expr("active_users * 1000000 DIV cohort_users")
        .alias("retention_fp6"))


def cohort_retention_oracle_sql(table: str, period_s: int, *,
                                user_col: str = "user_id",
                                ts_col: str = "ts") -> str:
    """DuckDB ground truth: the same epoch-floor cohorting, distinct
    activity periods, and exact integer retention ratio."""
    def floor_expr(col: str) -> str:
        return (f"to_timestamp(CAST(floor(epoch({col}) / {period_s}) "
                f"AS BIGINT) * {period_s})::TIMESTAMP")

    return f"""
WITH firsts AS (
    SELECT {user_col} AS user_id,
           {floor_expr(f"min({ts_col})")} AS cohort_ts
    FROM {table} GROUP BY 1),
activity AS (
    SELECT DISTINCT {user_col} AS user_id,
           {floor_expr(ts_col)} AS p
    FROM {table}),
j AS (
    SELECT f.cohort_ts,
           CAST((epoch(a.p) - epoch(f.cohort_ts)) / {period_s} AS INTEGER)
               AS period_offset
    FROM activity a JOIN firsts f USING (user_id)),
per AS (
    SELECT cohort_ts, period_offset, count(*) AS active_users
    FROM j GROUP BY 1, 2),
sizes AS (
    SELECT cohort_ts, count(*) AS cohort_users FROM firsts GROUP BY 1)
SELECT p.cohort_ts, p.period_offset,
       CAST(p.active_users AS BIGINT) AS active_users,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       CAST(p.active_users * 1000000 // s.cohort_users AS BIGINT)
           AS retention_fp6
FROM per p JOIN sizes s USING (cohort_ts)
"""
