"""Out-of-order ingest reconciliation: last-writer-wins upsert dedup.

Real collectors redeliver (at-least-once transports), correct
(late republish of a fixed value), and interleave shards out of order.
A time-series store must reduce that multiset to ONE value per
(series, ts) before any tier sees it — InfluxDB and QuestDB do this as
last-write-wins on ingest; Iceberg pipelines do it as a MERGE keyed on
the natural key. This operator is the batch/streaming-mergeable form:

    winner(series, ts) = argmax over versions of
                         (ingest_ts, ingest_seq, value)

expressed as ONE ``max(struct(...))`` hash aggregate — associative and
commutative, so it combines map-side, merges across incremental
partitions exactly (re-running over old + new versions can only keep
or improve the winner), and drops into the streaming tier machinery
unchanged. The ``value`` tail of the struct makes the order TOTAL even
when a transport redelivers two different payloads with identical
(ingest_ts, seq) — the dedup is then deterministic rather than
arrival-order-dependent, which is what makes the result reproducible
across partitionings and retries.

Scale shape: one shuffle on (series, ts) — the same key the 1m rollup
shuffles on, so at 100 TB the dedup rides the shuffle the first tier
already pays; no windows, no Python, no skew beyond what the tier
itself has (a hot series is salted by the rollup layer's existing
machinery).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def dedup_ingest_lww(
    raw: DataFrame,
    *,
    key_cols: Sequence[str] = ("series_key", "ts"),
    ingest_ts_col: str = "ingest_ts",
    ingest_seq_col: str = "ingest_seq",
    value_col: str = "value_double",
) -> DataFrame:
    """Reduce an at-least-once ingest multiset to one row per key.

    Output: ``key_cols`` + (``value_col``, ``ingest_ts_col``,
    ``ingest_seq_col`` of the winning version) + ``n_versions`` (the
    redelivery count — the operational metric that tells you a shard
    is replaying). Winner = lexicographic max of
    (ingest_ts, ingest_seq, value); NULL values sort first in the
    struct max, so a real payload always beats a NULL redelivery at
    the same (ingest_ts, seq).
    """
    ks = list(key_cols)
    if not ks:
        raise ValueError("key_cols must be non-empty")
    w = F.max(F.struct(
        F.col(ingest_ts_col).alias("it"),
        F.col(ingest_seq_col).alias("sq"),
        F.col(value_col).alias("v"))).alias("_w")
    return (raw.groupBy(*ks)
            .agg(w, F.count(F.lit(1)).alias("n_versions"))
            .select(*ks,
                    F.col("_w.v").alias(value_col),
                    F.col("_w.it").alias(ingest_ts_col),
                    F.col("_w.sq").alias(ingest_seq_col),
                    "n_versions"))


def lww_oracle_sql(versions_sql: str, *,
                   key_cols: Sequence[str] = ("series_key", "ts"),
                   value_col: str = "value_double") -> str:
    """DuckDB replay of :func:`dedup_ingest_lww`: the identical total
    order as an ORDER BY over the version rows produced by
    ``versions_sql`` (columns: key_cols, value, ingest_ts,
    ingest_seq)."""
    ks = ", ".join(key_cols)
    return f"""
SELECT {ks},
       first({value_col} ORDER BY ingest_ts DESC, ingest_seq DESC,
             {value_col} DESC) AS {value_col},
       first(ingest_ts ORDER BY ingest_ts DESC, ingest_seq DESC,
             {value_col} DESC) AS ingest_ts,
       first(ingest_seq ORDER BY ingest_ts DESC, ingest_seq DESC,
             {value_col} DESC) AS ingest_seq,
       count(*) AS n_versions
FROM ({versions_sql})
GROUP BY {ks}
"""
