"""Tiered retention: expire old raw/fine-tier data by partition drop.

TimescaleDB-style retention per tier (e.g. raw 7 days, 1m 90 days, 1h 2
years, 1d forever). The operation is metadata-only where the storage layer
allows it:

- **Iceberg** (real cluster): ``DELETE FROM t WHERE dt < cutoff`` prunes
  whole partitions without rewriting files, followed by
  ``CALL system.expire_snapshots`` to reclaim storage. Gated behind an
  import/catalog check (Iceberg jars are not in this sandbox).
- **Parquet fallback** (this sandbox): the tier table is directory-
  partitioned by day (``dt=YYYY-MM-DD``); retention deletes partition
  directories below the cutoff via the Hadoop FileSystem API — no data
  rewrite, the same O(partitions) cost profile as the Iceberg path.

Retention is lineage-audited: dropped partitions get an ``EXPIRED``
lineage row recording what was removed and when. Resume protection itself
comes from the processing stages' original ``DONE`` rows (which outlive
the data); the EXPIRED rows are the audit trail an operator reads to
distinguish "expired by policy" from "never arrived".
"""

from __future__ import annotations

from datetime import date
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import SparkSession

from json_time_series_extractor_spark.plans.pipeline import LineageStore

#: Default per-tier retention horizon (days); None = keep forever.
DEFAULT_RETENTION_DAYS = {
    "raw": 7,
    "1m": 90,
    "1h": 730,
    "1d": None,
}


def list_day_partitions(spark: SparkSession, path: str,
                        partition_col: str = "dt") -> List[str]:
    """Partition values present under a day-partitioned parquet table."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(f"{partition_col}="):
            out.append(name.split("=", 1)[1])
    return sorted(out)


def expire_partitions(spark: SparkSession, path: str, cutoff: date, *,
                      partition_col: str = "dt",
                      stage: Optional[str] = None,
                      lineage_path: Optional[str] = None,
                      dry_run: bool = False) -> List[str]:
    """Drop all ``dt=<day>`` partition directories strictly older than
    ``cutoff``. Returns the dropped partition values. Metadata/filesystem
    only — no data is rewritten."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)

    dropped: List[str] = []
    for value in list_day_partitions(spark, path, partition_col):
        try:
            day = date.fromisoformat(value)
        except ValueError:
            continue
        if day < cutoff:
            if not dry_run:
                fs.delete(jvm.org.apache.hadoop.fs.Path(
                    path, f"{partition_col}={value}"), True)
            dropped.append(value)

    if dropped and lineage_path and stage and not dry_run:
        LineageStore(spark, lineage_path).append([
            (stage, value, f"retention-{cutoff.isoformat()}",
             0, 0, 0, "EXPIRED")
            for value in dropped])
    return dropped


def apply_tiered_retention(
    spark: SparkSession,
    tier_paths: Sequence[Tuple[str, str]],
    today: date,
    *,
    retention_days: Optional[dict] = None,
    lineage_path: Optional[str] = None,
) -> dict:
    """Apply the per-tier horizon to each (tier_name, path).

    ``today`` is passed in explicitly (never wall-clock) so retention is
    deterministic and replayable.
    """
    from datetime import timedelta

    horizons = dict(DEFAULT_RETENTION_DAYS)
    if retention_days:
        horizons.update(retention_days)

    report = {}
    for tier, path in tier_paths:
        days = horizons.get(tier)
        if days is None:
            report[tier] = []
            continue
        cutoff = today - timedelta(days=days)
        report[tier] = expire_partitions(
            spark, path, cutoff, stage=f"retention_{tier}",
            lineage_path=lineage_path)
    return report
