"""Tiered retention tests (partition-drop semantics, lineage integration)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from json_time_series_extractor_spark.operators.retention import (
    apply_tiered_retention,
    expire_partitions,
    list_day_partitions,
)


def _write_day_partitioned(spark, path, days):
    rows = [(d, float(i)) for i, d in enumerate(days)]
    df = spark.createDataFrame(rows, "dt_str string, v double") \
        .select(F.to_date("dt_str").alias("dt"), "v")
    df.write.mode("overwrite").partitionBy("dt").parquet(path)


def test_expire_partitions_drops_only_older(spark, tmp_path):
    path = str(tmp_path / "tier_raw")
    days = ["2024-02-01", "2024-02-05", "2024-02-10"]
    _write_day_partitioned(spark, path, days)
    assert list_day_partitions(spark, path) == days

    dropped = expire_partitions(spark, path, date(2024, 2, 5))
    assert dropped == ["2024-02-01"]
    assert list_day_partitions(spark, path) == ["2024-02-05", "2024-02-10"]
    # Remaining data still readable with correct values.
    left = spark.read.parquet(path).collect()
    assert sorted(r.v for r in left) == [1.0, 2.0]


def test_expire_dry_run_touches_nothing(spark, tmp_path):
    path = str(tmp_path / "tier")
    _write_day_partitioned(spark, path, ["2024-01-01", "2024-03-01"])
    dropped = expire_partitions(spark, path, date(2024, 2, 1), dry_run=True)
    assert dropped == ["2024-01-01"]
    assert list_day_partitions(spark, path) == ["2024-01-01", "2024-03-01"]


def test_tiered_retention_with_lineage(spark, tmp_path):
    raw = str(tmp_path / "raw")
    t1m = str(tmp_path / "1m")
    lineage = str(tmp_path / "lineage")
    _write_day_partitioned(spark, raw, ["2024-01-01", "2024-02-04"])
    _write_day_partitioned(spark, t1m, ["2023-01-01", "2024-02-04"])

    report = apply_tiered_retention(
        spark, [("raw", raw), ("1m", t1m), ("1d", str(tmp_path / "none"))],
        today=date(2024, 2, 5), lineage_path=lineage)
    assert report["raw"] == ["2024-01-01"]   # 7-day horizon
    assert report["1m"] == ["2023-01-01"]    # 90-day horizon
    assert report["1d"] == []                # keep forever

    lin = spark.read.parquet(lineage).collect()
    assert {(r.stage, r.partition_value, r.status) for r in lin} == {
        ("retention_raw", "2024-01-01", "EXPIRED"),
        ("retention_1m", "2023-01-01", "EXPIRED"),
    }
