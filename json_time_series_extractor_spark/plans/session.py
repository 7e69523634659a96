"""SparkSession construction with scale-appropriate defaults.

One place to pin the settings every stage relies on: UTC session timezone
(oracle comparison + deterministic timestamps), AQE (runtime re-plan,
skew-join splitting, shuffle coalescing), Arrow for the Python boundary,
and shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "json-time-series-extractor-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env default 32).
    On a real cluster the caller passes ``master=None`` via ``spark-submit``
    and these configs act as soft defaults.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Join strategy (optimization round 8, guide §3.1/§9): let the
        # planner pick shuffled-hash over sort-merge when the build side
        # fits (drops both sort stages from every equi-join whose sides
        # are hash-table-sized), let AQE rewrite SMJ->SHJ at runtime for
        # post-shuffle partitions under 64 MB, and broadcast up to 64 MB
        # (the 10 MB default is conservative for 100 GB+ executors; the
        # decision still scales off runtime size estimates, so a side
        # that grows past the threshold at bigger SFs degrades back to a
        # shuffle join on its own). All three are env-overridable.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
        # MIN/MAX/COUNT over unfiltered parquet scans answer from footer
        # statistics instead of a full scan (Spark 3.3+; falls back
        # silently where stats don't apply).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Driver-side plan-build cost (round 8; guide §5 — the driver
        # should do almost no work): PySpark 4 captures the Python call
        # site for DataFrame error context on EVERY API call — a Python
        # stack walk plus extra py4j round trips per call, measured at
        # 15-40% of this repo's per-query plan-construction wall (e.g.
        # cm_frequency 0.45->0.36s, asof_join_nearest 0.33->0.20s,
        # same-session best-of-2). Costs only error-message call-site
        # context; plans and results are unchanged. Env-overridable.
        .config("spark.python.sql.dataFrameDebugging.enabled",
                os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE",
                               "/tmp/jtse_spark_warehouse"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if extra_conf:
        for key, value in extra_conf.items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
