"""Checkpointed, resumable stage execution with per-partition lineage.

North-rule requirement: every stage is resumable from checkpoint with
per-partition lineage rows and counters. Design:

- A stage consumes an input DataFrame partitioned by a coarse unit of work
  (e.g. ``dt`` day, or ``dt/url_bucket``) and writes its output
  partitioned by the same column.
- The **lineage table** (parquet; Iceberg on a real cluster) holds one row
  per (stage, partition_value, run_id) with input/output row counts, an
  order-insensitive content checksum, and status. The lineage row is the
  COMMIT MARKER: it is appended only after the partition's output is
  durably written.
- **Resume** = re-running the same stage: partitions with a DONE lineage
  row are skipped; pending partitions are (re)processed with dynamic
  partition overwrite, so a crash between output-write and lineage-append
  replays idempotently (the partition directory is atomically replaced).
- Determinism: transforms must be deterministic (no wall-clock, no rand),
  which every operator in this engine is; the checksum (sum of xxhash64
  over all columns) makes silent nondeterminism visible across runs.

At cluster scale the same protocol maps to Iceberg: dynamic overwrite ->
``overwritePartitions()``, lineage appends -> an Iceberg table, and both
writes can share a WAP (write-audit-publish) transaction.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_value string, run_id string, "
    "input_count long, output_count long, checksum long, status string"
)


@dataclass
class StageResult:
    stage: str
    processed: List[str]
    skipped: List[str]
    output_count: int
    #: Output (event-day) partitions this run rewrote — downstream stages
    #: keyed on the same days must reprocess exactly these.
    output_partitions: List[str] = field(default_factory=list)
    #: Event days dropped by the lateness horizon (see run_event_day_stage).
    dead_lettered: List[str] = field(default_factory=list)


class LineageStore:
    """Parquet-backed lineage table (append-only; the newest DONE row per
    (stage, partition) wins)."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def read(self) -> Optional[DataFrame]:
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def completed_partitions(self, stage: str) -> set:
        df = self.read()
        if df is None:
            return set()
        rows = (df.where((F.col("stage") == stage)
                         & (F.col("status") == "DONE"))
                .select("partition_value").distinct().collect())
        return {r.partition_value for r in rows}

    def append(self, rows: Sequence[tuple]) -> None:
        df = self.spark.createDataFrame(list(rows), LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)


def _content_checksum(df: DataFrame, partition_col: str) -> DataFrame:
    """Order-insensitive per-partition checksum + count: SUM of xxhash64
    over every row (decimal accumulator, folded back to int64). Sum, not
    xor: xor cancels rows that repeat an even number of times, hiding
    exactly the duplicate-row nondeterminism the checksum exists to
    expose."""
    total = F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
    modulus = F.lit(str(1 << 63)).cast("decimal(38,0)")  # > long range
    return (df
            .groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.pmod(total, modulus).cast("long").alias("_sum")))


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf —
    the one place the JVM filesystem boilerplate lives (used by partition
    discovery here and the streaming sink's sentinel)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def qualified_path(spark: SparkSession, path: str) -> str:
    """Scheme-qualified absolute form of ``path`` (e.g. ``file:/x`` for
    ``/x/``), so equivalent spellings compare equal."""
    fs, p = hadoop_fs(spark, path)
    return str(fs.makeQualified(p))


def list_partition_values(spark: SparkSession, path: str,
                          partition_col: str) -> Optional[List[str]]:
    """Partition values of a directory-partitioned parquet table from
    FILESYSTEM METADATA — one directory listing, zero data scanned.

    This is how stage partition discovery must work at warehouse scale: a
    ``distinct()`` over the input is a full scan of the table before any
    real work (at 10^12 rows, an extra pass per stage). On Iceberg the
    same call is one query over the ``<table>.partitions`` metadata table.
    Returns None when the path does not exist or has no
    ``<col>=<value>`` subdirectories (not partitioned that way), so
    callers can fall back explicitly."""
    from urllib.parse import unquote

    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    prefix = partition_col + "="
    values = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            # Hive-style escaping: special chars are %-encoded in dirnames.
            values.append(unquote(name[len(prefix):]))
    return sorted(values) if values else None


def _discover_partitions(input_df: DataFrame, partition_col: str,
                         input_partitions) -> List[str]:
    """Stage partition discovery. ``input_partitions`` (from
    :func:`list_partition_values` / catalog metadata) avoids scanning the
    input; the ``distinct()`` fallback is for ad-hoc in-memory inputs and
    costs a full pass — fine in tests, wrong at warehouse scale."""
    if input_partitions is not None:
        return [str(v) for v in input_partitions]
    return [str(r[0]) for r in
            input_df.select(partition_col).distinct().collect()]


def run_event_day_stage(
    spark: SparkSession,
    *,
    stage: str,
    input_df: DataFrame,
    capture_col: str = "dt",
    event_day,
    transform: Callable[[DataFrame], DataFrame],
    output_path: str,
    lineage_path: str,
    run_id: Optional[str] = None,
    min_event_day: Optional[str] = None,
    input_partitions: Optional[Sequence[str]] = None,
) -> StageResult:
    """Incremental stage whose OUTPUT partitions key on the *event* day
    (derived from data timestamps) while resume tracks *capture* days
    (the input's arrival partitioning).

    A late sample (event day != its page's capture day) means one event-day
    output partition draws from several capture days; replaying a pending
    capture-day subset through a plain partition overwrite would clobber a
    complete event-day partition with a partial aggregate. Protocol:

    1. pending capture days = input partitions without a DONE ``capture:``
       lineage row;
    2. affected event days = distinct ``event_day`` over the pending
       capture days' rows;
    3. recompute those event days from ALL input rows (any capture day) —
       on Iceberg, step 3 prunes with partition metadata plus a bounded
       lateness horizon (capture in [event_day, event_day + L]);
    4. dynamically overwrite exactly those event-day partitions;
    5. lineage commits ``capture:<d>`` resume tokens and ``event:<d>``
       rows carrying the output counters.

    ``event_day`` is a function DataFrame -> Column giving each input
    row's event day; ``transform`` must emit a ``dt`` column equal to it.

    Retention interaction: recomputing an event day REBUILDS it from the
    raw rows present *now* — event days older than the raw retention
    horizon must not be reopened (their contributors are expired), so late
    data beyond that horizon is dead-lettered upstream, exactly like a
    streaming watermark.
    """
    run_id = run_id or f"{stage}-{int(time.time())}"
    lineage = LineageStore(spark, lineage_path)
    lineage_done = lineage.completed_partitions(stage)
    done = {v[len("capture:"):]
            for v in lineage_done if v.startswith("capture:")}
    done_events = {v[len("event:"):]
                   for v in lineage_done if v.startswith("event:")}

    capture_values = _discover_partitions(input_df, capture_col,
                                          input_partitions)
    pending = sorted(v for v in capture_values if v not in done)
    skipped = sorted(v for v in capture_values if v in done)
    if not pending:
        return StageResult(stage, [], skipped, 0)

    pending_rows = input_df.where(
        F.col(capture_col).cast("string").isin(pending))
    affected = sorted(str(r[0]) for r in
                      pending_rows.select(event_day(input_df)
                                          .alias("_ed"))
                      .distinct().collect())
    dead_lettered: List[str] = []
    if min_event_day is not None:
        # Lateness horizon: a PREVIOUSLY BUILT event day beyond the raw
        # retention horizon must not be rebuilt — its original contributors
        # may be expired, so the recompute would see only the new late rows
        # and overwrite a complete partition with a partial aggregate.
        # Never-built old days are still computed (their raw rows are the
        # full population right now). Late rows for protected days are
        # dead-lettered, like a streaming watermark.
        dead_lettered = [d for d in affected
                         if d < min_event_day and d in done_events]
        affected = [d for d in affected if d not in dead_lettered]

    recompute_in = input_df.where(
        event_day(input_df).cast("string").isin(affected))
    out = transform(recompute_in)
    if "dt" not in out.columns:
        raise ValueError(f"stage {stage!r}: transform must emit 'dt'")
    (out.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("dt").parquet(output_path))

    # Explicit schema: a transform can legitimately emit zero rows, and
    # schema inference on a parquet dir holding only _SUCCESS throws.
    written = spark.read.schema(out.schema).parquet(output_path).where(
        F.col("dt").cast("string").isin(affected))
    stats = {str(r[0]): (r["_n"], r["_sum"]) for r in
             _content_checksum(written, "dt").collect()}

    rows = [(stage, f"capture:{v}", run_id, 0, 0, 0, "DONE")
            for v in pending]
    total_out = 0
    for value in affected:
        n, checksum = stats.get(value, (0, 0))
        total_out += n
        rows.append((stage, f"event:{value}", run_id, 0, int(n),
                     int(checksum or 0), "DONE"))
    lineage.append(rows)
    return StageResult(stage, pending, skipped, total_out,
                       output_partitions=affected,
                       dead_lettered=dead_lettered)


def run_partitioned_stage(
    spark: SparkSession,
    *,
    stage: str,
    input_df: DataFrame,
    partition_col: str,
    transform: Callable[[DataFrame], DataFrame],
    output_path: str,
    lineage_path: str,
    run_id: Optional[str] = None,
    force: Optional[set] = None,
    input_partitions: Optional[Sequence[str]] = None,
) -> StageResult:
    """Execute ``transform`` over all not-yet-DONE partitions of the input.

    The transform must preserve ``partition_col`` in its output. Output is
    written with dynamic partition overwrite (idempotent replay); lineage
    rows commit each partition afterwards. ``force`` reprocesses the given
    partition values even when DONE — the cascade hook for upstream stages
    that rewrote those partitions this run.
    """
    run_id = run_id or f"{stage}-{int(time.time())}"
    force = force or set()
    lineage = LineageStore(spark, lineage_path)
    done = lineage.completed_partitions(stage) - force

    part_values = _discover_partitions(input_df, partition_col,
                                       input_partitions)
    pending = sorted(v for v in part_values if v not in done)
    skipped = sorted(v for v in part_values if v in done)
    if not pending:
        return StageResult(stage, [], skipped, 0)

    subset = input_df.where(
        F.col(partition_col).cast("string").isin(pending))
    in_counts = {str(r[0]): r[1] for r in
                 subset.groupBy(partition_col).count().collect()}

    out = transform(subset)
    if partition_col not in out.columns:
        raise ValueError(
            f"stage {stage!r}: transform dropped partition column "
            f"{partition_col!r}")

    # Writer-scoped option, NOT spark.conf.set: a session-wide default
    # would silently change unrelated overwrite writes elsewhere.
    (out.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(output_path))

    # Counters + checksum from what was durably written (read-back, so the
    # lineage row attests the files on disk, not the in-flight plan).
    # Explicit schema: zero-row transforms write only _SUCCESS and schema
    # inference on that throws.
    written = spark.read.schema(out.schema).parquet(output_path).where(
        F.col(partition_col).cast("string").isin(pending))
    stats = {str(r[0]): (r["_n"], r["_sum"]) for r in
             _content_checksum(written, partition_col).collect()}

    rows = []
    total_out = 0
    for value in pending:
        n, checksum = stats.get(value, (0, 0))
        total_out += n
        rows.append((stage, value, run_id,
                     int(in_counts.get(value, 0)), int(n),
                     int(checksum or 0), "DONE"))
    lineage.append(rows)
    return StageResult(stage, pending, skipped, total_out,
                       output_partitions=pending)
