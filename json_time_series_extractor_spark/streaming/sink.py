"""Streaming tier sink: rollup micro-batches -> an upsert-log tier table.

``foreachBatch`` writes each micro-batch's rows under
``dt=<day>/p_batch=<batch_id>`` with dynamic partition overwrite, plus a
lineage commit marker per (day, batch_id):

- **exactly-once**: the engine replays a crashed batch_id with identical
  content; the overwrite replaces exactly that batch's sub-partitions, so
  replay is idempotent and rows from OTHER batches in the same day are
  untouched (a plain per-day overwrite would delete them — update-mode
  batches carry only the windows that changed);
- **upsert semantics**: update mode re-emits a window whenever it changes,
  so the freshest aggregate for a (series, bucket) is the row with the
  greatest ``p_batch`` — :func:`read_rollup_tier` resolves it. On Iceberg
  this whole file is ``MERGE INTO`` keyed on (series_key, bucket_ts).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.plans.pipeline import LineageStore


def _read_sentinel(spark, output_path: str) -> Optional[str]:
    from json_time_series_extractor_spark.plans.pipeline import hadoop_fs

    fs, p = hadoop_fs(spark, f"{output_path}/_jtse_checkpoint")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8").strip()
    finally:
        stream.close()


def _write_sentinel(spark, output_path: str, value: str) -> None:
    from json_time_series_extractor_spark.plans.pipeline import hadoop_fs

    fs, p = hadoop_fs(spark, f"{output_path}/_jtse_checkpoint")
    out = fs.create(p, True)
    try:
        out.write(bytearray(value.encode("utf-8")))
    finally:
        out.close()


def check_batch0_ownership(spark, output_path: str,
                           checkpoint_dir: str) -> None:
    """Guard run at batch 0. Freshness resolution is "greatest p_batch
    wins", and batch ids restart at 0 with a NEW checkpoint. Pointing a
    fresh checkpoint at an output that already has batches would make
    stale rows shadow new ones (even a lone replayed p_batch=0 only
    overwrites ITS batch's day partitions). A crash-replay of batch 0
    from the SAME checkpoint, however, is the normal exactly-once path
    and must succeed — the two cases are told apart by a
    checkpoint-identity sentinel written alongside the output on the
    first commit. Ownership compares scheme-qualified paths so
    equivalent spellings (trailing slash, file:// scheme, relative) of
    the same checkpoint count as a replay, not a takeover."""
    from json_time_series_extractor_spark.plans.pipeline import (
        qualified_path)
    from pyspark.sql import functions as F

    try:
        existing = (spark.read.parquet(output_path)
                    .agg(F.max("p_batch")).first()[0])
    except Exception:
        existing = None
    me = qualified_path(spark, checkpoint_dir)
    if existing is not None:
        owner = _read_sentinel(spark, output_path)
        # Sentinels written by earlier releases hold the RAW checkpoint
        # string — qualify before comparing so an upgrade does not refuse
        # a legitimate same-checkpoint replay.
        if owner is not None:
            owner = qualified_path(spark, owner)
        # owner is None on pre-sentinel outputs: fall back to the legacy
        # rule (a lone replayed p_batch=0 was always allowed; anything
        # newer is refused).
        legacy_ok = owner is None and existing == 0
        if not legacy_ok and owner != me:
            raise RuntimeError(
                f"{output_path} already holds batches up to "
                f"p_batch={existing} written under checkpoint "
                f"{owner!r}; resuming with a different/fresh "
                "checkpoint would shadow newer data behind stale "
                "batch ids. Reuse the original checkpointLocation "
                "or start a new output path.")
    _write_sentinel(spark, output_path, me)


def write_rollup_stream(rollup_stream: DataFrame, output_path: str, *,
                        lineage_path: Optional[str] = None,
                        checkpoint_dir: str,
                        query_name: str = "rollup_sink",
                        trigger_once: bool = False):
    """Start the streaming query writing tier rows to ``output_path``
    partitioned by day, committing lineage per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id == 0:
            check_batch0_ownership(spark, output_path, checkpoint_dir)
        out = (batch_df
               .withColumn("dt", F.to_date("bucket_ts"))
               .withColumn("p_batch", F.lit(int(batch_id))))
        # Partitioned by (dt, p_batch): a REPLAY of the same batch_id
        # overwrites exactly its own sub-partitions (exactly-once), while
        # other batches' rows in the same day survive. Readers take the
        # row with the greatest p_batch per (series_key, bucket_ts) — an
        # upsert log, see read_rollup_tier().
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("dt", "p_batch").parquet(output_path))
        if lineage_path:
            days = [str(r[0]) for r in out.select("dt").distinct().collect()]
            LineageStore(spark, lineage_path).append([
                ("stream_rollup", d, f"batch-{batch_id}", 0, 0, 0, "DONE")
                for d in days])

    writer = (rollup_stream.writeStream
              .outputMode("update")
              .foreachBatch(sink)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup_tier(spark, output_path: str) -> DataFrame:
    """Current state of a streamed tier: latest ``p_batch`` wins per
    (series_key, bucket_ts) — update-mode batches re-emit a window whenever
    it changes, so the greatest batch id holds the freshest aggregate."""
    from pyspark.sql import Window

    df = spark.read.parquet(output_path)
    w = Window.partitionBy("series_key", "bucket_ts").orderBy(
        F.col("p_batch").desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "p_batch"))
