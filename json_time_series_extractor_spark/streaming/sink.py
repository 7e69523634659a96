"""Streaming tier sink: rollup micro-batches -> day-partitioned storage.

``foreachBatch`` bridges the streaming rollup onto the SAME batch sink
protocol the pipeline uses (dynamic partition overwrite + lineage commit
markers, ``plans.pipeline``): each micro-batch's affected day-partitions
are rewritten wholesale from the batch's complete output, and a lineage
row per (partition, batch_id) commits afterwards.

Exactly-once reasoning: the streaming engine guarantees each batch_id is
replayed with identical content after a crash; dynamic overwrite makes the
replay idempotent at partition granularity; the lineage row is the commit
marker, so an observer (or the batch cascade picking up the 1m tier)
treats un-marked partitions as in-flight. This is the parquet analog of
Iceberg's ``overwritePartitions`` under a WAP transaction.

Output mode must be "update"-capable: with a watermark + append mode the
windows arrive once, closed; with complete mode each batch re-emits
everything and the overwrite still converges. Both compose with this sink.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.plans.pipeline import LineageStore


def write_rollup_stream(rollup_stream: DataFrame, output_path: str, *,
                        lineage_path: Optional[str] = None,
                        checkpoint_dir: str,
                        query_name: str = "rollup_sink",
                        trigger_once: bool = False):
    """Start the streaming query writing tier rows to ``output_path``
    partitioned by day, committing lineage per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = batch_df.withColumn("dt", F.to_date("bucket_ts"))
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        out.write.mode("overwrite").partitionBy("dt").parquet(output_path)
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
