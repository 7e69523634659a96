"""Resume/lineage and streaming-shell tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from json_time_series_extractor_spark.operators.rollup import rollup
from json_time_series_extractor_spark.plans.pipeline import (
    LineageStore,
    run_partitioned_stage,
)
from json_time_series_extractor_spark.sources.pages import (
    PAGES_EXTRACT_OPTIONS,
    synthesize_pages,
)
from json_time_series_extractor_spark.operators.extract import extract_samples


@pytest.fixture()
def pages_small(spark):
    return synthesize_pages(spark, 300).withColumn("dt",
                                                   F.to_date("warc_ts"))


def _transform(pages):
    samples = extract_samples(
        pages.withColumnRenamed("dt", "_dt"), PAGES_EXTRACT_OPTIONS)
    out = rollup(samples, "1 hour")
    return out.withColumn("dt", F.to_date("bucket_ts"))


def test_stage_runs_then_resumes_noop(spark, pages_small, tmp_path):
    out_path = str(tmp_path / "rollup_1h")
    lineage_path = str(tmp_path / "lineage")

    r1 = run_partitioned_stage(
        spark, stage="rollup_1h", input_df=pages_small, partition_col="dt",
        transform=_transform, output_path=out_path,
        lineage_path=lineage_path)
    assert len(r1.processed) >= 2 and not r1.skipped
    first = sorted(spark.read.parquet(out_path).collect())

    # Re-run: everything already DONE -> no work, identical output.
    r2 = run_partitioned_stage(
        spark, stage="rollup_1h", input_df=pages_small, partition_col="dt",
        transform=_transform, output_path=out_path,
        lineage_path=lineage_path)
    assert not r2.processed
    assert sorted(r2.skipped) == sorted(r1.processed)
    assert sorted(spark.read.parquet(out_path).collect()) == first


def test_stage_resumes_partially_after_simulated_crash(spark, pages_small,
                                                       tmp_path):
    """Simulate a crash after partition 1 of N committed: pre-seed lineage
    with one DONE row, then run — only the remaining partitions process,
    and the final output equals a from-scratch run."""
    out_path = str(tmp_path / "out")
    lineage_path = str(tmp_path / "lineage")
    full_path = str(tmp_path / "full")

    # Ground truth: full run into a separate location.
    run_partitioned_stage(
        spark, stage="s", input_df=pages_small, partition_col="dt",
        transform=_transform, output_path=full_path,
        lineage_path=str(tmp_path / "lineage_full"))
    truth = sorted(spark.read.parquet(full_path).collect())

    parts = sorted(str(r[0]) for r in
                   pages_small.select("dt").distinct().collect())
    crashed_done = parts[0]

    # "Crashed" state: first partition written + committed, rest missing.
    subset = pages_small.where(F.col("dt").cast("string") == crashed_done)
    _transform(subset).write.mode("overwrite").partitionBy("dt") \
        .parquet(out_path)
    LineageStore(spark, lineage_path).append(
        [("s", crashed_done, "run-crashed", 0, 0, 0, "DONE")])

    r = run_partitioned_stage(
        spark, stage="s", input_df=pages_small, partition_col="dt",
        transform=_transform, output_path=out_path,
        lineage_path=lineage_path)
    assert crashed_done in r.skipped
    assert sorted(r.processed) == parts[1:]
    assert sorted(spark.read.parquet(out_path).collect()) == truth

    # Lineage counters recorded for resumed partitions.
    lin = spark.read.parquet(lineage_path).where(
        F.col("run_id") != "run-crashed").collect()
    assert all(row.output_count > 0 and row.status == "DONE" for row in lin)


def test_streaming_rollup_smoke(spark, tmp_path):
    from json_time_series_extractor_spark.streaming.stream import (
        read_pages_stream,
        run_to_memory_sink,
        streaming_rollup,
    )
    pages_dir = str(tmp_path / "pages_stream")
    synthesize_pages(spark, 200).write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=4)
    assert stream.isStreaming
    agg = streaming_rollup(stream, PAGES_EXTRACT_OPTIONS, "1 hour",
                           watermark="1 minute")
    query = run_to_memory_sink(agg, "rollup_smoke_test",
                               str(tmp_path / "ckpt"))
    try:
        # Append mode only emits windows the watermark has passed; with a
        # bounded file source the final windows stay open, so just check
        # the query ran and the in-flight state is consistent.
        progress = query.lastProgress
        assert progress is not None
        assert query.exception() is None
    finally:
        query.stop()

    # Completeness check via complete-mode into memory (small data).
    q2 = (agg.writeStream.outputMode("complete").format("memory")
          .queryName("rollup_complete_test").start())
    q2.processAllAvailable()
    try:
        rows = spark.sql("SELECT * FROM rollup_complete_test").collect()
        keys = {r.series_key for r in rows}
        assert keys == {"fetch_latency_ms", "page_size_bytes", "lang_count"}
        assert all(r["count"] > 0 for r in rows)
    finally:
        q2.stop()


def test_stateful_locf_across_microbatches(spark, tmp_path):
    """applyInPandasWithState LOCF: holes within AND between micro-batches
    are filled from per-series state."""
    import os

    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_locf,
    )

    src = str(tmp_path / "rollup_stream")
    os.makedirs(src)
    # Two micro-batches (one file each, maxFilesPerTrigger=1). Series "a"
    # has a hole inside batch 1 (00:00 -> 00:02) and a hole spanning the
    # batch boundary (00:02 -> 00:05).
    batch1 = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0),
         ("a", "2024-01-01 00:02:00", 3.0),
         ("b", "2024-01-01 00:00:00", 10.0)],
        "series_key string, bucket_ts string, mean double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    batch2 = spark.createDataFrame(
        [("a", "2024-01-01 00:05:00", 6.0)],
        "series_key string, bucket_ts string, mean double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    batch1.coalesce(1).write.parquet(src + "/f1")
    import time as _time
    _time.sleep(0.2)  # distinct mtimes: the file source triggers oldest-first
    batch2.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, bucket_ts timestamp, mean double")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    dense = stateful_locf(stream, interval_seconds=60)
    q = (dense.writeStream.outputMode("append").format("memory")
         .queryName("locf_state_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        rows = {(r.series_key, r.bucket_ts.strftime("%H:%M"), r.value,
                 r.filled)
                for r in spark.sql(
                    "SELECT * FROM locf_state_test").collect()}
    finally:
        q.stop()

    a = sorted((t, v, f) for (k, t, v, f) in rows if k == "a")
    assert a == [("00:00", 1.0, False), ("00:01", 1.0, True),
                 ("00:02", 3.0, False), ("00:03", 3.0, True),
                 ("00:04", 3.0, True), ("00:05", 6.0, False)]
    assert ("b", "00:00", 10.0, False) in rows


def test_stateful_locf_matches_batch_gapfill(spark, tmp_path):
    """Streaming LOCF over real sparse rollups == batch gapfill_locf
    exactly (values, fill flags, per-series spans), with the series
    split across two time-ordered microbatches so cross-batch carries
    are exercised on real data — the same batch cross-validation the
    stateful sessionize/counter/histogram/t-digest tiers have."""
    import os

    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_locf,
    )
    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_locf,
    )

    r1m = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
           .groupBy(F.col("event_type").alias("series_key"),
                    F.date_trunc("minute", "ts").alias("bucket_ts"))
           .agg(F.avg("value").alias("mean")))
    cut = r1m.agg(F.expr("percentile(unix_timestamp(bucket_ts), 0.5)")) \
        .collect()[0][0]
    src = str(tmp_path / "locf_xval")
    os.makedirs(src)
    r1m.where(F.unix_timestamp("bucket_ts") <= cut) \
        .coalesce(1).write.parquet(src + "/f1")
    import time as _time
    _time.sleep(0.2)
    r1m.where(F.unix_timestamp("bucket_ts") > cut) \
        .coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, bucket_ts timestamp, mean double")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    q = (stateful_locf(stream, interval_seconds=60)
         .writeStream.outputMode("append").format("memory")
         .queryName("locf_xval_test")
         .option("checkpointLocation", str(tmp_path / "ckpt_locf")).start())
    q.processAllAvailable()
    try:
        got = {(r.series_key, r.bucket_ts, r.value, r.filled)
               for r in spark.sql("SELECT * FROM locf_xval_test").collect()}
    finally:
        q.stop()

    want = {(r.series_key, r.bucket_ts, r.value, r.filled)
            for r in gapfill_locf(r1m, "1 minute",
                                  value_col="mean").collect()}
    assert len(got) > 100
    assert got == want
    assert any(f for _, _, _, f in got)       # real holes were filled


def test_streaming_tier_sink_foreachbatch(spark, tmp_path):
    """foreachBatch tier sink: day-partitioned output + per-batch lineage."""
    from json_time_series_extractor_spark.streaming.sink import (
        write_rollup_stream,
    )
    from json_time_series_extractor_spark.streaming.stream import (
        read_pages_stream,
        streaming_rollup,
    )

    from json_time_series_extractor_spark.streaming.sink import (
        read_rollup_tier,
    )

    import os as _os
    import time as _time

    pages_dir = str(tmp_path / "pages_sink")
    # One file per capture day, written in time order (distinct mtimes) ->
    # several micro-batches, chronological, so nothing falls behind the
    # watermark; consecutive batches update windows in the same days and
    # earlier batches' rows must survive later overwrites.
    _os.makedirs(pages_dir)
    pages_all = synthesize_pages(spark, 200)
    days = sorted(r[0].isoformat() for r in
                  pages_all.selectExpr("to_date(warc_ts) d")
                  .distinct().collect())
    for i, d in enumerate(days):
        (pages_all.where(F.to_date("warc_ts") == d).coalesce(1)
         .write.parquet(f"{pages_dir}/f{i}"))
        _time.sleep(0.2)
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, "
                      "text string, lang string")
              .option("maxFilesPerTrigger", "1")
              .parquet(pages_dir + "/*"))
    agg = streaming_rollup(stream, PAGES_EXTRACT_OPTIONS, "1 hour",
                           watermark="1 minute")
    out_dir = str(tmp_path / "tier_1h")
    lineage = str(tmp_path / "lineage")
    q = write_rollup_stream(agg, out_dir, lineage_path=lineage,
                            checkpoint_dir=str(tmp_path / "ckpt"),
                            trigger_once=True)
    q.awaitTermination(180)
    assert q.exception() is None

    raw = spark.read.parquet(out_dir)
    assert raw.count() > 0
    assert "dt" in raw.columns and "p_batch" in raw.columns
    n_batches = raw.select("p_batch").distinct().count()
    assert n_batches >= 2  # multiple micro-batches hit the same days

    # Latest-batch-wins view equals a batch rollup over all pages.
    from json_time_series_extractor_spark.operators.extract import (
        extract_samples,
    )
    current = read_rollup_tier(spark, out_dir)
    expect = rollup(extract_samples(spark.read.parquet(pages_dir + "/*"),
                                    PAGES_EXTRACT_OPTIONS), "1 hour")
    got = {(r.series_key, r.bucket_ts): r["count"]
           for r in current.collect()}
    want = {(r.series_key, r.bucket_ts): r["count"]
            for r in expect.collect()}
    assert got == want

    lin = spark.read.parquet(lineage)
    assert lin.where("stage = 'stream_rollup' AND status = 'DONE'").count() > 0


def test_event_day_stage_handles_late_samples(spark, tmp_path):
    """A sample whose event day differs from its capture day: incremental
    runs must rebuild the affected event-day partition from ALL capture
    days, never overwrite it with a partial aggregate."""
    from datetime import datetime

    from json_time_series_extractor_spark.plans.pipeline import (
        run_event_day_stage,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, "series_key string, ts timestamp, value_double double, "
                  "dt date").withColumn("dt", F.col("dt"))

    d5, d6 = datetime(2024, 2, 5, 23, 59), datetime(2024, 2, 6, 0, 1)
    cap5 = [("s", d5, 1.0, datetime(2024, 2, 5).date())]
    # Captured on the 6th, but one sample's timestamp is late (on the 5th).
    cap6 = [("s", d6, 2.0, datetime(2024, 2, 6).date()),
            ("s", datetime(2024, 2, 5, 23, 59, 30), 3.0,
             datetime(2024, 2, 6).date())]

    out_path = str(tmp_path / "r1m")
    lineage = str(tmp_path / "lineage")

    def tf(df):
        return rollup(df, "1 minute").withColumn(
            "dt", F.to_date("bucket_ts"))

    r1 = run_event_day_stage(
        spark, stage="r1m", input_df=mk(cap5), capture_col="dt",
        event_day=lambda df: F.to_date(df["ts"]), transform=tf,
        output_path=out_path, lineage_path=lineage)
    assert r1.processed == ["2024-02-05"]

    r2 = run_event_day_stage(
        spark, stage="r1m", input_df=mk(cap5 + cap6), capture_col="dt",
        event_day=lambda df: F.to_date(df["ts"]), transform=tf,
        output_path=out_path, lineage_path=lineage)
    assert r2.processed == ["2024-02-06"]
    assert r2.skipped == ["2024-02-05"]

    # The 23:59 bucket on the 5th must aggregate BOTH the original sample
    # (capture day 5) and the late one (capture day 6).
    got = {r.bucket_ts.isoformat(): (r["count"], r["min"], r["max"])
           for r in spark.read.parquet(out_path).collect()}
    assert got["2024-02-05T23:59:00"] == (2, 1.0, 3.0)
    assert got["2024-02-06T00:01:00"] == (1, 2.0, 2.0)


def test_list_partition_values_matches_distinct_scan(spark, pages_small,
                                                     tmp_path):
    """Filesystem partition discovery (no data scan) returns exactly the
    values a distinct() over the data would, including round-tripping
    through Hive-style directory names."""
    from json_time_series_extractor_spark.plans.pipeline import (
        list_partition_values)

    path = str(tmp_path / "pages")
    pages_small.write.partitionBy("dt").parquet(path)
    listed = list_partition_values(spark, path, "dt")
    scanned = sorted(str(r[0]) for r in
                     pages_small.select("dt").distinct().collect())
    assert listed == scanned
    # Missing path / wrong column -> explicit None (caller falls back).
    assert list_partition_values(spark, str(tmp_path / "nope"), "dt") is None
    assert list_partition_values(spark, path, "other_col") is None


def test_stage_with_metadata_partitions_equals_scan_discovery(
        spark, pages_small, tmp_path):
    """A stage driven by filesystem-listed partitions resumes identically
    to one driven by the distinct() fallback."""
    from json_time_series_extractor_spark.plans.pipeline import (
        list_partition_values)

    src = str(tmp_path / "src")
    pages_small.write.partitionBy("dt").parquet(src)
    pages = spark.read.parquet(src)
    parts = list_partition_values(spark, src, "dt")

    out_path = str(tmp_path / "out")
    lineage_path = str(tmp_path / "lineage")
    r1 = run_partitioned_stage(
        spark, stage="s", input_df=pages, partition_col="dt",
        transform=_transform, output_path=out_path,
        lineage_path=lineage_path, input_partitions=parts)
    assert sorted(r1.processed) == parts
    r2 = run_partitioned_stage(
        spark, stage="s", input_df=pages, partition_col="dt",
        transform=_transform, output_path=out_path,
        lineage_path=lineage_path, input_partitions=parts)
    assert not r2.processed and sorted(r2.skipped) == parts


def test_streaming_sink_batch0_replay_and_fresh_checkpoint_guard(
        spark, tmp_path):
    """The batch-0 ownership guard matrix, exercised directly (the
    streaming engine's checkpoint fencing makes surgical batch-0 replay
    simulation flaky), plus the engine-level fresh-checkpoint refusal."""
    from json_time_series_extractor_spark.streaming.sink import (
        check_batch0_ownership, write_rollup_stream)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_rollup)

    out_dir = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")

    # Fresh output: allowed; stamps ownership.
    check_batch0_ownership(spark, out_dir, ckpt)

    # Existing batches under the SAME checkpoint (crash replay of batch 0,
    # any spelling of the path): allowed.
    (spark.range(3)
     .selectExpr("'k' AS series_key",
                 "timestamp'2024-01-01 00:00:00' AS bucket_ts",
                 "CAST(id AS double) AS mean",
                 "date'2024-01-01' AS dt", "0 AS p_batch")
     .write.partitionBy("dt", "p_batch").mode("append").parquet(out_dir))
    check_batch0_ownership(spark, out_dir, ckpt)
    check_batch0_ownership(spark, out_dir, ckpt + "/")        # trailing /
    check_batch0_ownership(spark, out_dir, f"file://{ckpt}")  # scheme

    # A DIFFERENT checkpoint: refused.
    import os

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="checkpoint"):
        check_batch0_ownership(spark, out_dir, str(tmp_path / "ckpt2"))

    # Legacy pre-sentinel output: batch-0-only replay allowed (old rule),
    # anything newer refused.
    os.remove(f"{out_dir}/_jtse_checkpoint")
    check_batch0_ownership(spark, out_dir, ckpt)
    os.remove(f"{out_dir}/_jtse_checkpoint")
    (spark.range(1)
     .selectExpr("'k' AS series_key",
                 "timestamp'2024-01-02 00:00:00' AS bucket_ts",
                 "1.0 AS mean", "date'2024-01-02' AS dt", "1 AS p_batch")
     .write.partitionBy("dt", "p_batch").mode("append").parquet(out_dir))
    with _pytest.raises(RuntimeError, match="checkpoint"):
        check_batch0_ownership(spark, out_dir, ckpt)

    # Engine-level: a real stream to a fresh output succeeds, and a rerun
    # pointed at the same output with a FRESH checkpoint is refused.
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    pages_dir = str(tmp_path / "pages")
    synthesize_pages(spark, 50).coalesce(1).write.parquet(pages_dir)
    out2 = str(tmp_path / "tier2")

    def run(checkpoint):
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, html binary, "
                          "text string, lang string")
                  .parquet(pages_dir))
        agg = streaming_rollup(stream, PAGES_EXTRACT_OPTIONS, "1 hour",
                               watermark="1 minute")
        q = write_rollup_stream(agg, out2, checkpoint_dir=checkpoint,
                                trigger_once=True)
        q.awaitTermination(180)
        q.stop()
        return q

    assert run(str(tmp_path / "sckpt")).exception() is None
    first = sorted(spark.read.parquet(out2).collect())
    with _pytest.raises(StreamingQueryException, match="checkpoint"):
        run(str(tmp_path / "sckpt2"))
    # Refusal happened before any write: output unchanged.
    assert sorted(spark.read.parquet(out2).collect()) == first

def test_stateful_counter_increase_across_microbatches(spark, tmp_path):
    """Streaming counter increase: the cross-batch baseline (previous
    batch's last value) and open-bucket partials live in state; a bucket
    emits exactly once, when a later sample closes it."""
    import os
    import time as _time

    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_counter_increase,
    )

    src = str(tmp_path / "samples_stream")
    os.makedirs(src)
    # Batch 1: hour 00 gets +10 +20 (first sample contributes 0);
    # batch 2 opens hour 01 with a cross-batch delta (+5 from 130 -> 135),
    # closing hour 00, then a reset (135 -> 2 contributes 2) and +8.
    b1 = spark.createDataFrame(
        [("c", "2024-01-01 00:10:00", 100.0),
         ("c", "2024-01-01 00:20:00", 110.0),
         ("c", "2024-01-01 00:40:00", 130.0)],
        "series_key string, ts string, value_double double",
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [("c", "2024-01-01 01:05:00", 135.0),
         ("c", "2024-01-01 01:10:00", 2.0),
         ("c", "2024-01-01 02:00:00", 10.0)],
        "series_key string, ts string, value_double double",
    ).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.parquet(src + "/f1")
    _time.sleep(0.2)
    b2.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, value_double double")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    inc = stateful_counter_increase(stream, tier_seconds=3600)
    q = (inc.writeStream.outputMode("append").format("memory")
         .queryName("rate_state_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        rows = {(r.series_key, r.bucket_ts.strftime("%H:%M")):
                (r.increase, r.n_samples)
                for r in spark.sql(
                    "SELECT * FROM rate_state_test").collect()}
    finally:
        q.stop()

    # Hour 00 closed by batch 2's first sample: 0 + 10 + 20.
    assert rows[("c", "00:00")] == (30.0, 3)
    # Hour 01 closed by the 02:00 sample: +5 (cross-batch baseline
    # 130 -> 135) + 2 (reset 135 -> 2). The 02:00 sample's own +8 accrues
    # to hour 02, which is still open -> not emitted yet.
    assert rows[("c", "01:00")] == (7.0, 2)
    assert ("c", "02:00") not in rows


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    """Streaming sessionization: the open session spans a micro-batch
    boundary (continuing events within the gap extend it); a later gap
    closes and emits it exactly once with correct bounds."""
    import os
    import time as _time

    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_sessionize,
    )

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    # Batch 1 ends mid-session; batch 2 continues it (gap 10 min < 30),
    # then a 40-minute gap closes session 1 and opens session 2.
    b1 = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:00"),
         (2, 7, "2024-01-01 00:10:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [(3, 7, "2024-01-01 00:20:00"),
         (4, 7, "2024-01-01 01:00:00"),
         (5, 7, "2024-01-01 01:05:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.parquet(src + "/f1")
    _time.sleep(0.2)
    b2.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    sess = stateful_sessionize(stream, gap_seconds=1800)
    q = (sess.writeStream.outputMode("append").format("memory")
         .queryName("session_state_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        rows = spark.sql("SELECT * FROM session_state_test").collect()
    finally:
        q.stop()

    # Exactly one CLOSED session: events 1-3 (00:00-00:20, crossing the
    # batch boundary). Session 2 (events 4-5) is still open -> withheld.
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.session_idx, r.n_events) == (7, 1, 3)
    assert r.session_start.strftime("%H:%M") == "00:00"
    assert r.session_end.strftime("%H:%M") == "00:20"
    assert r.duration_s == 1200.0


def test_stateful_sessionize_matches_batch_on_closed_sessions(
        spark, tmp_path):
    """Cross-validation: streaming closed sessions == batch sessionize
    minus each user's (still-open) final session, on real event data."""
    import os

    from json_time_series_extractor_spark.operators.sessions import (
        sessionize,
    )
    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_sessionize,
    )

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "user_id", "ts"))
    src = str(tmp_path / "ev")
    os.makedirs(src)
    ev.coalesce(1).write.parquet(src + "/f1")

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts timestamp")
              .parquet(src + "/*"))
    q = (stateful_sessionize(stream, gap_seconds=1800)
         .writeStream.outputMode("append").format("memory")
         .queryName("session_parity_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        got = {(r.user_id, r.session_idx):
               (r.session_start, r.session_end, r.n_events)
               for r in spark.sql(
                   "SELECT * FROM session_parity_test").collect()}
    finally:
        q.stop()

    batch = sessionize(ev, gap="30 minutes").collect()
    last_idx = {}
    for r in batch:
        last_idx[r.user_id] = max(last_idx.get(r.user_id, 0), r.session_idx)
    want = {(r.user_id, r.session_idx):
            (r.session_start, r.session_end, r.n_events)
            for r in batch if r.session_idx < last_idx[r.user_id]}
    assert got == want


def test_stateful_counter_increase_matches_batch_on_closed_buckets(
        spark, tmp_path):
    """Cross-validation: streaming closed counter buckets == batch
    counter_increase minus each series' (still-open) final bucket, on
    real event data split across micro-batches."""
    import os
    import time as _time

    from json_time_series_extractor_spark.operators.rate import (
        counter_increase,
    )
    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_counter_increase,
    )

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double")
               .where("value_double IS NOT NULL"))
    # Two micro-batches split mid-stream by timestamp so cross-batch
    # baselines (and reset handling around the split) are exercised.
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # events ts is NTZ
    cut = samples.select(F.percentile(us, F.lit(0.5)).alias("p")).first().p
    src = str(tmp_path / "cnt")
    os.makedirs(src)
    samples.where(us <= cut).coalesce(1).write.parquet(src + "/f1")
    _time.sleep(0.2)
    samples.where(us > cut).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, value_double double")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    q = (stateful_counter_increase(stream, tier_seconds=3600)
         .writeStream.outputMode("append").format("memory")
         .queryName("rate_parity_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        got = {(r.series_key, r.bucket_ts): (r.increase, r.n_samples)
               for r in spark.sql(
                   "SELECT * FROM rate_parity_test").collect()}
    finally:
        q.stop()

    batch = counter_increase(samples, "1 hour").collect()
    last_bucket = {}
    for r in batch:
        lb = last_bucket.get(r.series_key)
        if lb is None or r.bucket_ts > lb:
            last_bucket[r.series_key] = r.bucket_ts
    want = {(r.series_key, r.bucket_ts): (r.increase, r.n_samples)
            for r in batch if r.bucket_ts < last_bucket[r.series_key]}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1], k
        assert abs(got[k][0] - want[k][0]) < 1e-9, k


def test_stateful_updates_tolerate_empty_invocations():
    """A GroupStateTimeout tick invokes the update functions with no
    data; they must early-return without touching param columns."""
    import pandas as pd

    from json_time_series_extractor_spark.streaming.stateful import (
        _locf_update, _rate_update, _session_update,
    )

    class _FakeState:
        exists = False

        def update(self, *_):  # pragma: no cover - must NOT be called
            raise AssertionError("state updated on empty invocation")

    for fn, key in [(_locf_update, ("s",)), (_rate_update, ("s",)),
                    (_session_update, (1,))]:
        outs = list(fn(key, iter([pd.DataFrame()]), _FakeState()))
        assert len(outs) == 1 and outs[0].empty
        outs = list(fn(key, iter([]), _FakeState()))
        assert len(outs) == 1 and outs[0].empty


def test_streaming_tdigest_matches_batch(spark, tmp_path):
    """Streaming t-digest sketches are BIT-IDENTICAL to the batch tier
    on closed windows — same sorted bucket contents through the same
    build kernel — even with late (within-watermark) rows arriving in a
    second microbatch; the streamed rows feed the batch cascade and
    quantile estimator unchanged."""
    import os

    from json_time_series_extractor_spark.operators.tdigest import (
        rollup_tdigest, tdigest_cascade, tdigest_quantiles,
    )
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_tdigest,
    )

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key",
                           "CAST(ts AS TIMESTAMP) AS ts",
                           "value AS value_double"))
    # Split into "on-time" and "late" rows per hour bucket: the late file
    # arrives a microbatch later but within the 2h watermark, so every
    # closed window still saw its full contents.
    on_time = samples.where("pmod(hash(series_key, ts), 5) != 0")
    late = samples.where("pmod(hash(series_key, ts), 5) = 0")
    src = str(tmp_path / "td_stream")
    os.makedirs(src)
    on_time.coalesce(1).write.parquet(src + "/f1")
    late.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, value_double double")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    q = (streaming_tdigest(stream, tier="1 hour", watermark="2 hours",
                           delta=100)
         .writeStream.outputMode("append").format("memory")
         .queryName("td_stream_test")
         .option("checkpointLocation", str(tmp_path / "td_ckpt")).start())
    q.processAllAvailable()
    try:
        got = {(r.series_key, r.bucket_ts):
               (list(r.means), list(r.weights), r.cnt, r.vmin, r.vmax)
               for r in spark.sql("SELECT * FROM td_stream_test").collect()}
    finally:
        q.stop()

    want = {(r.series_key, r.bucket_ts):
            (list(r.means), list(r.weights), r.cnt, r.vmin, r.vmax)
            for r in rollup_tdigest(samples, "1 hour", delta=100).collect()}
    # Append mode emits only closed windows; every emitted sketch must
    # equal the batch sketch exactly (floats included — same kernel,
    # same sorted input).
    assert len(got) > 10
    for k in got:
        assert got[k] == want[k], k

    # Streamed sketches are valid child state for the batch cascade +
    # quantile extraction.
    streamed = spark.createDataFrame(
        [(sk, bt, m, w, c, lo, hi)
         for (sk, bt), (m, w, c, lo, hi) in got.items()],
        "series_key string, bucket_ts timestamp, means array<double>, "
        "weights array<double>, cnt long, vmin double, vmax double")
    day = tdigest_cascade(streamed, "1 day", delta=100)
    qs = tdigest_quantiles(day).collect()
    assert qs and all(r.p50 <= r.p95 <= r.p99 for r in qs)
    assert sum(r.cnt for r in qs) == sum(c for _, _, c, _, _ in got.values())


def test_streaming_histogram_matches_batch(spark, tmp_path):
    """Streaming explicit-bounds histogram == batch rollup_histogram on
    closed (watermark-expired) windows, and its output feeds the batch
    histogram_cascade unchanged (streaming/batch tier handoff)."""
    import os

    from json_time_series_extractor_spark.operators.rollup import (
        histogram_cascade, rollup_histogram,
    )
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_histogram,
    )

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key",
                           "CAST(ts AS TIMESTAMP) AS ts",
                           "value AS value_double"))
    src = str(tmp_path / "hist_stream")
    os.makedirs(src)
    samples.coalesce(1).write.parquet(src + "/f1")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, value_double double")
              .parquet(src + "/*"))
    bounds = (25.0, 50.0, 100.0)
    q = (streaming_histogram(stream, bounds, tier="1 hour",
                             watermark="0 seconds")
         .writeStream.outputMode("append").format("memory")
         .queryName("hist_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    try:
        got = {(r.series_key, r.bucket_ts): (list(r.hist), r.cnt)
               for r in spark.sql(
                   "SELECT * FROM hist_stream_test").collect()}
    finally:
        q.stop()

    batch = rollup_histogram(samples, "1 hour", bounds=bounds)
    want = {(r.series_key, r.bucket_ts): (list(r.hist), r.cnt)
            for r in batch.collect()}
    # Append mode emits only watermark-closed windows: every emitted
    # window must match batch exactly, and all but each series' final
    # (still-open) window must have been emitted.
    assert got and all(got[k] == want[k] for k in got)
    last = {}
    for sk, bt in want:
        if sk not in last or bt > last[sk]:
            last[sk] = bt
    missing = {k for k in want if k not in got}
    assert missing <= {(sk, bt) for sk, bt in last.items()}

    # The streamed rows ARE valid child-tier state for the batch cascade.
    streamed = spark.createDataFrame(
        [(sk, bt, h, c) for (sk, bt), (h, c) in got.items()],
        "series_key string, bucket_ts timestamp, hist array<bigint>, "
        "cnt long")
    day = histogram_cascade(streamed, "1 day", n_bins=len(bounds) + 1)
    assert day.count() > 0
    total_stream = sum(c for _, c in got.values())
    assert sum(r.cnt for r in day.collect()) == total_stream


def test_streaming_hll_matches_batch(spark, tmp_path):
    """Streamed HLL registers equal batch hll_rollup registers on
    closed windows (same reg/rank expressions, MAX-merged late rows),
    and feed hll_estimate unchanged."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.hll import (
        hll_estimate, hll_rollup)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_hll)

    rows = [("s", datetime(2024, 1, 1, 0, m % 60), f"u{m % 37}")
            for m in range(300)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")
    on_time = df.where("pmod(hash(key), 4) != 0")
    late = df.where("pmod(hash(key), 4) = 0")
    flush = spark.createDataFrame(
        [("_flush", datetime(2024, 1, 1, 0) + timedelta(days=30), "k")],
        "series_key string, ts timestamp, key string")
    src = str(tmp_path / "src")
    on_time.coalesce(1).write.parquet(src + "/f1")
    late.unionByName(flush).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, key string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_hll(stream, tier="1 hour", watermark="2 hours")
         .writeStream.outputMode("append").format("memory")
         .queryName("hll_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("hll_stream_test").localCheckpoint(eager=True)
    batch = hll_rollup(df, "1 hour", key_col="key")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    (est,) = hll_estimate(streamed).collect()
    assert abs(est["ndv_est"] - 37) < 4  # ~37 distinct keys


def test_streaming_cm_matches_batch(spark, tmp_path):
    """Streamed Count-Min registers equal batch cm_rollup registers on
    closed windows (same _cm_bucket expressions, additive COUNT-merged
    late rows), and feed cm_estimate unchanged — the parameter stamp
    included."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_estimate, cm_rollup)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_cm)

    rows = [("s", datetime(2024, 1, 1, 0, m % 60), f"u{m % 23}")
            for m in range(300)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")
    on_time = df.where("pmod(hash(key), 4) != 0")
    late = df.where("pmod(hash(key), 4) = 0")
    flush = spark.createDataFrame(
        [("_flush", datetime(2024, 1, 1, 0) + timedelta(days=30), "k")],
        "series_key string, ts timestamp, key string")
    src = str(tmp_path / "src")
    on_time.coalesce(1).write.parquet(src + "/f1")
    late.unionByName(flush).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, key string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_cm(stream, tier="1 hour", watermark="2 hours")
         .writeStream.outputMode("append").format("memory")
         .queryName("cm_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("cm_stream_test").localCheckpoint(eager=True)
    batch = cm_rollup(df, "1 hour", key_col="key")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # estimates off the streamed registers: exact here (23 keys << 1024
    # width, collisions possible but the one-sided bound always holds)
    keys = df.select("series_key",
                     F.date_trunc("hour", "ts").alias("bucket_ts"),
                     "key").distinct()
    exact = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    # memory-sink schema drops the metadata stamp? assert the contract
    # still verifies: estimates are one-sided vs truth
    for r in cm_estimate(streamed, keys).collect():
        assert r["cm_est"] >= exact[r["key"]]


def test_streaming_rollup_tiers_matches_batch_cascade(spark, tmp_path):
    """Chained streaming-to-streaming cascade (r6): ONE append-mode
    query runs raw -> 1m -> 1h -> 1d as chained time-window aggregates
    (multiple stateful operators under a single watermark), and the
    emitted 1d tier equals the batch rollup -> cascade -> cascade chain
    exactly — including late rows that arrive a micro-batch later and
    must merge into the fine tier before cascading."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.rollup import (
        rollup, rollup_cascade)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_rollup_tiers)

    # ~3 days, 3 series, irregular spacing, half-integer values (exact
    # in binary, so sums are accumulation-order independent)
    rows = [(f"s{m % 3}",
             datetime(2024, 1, 1) + timedelta(minutes=(m * 17) % 4321,
                                              seconds=m % 59),
             (m % 13) - 3.5)
            for m in range(700)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    on_time = df.where("pmod(hash(series_key, ts), 4) != 0")
    late = df.where("pmod(hash(series_key, ts), 4) = 0")
    flush = spark.createDataFrame(
        [("_flush", datetime(2025, 1, 1), 0.0)],
        "series_key string, ts timestamp, value_double double")
    src = str(tmp_path / "src")
    on_time.coalesce(1).write.parquet(src + "/f1")
    late.unionByName(flush).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, "
                      "value_double double")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_rollup_tiers(stream, ("1 minute", "1 hour", "1 day"),
                                watermark="2 hours",
                                deterministic_last=True)
         .writeStream.outputMode("append").format("memory")
         .queryName("tiers_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("tiers_stream_test").localCheckpoint(eager=True)
    batch = (rollup_cascade(rollup_cascade(
        rollup(df, "1 minute", deterministic_last=True), "1 hour"), "1 day")
        .select("series_key", "bucket_ts", "min", "max", "sum", "count",
                "mean", "last", "last_ts"))
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_streaming_bloom_matches_batch(spark, tmp_path):
    """Streamed Bloom bit rows equal batch bloom_rollup bit rows on
    closed windows (same _bloom_bit expressions, set-union-merged late
    rows), and feed bloom_probe unchanged — no false negatives on
    present keys."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.bloom import (
        bloom_probe, bloom_rollup)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_bloom)

    rows = [("s", datetime(2024, 1, 1, 0, m % 60), f"u{m % 29}")
            for m in range(300)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")
    on_time = df.where("pmod(hash(key), 4) != 0")
    late = df.where("pmod(hash(key), 4) = 0")
    flush = spark.createDataFrame(
        [("_flush", datetime(2024, 1, 1, 0) + timedelta(days=30), "k")],
        "series_key string, ts timestamp, key string")
    src = str(tmp_path / "src")
    on_time.coalesce(1).write.parquet(src + "/f1")
    late.unionByName(flush).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, key string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_bloom(stream, tier="1 hour", watermark="2 hours")
         .writeStream.outputMode("append").format("memory")
         .queryName("bloom_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("bloom_stream_test") \
        .localCheckpoint(eager=True)
    batch = bloom_rollup(df, "1 hour", key_col="key")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # Probe off the streamed bits: every present key must flag.
    keys = df.select("series_key",
                     F.date_trunc("hour", "ts").alias("bucket_ts"),
                     "key").distinct()
    probed = bloom_probe(streamed, keys).collect()
    assert probed and all(r["maybe_present"] for r in probed)


def test_stateful_kmv_matches_batch_on_closed_buckets(spark, tmp_path):
    """Streamed KMV sketches equal batch kmv_rollup sketches on closed
    buckets — bit-for-bit, including across micro-batch boundaries —
    and feed kmv_estimate unchanged (exact-below-k on small buckets)."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.kmv import (
        kmv_estimate, kmv_rollup)
    from json_time_series_extractor_spark.streaming.stateful import (
        stateful_kmv)

    k = 8  # small k so min-k selection (not exactness) is exercised
    rows = [("s", datetime(2024, 1, 1, 0, 0) + timedelta(minutes=m),
             f"u{(m * 7) % 41}") for m in range(240)] \
        + [("t", datetime(2024, 1, 1, 0, 0) + timedelta(minutes=m),
            f"v{m % 3}") for m in range(120)]  # below-k series
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")
    flush = spark.createDataFrame(
        [("s", datetime(2024, 2, 1), "x"), ("t", datetime(2024, 2, 1), "x")],
        "series_key string, ts timestamp, key string")
    # Two in-order files split at minute 90 — MID-bucket for hour 1 —
    # so the open-bucket state must carry partial hashes across the
    # micro-batch boundary to reproduce the batch sketch.
    f1 = df.where("ts < timestamp'2024-01-01 01:30:00'")
    f2 = df.exceptAll(f1).unionByName(flush)
    src = str(tmp_path / "src")
    f1.coalesce(1).write.parquet(src + "/f1")
    f2.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream
              .schema("series_key string, ts timestamp, key string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (stateful_kmv(stream, tier_seconds=3600, k=k)
         .writeStream.outputMode("append").format("memory")
         .queryName("kmv_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {(r.series_key, r.bucket_ts): list(r.kmv)
                for r in spark.table("kmv_stream_test").collect()}
    batch = {(r.series_key, r.bucket_ts): list(r.kmv)
             for r in kmv_rollup(df, "1 hour", k,
                                 key_col="series_key",
                                 item_col="key").collect()}
    assert streamed == batch  # bit-for-bit, all 4+2 real windows closed
    assert len(streamed) == 6
    # exact-below-k: series "t" has 3 distinct keys < k=8
    est = (spark.table("kmv_stream_test")
           .select("series_key", "bucket_ts",
                   kmv_estimate(F.col("kmv"), k).alias("ndv")))
    for r in est.where("series_key = 't'").collect():
        assert r["ndv"] == 3.0


def test_streaming_refresh_partial_log(spark, tmp_path):
    """write_partials_stream + read_merged_tier == a batch
    rollup_mergeable over everything, regardless of micro-batching;
    crash-replaying a batch id (identical content) is a no-op; buckets
    touched after batch 0 carry refreshed=true."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from json_time_series_extractor_spark.operators.refresh import (
        read_merged_tier, rollup_mergeable, write_partials_stream)

    schema = "series_key string, ts timestamp, value_double double"
    b0 = [("a", datetime(2024, 1, 1, 0, 0, 10), 2.0),
          ("a", datetime(2024, 1, 1, 0, 1, 5), 4.0),
          ("b", datetime(2024, 1, 1, 0, 0, 30), 1.0)]
    b1 = [("a", datetime(2024, 1, 1, 0, 0, 55), 9.5),   # revises a@m0
          ("c", datetime(2024, 1, 1, 0, 2, 1), 7.0)]    # new series
    b2 = [("b", datetime(2024, 1, 1, 0, 0, 30), 3.0)]   # exact-ts tie
    src = str(tmp_path / "src")
    for i, rows in enumerate((b0, b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{src}/f{i}")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    tier_dir = str(tmp_path / "tier")
    q = write_partials_stream(stream, tier_dir, "1 minute",
                              checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    everything = spark.createDataFrame(b0 + b1 + b2, schema)
    want = {(r["series_key"], r["bucket_ts"]): r
            for r in rollup_mergeable(everything, "1 minute").collect()}
    got = {(r["series_key"], r["bucket_ts"]): r
           for r in read_merged_tier(spark, tier_dir).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for c in ("min", "max", "sum_fp6", "cnt", "last", "last_ts"):
            assert g[c] == w[c], (k, c)
    m0 = datetime(2024, 1, 1, 0, 0)
    assert got[("a", m0)]["refreshed"] is True
    assert got[("b", m0)]["refreshed"] is True
    assert got[("c", datetime(2024, 1, 1, 0, 2))]["refreshed"] is True
    assert got[("a", datetime(2024, 1, 1, 0, 1))]["refreshed"] is False
    # tie resolves to the larger value, same as the batch tie rule
    assert got[("b", m0)]["last"] == 3.0

    # crash-replay: rewriting batch 1's directory with identical
    # content (what the engine does on recovery) changes nothing
    parts = (rollup_mergeable(spark.createDataFrame(b1, schema),
                              "1 minute")
             .withColumn("p_batch", F.lit(1)))
    parts.write.mode("overwrite").parquet(f"{tier_dir}/b00001")
    again = {(r["series_key"], r["bucket_ts"]): r
             for r in read_merged_tier(spark, tier_dir).collect()}
    assert {k: tuple(v) for k, v in got.items()} \
        == {k: tuple(v) for k, v in again.items()}

    # compaction: folds the three batch dirs into one superseding
    # generation; the merged view is unchanged bit-for-bit
    import os

    from json_time_series_extractor_spark.operators.refresh import (
        compact_partials)

    assert compact_partials(spark, tier_dir) == 3
    names = sorted(n for n in os.listdir(tier_dir)
                   if not n.startswith("_"))
    assert names == ["c00002"]
    after = {(r["series_key"], r["bucket_ts"]): tuple(r)
             for r in read_merged_tier(spark, tier_dir).collect()}
    assert after == {k: tuple(v) for k, v in got.items()}

    # crashed-compaction debris (a stale b-dir below the generation)
    # is ignored by readers and swept by the next compaction
    parts.write.mode("overwrite").parquet(f"{tier_dir}/b00001")
    assert {(r["series_key"], r["bucket_ts"]): tuple(r)
            for r in read_merged_tier(spark, tier_dir).collect()} == after
    assert compact_partials(spark, tier_dir) == 0  # sweep only
    assert sorted(n for n in os.listdir(tier_dir)
                  if not n.startswith("_")) == ["c00002"]

    # post-compaction batches keep merging on top of the generation
    b3 = [("a", datetime(2024, 1, 1, 0, 0, 20), 1.5)]
    (rollup_mergeable(spark.createDataFrame(b3, schema), "1 minute")
     .withColumn("p_batch", F.lit(3))
     .write.parquet(f"{tier_dir}/b00003"))
    want2 = {(r["series_key"], r["bucket_ts"]): r
             for r in rollup_mergeable(
                 spark.createDataFrame(b0 + b1 + b2 + b3, schema),
                 "1 minute").collect()}
    got2 = {(r["series_key"], r["bucket_ts"]): r
            for r in read_merged_tier(spark, tier_dir).collect()}
    for k, w in want2.items():
        for c in ("min", "max", "sum_fp6", "cnt", "last", "last_ts"):
            assert got2[k][c] == w[c], (k, c)


def test_streaming_lww_matches_batch(spark, tmp_path):
    """Streamed LWW winners equal the batch dedup on closed keys: the
    correction arrives a micro-batch AFTER its base delivery (within
    the watermark) and must overturn it; n_versions merges additively
    across batches; the same-key same-ingest_ts seq tie-break holds
    across the batch boundary."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.ingest import (
        dedup_ingest_lww)
    from json_time_series_extractor_spark.streaming.stream import (
        streaming_lww)

    t0 = datetime(2024, 1, 1, 0, 0)
    sch = ("series_key string, ts timestamp, value_double double, "
           "ingest_ts timestamp, ingest_seq int")
    on_time = [("a", t0 + timedelta(minutes=m), float(m),
                t0 + timedelta(minutes=m), 0) for m in range(20)]
    late = (
        [("a", t0 + timedelta(minutes=m), float(m) + 100.0,
          t0 + timedelta(minutes=m, seconds=300), 1)
         for m in range(0, 20, 3)]
        # stale republish at the SAME late ingest_ts, lower seq: loses
        + [("a", t0, -5.0, t0 + timedelta(seconds=300), 0)])
    df1 = spark.createDataFrame(on_time, sch)
    df2 = spark.createDataFrame(late, sch)
    flush = spark.createDataFrame(
        [("_flush", t0 + timedelta(days=30), 0.0,
          t0 + timedelta(days=30), 0)], sch)
    src = str(tmp_path / "src")
    df1.coalesce(1).write.parquet(src + "/f1")
    df2.unionByName(flush).coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_lww(stream, watermark="2 hours")
         .writeStream.outputMode("append").format("memory")
         .queryName("lww_stream_test")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = (spark.table("lww_stream_test")
                .where("series_key != '_flush'")
                .localCheckpoint(eager=True))
    batch = dedup_ingest_lww(df1.unionByName(df2))
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    got = {r["ts"].minute: (r["value_double"], r["n_versions"])
           for r in streamed.collect()}
    assert got[0] == (100.0, 3)    # correction beats base AND stale
    assert got[3] == (103.0, 2)
    assert got[1] == (1.0, 1)
