"""spark-submit entrypoint: the full resumable pipeline as a CLI.

North-rule requirement: the engine runs via ``spark-submit --py-files`` on
multi-executor clusters. This module is that surface::

    zip -r jtse.zip json_time_series_extractor_spark
    spark-submit --py-files jtse.zip runner.py pipeline \
        --input /data/pages --output-root /data/out --run-id r1 \
        --retention-today 2024-02-20

(or in-process: ``python -m json_time_series_extractor_spark pipeline ...``).

Stages (each resumable via the lineage protocol in ``plans.pipeline``; a
re-run with the same ``--output-root`` skips DONE partitions):

1. **extract**  — pages -> samples (``mapInPandas``), partitioned by capture
   day ``dt``; per-day lineage rows + counters.
2. **rollup_1m** — incremental by EVENT day (``run_event_day_stage``):
   late samples whose timestamp day differs from the capture day rebuild
   the affected sample-day partitions from all capture days; event days
   older than the raw retention horizon are dead-lettered. **rollup_1h /
   rollup_1d** cascade day-aligned, force-refreshing any bucket-day the
   previous tier rewrote this run.
3. **gapfill** (optional) — per-series dense grid spans days, so it runs
   globally; it refreshes whenever the fine tier rewrote partitions.
4. **compress** (optional) — Gorilla/DoD chunks, day-partitioned, same
   event-day protocol as rollup_1m.
5. **retention** — per-tier partition expiry driven by ``--retention-today``
   (explicit date, never wall-clock).

All stage boundaries are parquet directories in this sandbox; on a real
cluster the same protocol maps to Iceberg tables (see ``plans.pipeline``).
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date
from typing import List, Optional

from pyspark.sql import SparkSession, functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="json_time_series_extractor_spark",
        description="PySpark-native JSON time-series extraction + rollup "
                    "+ retention engine")
    sub = p.add_subparsers(dest="command", required=True)

    syn = sub.add_parser("synthesize",
                         help="write a deterministic synthetic pages table "
                              "(bucket(url), days(warc_ts) partition spec)")
    syn.add_argument("--n-docs", type=int, required=True)
    syn.add_argument("--output", required=True)
    syn.add_argument("--hosts", type=int, default=1000)
    syn.add_argument("--url-buckets", type=int, default=32)

    corp = sub.add_parser(
        "corpus",
        help="training-corpus operations over a documents table "
             "(dedup / deterministic sampling / near-dup clustering)")
    corp.add_argument("--input", required=True,
                      help="documents table path (parquet; needs doc_id + "
                           "text, plus the group column for per-group ops)")
    corp.add_argument("--output", required=True)
    corp.add_argument("--op", required=True,
                      choices=["dedup-exact", "dedup-minhash",
                               "sample-fraction", "sample-per-group",
                               "neardup-components", "url-dedup",
                               "dedup-paragraphs", "dup-ngram-stats",
                               "token-count-bpe", "decontaminate",
                               "lm-quality", "domain-stats",
                               "dedup-spans", "boilerplate-lines",
                               "collapse-lines", "domain-mix",
                               "split-assign", "quality-threshold"])
    corp.add_argument("--fraction", type=float, default=0.1,
                      help="sample-fraction: keep probability")
    corp.add_argument("--group-col", default="lang")
    corp.add_argument("--per-group-n", type=int, default=1000)
    corp.add_argument("--threshold", type=float, default=0.5,
                      help="dedup-minhash/neardup: Jaccard threshold")
    corp.add_argument("--num-hashes", type=int, default=64)
    corp.add_argument("--bands", type=int, default=16)
    corp.add_argument("--max-bucket-size", type=int, default=10_000,
                      help="dedup-minhash/neardup: LSH buckets larger "
                           "than this emit linear star edges instead of "
                           "all pairs (B^2 blowup guard at web scale; "
                           "components-equivalent). 0 disables the cap "
                           "(exact all-pairs, verification runs only)")
    corp.add_argument("--seed", type=int, default=7)
    corp.add_argument("--components-algorithm",
                      choices=["minlabel", "star"], default="minlabel",
                      help="neardup-components: BSP min-label (rounds = "
                           "diameter) or large-star/small-star (O(log^2 n) "
                           "rounds for adversarial graphs)")
    corp.add_argument("--url-col", default="url",
                      help="url-dedup: URL column name")
    corp.add_argument("--paragraph-sep", default="\\n\\n",
                      help="dedup-paragraphs: separator (escapes decoded)")
    corp.add_argument("--ngram-n", type=int, default=8,
                      help="dup-ngram-stats: window length in tokens")
    corp.add_argument("--bpe-merges", type=int, default=200,
                      help="token-count-bpe: max learned merges")
    corp.add_argument("--bpe-max-vocab", type=int, default=65536,
                      help="token-count-bpe: training-vocab truncation "
                           "(top-N words by freq desc, word asc — the "
                           "bounded driver collect)")
    corp.add_argument("--eval-input", default=None,
                      help="decontaminate: benchmark/eval documents "
                           "table (parquet; doc_id + text). REQUIRED "
                           "for the decontaminate op")
    corp.add_argument("--decontam-n", type=int, default=8,
                      help="decontaminate: word n-gram length")
    corp.add_argument("--drop-contaminated", action="store_true",
                      help="decontaminate: write surviving DOCS instead "
                           "of the per-doc score table")
    corp.add_argument("--lm-threshold-fp6", type=int, default=-6_000_000,
                      help="lm-quality: avg-logprob flag threshold "
                           "(1e-6 fixed point)")
    corp.add_argument("--chars-col", default=None,
                      help="domain-stats: optional per-doc char-count "
                           "column to total per domain")
    corp.add_argument("--min-df", type=int, default=3,
                      help="boilerplate-lines: distinct-doc frequency "
                           "at which a line is furniture")
    corp.add_argument("--min-chars", type=int, default=6,
                      help="boilerplate-lines: normalized length below "
                           "which lines are immune")
    corp.add_argument("--target-total", type=int, default=100_000,
                      help="domain-mix: docs to keep across all domains")
    corp.add_argument("--domain-col", default="domain",
                      help="domain-mix: pre-computed domain column")
    corp.add_argument("--splits", default="train=0.9,val=0.05,test=0.05",
                      help="split-assign: name=weight list in order")
    corp.add_argument("--drop-frac", type=float, default=0.1,
                      help="quality-threshold: worst fraction to drop "
                           "by the exact corpus quantile")
    corp.add_argument("--score-col", default="quality_score_fp6",
                      help="quality-threshold: int64 score column "
                           "(computed from text when absent)")
    corp.add_argument("--dup-ratio-flag-fp6", type=int,
                      default=1_500_000,
                      help="domain-stats: docs/pages ratio above which "
                           "a domain is flagged (1e-6 fixed point)")

    q = sub.add_parser(
        "query",
        help="run a PromQL-subset expression over a samples table "
             "(plans/promql.py: tumbling-grid evaluation, lowered onto "
             "the engine's operators)")
    q.add_argument("--input", required=True,
                   help="samples table path (parquet; needs the key/ts/"
                        "value columns)")
    q.add_argument("--expr", required=True,
                   help="PromQL expression, e.g. "
                        "'sum(rate({series_key=~\".+\"}[1h]))'")
    q.add_argument("--step", default="1 hour",
                   help="evaluation grid, e.g. '1 hour' (range selectors "
                        "must align to it)")
    q.add_argument("--key-col", default="series_key")
    q.add_argument("--ts-col", default="ts")
    q.add_argument("--value-col", default="value_double")
    q.add_argument("--fp6-cross-series", action="store_true",
                   help="quantize to 1e-6 ints before cross-series float "
                        "accumulation (reproducible sums)")
    q.add_argument("--histogram-bounds", action="append", default=[],
                   metavar="NAME=B0,B1,...",
                   help="declare histogram bin bounds for a metric so "
                        "histogram_quantile() can lower onto the "
                        "mergeable histogram tier (repeatable)")
    q.add_argument("--tier", action="append", default=[],
                   metavar="INTERVAL=PATH",
                   help="materialized rollup tier parquet (built with "
                        "deterministic_last=True), e.g. "
                        "'1 minute=/tiers/1m'; instant/_over_time "
                        "selectors serve from it instead of rescanning "
                        "raw samples (repeatable)")
    q.add_argument("--output", default=None,
                   help="parquet output dir; omit to print row count + "
                        "first rows as JSON")
    q.add_argument("--show", type=int, default=20,
                   help="rows to print when --output is omitted")

    pipe = sub.add_parser("pipeline", help="run the resumable pipeline")
    pipe.add_argument("--input", required=True,
                      help="pages table path (parquet dir)")
    pipe.add_argument("--output-root", required=True)
    pipe.add_argument("--run-id", default="run")
    pipe.add_argument("--options-json", default=None,
                      help="ExtractorOptions as a JSON object (default: the "
                           "synthetic-pages F6 options)")
    pipe.add_argument("--tiers", default="1m,1h,1d")
    pipe.add_argument("--gapfill", choices=["none", "locf", "linear"],
                      default="none")
    pipe.add_argument("--compress", action="store_true",
                      help="write Gorilla/delta-of-delta chunk table")
    pipe.add_argument("--chunk-window", default="1 day")
    pipe.add_argument("--retention-today", default=None,
                      help="YYYY-MM-DD; enables tiered retention relative "
                           "to this date (explicit, never wall-clock)")
    pipe.add_argument("--salt-buckets", type=int, default=0,
                      help=">0 uses the skew-safe salted two-phase rollup "
                           "for the 1m tier")
    pipe.add_argument("--detect-hot-keys", action="store_true",
                      help="with --salt-buckets: sample-detect heavy-hitter "
                           "series and salt only those (cold keys skip the "
                           "extra shuffle fan-out)")
    return p


TIER_WINDOWS = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def run_pipeline(spark: SparkSession, args: argparse.Namespace) -> dict:
    from json_time_series_extractor_spark.operators.chunks import (
        compress_chunks)
    from json_time_series_extractor_spark.operators.extract import (
        SAMPLE_SCHEMA, extract_samples)
    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_linear, gapfill_locf)
    from json_time_series_extractor_spark.operators.retention import (
        apply_tiered_retention)
    from json_time_series_extractor_spark.operators.rollup import (
        ROLLUP_SCHEMA, detect_hot_keys, rollup, rollup_cascade,
        rollup_salted)
    from json_time_series_extractor_spark.plans.pipeline import (
        LineageStore, list_partition_values, run_event_day_stage,
        run_partitioned_stage)
    from json_time_series_extractor_spark.sources.pages import (
        PAGES_EXTRACT_OPTIONS)

    root = args.output_root.rstrip("/")
    lineage_path = f"{root}/lineage"
    options = (json.loads(args.options_json) if args.options_json
               else dict(PAGES_EXTRACT_OPTIONS))
    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    unknown = [t for t in tiers if t not in TIER_WINDOWS]
    if unknown:
        raise SystemExit(f"unknown tiers: {unknown} (have 1m/1h/1d)")
    order = list(TIER_WINDOWS)
    if [order.index(t) for t in tiers] != sorted(
            order.index(t) for t in tiers):
        # A coarse tier cascaded into a finer one would produce one
        # midnight bucket per day carrying day-level aggregates — garbage.
        raise SystemExit(f"tiers must go fine->coarse (e.g. 1m,1h,1d); "
                         f"got {args.tiers!r}")

    # Lateness horizon: when retention is active, event days whose raw
    # contributors may already be expired must not be rebuilt (a recompute
    # would see only the new late rows). Late data older than the raw
    # horizon is dead-lettered by the event-day stages.
    min_event_day = None
    if args.retention_today:
        from datetime import timedelta

        from json_time_series_extractor_spark.operators.retention import (
            DEFAULT_RETENTION_DAYS)

        raw_days = DEFAULT_RETENTION_DAYS.get("raw")
        if raw_days is not None:
            min_event_day = (date.fromisoformat(args.retention_today)
                             - timedelta(days=raw_days)).isoformat()

    report: dict = {"run_id": args.run_id, "stages": {}}

    def record(res) -> None:
        report["stages"][res.stage] = {
            "processed": len(res.processed), "skipped": len(res.skipped),
            "output_rows": res.output_count,
            "rewritten_partitions": len(res.output_partitions),
            "dead_lettered": len(res.dead_lettered)}

    # 1. extract ------------------------------------------------------
    # Partition discovery everywhere below goes through FILESYSTEM
    # metadata (list_partition_values) — never a distinct() scan of the
    # data. A non-dt-partitioned input (dt derived from warc_ts) returns
    # None and falls back to the scan, with a visible warning.
    pages = spark.read.parquet(args.input)
    input_parts = list_partition_values(spark, args.input, "dt")
    if "dt" not in pages.columns:
        pages = pages.withColumn("dt", F.to_date("warc_ts"))
    if input_parts is None:
        print("WARNING: input is not dt-partitioned; stage discovery "
              "falls back to a full distinct() scan — repartition the "
              "input by dt for warehouse-scale runs", file=sys.stderr)
    res = run_partitioned_stage(
        spark, stage="extract", input_df=pages, partition_col="dt",
        transform=lambda df: extract_samples(df, options)
        .withColumn("dt", F.to_date("warc_ts")),
        output_path=f"{root}/samples", lineage_path=lineage_path,
        run_id=args.run_id, input_partitions=input_parts)
    record(res)

    # 2. rollup tiers --------------------------------------------------
    # Explicit schemas on every read-back: retention can expire EVERY
    # partition of a stage output, and schema inference on an empty
    # directory fails — a resumed run must read it as an empty DataFrame.
    samples = spark.read.schema(SAMPLE_SCHEMA + ", dt date").parquet(
        f"{root}/samples")
    child_path = None
    prev_rewritten: list = []
    for tier in tiers:
        window = TIER_WINDOWS[tier]
        if child_path is None:
            # Raw -> first tier: output partitions key on the SAMPLE day
            # (bucket_ts), but resume tracks the CAPTURE day (a late
            # sample's bucket-day partition draws from several capture
            # days) — run_event_day_stage recomputes affected sample-days
            # wholesale so partial aggregates never overwrite complete
            # partitions.
            if args.salt_buckets > 0:
                # Hot-key detection runs lazily, inside the transform: a
                # no-op resume (nothing pending) must not pay the sampling
                # scan just to throw the result away.
                hot_memo: list = []

                def tf(df, w=window):
                    if getattr(args, "detect_hot_keys", False):
                        if not hot_memo:
                            hot_memo.append(detect_hot_keys(samples))
                        h = hot_memo[0]
                    else:
                        h = None
                    return (rollup_salted(df, w,
                                          salt_buckets=args.salt_buckets,
                                          hot_keys=h)
                            .withColumn("dt", F.to_date("bucket_ts")))
            else:
                tf = lambda df, w=window: (
                    rollup(df, w).withColumn("dt", F.to_date("bucket_ts")))
            res = run_event_day_stage(
                spark, stage=f"rollup_{tier}", input_df=samples,
                capture_col="dt", event_day=lambda df: F.to_date(df["ts"]),
                transform=tf, output_path=f"{root}/rollup_{tier}",
                lineage_path=lineage_path, run_id=args.run_id,
                min_event_day=min_event_day,
                input_partitions=list_partition_values(
                    spark, f"{root}/samples", "dt"))
        else:
            # Cascade from the previous tier's mergeable state. Bucket-days
            # align across tiers (canonical windows never cross a day), so
            # the plain capture==event partitioned stage is sound here.
            tf = lambda df, w=window: (
                rollup_cascade(df.drop("dt"), w)
                .withColumn("dt", F.to_date("bucket_ts")))
            stage_in = spark.read.schema(ROLLUP_SCHEMA + ", dt date") \
                .parquet(child_path)
            # force: bucket-days the previous tier rewrote this run must
            # cascade even when this tier marked them DONE earlier.
            res = run_partitioned_stage(
                spark, stage=f"rollup_{tier}", input_df=stage_in,
                partition_col="dt", transform=tf,
                output_path=f"{root}/rollup_{tier}",
                lineage_path=lineage_path, run_id=args.run_id,
                force=set(prev_rewritten),
                input_partitions=list_partition_values(
                    spark, child_path, "dt"))
        record(res)
        prev_rewritten = res.output_partitions
        child_path = f"{root}/rollup_{tier}"

    # 3. gapfill (global per-series grids cross day partitions) --------
    if args.gapfill != "none" and tiers:
        fine = spark.read.schema(ROLLUP_SCHEMA + ", dt date").parquet(
            f"{root}/rollup_{tiers[0]}")
        fn = gapfill_locf if args.gapfill == "locf" else gapfill_linear
        lineage = LineageStore(spark, lineage_path)
        stage = f"gapfill_{args.gapfill}"
        fine_changed = (report["stages"]
                        .get(f"rollup_{tiers[0]}", {})
                        .get("rewritten_partitions", 0) > 0)
        if fine_changed or (
                "__global__" not in lineage.completed_partitions(stage)):
            out = fn(fine.drop("dt"), TIER_WINDOWS[tiers[0]],
                     value_col="mean")
            out.write.mode("overwrite").parquet(f"{root}/{stage}")
            n = spark.read.parquet(f"{root}/{stage}").count()
            lineage.append([(stage, "__global__", args.run_id,
                             0, int(n), 0, "DONE")])
            report["stages"][stage] = {"processed": 1, "skipped": 0,
                                       "output_rows": int(n)}
        else:
            report["stages"][stage] = {"processed": 0, "skipped": 1,
                                       "output_rows": 0}

    # 4. compression ----------------------------------------------------
    if args.compress:
        from json_time_series_extractor_spark.operators.gapfill import (
            _interval_seconds)

        chunk_s = _interval_seconds(args.chunk_window)
        if chunk_s > 86400 or 86400 % chunk_s != 0:
            raise SystemExit(
                f"--chunk-window {args.chunk_window!r} must evenly divide "
                "one day: the incremental compress stage recomputes whole "
                "sample-days, so chunks must not cross day boundaries")
        # Chunks key on sample time too (chunk_start) — same capture-day
        # vs event-day treatment as the first rollup tier.
        res = run_event_day_stage(
            spark, stage="compress", input_df=samples, capture_col="dt",
            event_day=lambda df: F.to_date(df["ts"]),
            transform=lambda df: compress_chunks(
                df.drop("dt"), args.chunk_window)
            .withColumn("dt", F.to_date("chunk_start")),
            output_path=f"{root}/chunks", lineage_path=lineage_path,
            run_id=args.run_id, min_event_day=min_event_day,
            input_partitions=list_partition_values(
                spark, f"{root}/samples", "dt"))
        record(res)

    # 5. retention -------------------------------------------------------
    if args.retention_today:
        today = date.fromisoformat(args.retention_today)
        tier_paths = [("raw", f"{root}/samples")] + [
            (t, f"{root}/rollup_{t}") for t in tiers]
        dropped = apply_tiered_retention(
            spark, tier_paths, today, lineage_path=lineage_path)
        report["stages"]["retention"] = {
            tier: len(parts) for tier, parts in dropped.items()}

    return report


def run_corpus(spark: SparkSession, args: argparse.Namespace) -> dict:
    """Corpus-pipeline dispatch: every op is a pure DataFrame transform
    from the operator modules (deterministic, partition-invariant), so
    the CLI surface is exactly the library surface."""
    from pyspark.sql import Observation

    from json_time_series_extractor_spark.operators.components import (
        dedup_survivors)
    from json_time_series_extractor_spark.operators.dedup import (
        dedup_exact, minhash_lsh_dedup_pairs)
    from json_time_series_extractor_spark.operators.sampling import (
        deterministic_sample, sample_per_group)

    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    # LSH mega-bucket cap: ON by default from the CLI (10^4) — a
    # templated cluster of 10^6 members in one bucket would otherwise
    # emit 10^12 pairs from the self-join. --max-bucket-size 0 restores
    # exact all-pairs for verification runs. Capping is metered via an
    # Observation surfaced in the report.
    cap = args.max_bucket_size if getattr(args, "max_bucket_size",
                                          0) > 0 else None
    obs = None
    if args.op == "dedup-exact":
        out = dedup_exact(docs)
    elif args.op == "dedup-minhash":
        obs = Observation("lsh_buckets") if cap else None
        pairs = minhash_lsh_dedup_pairs(
            docs, num_hashes=args.num_hashes, bands=args.bands,
            threshold=args.threshold, max_bucket_size=cap,
            observation=obs)
        surv = dedup_survivors(pairs,
                               algorithm=args.components_algorithm)
        # Drop every clustered doc except its canonical survivor.
        members = (pairs.selectExpr("id_a AS doc_id")
                   .union(pairs.selectExpr("id_b AS doc_id")).distinct())
        keepers = surv.selectExpr("keep_id AS doc_id")
        drop = members.join(keepers, "doc_id", "left_anti")
        out = docs.join(drop, "doc_id", "left_anti")
    elif args.op == "url-dedup":
        from json_time_series_extractor_spark.operators.urltools import (
            dedup_by_canonical_url)
        out = dedup_by_canonical_url(docs, url_col=args.url_col)
    elif args.op == "dedup-paragraphs":
        from json_time_series_extractor_spark.operators.dedup import (
            dedup_paragraphs)
        sep = args.paragraph_sep.encode().decode("unicode_escape")
        out = dedup_paragraphs(docs, sep=sep)
    elif args.op == "dup-ngram-stats":
        from json_time_series_extractor_spark.operators.dedup import (
            duplicate_ngram_stats)
        out = duplicate_ngram_stats(docs, n=args.ngram_n)
    elif args.op == "dedup-spans":
        from json_time_series_extractor_spark.operators.dedup import (
            remove_duplicate_spans)
        out = remove_duplicate_spans(docs, n=args.ngram_n)
    elif args.op == "token-count-bpe":
        from json_time_series_extractor_spark.operators.bpe import (
            bpe_token_counts, bpe_train)
        merges = bpe_train(docs, num_merges=args.bpe_merges,
                           max_vocab=args.bpe_max_vocab)
        out = bpe_token_counts(docs, merges)
    elif args.op == "decontaminate":
        from json_time_series_extractor_spark.operators.decontam import (
            benchmark_contamination)
        if not args.eval_input:
            raise SystemExit("decontaminate requires --eval-input")
        ev = spark.read.parquet(args.eval_input)
        scores = benchmark_contamination(docs, ev, n=args.decontam_n)
        if args.drop_contaminated:
            dirty = scores.where("contaminated").select("doc_id")
            out = docs.join(dirty, "doc_id", "left_anti")
        else:
            out = scores
    elif args.op == "lm-quality":
        from json_time_series_extractor_spark.operators.lmscore import (
            lm_quality_scores, trigram_frequencies,
            trigram_logprob_table)
        counts = [(r["gram"], r["cnt"])
                  for r in trigram_frequencies(docs).collect()]
        out = lm_quality_scores(docs, trigram_logprob_table(counts),
                                threshold_fp6=args.lm_threshold_fp6)
    elif args.op == "domain-stats":
        from json_time_series_extractor_spark.operators.urltools import (
            domain_stats)
        out = domain_stats(docs, url_col=args.url_col,
                           chars_col=args.chars_col,
                           dup_ratio_flag_fp6=args.dup_ratio_flag_fp6)
    elif args.op == "boilerplate-lines":
        from json_time_series_extractor_spark.operators.dedup import (
            remove_boilerplate_lines)
        out = remove_boilerplate_lines(docs, min_df=args.min_df,
                                       min_chars=args.min_chars)
    elif args.op == "collapse-lines":
        from json_time_series_extractor_spark.operators.dedup import (
            collapse_repeated_lines)
        out = collapse_repeated_lines(docs)
    elif args.op == "domain-mix":
        from json_time_series_extractor_spark.operators.sampling import (
            domain_mix_sample)
        d = docs
        if args.domain_col not in d.columns:
            from json_time_series_extractor_spark.operators.urltools \
                import canonical_url, url_host
            d = d.withColumn(args.domain_col,
                             url_host(canonical_url(F.col(args.url_col))))
        out = domain_mix_sample(d, args.target_total,
                                domain_col=args.domain_col,
                                seed=args.seed)
    elif args.op == "split-assign":
        from json_time_series_extractor_spark.operators.sampling import (
            assign_splits)
        weights = {}
        for part in args.splits.split(","):
            name, _, w = part.partition("=")
            weights[name.strip()] = float(w)
        out = assign_splits(docs, weights, seed=args.seed)
    elif args.op == "quality-threshold":
        from json_time_series_extractor_spark.operators.rankselect \
            import quantile_threshold_filter
        d = docs
        if args.score_col not in d.columns:
            from json_time_series_extractor_spark.operators.textstats \
                import with_quality_score
            d = with_quality_score(d).withColumn(
                args.score_col,
                F.floor(F.col("quality_score") * 1e6 + F.lit(0.5))
                .cast("long"))
        out = quantile_threshold_filter(d, args.score_col,
                                        args.drop_frac)
    elif args.op == "sample-fraction":
        out = deterministic_sample(docs, args.fraction, seed=args.seed)
    elif args.op == "sample-per-group":
        out = sample_per_group(docs, [args.group_col], args.per_group_n,
                               seed=args.seed)
    else:  # neardup-components
        obs = Observation("lsh_buckets") if cap else None
        pairs = minhash_lsh_dedup_pairs(
            docs, num_hashes=args.num_hashes, bands=args.bands,
            threshold=args.threshold, max_bucket_size=cap,
            observation=obs)
        out = dedup_survivors(pairs,
                              algorithm=args.components_algorithm)
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    report = {"command": "corpus", "op": args.op, "rows_in": n_in,
              "rows_out": n_out, "output": args.output}
    if obs is not None:
        report["lsh_bucket_cap"] = cap
        report["lsh_buckets"] = obs.get
    return report


def run_query(spark: SparkSession, args: argparse.Namespace) -> dict:
    """PromQL-subset dispatch: parse the declared histogram bounds, compile
    the expression onto the samples table and either write parquet or
    report count + head rows. The compiled plan is stock Catalyst (the
    frontend lowers everything onto the engine's operators), so writing
    the result is one ordinary distributed job."""
    from json_time_series_extractor_spark.plans.promql import promql

    bounds = {}
    for spec in args.histogram_bounds:
        name, _, rest = spec.partition("=")
        if not rest:
            raise SystemExit(f"--histogram-bounds needs NAME=B0,B1,... "
                             f"got {spec!r}")
        bounds[name] = tuple(float(b) for b in rest.split(","))
    tiers = {}
    for spec in args.tier:
        interval, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--tier needs INTERVAL=PATH, got {spec!r}")
        tiers[interval] = spark.read.parquet(path)
    out = promql(spark.read.parquet(args.input), args.expr, args.step,
                 key_col=args.key_col, ts_col=args.ts_col,
                 value_col=args.value_col,
                 fp6_cross_series=args.fp6_cross_series,
                 histogram_bounds=bounds or None,
                 tiers=tiers or None)
    report = {"command": "query", "expr": args.expr, "step": args.step}
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        report["output"] = args.output
        report["rows"] = spark.read.parquet(args.output).count()
        return report
    # r8 (ADVICE): one execution for the report path — persist the
    # result so the shown-rows collect and the count don't each re-run
    # the full compiled plan.
    out = out.persist()
    try:
        rows = (out.orderBy("series_key", "bucket_ts").limit(args.show)
                .collect())
        report["rows_shown"] = [
            {"series_key": r.series_key, "bucket_ts": str(r.bucket_ts),
             "value": r.value} for r in rows]
        report["rows"] = out.count()
    finally:
        out.unpersist()
    return report


def main(argv: Optional[List[str]] = None) -> None:
    from json_time_series_extractor_spark.plans.session import get_spark
    from json_time_series_extractor_spark.sources.pages import (
        synthesize_pages, write_pages_partitioned)

    args = _build_parser().parse_args(argv)
    # Under spark-submit the master/conf come from the submit command and
    # getOrCreate picks them up; standalone runs fall back to local[N].
    spark = get_spark(app_name=f"jtse-{args.command}")

    if args.command == "synthesize":
        pages = synthesize_pages(spark, args.n_docs, hosts=args.hosts)
        write_pages_partitioned(pages, args.output,
                                url_buckets=args.url_buckets)
        print(json.dumps({"command": "synthesize", "n_docs": args.n_docs,
                          "output": args.output}))
        return
    if args.command == "corpus":
        print(json.dumps(run_corpus(spark, args)))
        return
    if args.command == "query":
        print(json.dumps(run_query(spark, args)))
        return

    report = run_pipeline(spark, args)
    print(json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1:])
