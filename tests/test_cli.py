"""CLI / spark-submit entrypoint tests (north_rule: runs via
spark-submit --py-files; every stage resumable with lineage)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pipeline_args(input_path: str, out_root: str, **over) -> argparse.Namespace:
    base = dict(command="pipeline", input=input_path, output_root=out_root,
                run_id="t1", options_json=None, tiers="1m,1h",
                gapfill="locf", compress=True, chunk_window="1 day",
                retention_today=None, salt_buckets=0,
                detect_hot_keys=False)
    base.update(over)
    return argparse.Namespace(**base)


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    from json_time_series_extractor_spark.cli import run_pipeline
    from json_time_series_extractor_spark.sources.pages import (
        synthesize_pages, write_pages_partitioned)

    pages_path = str(tmp_path / "pages")
    out_root = str(tmp_path / "out")
    write_pages_partitioned(synthesize_pages(spark, 300), pages_path,
                            url_buckets=4)

    report = run_pipeline(spark, _pipeline_args(pages_path, out_root))
    st = report["stages"]
    assert st["extract"]["processed"] > 0
    assert st["extract"]["output_rows"] == 900  # 3 samples per page
    assert st["rollup_1m"]["output_rows"] > 0
    assert st["rollup_1h"]["output_rows"] > 0
    assert st["gapfill_locf"]["output_rows"] > 0
    assert st["compress"]["output_rows"] > 0

    # Outputs exist and the cascade is consistent with a direct rollup.
    r1h = spark.read.parquet(f"{out_root}/rollup_1h")
    assert r1h.agg(F.sum("count")).first()[0] == 900

    # Resume: everything already DONE -> nothing reprocessed.
    report2 = run_pipeline(spark, _pipeline_args(pages_path, out_root))
    st2 = report2["stages"]
    for stage in ("extract", "rollup_1m", "rollup_1h", "gapfill_locf",
                  "compress"):
        assert st2[stage]["processed"] == 0, stage
        assert st2[stage]["skipped"] > 0, stage


def test_pipeline_salted_rollup_matches_plain(spark, tmp_path):
    from json_time_series_extractor_spark.cli import run_pipeline
    from json_time_series_extractor_spark.sources.pages import (
        synthesize_pages, write_pages_partitioned)

    pages_path = str(tmp_path / "pages")
    write_pages_partitioned(synthesize_pages(spark, 300), pages_path)
    run_pipeline(spark, _pipeline_args(
        pages_path, str(tmp_path / "plain"), tiers="1m", gapfill="none",
        compress=False))
    run_pipeline(spark, _pipeline_args(
        pages_path, str(tmp_path / "salted"), tiers="1m", gapfill="none",
        compress=False, salt_buckets=8, detect_hot_keys=True))

    def rows(root):
        return {(r.series_key, r.bucket_ts):
                (r["min"], r["max"], r["count"])
                for r in spark.read.parquet(f"{root}/rollup_1m").collect()}

    assert rows(str(tmp_path / "plain")) == rows(str(tmp_path / "salted"))


def test_pipeline_retention_drops_old_days(spark, tmp_path):
    from json_time_series_extractor_spark.cli import run_pipeline
    from json_time_series_extractor_spark.sources.pages import (
        synthesize_pages, write_pages_partitioned)

    pages_path = str(tmp_path / "pages")
    out_root = str(tmp_path / "out")
    write_pages_partitioned(synthesize_pages(spark, 200), pages_path)

    # Pages span 2024-02-05..09; raw horizon is 7 days, so 2024-02-20
    # expires every raw day but keeps 1m (90d horizon).
    report = run_pipeline(spark, _pipeline_args(
        pages_path, out_root, tiers="1m", gapfill="none", compress=False,
        retention_today="2024-02-20"))
    ret = report["stages"]["retention"]
    assert ret["raw"] >= 4
    assert ret["1m"] == 0
    assert spark.read.parquet(f"{out_root}/rollup_1m").count() > 0
    # Lineage records the expiry so resume never re-extracts expired days.
    lineage = spark.read.parquet(f"{out_root}/lineage")
    assert lineage.where("status = 'EXPIRED'").count() >= 4


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    """The packaging path the north rule names: ship the package as a zip
    via spark-submit --py-files and run the pipeline CLI in a fresh JVM."""
    pkg_zip = str(tmp_path / "jtse.zip")
    pkg_root = os.path.join(REPO, "json_time_series_extractor_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    runner = tmp_path / "runner.py"
    runner.write_text(
        "from json_time_series_extractor_spark.cli import main\nmain()\n")

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out_dir = str(tmp_path / "pages")
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=2g",
         "--py-files", pkg_zip, str(runner),
         "synthesize", "--n-docs", "100", "--output", out_dir],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    assert json.loads(line)["n_docs"] == 100
    assert os.path.isdir(out_dir)


def test_resume_after_full_retention(spark, tmp_path):
    """Retention can expire EVERY raw-sample partition; a later resume must
    read the emptied stage outputs as empty (explicit schemas), not fail
    schema inference."""
    from json_time_series_extractor_spark.cli import run_pipeline
    from json_time_series_extractor_spark.sources.pages import (
        synthesize_pages, write_pages_partitioned)

    pages_path = str(tmp_path / "pages")
    out_root = str(tmp_path / "out")
    write_pages_partitioned(synthesize_pages(spark, 200), pages_path)
    args = _pipeline_args(pages_path, out_root, tiers="1m,1h",
                          gapfill="locf", compress=True,
                          retention_today="2024-02-20")
    run_pipeline(spark, args)        # raw horizon 7d -> all days expire
    report = run_pipeline(spark, args)   # resume over emptied samples dir
    st = report["stages"]
    assert st["extract"]["processed"] == 0 and st["extract"]["skipped"] > 0
    assert st["rollup_1m"]["processed"] == 0
    # 1m tier (90d horizon) survives both runs.
    assert spark.read.parquet(f"{out_root}/rollup_1m").count() > 0


def test_late_sample_refreshes_cascaded_tiers(spark, tmp_path):
    """A late sample rewrites its 1m event-day partition; the 1h cascade
    must refresh the same day instead of serving stale DONE aggregates."""
    import json as _json
    from datetime import datetime

    from json_time_series_extractor_spark.cli import run_pipeline

    def page(url, warc_ts, sample_ts, value):
        text = _json.dumps({"time": sample_ts, "v": value})
        return (url, warc_ts, bytearray(b"x"), text, "en")

    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    pages_path = str(tmp_path / "pages")
    out_root = str(tmp_path / "out")
    args = _pipeline_args(pages_path, out_root, tiers="1m,1h",
                          gapfill="none", compress=False,
                          options_json=_json.dumps(
                              {"timestamp_property": "/time"}))

    # Run 1: one page captured on the 5th, sample on the 5th.
    spark.createDataFrame(
        [page("u1", datetime(2024, 2, 5, 10), "2024-02-05T10:00:00Z", 1.0)],
        schema).write.mode("overwrite").parquet(pages_path)
    run_pipeline(spark, args)

    # Run 2: a page captured on the 6th carrying a LATE sample (on the 5th,
    # same hour) plus an on-time one.
    spark.createDataFrame(
        [page("u1", datetime(2024, 2, 5, 10), "2024-02-05T10:00:00Z", 1.0),
         page("u2", datetime(2024, 2, 6, 9), "2024-02-05T10:00:30Z", 5.0),
         page("u3", datetime(2024, 2, 6, 9), "2024-02-06T09:00:00Z", 2.0)],
        schema).write.mode("overwrite").parquet(pages_path)
    report = run_pipeline(spark, args)

    r1h = {(r.series_key, r.bucket_ts.isoformat()): (r["count"], r["max"])
           for r in spark.read.parquet(f"{out_root}/rollup_1h").collect()}
    # The 10:00 hour on the 5th must include BOTH the original and the
    # late sample — a stale cascade would still show count=1.
    assert r1h[("v", "2024-02-05T10:00:00")] == (2, 5.0)
    assert r1h[("v", "2024-02-06T09:00:00")] == (1, 2.0)
    assert report["stages"]["rollup_1h"]["rewritten_partitions"] >= 1


def test_corpus_subcommand_ops(spark, tmp_path):
    """The corpus CLI surface = the library operators: deterministic
    sampling honors caps and the seed, minhash dedup keeps one survivor
    per near-dup cluster, and the star clustering option runs."""
    import argparse

    from json_time_series_extractor_spark.cli import run_corpus

    src = "/root/testdata/sf0.001/documents.parquet"

    def args(**kw):
        base = dict(input=src, output=str(tmp_path / kw.pop("out")),
                    op=None, fraction=0.1, group_col="lang",
                    per_group_n=20, threshold=0.5, num_hashes=32,
                    bands=16, seed=7, components_algorithm="minlabel",
                    max_bucket_size=10_000)
        base.update(kw)
        return argparse.Namespace(**base)

    r = run_corpus(spark, args(out="s1", op="sample-per-group"))
    assert r["rows_out"] == 100            # 5 langs x 20
    per = (spark.read.parquet(r["output"]).groupBy("lang").count()
           .collect())
    assert all(row["count"] == 20 for row in per)

    r2 = run_corpus(spark, args(out="s2", op="sample-fraction",
                                fraction=0.25))
    assert 0 < r2["rows_out"] < r2["rows_in"]

    rd = run_corpus(spark, args(out="d1", op="dedup-minhash"))
    assert rd["rows_out"] < rd["rows_in"]  # near-dups exist in the table
    # the mega-bucket cap is the CLI default (r6) and is metered: the
    # report carries the Observation; fixture clusters sit below 10^4
    # members, so nothing is capped here
    assert rd["lsh_bucket_cap"] == 10_000
    assert rd["lsh_buckets"]["capped_buckets"] == 0
    assert rd["lsh_buckets"]["total_buckets"] > 0

    rc = run_corpus(spark, args(out="c1", op="neardup-components",
                                components_algorithm="star"))
    assert rc["rows_out"] > 0
    comp = spark.read.parquet(rc["output"])
    assert set(comp.columns) == {"component", "keep_id", "n_members"}

    re = run_corpus(spark, args(out="e1", op="dedup-exact"))
    assert 0 < re["rows_out"] <= re["rows_in"]


def test_corpus_subcommand_r5_ops(spark, tmp_path):
    """Round-5 corpus CLI ops: paragraph dedup, dup-ngram stats (over
    the stock documents table) and url-dedup (over a derived table with
    a url column)."""
    import argparse

    from json_time_series_extractor_spark.cli import run_corpus

    src = "/root/testdata/sf0.001/documents.parquet"

    def args(**kw):
        base = dict(input=src, output=str(tmp_path / kw.pop("out")),
                    op=None, fraction=0.1, group_col="lang",
                    per_group_n=20, threshold=0.5, num_hashes=32,
                    bands=16, seed=7, components_algorithm="minlabel",
                    url_col="url", paragraph_sep="\\n\\n", ngram_n=4)
        base.update(kw)
        return argparse.Namespace(**base)

    rp = run_corpus(spark, args(out="p1", op="dedup-paragraphs"))
    assert rp["rows_out"] == rp["rows_in"]  # one row per doc
    cols = set(spark.read.parquet(rp["output"]).columns)
    assert cols == {"doc_id", "clean_text", "n_paras", "n_dropped"}

    rg = run_corpus(spark, args(out="g1", op="dup-ngram-stats"))
    out = spark.read.parquet(rg["output"])
    assert out.where("dup_fraction > 0").count() > 0

    urls = (spark.read.parquet(src)
            .selectExpr("doc_id",
                        "concat('HTTP://H', doc_id % 5, "
                        "'.COM:80/p?utm_source=x&a=1') AS url"))
    usrc = str(tmp_path / "urls_src")
    urls.write.parquet(usrc)
    ru = run_corpus(spark, args(input=usrc, out="u1", op="url-dedup"))
    assert ru["rows_out"] == 5              # 5 hosts -> 5 canonicals
    u = spark.read.parquet(ru["output"]).collect()
    assert all(r["canonical_url"].startswith("http://h") for r in u)


def test_corpus_subcommand_token_count_bpe(spark, tmp_path):
    """Round-7 corpus CLI op: corpus-trained BPE token counts — one row
    per doc, learned subword count bounded by [n_words, n_chars]."""
    import argparse

    from json_time_series_extractor_spark.cli import run_corpus

    src = "/root/testdata/sf0.001/documents.parquet"
    ns = argparse.Namespace(
        input=src, output=str(tmp_path / "bpe1"), op="token-count-bpe",
        fraction=0.1, group_col="lang", per_group_n=20, threshold=0.5,
        num_hashes=32, bands=16, seed=7,
        components_algorithm="minlabel", url_col="url",
        paragraph_sep="\\n\\n", ngram_n=4, bpe_merges=100,
        bpe_max_vocab=1000)
    r = run_corpus(spark, ns)
    assert r["rows_out"] == r["rows_in"]
    out = spark.read.parquet(r["output"])
    assert set(out.columns) == {"doc_id", "n_words",
                                "n_tokens_bpe_learned"}
    # Learned subwords: at least one per word, at most one per char —
    # and on this recurring-word corpus the merges actually bite
    # (strictly fewer subwords than characters overall).
    from pyspark.sql import functions as F
    joined = out.join(
        spark.read.parquet(src).select(
            "doc_id", F.length("text").alias("n_chars")), "doc_id")
    bad = joined.where(
        (F.col("n_tokens_bpe_learned") < F.col("n_words"))
        | (F.col("n_tokens_bpe_learned") > F.col("n_chars"))).count()
    assert bad == 0
    tot = joined.agg(F.sum("n_tokens_bpe_learned").alias("t"),
                     F.sum("n_chars").alias("c")).first()
    assert tot["t"] < tot["c"]


def test_corpus_subcommand_r7_ops(spark, tmp_path):
    """Round-7 corpus CLI ops: decontaminate (scores + --drop mode),
    lm-quality, and domain-stats over a derived url table."""
    import argparse

    from pyspark.sql import functions as F

    from json_time_series_extractor_spark.cli import run_corpus

    src = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(src)
    ev_path = str(tmp_path / "eval")
    docs.where("doc_id % 19 = 3").write.parquet(ev_path)
    train_path = str(tmp_path / "train")
    docs.where("doc_id % 19 <> 3").write.parquet(train_path)

    def args(**kw):
        base = dict(input=train_path,
                    output=str(tmp_path / kw.pop("out")),
                    op=None, fraction=0.1, group_col="lang",
                    per_group_n=20, threshold=0.5, num_hashes=32,
                    bands=16, seed=7, components_algorithm="minlabel",
                    max_bucket_size=10_000, url_col="url",
                    eval_input=ev_path, decontam_n=8,
                    drop_contaminated=False,
                    lm_threshold_fp6=-6_000_000, chars_col=None,
                    dup_ratio_flag_fp6=1_500_000)
        base.update(kw)
        return argparse.Namespace(**base)

    r = run_corpus(spark, args(out="dc1", op="decontaminate"))
    scores = spark.read.parquet(r["output"])
    assert set(scores.columns) == {"doc_id", "n_grams", "n_hit",
                                   "contam_frac", "contaminated"}
    assert r["rows_out"] == r["rows_in"]   # one score row per doc
    n_dirty = scores.where("contaminated").count()

    r2 = run_corpus(spark, args(out="dc2", op="decontaminate",
                                drop_contaminated=True))
    assert r2["rows_out"] == r2["rows_in"] - n_dirty

    import pytest as _pytest
    with _pytest.raises(SystemExit):
        run_corpus(spark, args(out="dc3", op="decontaminate",
                               eval_input=None))

    r3 = run_corpus(spark, args(input=src, out="lm1", op="lm-quality",
                                lm_threshold_fp6=-820_000))
    lm = spark.read.parquet(r3["output"])
    assert r3["rows_out"] == r3["rows_in"]
    assert lm.where("NOT quality_ok").count() > 0   # tail flagged

    urls_path = str(tmp_path / "urls")
    docs.select(
        "doc_id", "n_chars",
        F.concat(F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".com/p/"), (F.col("doc_id") % 5).cast("string"))
        .alias("url")).write.parquet(urls_path)
    r4 = run_corpus(spark, args(input=urls_path, out="ds1",
                                op="domain-stats", chars_col="n_chars"))
    ds = spark.read.parquet(r4["output"])
    assert r4["rows_out"] == 3              # 3 hosts
    row = ds.where("domain = 'h0.com'").first()
    assert row["n_pages"] == 5 and row["flagged"]  # heavy re-crawl dup


def test_corpus_subcommand_r7b_ops(spark, tmp_path):
    """The r7b corpus ops ride the same CLI surface: boilerplate /
    stutter cleaning, temperature domain mixing (domain derived from
    --url-col when absent), split assignment with a custom weight
    spec, and the exact quality-threshold drop (score computed from
    text when absent)."""
    import argparse

    from json_time_series_extractor_spark.cli import run_corpus

    src = "/root/testdata/sf0.001/documents.parquet"

    def args(**kw):
        base = dict(input=src, output=str(tmp_path / kw.pop("out")),
                    op=None, fraction=0.1, group_col="lang",
                    per_group_n=20, threshold=0.5, num_hashes=32,
                    bands=16, seed=7, components_algorithm="minlabel",
                    max_bucket_size=10_000, min_df=3, min_chars=6,
                    target_total=50, domain_col="domain",
                    url_col="url",
                    splits="train=0.8,val=0.1,test=0.1",
                    drop_frac=0.2, score_col="quality_score_fp6")
        base.update(kw)
        return argparse.Namespace(**base)

    r = run_corpus(spark, args(out="b1", op="boilerplate-lines"))
    assert r["rows_out"] == r["rows_in"]    # per-doc cleaned rows
    cols = spark.read.parquet(r["output"]).columns
    assert "text_clean" in cols and "n_removed" in cols

    r2 = run_corpus(spark, args(out="b2", op="collapse-lines"))
    assert r2["rows_out"] == r2["rows_in"]

    r3 = run_corpus(spark, args(out="b3", op="split-assign"))
    per = {row["split"]: row["count"] for row in
           spark.read.parquet(r3["output"])
           .groupBy("split").count().collect()}
    assert set(per) == {"train", "val", "test"}   # weights sum to 1.0
    assert per["train"] > per["val"]

    r4 = run_corpus(spark, args(out="b4", op="quality-threshold"))
    # drop <= 20% (boundary ties kept -> can drop fewer, never more)
    assert 0.8 * r4["rows_in"] <= r4["rows_out"] < r4["rows_in"]
    kept = spark.read.parquet(r4["output"])
    assert kept.where("n_dropped > 0").count() == kept.count()

    # domain-mix derives the domain from a synthesized url column
    docs = spark.read.parquet(src).withColumn(
        "url", F.concat(F.lit("https://site"),
                        (F.col("doc_id") % 5).cast("string"),
                        F.lit(".test/p/"),
                        F.col("doc_id").cast("string")))
    dsrc = str(tmp_path / "docs_url")
    docs.write.parquet(dsrc)
    r5 = run_corpus(spark, args(input=dsrc, out="b5", op="domain-mix"))
    assert 0 < r5["rows_out"] <= 50


def test_run_query_promql_and_tier_routing(spark, tmp_path):
    """cli query: compile + run a PromQL expression from argparse args;
    --tier routes onto the materialized tier and must return identical
    rows; --histogram-bounds parse errors reject loudly."""
    from json_time_series_extractor_spark.cli import (
        _build_parser,
        run_query,
    )
    from json_time_series_extractor_spark.operators.rollup import rollup

    src = str(tmp_path / "samples")
    (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
     .select(F.col("event_type").alias("series_key"), "ts",
             F.col("value").cast("double").alias("value_double"))
     .write.parquet(src))
    tier = str(tmp_path / "t1m")
    rollup(spark.read.parquet(src), "1 minute",
           deterministic_last=True).write.parquet(tier)

    def args(*extra):
        return _build_parser().parse_args([
            "query", "--input", src, "--expr",
            'max_over_time({series_key=~".+"}[6h])', "--show", "3",
            *extra])

    plain = run_query(spark, args())
    routed = run_query(spark, args("--tier", f"1 minute={tier}"))
    assert plain["rows"] == routed["rows"] > 0
    assert plain["rows_shown"] == routed["rows_shown"]

    out = str(tmp_path / "qout")
    written = run_query(spark, args("--output", out))
    assert written["rows"] == plain["rows"]
    assert spark.read.parquet(out).count() == plain["rows"]

    with pytest.raises(SystemExit):
        run_query(spark, args("--histogram-bounds", "nope"))
    with pytest.raises(SystemExit):
        run_query(spark, args("--tier", "nope"))
