"""Golden tests for tiered rollups, cascade mergeability, salting, gap-fill."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    gapfill_linear,
    gapfill_locf,
)
from json_time_series_extractor_spark.operators.rollup import (
    rollup,
    rollup_cascade,
    rollup_salted,
)


def ts(minute, second=0, hour=16):
    return datetime(2024, 2, 5, hour, minute, second)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        # key a, minute 0: values 1, 5, 3 (last at :50 = 3)
        ("a", ts(0, 10), 1.0),
        ("a", ts(0, 20), 5.0),
        ("a", ts(0, 50), 3.0),
        # key a, minute 2 (gap at minute 1): single value
        ("a", ts(2, 5), 7.0),
        # key b, minute 0
        ("b", ts(0, 0), 10.0),
        # key b, next hour
        ("b", ts(0, 0, hour=17), 20.0),
        # null value must be ignored
        ("a", ts(0, 30), None),
    ]
    return spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")


def test_rollup_1m_golden(samples):
    out = {(r.series_key, r.bucket_ts): r
           for r in rollup(samples, "1 minute").collect()}
    a0 = out[("a", ts(0))]
    assert (a0.min, a0.max, a0.sum, a0["count"]) == (1.0, 5.0, 9.0, 3)
    assert a0.mean == 3.0
    assert a0.last == 3.0 and a0.last_ts == ts(0, 50)
    a2 = out[("a", ts(2))]
    assert (a2.min, a2.max, a2["count"], a2.last) == (7.0, 7.0, 1, 7.0)
    assert ("b", ts(0)) in out and ("b", ts(0, 0, 17)) in out
    assert len(out) == 4


def test_rollup_cascade_matches_direct(samples):
    """1m -> 1h cascade must equal a direct 1h rollup of the raw samples."""
    direct = {(r.series_key, r.bucket_ts): r
              for r in rollup(samples, "1 hour").collect()}
    cascaded = {(r.series_key, r.bucket_ts): r
                for r in rollup_cascade(rollup(samples, "1 minute"),
                                        "1 hour").collect()}
    assert direct.keys() == cascaded.keys()
    for key, d in direct.items():
        c = cascaded[key]
        assert (d.min, d.max, d.sum, d["count"], d.mean, d.last, d.last_ts) == \
               (c.min, c.max, c.sum, c["count"], c.mean, c.last, c.last_ts)


def test_rollup_salted_matches_plain(samples):
    plain = sorted(rollup(samples, "1 minute").collect())
    salted = sorted(rollup_salted(samples, "1 minute",
                                  salt_buckets=4).collect())
    assert plain == salted
    hot = samples.sparkSession.createDataFrame([("a",)], "series_key string")
    salted_hot = sorted(rollup_salted(samples, "1 minute", salt_buckets=4,
                                      hot_keys=hot).collect())
    assert plain == salted_hot


def test_rollup_last_deterministic_on_ts_tie(spark):
    """Equal timestamps break by value (max of (ts, value) pair)."""
    df = spark.createDataFrame(
        [("k", ts(0, 10), 2.0), ("k", ts(0, 10), 9.0), ("k", ts(0, 10), 4.0)],
        "series_key string, ts timestamp, value_double double")
    rows = rollup(df, "1 minute", deterministic_last=True).collect()
    assert rows[0].last == 9.0


def test_gapfill_locf_golden(samples):
    r = rollup(samples, "1 minute")
    out = {(row.series_key, row.bucket_ts): row
           for row in gapfill_locf(r, "1 minute").collect()}
    # key a grid: minutes 0..2; minute 1 filled with minute 0's mean (3.0)
    assert out[("a", ts(0))].value == 3.0
    assert out[("a", ts(0))].filled is False
    assert out[("a", ts(1))].value == 3.0
    assert out[("a", ts(1))].filled is True
    assert out[("a", ts(2))].value == 7.0
    # key b grid spans 16:00..17:00 -> 61 buckets, 59 filled
    b_rows = [v for k, v in out.items() if k[0] == "b"]
    assert len(b_rows) == 61
    assert sum(1 for r_ in b_rows if r_.filled) == 59


def test_gapfill_linear_golden(spark):
    df = spark.createDataFrame(
        [("k", ts(0), 1.0, 1.0), ("k", ts(4), 9.0, 9.0)],
        "series_key string, bucket_ts timestamp, mean double, min double")
    out = {r.bucket_ts: r.value
           for r in gapfill_linear(df, "1 minute").collect()}
    assert out[ts(0)] == 1.0
    assert out[ts(1)] == 3.0
    assert out[ts(2)] == 5.0
    assert out[ts(3)] == 7.0
    assert out[ts(4)] == 9.0


def test_gapfill_single_point_series(spark):
    df = spark.createDataFrame(
        [("k", ts(0), 5.0)],
        "series_key string, bucket_ts timestamp, mean double")
    locf = gapfill_locf(df, "1 minute").collect()
    lin = gapfill_linear(df, "1 minute").collect()
    assert len(locf) == 1 and locf[0].value == 5.0
    assert len(lin) == 1 and lin[0].value == 5.0


def test_rollup_plan_is_whole_stage_codegen(samples):
    """The rollup must stay JVM-side: partial + final hash aggregate, one
    shuffle, no Python in the plan."""
    plan = rollup(samples, "1 minute")._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Python" not in plan


def test_detect_hot_keys_feeds_salted_rollup(spark):
    from json_time_series_extractor_spark.operators.extract import (
        extract_samples,
    )
    from json_time_series_extractor_spark.operators.rollup import (
        detect_hot_keys,
        rollup,
        rollup_salted,
    )
    from json_time_series_extractor_spark.sources.pages import (
        PAGES_EXTRACT_OPTIONS,
        synthesize_pages,
    )

    samples = extract_samples(synthesize_pages(spark, 2000),
                              PAGES_EXTRACT_OPTIONS)
    # All three series keys appear in every doc -> all are "hot" at 1%.
    hot = detect_hot_keys(samples, min_share=0.01, sample_fraction=0.5)
    hot_keys = {r.series_key for r in hot.collect()}
    assert hot_keys == {"fetch_latency_ms", "page_size_bytes", "lang_count"}

    plain = {(r.series_key, r.bucket_ts): (r["min"], r["max"], r["count"])
             for r in rollup(samples, "1 hour").collect()}
    salted = {(r.series_key, r.bucket_ts): (r["min"], r["max"], r["count"])
              for r in rollup_salted(samples, "1 hour", salt_buckets=8,
                                     hot_keys=hot).collect()}
    assert plain == salted


def test_rollup_over_decompressed_chunks_matches_raw(spark):
    """Lossless integration: compress -> decompress -> rollup equals the
    rollup of the raw samples at every tier (north rule: identical rolled-up
    points at each retention tier)."""
    from json_time_series_extractor_spark.operators.chunks import (
        compress_chunks,
        decompress_chunks,
    )
    from json_time_series_extractor_spark.operators.rollup import (
        rollup,
        rollup_cascade,
    )

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    direct_1m = rollup(samples, "1 minute", deterministic_last=True)
    via_chunks = rollup(
        decompress_chunks(compress_chunks(samples, "1 day")),
        "1 minute", deterministic_last=True)

    def key(df):
        return {(r.series_key, r.bucket_ts):
                (r["min"], r["max"], r["sum"], r["count"], r["last"],
                 r["last_ts"]) for r in df.collect()}

    assert key(direct_1m) == key(via_chunks)
    assert key(rollup_cascade(direct_1m, "1 hour")) == key(
        rollup_cascade(via_chunks, "1 hour"))


def test_bucketed_rollup_has_no_exchange(spark):
    """A samples table bucketed by series_key satisfies the rollup
    aggregate's clustering requirement: no shuffle in any tier."""
    from json_time_series_extractor_spark.operators.rollup import rollup
    from json_time_series_extractor_spark.sources.pages import (
        write_samples_bucketed,
    )

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    spark.sql("DROP TABLE IF EXISTS samples_bucketed_test")
    write_samples_bucketed(samples, "samples_bucketed_test", buckets=8)

    bucketed = spark.table("samples_bucketed_test")
    r = rollup(bucketed, "1 hour")
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # And the results equal the unbucketed rollup.
    expect = {(x.series_key, x.bucket_ts): x["count"]
              for x in rollup(samples, "1 hour").collect()}
    got = {(x.series_key, x.bucket_ts): x["count"] for x in r.collect()}
    assert got == expect
    spark.sql("DROP TABLE samples_bucketed_test")


def test_gapfill_locf_partitioned_matches_global(spark):
    """The segment-partitioned LOCF (bounded window partitions) equals the
    whole-series LOCF on real data, including cross-segment carries."""
    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_locf,
        gapfill_locf_partitioned,
    )
    from json_time_series_extractor_spark.operators.rollup import rollup

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    r1m = rollup(samples, "1 minute")
    base = {(r.series_key, r.bucket_ts): (r.value, r.filled)
            for r in gapfill_locf(r1m, "1 minute").collect()}
    part = {(r.series_key, r.bucket_ts): (r.value, r.filled)
            for r in gapfill_locf_partitioned(
                r1m, "1 minute", segment="1 day").collect()}
    assert part == base
    # Hour-sized segments force many cross-segment carries; still equal.
    part_h = {(r.series_key, r.bucket_ts): (r.value, r.filled)
              for r in gapfill_locf_partitioned(
                  r1m, "1 minute", segment="1 hour").collect()}
    assert part_h == base


def test_gapfill_linear_partitioned_matches_global(spark):
    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_linear,
        gapfill_linear_partitioned,
    )
    from json_time_series_extractor_spark.operators.rollup import rollup

    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    r1m = rollup(samples, "1 minute")
    base = {(r.series_key, r.bucket_ts): (r.value, r.filled)
            for r in gapfill_linear(r1m, "1 minute").collect()}
    for seg in ("1 day", "1 hour"):
        part = {(r.series_key, r.bucket_ts): (r.value, r.filled)
                for r in gapfill_linear_partitioned(
                    r1m, "1 minute", segment=seg).collect()}
        assert part == base, seg


def test_asof_join_semantics(spark):
    from datetime import datetime

    from json_time_series_extractor_spark.operators.joins import asof_join

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [("a", t(10)), ("a", t(20)), ("a", t(5)), ("b", t(10))],
        "series_key string, ts timestamp")
    right = spark.createDataFrame(
        [("a", t(10), 1.0), ("a", t(15), 2.0), ("b", t(11), 9.0)],
        "series_key string, ts timestamp, value_double double")

    out = {(r.series_key, r.ts.minute): (r.asof_value_double,
                                         r.asof_ts.minute if r.asof_ts
                                         else None)
           for r in asof_join(left, right).collect()}
    assert out[("a", 10)] == (1.0, 10)   # tie matches
    assert out[("a", 20)] == (2.0, 15)   # latest at-or-before
    assert out[("a", 5)] == (None, None)  # nothing before
    assert out[("b", 10)] == (None, None)  # right row is after

    # Tolerance: the minute-20 probe only sees values from minute >= 12.
    tol = {(r.series_key, r.ts.minute): r.asof_value_double
           for r in asof_join(left, right, tolerance="8 minutes").collect()}
    assert tol[("a", 20)] == 2.0
    tol2 = {(r.series_key, r.ts.minute): r.asof_value_double
            for r in asof_join(left, right, tolerance="4 minutes").collect()}
    assert tol2[("a", 20)] is None  # 15 < 20-4=16: match out of tolerance


def test_asof_join_no_frankenrows(spark):
    """The match is one whole right row: a null value column in the latest
    right row must NOT backfill from an older right row, and tolerance
    applies to the row, not per column."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.joins import asof_join

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame([("k", t(30))],
                                 "series_key string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t(1), 1.0, None), ("k", t(29), None, 2.0)],
        "series_key string, ts timestamp, a double, b double")

    r = asof_join(left, right).collect()[0]
    assert r.asof_ts.minute == 29
    assert r.asof_a is None  # no backfill from the t(1) row
    assert r.asof_b == 2.0

    r2 = asof_join(left, right, tolerance="5 minutes").collect()[0]
    assert r2.asof_a is None and r2.asof_b == 2.0  # t(29) inside tolerance


def test_guards_reject_invalid_configs(spark):
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        simhash_near_dup_pairs,
    )
    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_locf_partitioned,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_dedup_pairs(docs, num_hashes=64, bands=12)
    with _pytest.raises(ValueError, match="block-trick"):
        simhash_near_dup_pairs(docs, max_hamming=10, blocks=4)
    r = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1.0)],
        "series_key string, bucket_ts timestamp, mean double")
    with _pytest.raises(ValueError, match="divide"):
        gapfill_locf_partitioned(r, interval="25 minutes", segment="1 day")


def test_counter_increase_reset_semantics(spark):
    """PromQL-style counter semantics: monotone deltas accumulate, a drop
    contributes the post-reset value, the first sample contributes 0."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.rate import (
        counter_increase, counter_rate)

    rows = [("c", datetime(2024, 1, 1, 0, 0, s), v) for s, v in
            [(0, 100.0), (10, 110.0), (20, 130.0),  # +10 +20
             (30, 5.0),                             # reset -> +5
             (40, 25.0)]]                           # +20
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    for segment in (None, "1 day"):
        out = counter_increase(df, "1 hour", segment=segment).collect()
        assert len(out) == 1
        assert out[0].increase == 55.0 and out[0].n_samples == 5
    r = counter_rate(df, "1 hour").collect()[0]
    assert abs(r.rate - 55.0 / 3600.0) < 1e-12


def test_counter_increase_partitioned_matches_whole_series(spark):
    """The bounded (series, day) plan with per-day carry must equal the
    whole-series lag window on real multi-day data, including the
    cross-midnight baselines."""
    from json_time_series_extractor_spark.operators.rate import (
        counter_increase)

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .selectExpr("event_type AS series_key", "ts",
                      "value AS value_double"))
    whole = {(r.series_key, r.bucket_ts): (round(r.increase, 9),
                                           r.n_samples)
             for r in counter_increase(ev, "1 hour",
                                       segment=None).collect()}
    seg = {(r.series_key, r.bucket_ts): (round(r.increase, 9), r.n_samples)
           for r in counter_increase(ev, "1 hour",
                                     segment="1 day").collect()}
    assert whole == seg


def test_rollup_percentiles_exact(spark):
    """Exact interpolated percentiles over a known bucket."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.rollup import (
        rollup_percentiles)

    rows = [("k", datetime(2024, 1, 1, 0, 0, s), float(v))
            for s, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = rollup_percentiles(df, "1 hour", qs=(0.5, 0.9)).collect()[0]
    assert out.p50 == 5.5          # (n-1)*q = 4.5 -> 5 + 0.5*(6-5)
    assert abs(out.p90 - 9.1) < 1e-9
    assert out.cnt == 10


def test_time_weighted_avg_known_integral(spark):
    """Hand-computed LOCF integral: v=10 holds 0:00->0:30, v=20 holds
    0:30->1:30 (crossing the bucket boundary), last sample holds nothing."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.twa import (
        time_weighted_avg)

    rows = [("k", datetime(2024, 1, 1, 0, 0, 0), 10.0),
            ("k", datetime(2024, 1, 1, 0, 30, 0), 20.0),
            ("k", datetime(2024, 1, 1, 1, 30, 0), 99.0)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {r.bucket_ts.hour: r for r in
           time_weighted_avg(df, "1 hour").collect()}
    # Hour 0: 10 for 1800s + 20 for 1800s -> 15.0, fully covered.
    assert out[0].twa == 15.0 and out[0].covered_seconds == 3600.0
    # Hour 1: 20 for the first 1800s only; 99 never holds.
    assert out[1].twa == 20.0 and out[1].covered_seconds == 1800.0


def test_rollup_histogram_cascade_mergeable(spark):
    """Cascading 1h histograms to 1d equals computing 1d from raw."""
    from json_time_series_extractor_spark.operators.rollup import (
        histogram_cascade, rollup_histogram)

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .selectExpr("event_type AS series_key", "ts",
                      "value AS value_double"))
    bounds = (1.0, 5.0, 20.0, 100.0)
    from_raw = {(r.series_key, r.bucket_ts): (list(r.hist), r.cnt)
                for r in rollup_histogram(ev, "1 day",
                                          bounds=bounds).collect()}
    cascaded = {(r.series_key, r.bucket_ts): (list(r.hist), r.cnt)
                for r in histogram_cascade(
                    rollup_histogram(ev, "1 hour", bounds=bounds),
                    "1 day", n_bins=len(bounds) + 1).collect()}
    assert from_raw == cascaded
    # Bin counts partition the bucket count.
    for hist, cnt in from_raw.values():
        assert sum(hist) == cnt


def test_histogram_quantile_interpolation(spark):
    """Interior-bin interpolation, first/last-bin clamps, cnt=0 NULL,
    and parameter validation for histogram_quantile."""
    from json_time_series_extractor_spark.operators.rollup import (
        histogram_quantile)

    bounds = (10.0, 20.0, 30.0)  # bins (-inf,10),[10,20),[20,30),[30,inf)
    rows = [
        # 10 values: 0 below 10, 4 in [10,20), 4 in [20,30), 2 >= 30.
        ("a", [0, 4, 4, 2], 10),
        # all mass below b0 -> every quantile clamps to b0.
        ("lo", [5, 0, 0, 0], 5),
        # all mass in the open tail -> clamps to b_{n-1}.
        ("hi", [0, 0, 0, 7], 7),
        ("empty", [0, 0, 0, 0], 0),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, hist array<long>, cnt long")
    out = {r.series_key: r for r in histogram_quantile(
        df, (0.5, 0.9), bounds=bounds, names=("p50", "p90")).collect()}
    # a: rank=5 -> cum(bin1)=4 < 5 <= cum(bin2)=8 -> bin2 [20,30):
    # 20 + 10*(5-4)/4 = 22.5.  rank=9 -> bin3 (tail) clamps to 30.
    assert out["a"].p50 == pytest.approx(22.5)
    assert out["a"].p90 == pytest.approx(30.0)
    assert out["lo"].p50 == pytest.approx(10.0)
    assert out["hi"].p50 == pytest.approx(30.0)
    assert out["empty"].p50 is None and out["empty"].p90 is None

    with pytest.raises(ValueError, match="strictly"):
        histogram_quantile(df, (0.5,), bounds=(2.0, 1.0))
    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantile(df, (0.0,), bounds=bounds)
    with pytest.raises(ValueError, match="align"):
        histogram_quantile(df, (0.5, 0.9), bounds=bounds, names=("x",))


def test_rollup_linear_trend(spark):
    """Known-line fit, degenerate single-sample bucket, and the exact
    fixed-point arithmetic (slope/intercept/predict from a hand
    computation)."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.trend import (
        rollup_linear_trend)

    rows = [
        # series 'a', one bucket: y = 1 + 0.1 * x over x = 0, 10, 20.
        ("a", datetime(2024, 1, 1, 0, 0, 0), 1.0),
        ("a", datetime(2024, 1, 1, 0, 0, 10), 2.0),
        ("a", datetime(2024, 1, 1, 0, 0, 20), 3.0),
        # series 'b': single sample -> degenerate.
        ("b", datetime(2024, 1, 1, 0, 0, 5), 42.0),
        # series 'c': two samples in the SAME second -> den = 0.
        ("c", datetime(2024, 1, 1, 0, 0, 1, 100), 1.0),
        ("c", datetime(2024, 1, 1, 0, 0, 1, 900), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {r.series_key: r
           for r in rollup_linear_trend(df, "1 hour").collect()}
    a = out["a"]
    assert a.n == 3 and a.fit_ok
    assert a.slope_per_s == pytest.approx(0.1)
    assert a.intercept == pytest.approx(1.0)
    assert a.predict_end == pytest.approx(1.0 + 0.1 * 3600)
    for k in ("b", "c"):
        r = out[k]
        assert not r.fit_ok
        assert r.slope_per_s is None and r.predict_end is None


def test_kmv_sketch(spark):
    """Cascade exactness (1h->1d sketch == from-raw 1d sketch),
    exact-below-k counts, estimator accuracy above k, and set-ops
    identities (self-join -> jaccard 1; disjoint -> m_both 0)."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.kmv import (
        kmv_cascade, kmv_estimate, kmv_rollup, kmv_set_ops)

    base = datetime(2024, 1, 1)
    rows = []
    # series 'big': 3000 distinct users spread over 24 hours (above k).
    for u in range(3000):
        rows.append(("big", base + timedelta(hours=u % 24, minutes=7), u))
    # series 'small': 9 distinct users, with repeats (below k -> exact).
    for u in range(9):
        rows.append(("small", base + timedelta(hours=u), 10_000 + u))
        rows.append(("small", base + timedelta(hours=u, minutes=30),
                     10_000 + u))
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, user_id long")

    k = 64
    d_raw = kmv_rollup(df, "1 day", k, item_col="user_id")
    d_casc = kmv_cascade(kmv_rollup(df, "1 hour", k,
                                    item_col="user_id"), "1 day", k)
    raw = {(r.series_key, r.bucket_ts): list(r.kmv)
           for r in d_raw.collect()}
    casc = {(r.series_key, r.bucket_ts): list(r.kmv)
            for r in d_casc.collect()}
    assert raw == casc  # merge closure: cascade is bit-exact

    ests = {r.series_key: r.est for r in d_raw.select(
        "series_key", kmv_estimate(F.col("kmv"), k).alias("est"))
        .collect()}
    assert ests["small"] == 9.0  # below k: exact
    assert abs(ests["big"] - 3000) / 3000 < 0.35  # ~1/sqrt(k) error

    ops_self = kmv_set_ops(d_raw, d_raw, k).collect()
    for r in ops_self:
        assert r.m_both == r.k_union and r.jaccard_est == 1.0
    # Disjoint user populations -> no shared sketch hashes.
    other = spark.createDataFrame(
        [("big", base + timedelta(hours=h), 900_000 + h)
         for h in range(24)],
        "series_key string, ts timestamp, user_id long")
    d_other = kmv_rollup(other, "1 day", k, item_col="user_id")
    for r in kmv_set_ops(d_raw, d_other, k).collect():
        assert r.m_both == 0 and r.inter_est == 0.0

    with pytest.raises(ValueError, match="k must be"):
        kmv_rollup(df, "1 day", 1)


def test_detect_anomalies(spark):
    """Injected spike flagged, warmup rows unscored, zero-variance
    baseline unscored (not a spurious infinity)."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.anomaly import (
        detect_anomalies)

    base = datetime(2024, 1, 1)
    rows = []
    # 'noisy': counts alternate 10/12 for 20 buckets, then a 100 spike.
    for i in range(20):
        rows.append(("noisy", base + timedelta(hours=i),
                     10 + 2 * (i % 2)))
    rows.append(("noisy", base + timedelta(hours=20), 100))
    # 'flat': constant counts -> zero variance -> never scored.
    for i in range(10):
        rows.append(("flat", base + timedelta(hours=i), 5))
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    out = detect_anomalies(df, 12, min_buckets=6, threshold=3.0)
    got = {(r.series_key, r.bucket_ts): r for r in out.collect()}

    spike = got[("noisy", base + timedelta(hours=20))]
    assert spike.scored and spike.is_anomaly and spike.z > 3.0
    normal = got[("noisy", base + timedelta(hours=19))]
    assert normal.scored and not normal.is_anomaly
    warm = got[("noisy", base + timedelta(hours=2))]  # 2 trailing rows
    assert not warm.scored and warm.z is None and not warm.is_anomaly
    for i in range(10):
        r = got[("flat", base + timedelta(hours=i))]
        assert not r.scored and r.z is None and not r.is_anomaly

    with pytest.raises(ValueError, match="k_buckets"):
        detect_anomalies(df, 1)


def test_asof_join_directions(spark):
    """forward picks the earliest right row at-or-after; nearest picks the
    closer side with ties going backward; tolerance bounds both sides."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 10), 1.0),
         ("k", datetime(2024, 1, 1, 0, 0, 40), 2.0)],
        "series_key string, ts timestamp, value_double double")
    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 0)),    # before all rights
         ("k", datetime(2024, 1, 1, 0, 0, 20)),   # 10 after r1, 20 before r2
         ("k", datetime(2024, 1, 1, 0, 0, 25)),   # equidistant -> backward
         ("k", datetime(2024, 1, 1, 0, 0, 40)),   # exact tie on r2
         ("k", datetime(2024, 1, 1, 0, 0, 50))],  # after all rights
        "series_key string, ts timestamp")

    def vals(direction, tolerance=None):
        out = asof_join(left, right, direction=direction,
                        tolerance=tolerance)
        return [r.asof_value_double
                for r in out.orderBy("ts").collect()]

    assert vals("backward") == [None, 1.0, 1.0, 2.0, 2.0]
    assert vals("forward") == [1.0, 2.0, 2.0, 2.0, None]
    assert vals("nearest") == [1.0, 1.0, 1.0, 2.0, 2.0]
    # Tolerance 12s (inclusive): the equidistant t=25 row (15s each way)
    # dies on both sides; t=20's forward match (20s to r2) dies while its
    # backward match (10s to r1) survives.
    assert vals("backward", "12 seconds") == [None, 1.0, None, 2.0, 2.0]
    assert vals("forward", "12 seconds") == [1.0, None, None, 2.0, None]
    assert vals("nearest", "12 seconds") == [1.0, 1.0, None, 2.0, 2.0]


def test_rate_and_twa_invariants_on_random_series(spark):
    """Seeded-random invariants: (1) summed counter increase of a MONOTONE
    series equals last-first regardless of bucketing or segmentation;
    (2) TWA of a CONSTANT series is that constant on every bucket and the
    covered time telescopes to last_ts - first_ts."""
    import numpy as np

    from json_time_series_extractor_spark.operators.rate import (
        counter_increase)
    from json_time_series_extractor_spark.operators.twa import (
        time_weighted_avg)
    from datetime import datetime, timedelta

    rng = np.random.default_rng(42)
    base = datetime(2024, 3, 1)
    rows = []
    mono_last_first = {}
    for key in ("s0", "s1", "s2"):
        n = int(rng.integers(5, 60))
        offs = np.sort(rng.choice(np.arange(0, 3 * 86400), n, replace=False))
        vals = np.cumsum(rng.random(n))  # strictly increasing
        rows += [(key, base + timedelta(seconds=int(o)), float(v))
                 for o, v in zip(offs, vals)]
        mono_last_first[key] = float(vals[-1] - vals[0])
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")

    for tier in ("1 hour", "1 day"):
        for segment in (None, "1 day"):
            inc = (counter_increase(df, tier, segment=segment)
                   .groupBy("series_key")
                   .agg(F.sum("increase").alias("total")).collect())
            for r in inc:
                assert abs(r.total - mono_last_first[r.series_key]) < 1e-9

    const = df.withColumn("value_double", F.lit(7.5))
    twa = time_weighted_avg(const, "1 hour").collect()
    assert all(abs(r.twa - 7.5) < 1e-12 for r in twa)
    spans = {}
    for key, t, _v in rows:
        lo, hi = spans.get(key, (t, t))
        spans[key] = (min(lo, t), max(hi, t))
    covered = {}
    for r in twa:
        covered[r.series_key] = covered.get(r.series_key, 0.0) \
            + r.covered_seconds
    for key, (lo, hi) in spans.items():
        assert abs(covered[key] - (hi - lo).total_seconds()) < 1e-6


def test_percentile_labels_and_calendar_tolerance(spark):
    """Sub-percent quantiles get distinct labels (0.99 vs 0.999); the
    as-of backward tolerance uses the backward calendar bound (a Feb-29
    match one calendar month before Mar-31 survives tolerance='1 month')."""
    from datetime import datetime

    from json_time_series_extractor_spark.operators.joins import asof_join
    from json_time_series_extractor_spark.operators.rollup import (
        rollup_percentiles)

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), float(v)) for v in range(1, 101)],
        "series_key string, ts timestamp, value_double double")
    out = rollup_percentiles(df, "1 hour", qs=(0.99, 0.999))
    assert {"p99", "p99_9"} <= set(out.columns)
    row = out.collect()[0]
    assert row.p99 < row.p99_9 <= 100.0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicate percentile"):
        rollup_percentiles(df, "1 hour", qs=(0.5, 0.5))

    left = spark.createDataFrame(
        [("k", datetime(2024, 3, 31))], "series_key string, ts timestamp")
    right = spark.createDataFrame(
        [("k", datetime(2024, 2, 29), 1.0)],
        "series_key string, ts timestamp, value_double double")
    got = asof_join(left, right, tolerance="1 month").collect()[0]
    assert got.asof_value_double == 1.0  # 2024-03-31 - 1 month = 2024-02-29


def test_media_decode_stub_validated(spark):
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.multimodal import (
        extract_audio_features, extract_image_features, resize_images,
        sample_video_frames, synthesize_media)

    media = synthesize_media(spark, 3)
    for op in (lambda: extract_image_features(media, decode_stub="Real"),
               lambda: resize_images(media, 8, 8, decode_stub="none"),
               lambda: extract_audio_features(media, decode_stub="tru"),
               lambda: sample_video_frames(media, decode_stub="")):
        with _pytest.raises(ValueError, match="decode_stub"):
            op()


def test_top_k_series_exact(spark):
    from datetime import datetime

    from json_time_series_extractor_spark.operators.rollup import (
        top_k_series)

    rows = ([("a", datetime(2024, 1, 1, 0, 0, s), 1.0) for s in range(5)]
            + [("b", datetime(2024, 1, 1, 1, 0, s), 1.0) for s in range(3)]
            + [("c", datetime(2024, 1, 1, 2, 0, s), 1.0) for s in range(3)]
            + [("d", datetime(2024, 1, 2, 0, 0, 0), 1.0)])
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {(r.bucket_ts.day, r.rank): (r.series_key, r.n)
           for r in top_k_series(df, "1 day", k=2).collect()}
    # Day 1: a(5) then the b/c tie broken alphabetically.
    assert out[(1, 1)] == ("a", 5)
    assert out[(1, 2)] == ("b", 3)
    assert out[(2, 1)] == ("d", 1)
    assert len(out) == 3


def test_histogram_bounds_validation(spark):
    """Unsorted/duplicate/empty bounds misbin silently -> must raise."""
    from json_time_series_extractor_spark.operators.rollup import (
        rollup_histogram,
    )

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)],
        "series_key string, ts string, value_double double",
    ).withColumn("ts", F.to_timestamp("ts"))
    for bad in [(), (2.0, 1.0), (1.0, 1.0)]:
        with pytest.raises(ValueError, match="strictly increasing"):
            rollup_histogram(df, "1 hour", bounds=bad)
    rollup_histogram(df, "1 hour", bounds=(1.0, 2.0))  # valid: no raise


def test_hll_cascade_matches_direct_build(spark):
    """Register-MAX merging is associative/idempotent: 1m -> 1h cascade
    must produce registers identical to a direct 1h build (the same
    contract rollup_cascade/histogram_cascade/tdigest_cascade test)."""
    import numpy as np

    from json_time_series_extractor_spark.operators.hll import (
        hll_cascade, hll_rollup)

    rng = np.random.default_rng(11)
    rows = [(f"s{i % 3}",
             datetime(2024, 1, 1, int(i // 500), int(i % 60)),
             f"k{rng.integers(0, 400)}")
            for i in range(3000)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")
    direct = hll_rollup(df, "1 hour", key_col="key")
    cascaded = hll_cascade(hll_rollup(df, "1 minute", key_col="key"),
                           "1 hour")
    assert direct.exceptAll(cascaded).count() == 0
    assert cascaded.exceptAll(direct).count() == 0


def test_hll_estimate_accuracy_and_small_range(spark):
    """b=9 (512 registers) HLL has ~4.6% standard error; assert < 10%
    on a 5k-distinct group, and that tiny groups (linear-counting
    branch) estimate near-exactly."""
    from json_time_series_extractor_spark.operators.hll import (
        hll_estimate, hll_rollup)

    big = [("big", datetime(2024, 1, 1, 0, 0), f"u{i}")
           for i in range(5000)]
    small = [("small", datetime(2024, 1, 1, 0, 0), f"v{i % 7}")
             for i in range(100)]
    df = spark.createDataFrame(
        big + small, "series_key string, ts timestamp, key string")
    est = {r["series_key"]: r for r in hll_estimate(
        hll_rollup(df, "1 hour", key_col="key")).collect()}
    assert abs(est["big"]["ndv_est"] - 5000) / 5000 < 0.10
    assert abs(est["small"]["ndv_est"] - 7) < 1.0
    assert est["small"]["n_zero"] > 500 - 10  # sparse registers


def test_hll_stays_jvm_side(spark):
    """The whole sketch pipeline is Column expressions — no Python
    workers in the plan (the 100 TB hot-path rule)."""
    from json_time_series_extractor_spark.operators.hll import (
        hll_cascade, hll_estimate, hll_rollup)

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), "k")],
        "series_key string, ts timestamp, key string")
    plan = hll_estimate(hll_cascade(
        hll_rollup(df, "1 minute", key_col="key"), "1 hour")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hll_register_bits_validated(spark):
    from json_time_series_extractor_spark.operators.hll import hll_rollup

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), "k")],
        "series_key string, ts timestamp, key string")
    for bad in (0, 3, 15):
        with pytest.raises(ValueError, match="register_bits"):
            hll_rollup(df, "1 hour", key_col="key", register_bits=bad)


def test_counter_resets_delta_irate_hand_computed(spark):
    """PromQL family additions (r5): resets/gauge-delta/irate on a
    hand-computed series with an in-bucket reset, a cross-bucket reset,
    and a single-sample bucket."""
    from json_time_series_extractor_spark.operators.rate import (
        counter_irate, counter_resets, gauge_delta)

    rows = [("a", datetime(2024, 1, 1, 0, 0, 0), 10.0),
            ("a", datetime(2024, 1, 1, 0, 10, 0), 20.0),
            ("a", datetime(2024, 1, 1, 0, 20, 0), 5.0),    # reset
            ("a", datetime(2024, 1, 1, 0, 40, 0), 8.0),
            ("a", datetime(2024, 1, 1, 1, 5, 0), 2.0),     # reset x-bucket
            ("b", datetime(2024, 1, 1, 0, 30, 0), 100.0)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")

    res = {(r["series_key"], r["bucket_ts"].hour): r["resets"]
           for r in counter_resets(df).collect()}
    assert res == {("a", 0): 1, ("a", 1): 1, ("b", 0): 0}
    # segmented plan == whole-series plan
    res_g = {(r["series_key"], r["bucket_ts"].hour): r["resets"]
             for r in counter_resets(df, segment=None).collect()}
    assert res_g == res

    d = {(r["series_key"], r["bucket_ts"].hour): r["delta"]
         for r in gauge_delta(df).collect()}
    assert d == {("a", 0): -2.0, ("a", 1): 0.0, ("b", 0): 0.0}

    ir = {(r["series_key"], r["bucket_ts"].hour): r["irate"]
          for r in counter_irate(df).collect()}
    # last two in a/h0: 5@0:20 -> 8@0:40: 3/1200s
    assert ir[("a", 0)] == pytest.approx(3.0 / 1200.0)
    assert ir[("a", 1)] is None and ir[("b", 0)] is None
    # reset between the last two samples: post-reset value over dt
    df2 = spark.createDataFrame(
        [("c", datetime(2024, 1, 1, 0, 0, 0), 50.0),
         ("c", datetime(2024, 1, 1, 0, 0, 10), 4.0)],
        "series_key string, ts timestamp, value_double double")
    (row,) = counter_irate(df2).collect()
    assert row["irate"] == pytest.approx(4.0 / 10.0)


def test_gauge_changes_hand_computed(spark):
    """PromQL changes() (r6): adjacent value transitions per bucket —
    repeats don't count, a series' first sample never counts, and the
    segmented plan equals the whole-series lag plan across a bucket
    boundary."""
    from json_time_series_extractor_spark.operators.rate import (
        gauge_changes)

    rows = [("a", datetime(2024, 1, 1, 0, 0, 0), 1.0),   # first: no chg
            ("a", datetime(2024, 1, 1, 0, 10, 0), 1.0),  # repeat
            ("a", datetime(2024, 1, 1, 0, 20, 0), 2.0),  # change
            ("a", datetime(2024, 1, 1, 0, 40, 0), 1.0),  # change (down)
            ("a", datetime(2024, 1, 1, 1, 5, 0), 1.0),   # x-bucket repeat
            ("a", datetime(2024, 1, 1, 1, 30, 0), 3.0),  # change
            ("b", datetime(2024, 1, 1, 0, 30, 0), 9.0)]  # singleton
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    got = {(r["series_key"], r["bucket_ts"].hour): r["changes"]
           for r in gauge_changes(df).collect()}
    assert got == {("a", 0): 2, ("a", 1): 1, ("b", 0): 0}
    whole = {(r["series_key"], r["bucket_ts"].hour): r["changes"]
             for r in gauge_changes(df, segment=None).collect()}
    assert whole == got


def test_cm_over_time_sliding_sum(spark):
    """frequency_over_time (r6): the k=2 rolling CM registers at a
    target bucket are identical to a direct build over the trailing-2
    present buckets' stream (gap skipped); estimates stay one-sided
    over the window; n_buckets gates; param stamp survives."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_estimate, cm_over_time, cm_rollup)

    rows = [("a", datetime(2024, 1, 1, 0, 5), "x")] * 3 \
        + [("a", datetime(2024, 1, 1, 1, 5), "x"),
           ("a", datetime(2024, 1, 1, 1, 6), "y"),
           ("a", datetime(2024, 1, 1, 3, 5), "y")]
    df = spark.createDataFrame(rows,
                               "series_key string, ts timestamp, "
                               "key string")
    regs = cm_rollup(df, "1 hour", key_col="key")
    roll = cm_over_time(regs, 2)

    def regset(frame, hour):
        return sorted((r["cm_row"], r["cm_bucket"], r["cnt"])
                      for r in frame.collect()
                      if r["bucket_ts"].hour == hour)

    union = df.where(F.hour("ts").isin(1, 3)) \
        .withColumn("ts", F.lit(datetime(2024, 1, 1, 3, 5)))
    assert regset(roll, 3) == regset(
        cm_rollup(union, "1 hour", key_col="key"), 3)

    est = cm_estimate(roll.drop("n_buckets"),
                      spark.createDataFrame(
                          [("a", datetime(2024, 1, 1, 1), "x")],
                          "series_key string, bucket_ts timestamp, "
                          "key string"))
    # window at hour 1 = hours {0,1}: x appeared 3 + 1 times
    (r,) = est.collect()
    assert r["cm_est"] >= 4

    gated = cm_over_time(regs, 2, min_buckets=2)
    assert {r["bucket_ts"].hour for r in gated.collect()} == {1, 3}
    with pytest.raises(ValueError):
        cm_over_time(regs, 0)


def test_hll_over_time_sliding_union(spark):
    """distinct_over_time (r6): the k=2 rolling register set at a
    target bucket is BIT-identical to a direct HLL build over the
    union of the trailing-2 PRESENT buckets' keys (the hour-2 gap is
    skipped in index space); k=1 is the identity; n_buckets gates."""
    from json_time_series_extractor_spark.operators.hll import (
        hll_over_time, hll_rollup)

    rows = [("a", datetime(2024, 1, 1, 0, 5), f"u{i}") for i in range(4)] \
        + [("a", datetime(2024, 1, 1, 1, 5), f"u{i}") for i in (2, 3, 9)] \
        + [("a", datetime(2024, 1, 1, 3, 5), "u42")]
    df = spark.createDataFrame(rows,
                               "series_key string, ts timestamp, "
                               "key string")
    regs = hll_rollup(df, "1 hour", key_col="key")

    def regset(frame, hour):
        return sorted((r["reg"], r["max_rank"])
                      for r in frame.collect()
                      if r["bucket_ts"].hour == hour)

    ident = hll_over_time(regs, 1)
    for h in (0, 1, 3):
        assert regset(ident, h) == regset(regs, h)

    roll = hll_over_time(regs, 2)
    # hour-3 window = present buckets {hour 1, hour 3}: union of their
    # keys, relabeled into one bucket, must produce identical registers
    union = df.where(F.hour("ts").isin(1, 3)) \
        .withColumn("ts", F.lit(datetime(2024, 1, 1, 3, 5)))
    assert regset(roll, 3) == regset(
        hll_rollup(union, "1 hour", key_col="key"), 3)
    nb = {r["bucket_ts"].hour: r["n_buckets"]
          for r in roll.select("series_key", "bucket_ts", "n_buckets")
          .distinct().collect()}
    assert nb == {0: 1, 1: 2, 3: 2}
    gated = hll_over_time(regs, 2, min_buckets=2)
    assert {r["bucket_ts"].hour for r in gated.collect()} == {1, 3}


def test_estimate_carry_columns_match_join(spark):
    """Round-8 optimization: the `carry` kwarg on cm_estimate /
    hll_estimate (extra group-dependent columns riding through the
    aggregate) must reproduce exactly what the old estimate-then-join
    shape produced — same rows, carried column included."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_estimate, cm_rollup)
    from json_time_series_extractor_spark.operators.hll import (
        hll_estimate, hll_over_time, hll_rollup)

    rows = [("a", datetime(2024, 1, 1, 0, 5), "x")] * 3 \
        + [("a", datetime(2024, 1, 1, 0, 7), "y"),
           ("a", datetime(2024, 1, 1, 1, 5), "x"),
           ("b", datetime(2024, 1, 1, 1, 6), "y")]
    df = spark.createDataFrame(rows,
                               "series_key string, ts timestamp, "
                               "key string")

    keys = (df.groupBy("series_key",
                       F.date_trunc("hour", "ts").alias("bucket_ts"),
                       "key")
            .agg(F.count(F.lit(1)).alias("exact_cnt")))
    regs = cm_rollup(df, "1 hour", key_col="key")
    carried = cm_estimate(regs, keys, carry=("exact_cnt",))
    joined = (cm_estimate(regs,
                          keys.select("series_key", "bucket_ts", "key"))
              .join(keys, ["series_key", "bucket_ts", "key"]))
    assert sorted(
        (r["series_key"], r["bucket_ts"], r["key"], r["cm_est"],
         r["exact_cnt"]) for r in carried.collect()) == sorted(
        (r["series_key"], r["bucket_ts"], r["key"], r["cm_est"],
         r["exact_cnt"]) for r in joined.collect())

    roll = hll_over_time(hll_rollup(df, "1 hour", key_col="key"), 2)
    carried_h = hll_estimate(roll, carry=("n_buckets",))
    nb = roll.select("series_key", "bucket_ts", "n_buckets").distinct()
    joined_h = hll_estimate(roll.drop("n_buckets")) \
        .join(nb, ["series_key", "bucket_ts"])
    cols = ["series_key", "bucket_ts", "n_zero", "inv_fp40", "ndv_est",
            "n_buckets"]
    assert carried_h.columns == cols
    assert sorted(tuple(r[c] for c in cols)
                  for r in carried_h.collect()) == sorted(
        tuple(r[c] for c in cols) for r in joined_h.collect())


def test_sql_coordinate_arrays_match_column_builders(spark):
    """Round-8 optimization: the one-parse SQL coordinate arrays
    (cmsketch._rb_array / bloom._bits_array) must be value-identical
    to the Column-built md5hi64 coordinates on adversarial keys
    (unicode, the '|' separator itself, empty) across widths."""
    from json_time_series_extractor_spark.operators.bloom import (
        _bits_array, _bloom_bit)
    from json_time_series_extractor_spark.operators.cmsketch import (
        _cm_bucket, _rb_array)

    df = spark.createDataFrame(
        [(str(i),) for i in range(64)]
        + [("äöü-Ω",), ("a|b",), ("",), ("0|x",)], "key string")
    for width in (64, 1024, 1 << 16):
        cols = F.array(*[
            F.struct(F.lit(j).alias("r"),
                     _cm_bucket(F.col("key"), j, width).alias("b"))
            for j in range(4)])
        assert df.where(
            cols != _rb_array("key", 4, width)).count() == 0
        bits = F.array(*[_bloom_bit(F.col("key"), j, width)
                         for j in range(3)])
        assert df.where(
            bits != _bits_array("key", 3, width)).count() == 0


def test_tdigest_over_time_rolling_merge(spark):
    """quantile_over_time from sketches (r6): k=1 is the identity on
    digest rows; a k=3 rolling merge accumulates exact counts over
    trailing PRESENT buckets (gaps skipped), its vmin/vmax span the
    window, and estimates sit inside the window's exact value range;
    min_buckets gates warmup rows; bad params raise."""
    from json_time_series_extractor_spark.operators.tdigest import (
        rollup_tdigest, tdigest_over_time, tdigest_quantiles)

    rows = [("a", datetime(2024, 1, 1, h, m), float(100 * h + m))
            for h in (0, 1, 3) for m in range(0, 60, 5)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    d1h = rollup_tdigest(df, "1 hour")

    ident = tdigest_over_time(d1h, 1).drop("n_buckets")
    base = {r["bucket_ts"]: r for r in d1h.collect()}
    for r in ident.collect():
        b = base[r["bucket_ts"]]
        assert (r["means"], r["weights"], r["cnt"]) == \
            (b["means"], b["weights"], b["cnt"])

    rolled = {r["bucket_ts"].hour: r
              for r in tdigest_over_time(d1h, 3).collect()}
    assert [rolled[h]["cnt"] for h in (0, 1, 3)] == [12, 24, 36]
    assert [rolled[h]["n_buckets"] for h in (0, 1, 3)] == [1, 2, 3]
    # hour-3 window spans ALL three present buckets (the hour-2 gap is
    # skipped, not a frame boundary)
    assert rolled[3]["vmin"] == 0.0 and rolled[3]["vmax"] == 355.0
    est = {r["bucket_ts"].hour: r for r in tdigest_quantiles(
        tdigest_over_time(d1h, 3).drop("n_buckets")).collect()}
    assert 0.0 <= est[3]["p50"] <= 355.0
    assert est[3]["p99"] >= est[3]["p50"]

    gated = tdigest_over_time(d1h, 3, min_buckets=3).collect()
    assert [r["bucket_ts"].hour for r in gated] == [3]

    with pytest.raises(ValueError):
        tdigest_over_time(d1h, 0)
    with pytest.raises(ValueError):
        tdigest_over_time(d1h, 3, min_buckets=0)


def test_exemplar_samples_deterministic(spark):
    """Exemplars (r6): k raw samples per (series, bucket), selection
    identical across partitionings; under-k buckets keep everything."""
    from json_time_series_extractor_spark.operators.sampling import (
        exemplar_samples)

    rows = [("a", datetime(2024, 1, 1, 0, m), float(m)) for m in
            range(0, 60, 5)] \
        + [("b", datetime(2024, 1, 1, 2, 7), 42.0)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    pick = sorted((r["series_key"], r["ts"], r["value_double"])
                  for r in exemplar_samples(df, "1 hour", 3).collect())
    assert len([p for p in pick if p[0] == "a"]) == 3
    assert ("b", datetime(2024, 1, 1, 2, 7), 42.0) in pick  # under-k
    repart = sorted(
        (r["series_key"], r["ts"], r["value_double"])
        for r in exemplar_samples(df.repartition(7), "1 hour",
                                  3).collect())
    assert repart == pick


def test_absent_buckets_hand_computed(spark):
    """absent_over_time analog (r6): sparse absent-bucket rows with
    dense gap ordinals, in-run positions and run lengths; gapless and
    singleton series emit nothing."""
    from json_time_series_extractor_spark.operators.gapfill import (
        absent_buckets)

    rows = ([("a", datetime(2024, 1, 1, h)) for h in (0, 3, 4, 7)]
            + [("b", datetime(2024, 1, 1, 0)),
               ("b", datetime(2024, 1, 1, 1)),
               ("c", datetime(2024, 1, 1, 5))])
    df = spark.createDataFrame(rows, "series_key string, "
                               "bucket_ts timestamp")
    out = {(r["series_key"], r["bucket_ts"].hour):
           (r["gap_id"], r["gap_pos"], r["gap_len"])
           for r in absent_buckets(df, "1 hour").collect()}
    assert out == {("a", 1): (1, 1, 2), ("a", 2): (1, 2, 2),
                   ("a", 5): (2, 1, 2), ("a", 6): (2, 2, 2)}


def test_absent_buckets_partitioned_matches_global(spark):
    """The segment-partitioned variant (bounded windows + per-gap
    summary) is bit-identical to the whole-series absent_buckets,
    including gap runs that SPAN segment boundaries."""
    from json_time_series_extractor_spark.operators.gapfill import (
        absent_buckets,
        absent_buckets_partitioned,
    )
    from json_time_series_extractor_spark.operators.rollup import rollup

    # Hand fixture: series "a" has a 4-bucket run crossing the 1-hour
    # segment boundary at minute 60 (absent 58..61) plus a run exactly
    # at a segment start (120) and a single absence inside a segment.
    from datetime import timedelta
    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(minutes=m)) for m in
            (0, 57, 62, 90, 119, 121, 125)] \
        + [("b", t0 + timedelta(minutes=59)),
           ("b", t0 + timedelta(minutes=61))]
    df = spark.createDataFrame(rows, "series_key string, "
                               "bucket_ts timestamp")

    def key(out):
        return {(r.series_key, r.bucket_ts):
                (r.gap_id, r.gap_pos, r.gap_len) for r in out.collect()}

    base = key(absent_buckets(df, "1 minute"))
    part = key(absent_buckets_partitioned(df, "1 minute",
                                          segment="1 hour"))
    assert part == base
    # Spot-check the boundary-spanning run is ONE run in both.
    assert base[("a", t0 + timedelta(minutes=58))] == (2, 1, 4)
    assert base[("a", t0 + timedelta(minutes=61))] == (2, 4, 4)

    # Real data, 1-minute tier: hour segments force many boundary runs.
    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    r1m = rollup(samples, "1 minute")
    base = key(absent_buckets(r1m, "1 minute"))
    assert base  # non-degenerate: the tier does have absent buckets
    for segment in ("1 hour", "1 day"):
        assert key(absent_buckets_partitioned(
            r1m, "1 minute", segment=segment)) == base

    # Type parity (the oracle hash gate is type-strict; nullability
    # differs — the arithmetic gap_pos is nullable-typed, the
    # row_number one is not — and the gate hashes values, not flags).
    assert (absent_buckets_partitioned(df, "1 minute").dtypes
            == absent_buckets(df, "1 minute").dtypes)


def test_holt_winters_hand_computed(spark):
    """Holt smoothing (r6): recurrence checked against a by-hand
    replay, lookahead-free seed at i=2, singleton series unscored,
    factor validation."""
    from json_time_series_extractor_spark.operators.smoothing import (
        holt_winters)

    rows = [("a", datetime(2024, 1, 1, h), c) for h, c in
            enumerate([10, 14, 12, 20, 16])] \
        + [("b", datetime(2024, 1, 1, 0), 7)]
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    out = {(r["series_key"], r["bucket_ts"].hour):
           (r["smoothed"], r["trend"], r["scored"])
           for r in holt_winters(df, 0.3, 0.1).collect()}

    # by-hand replay with the module's fixed op shape
    sf, tf, csf, ctf = 0.3, 0.1, 0.7, 0.9
    level, tr = 14.0, 4.0                       # seed: v2, v2-v1
    expect = {1: (14.0, 4.0)}
    for i, v in enumerate([12.0, 20.0, 16.0], start=2):
        nl = sf * v + csf * (level + tr)
        tr = tf * (nl - level) + ctf * tr
        level = nl
        expect[i] = (level, tr)
    assert out[("a", 0)] == (None, None, False)
    for i, (lv, tv) in expect.items():
        got = out[("a", i)]
        assert got[0] == lv and got[1] == tv and got[2] is True
    assert out[("b", 0)] == (None, None, False)

    with pytest.raises(ValueError):
        holt_winters(df, 1.5, 0.1)
    with pytest.raises(ValueError):
        holt_winters(df, 0.3, 0.0)


def test_histogram_rebin_subset_exact(spark):
    """Re-binning to a subset of the fine bounds equals building the
    coarse histogram directly from raw; non-subset bounds refuse."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.rollup import (
        histogram_rebin, rollup_histogram)

    fine = (1.0, 2.0, 5.0, 10.0)
    coarse = (2.0, 10.0)
    rows = [("a", datetime(2024, 1, 1, 0, m % 60), v)
            for m, v in enumerate([0.5, 1.0, 1.5, 2.0, 3.0, 7.0,
                                   10.0, 50.0, 0.9, 4.99])]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    direct = rollup_histogram(df, "1 hour", bounds=coarse).first()
    rebinned = histogram_rebin(
        rollup_histogram(df, "1 hour", bounds=fine),
        bounds=fine, coarse_bounds=coarse).first()
    # <2: {0.5, 1.0, 1.5, 0.9}; [2,10): {2.0, 3.0, 7.0, 4.99}; >=10:
    # {10.0, 50.0}
    assert rebinned["hist"] == direct["hist"] == [4, 4, 2]
    assert rebinned["cnt"] == direct["cnt"] == 10

    with _pytest.raises(ValueError, match="subset"):
        histogram_rebin(rollup_histogram(df, "1 hour", bounds=fine),
                        bounds=fine, coarse_bounds=(3.0,))
    with _pytest.raises(ValueError, match="increasing"):
        histogram_rebin(rollup_histogram(df, "1 hour", bounds=fine),
                        bounds=fine, coarse_bounds=(10.0, 2.0))


def test_mergeable_cascade_bit_exact(spark):
    """rollup_mergeable_cascade(1m tier -> 1h) == rollup_mergeable
    straight from raw at 1h, bit-for-bit — integer sums and
    lexicographic last are order-free."""
    from json_time_series_extractor_spark.operators.refresh import (
        rollup_mergeable, rollup_mergeable_cascade)

    rows = [("a", datetime(2024, 1, 1, 0, m, s), float(v))
            for m, s, v in ((0, 10, 2.5), (0, 50, 8.25), (1, 5, 4.0),
                            (59, 59, 7.125), (30, 0, 1.0))]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    via = {(r["series_key"], r["bucket_ts"]): tuple(r) for r in
           rollup_mergeable_cascade(
               rollup_mergeable(df, "1 minute"), "1 hour").collect()}
    direct = {(r["series_key"], r["bucket_ts"]): tuple(r) for r in
              rollup_mergeable(df, "1 hour").collect()}
    assert via == direct


def test_gapfill_locf_stale_expires_the_carry(spark):
    """PromQL staleness: the carry survives exactly max_stale buckets
    past the last observation, then the series goes dark (NULL +
    stale) until the next observation revives it."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.gapfill import (
        gapfill_locf_stale)

    rows = [("a", datetime(2024, 1, 1, 0, 0), 10.0),
            ("a", datetime(2024, 1, 1, 0, 20), 99.0)]
    tier = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, mean double")
    out = {r["bucket_ts"].minute: r for r in
           gapfill_locf_stale(tier, "1 minute",
                              max_stale_buckets=5).collect()}
    assert len(out) == 21
    assert out[0]["value"] == 10.0 and not out[0]["filled"]
    for m in range(1, 6):     # fresh carry
        assert out[m]["value"] == 10.0
        assert out[m]["filled"] and not out[m]["stale"]
    for m in range(6, 20):    # expired
        assert out[m]["value"] is None and out[m]["stale"]
    assert out[20]["value"] == 99.0 and not out[20]["stale"]

    with _pytest.raises(ValueError):
        gapfill_locf_stale(tier, "1 minute", max_stale_buckets=0)


def test_refresh_rollup_equals_full_recompute(spark):
    """Invalidation + merge == full recompute, bit-for-bit, across the
    edge cases: revised buckets, brand-new buckets (late-only), exact
    last-ts ties, and an untouched bucket that must pass through with
    refreshed=false."""
    from json_time_series_extractor_spark.operators.refresh import (
        invalidated_buckets, refresh_rollup, rollup_mergeable)

    schema = "series_key string, ts timestamp, value_double double"
    on_time = spark.createDataFrame([
        ("a", datetime(2024, 1, 1, 0, 0, 10), 2.0),
        ("a", datetime(2024, 1, 1, 0, 0, 50), 8.0),   # revised bucket
        ("a", datetime(2024, 1, 1, 0, 1, 5), 4.0),    # untouched bucket
        ("b", datetime(2024, 1, 1, 0, 0, 30), 1.0),   # last-ts tie below
    ], schema)
    late = spark.createDataFrame([
        ("a", datetime(2024, 1, 1, 0, 0, 55), 9.5),   # revises a@minute0
        ("a", datetime(2024, 1, 1, 0, 2, 1), 7.0),    # NEW bucket
        ("b", datetime(2024, 1, 1, 0, 0, 30), 3.0),   # exact ts tie
        ("b", datetime(2024, 1, 1, 0, 0, 30), None),  # null: no-op
    ], schema)

    tier = rollup_mergeable(on_time, "1 minute")
    refreshed = refresh_rollup(tier, late, "1 minute")
    full = rollup_mergeable(on_time.unionByName(late), "1 minute")
    got = {(r["series_key"], r["bucket_ts"]): r
           for r in refreshed.collect()}
    want = {(r["series_key"], r["bucket_ts"]): r for r in full.collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for c in ("min", "max", "sum_fp6", "cnt", "last", "last_ts"):
            assert g[c] == w[c], (k, c, g[c], w[c])
    # dirty flags: minute-0 of a (revised), minute-2 of a (new), and b
    # (tie bucket) are refreshed; minute-1 of a is untouched
    flags = {k: got[k]["refreshed"] for k in got}
    m = datetime(2024, 1, 1, 0, 0)
    assert flags[("a", m)] is True
    assert flags[("a", datetime(2024, 1, 1, 0, 2))] is True
    assert flags[("b", m)] is True
    assert flags[("a", datetime(2024, 1, 1, 0, 1))] is False
    # the exact-ts tie resolves to the larger value on both paths
    assert got[("b", m)]["last"] == 3.0
    # invalidation log matches the flagged set (null-value row excluded)
    inv = {(r["series_key"], r["bucket_ts"])
           for r in invalidated_buckets(late, "1 minute").collect()}
    assert inv == {k for k, f in flags.items() if f}

    # empty late batch: everything passes through, nothing flagged
    empty = spark.createDataFrame([], schema)
    out = refresh_rollup(tier, empty, "1 minute").collect()
    assert len(out) == 3 and all(not r["refreshed"] for r in out)


def test_refresh_rollup_recompute_handles_deletes(spark):
    """Retractions: a partially-deleted bucket recomputes (its min/max
    move — the non-invertible case a fold-in cannot handle), a fully
    deleted bucket VANISHES, untouched buckets pass through unflagged;
    result equals a from-scratch tier over the survivors."""
    from json_time_series_extractor_spark.operators.refresh import (
        invalidated_buckets, refresh_rollup_recompute, rollup_mergeable)

    schema = "series_key string, ts timestamp, value_double double"
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 10), 2.0),   # survives
        ("a", datetime(2024, 1, 1, 0, 0, 50), 99.0),  # DELETED (max!)
        ("a", datetime(2024, 1, 1, 0, 1, 5), 4.0),    # untouched bucket
        ("b", datetime(2024, 1, 1, 0, 0, 30), 1.0),   # DELETED (bucket
        ("b", datetime(2024, 1, 1, 0, 0, 40), 5.0),   #  fully emptied)
    ]
    deleted = {1, 3, 4}  # row indices retracted
    all_df = spark.createDataFrame(rows, schema)
    cur_rows = [r for i, r in enumerate(rows) if i not in deleted]
    cur = spark.createDataFrame(cur_rows, schema)
    del_df = spark.createDataFrame(
        [r for i, r in enumerate(rows) if i in deleted], schema)

    tier0 = rollup_mergeable(all_df, "1 minute")
    inv = invalidated_buckets(del_df, "1 minute")
    out = refresh_rollup_recompute(tier0, cur, inv, "1 minute")
    got = {(r["series_key"], r["bucket_ts"]): r for r in out.collect()}
    want = {(r["series_key"], r["bucket_ts"]): r
            for r in rollup_mergeable(cur, "1 minute").collect()}
    assert set(got) == set(want)          # b@minute0 vanished
    for k, w in want.items():
        for c in ("min", "max", "sum_fp6", "cnt", "last", "last_ts"):
            assert got[k][c] == w[c], (k, c)
    m0 = datetime(2024, 1, 1, 0, 0)
    assert ("b", m0) not in got
    a0 = got[("a", m0)]
    assert a0["refreshed"] and a0["max"] == 2.0   # 99.0 retracted
    assert not got[("a", datetime(2024, 1, 1, 0, 1))]["refreshed"]

    # AQE's executed-plan string repeats nodes (final + original plan
    # sections) — assert the join STRATEGY, not an exact node count
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan            # anti + semi


def test_refresh_rollup_plan_never_shuffles_the_tier(spark):
    """The standing tier must only flow through broadcast joins: the
    executed plan has no SortMergeJoin and no shuffle of the existing
    side — the scale contract (tier is 100 TB, late batch is MBs)."""
    from json_time_series_extractor_spark.operators.refresh import (
        refresh_rollup, rollup_mergeable)

    schema = "series_key string, ts timestamp, value_double double"
    tier = rollup_mergeable(spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)], schema), "1 minute")
    late = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 2.0)], schema)
    plan = refresh_rollup(tier, late)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan
    assert plan.count("BroadcastHashJoin") == 3  # anti, semi, right-outer


def test_realtime_rollup_equals_full_recompute(spark):
    """Real-time continuous aggregate: materialized-tier ∪ raw-tail
    must equal a full from-raw recompute bit-for-bit for EVERY
    watermark position — aligned, unaligned (floors to the bucket
    grid), before all data (all fresh), and after all data (all
    materialized) — with the materialized flag naming the serving
    side."""
    from json_time_series_extractor_spark.operators.refresh import (
        realtime_rollup, rollup_mergeable)

    schema = "series_key string, ts timestamp, value_double double"
    rows = [("a", datetime(2024, 1, 1, 0, 0, 10), 2.0),
            ("a", datetime(2024, 1, 1, 0, 0, 50), 8.0),
            ("a", datetime(2024, 1, 1, 0, 1, 5), 4.0),
            ("a", datetime(2024, 1, 1, 0, 3, 30), 7.0),   # bucket gap
            ("b", datetime(2024, 1, 1, 0, 1, 30), 1.0),
            ("b", datetime(2024, 1, 1, 0, 1, 30), 3.0)]   # exact-ts tie
    raw = spark.createDataFrame(rows, schema)
    want = {(r["series_key"], r["bucket_ts"]): r
            for r in rollup_mergeable(raw, "1 minute").collect()}

    for wm, aligned_min in [
            (datetime(2024, 1, 1, 0, 2), 2),       # aligned, mid-data
            (datetime(2024, 1, 1, 0, 1, 45), 1),   # unaligned -> floor
            (datetime(2023, 12, 31), None),        # before all: all fresh
            (datetime(2024, 1, 2), 99)]:           # after all: all tier
        tier = rollup_mergeable(
            raw.where(F.col("ts") < F.lit(wm)), "1 minute")
        got = {(r["series_key"], r["bucket_ts"]): r
               for r in realtime_rollup(tier, raw, wm,
                                        "1 minute").collect()}
        assert set(got) == set(want), wm
        for k, w in want.items():
            g = got[k]
            for c in ("min", "max", "sum_fp6", "cnt", "last", "last_ts"):
                assert g[c] == w[c], (wm, k, c)
            if aligned_min is None:
                assert g["materialized"] is False, (wm, k)
            else:
                assert g["materialized"] is (k[1].minute < aligned_min), \
                    (wm, k)


def test_realtime_rollup_plan_has_no_joins(spark):
    """The real-time union is two pruned scans + one hash aggregate —
    no join anywhere (the scale contract: the tier scan reads closed
    partitions, the raw scan only the tail)."""
    from json_time_series_extractor_spark.operators.refresh import (
        realtime_rollup, rollup_mergeable)

    schema = "series_key string, ts timestamp, value_double double"
    raw = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)], schema)
    out = realtime_rollup(rollup_mergeable(raw, "1 minute"), raw,
                          datetime(2024, 1, 1), "1 minute")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan


def test_downsample_lttb_keeps_extremes_and_endpoints(spark):
    """LTTB (bucket-mean-anchor variant): first/last buckets keep the
    series' first/last samples; an interior bucket keeps its most
    trend-deviating point (the spike, not the on-trend samples)."""
    from json_time_series_extractor_spark.operators.downsample import (
        downsample_lttb)

    rows = ([("a", datetime(2024, 1, 1, 0, m), 10.0 + m) for m in
             (5, 25, 45)]                                 # hour 0: trend
            + [("a", datetime(2024, 1, 1, 1, 10), 70.0),
               ("a", datetime(2024, 1, 1, 1, 30), 500.0),  # the spike
               ("a", datetime(2024, 1, 1, 1, 50), 74.0)]
            + [("a", datetime(2024, 1, 1, 2, m), 130.0 + m) for m in
               (10, 20, 55)])                             # hour 2: trend
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {r["bucket_ts"].hour: (r["ts"], r["value"])
           for r in downsample_lttb(df, "1 hour").collect()}
    assert out[0] == (datetime(2024, 1, 1, 0, 5), 15.0)    # series first
    assert out[1] == (datetime(2024, 1, 1, 1, 30), 500.0)  # the spike
    assert out[2] == (datetime(2024, 1, 1, 2, 55), 185.0)  # series last


def test_downsample_lttb_plan_shape(spark):
    """No Python; the only windows run over the per-bucket summary
    (lag/lead of bucket means), never over raw samples."""
    from json_time_series_extractor_spark.operators.downsample import (
        downsample_lttb)

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)],
        "series_key string, ts timestamp, value_double double")
    plan = downsample_lttb(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan
    # the pick is an aggregate (struct-min), not a row_number window
    assert plan.count("Window") == 1


def test_detect_anomalies_mad(spark):
    """Hand-checked med/MAD flags: lower-median semantics, zero-MAD
    degenerate behavior, self-exclusion, and robustness — a prior
    spike inside the baseline does not unflag a following spike nor
    flag a following normal point (the property z-scores lack)."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.anomaly import (
        detect_anomalies_mad)

    vals = [10, 12, 11, 10, 12, 11,   # baseline
            100,                      # spike (scored vs the 6 above)
            11,                       # normal again, spike now in window
            90]                       # second spike
    rows = [("a", datetime(2024, 1, 1, h), v) for h, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    out = {r["bucket_ts"].hour: r for r in
           detect_anomalies_mad(df, 24, k=3, min_buckets=6).collect()}

    assert not out[5]["scored"] and out[5]["med"] == -1  # only 5 prior
    s = out[6]
    # window [10,12,11,10,12,11] sorted [10,10,11,11,12,12]: lower
    # median idx (6+1)//2 = 3 -> 11; devs sorted [0,0,1,1,1,1] -> MAD 1
    assert s["scored"] and (s["med"], s["mad"]) == (11, 1)
    assert s["dev"] == 89 and s["is_outlier"]
    # next normal point: spike is IN the baseline now, median unmoved
    n = out[7]
    assert n["med"] == 11 and n["dev"] == 0 and not n["is_outlier"]
    # second spike still flags: window sorted
    # [10,10,11,11,11,12,12,100] -> med 11 (idx (8+1)//2=4), devs
    # sorted [0,0,0,1,1,1,1,89] -> MAD 1, dev 79 > 3
    s2 = out[8]
    assert (s2["med"], s2["mad"], s2["dev"]) == (11, 1, 79)
    assert s2["is_outlier"]

    # zero-MAD: constant baseline flags any deviation
    rows = [("c", datetime(2024, 1, 1, h), 5) for h in range(6)] + \
           [("c", datetime(2024, 1, 1, 6), 6)]
    dfc = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    outc = {r["bucket_ts"].hour: r for r in
            detect_anomalies_mad(dfc, 24, k=3, min_buckets=6).collect()}
    assert outc[6]["mad"] == 0 and outc[6]["dev"] == 1
    assert outc[6]["is_outlier"]

    with _pytest.raises(ValueError):
        detect_anomalies_mad(df, 1)
    with _pytest.raises(ValueError):
        detect_anomalies_mad(df, 24, min_buckets=1)


def test_rolling_correlation(spark):
    """Hand-checkable windows: y=2x+1 gives r=1, z=-x gives r=-1, a
    constant series is undefined (dx·dy=0), n ramps with the trailing
    frame, and buckets missing in either series drop out (inner
    alignment)."""
    import numpy as np

    from json_time_series_extractor_spark.operators.correlate import (
        rolling_correlation)

    def row(k, h, v):
        return (k, datetime(2024, 1, 1, h, 30), float(v))

    xs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0]
    rows = ([row("x", h, v) for h, v in enumerate(xs)]
            + [row("y", h, 2 * v + 1) for h, v in enumerate(xs) if h != 3]
            + [row("z", h, -v) for h, v in enumerate(xs)]
            + [row("c", h, 7.0) for h in range(6)])
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = rolling_correlation(
        df, [("x", "y"), ("x", "z"), ("x", "c")], "1 hour", 3)
    got = {(r["key_b"], r["bucket_ts"].hour): r for r in out.collect()}

    # x~y: aligned buckets exclude hour 3; perfect linear -> r = 1
    ys = {(h): v for h, v in enumerate(xs) if h != 3}
    assert [got[("y", h)]["n"] for h in sorted(ys)] == [1, 2, 3, 3, 3]
    assert got[("y", 0)]["defined"] is False           # n < 2
    for h in (2, 4, 5):
        assert got[("y", h)]["defined"] is True
        assert abs(got[("y", h)]["corr"] - 1.0) < 1e-12
    # covariance matches numpy population covariance of the window
    win = [xs[2], xs[4], xs[5]]                        # hours {2,4,5}
    want_cov = np.cov(win, [2 * v + 1 for v in win], bias=True)[0][1]
    assert abs(got[("y", 5)]["cov_pop"] - want_cov) < 1e-9

    # x~z: exact anti-correlation
    assert abs(got[("z", 5)]["corr"] + 1.0) < 1e-12
    # x~c: constant right side -> undefined, NULL stats
    assert got[("c", 5)]["defined"] is False
    assert got[("c", 5)]["corr"] is None
    assert got[("c", 5)]["cov_pop"] is None


def test_downsample_m4_picks_and_ties(spark):
    """M4: first/last by (ts, value), min/max by (value, ts); exact
    value ties resolve to the lexicographically smallest (min side) /
    largest (max side) struct; single-sample buckets emit the same
    sample in all four roles."""
    from json_time_series_extractor_spark.operators.downsample import (
        downsample_m4)

    rows = [
        # hour 0: distinct roles + a value tie at the minimum (7.0 at
        # :10 and :40 -> min keeps the EARLIER ts, struct (v, ts) min)
        ("a", datetime(2024, 1, 1, 0, 5), 20.0),    # first
        ("a", datetime(2024, 1, 1, 0, 10), 7.0),    # min (tie, earlier)
        ("a", datetime(2024, 1, 1, 0, 20), 90.0),   # max
        ("a", datetime(2024, 1, 1, 0, 40), 7.0),    # min tie, later
        ("a", datetime(2024, 1, 1, 0, 50), 30.0),   # last
        # hour 1: a single sample fills every role
        ("a", datetime(2024, 1, 1, 1, 15), 42.0),
        # NULL values are excluded before bucketing
        ("a", datetime(2024, 1, 1, 1, 30), None),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {r["bucket_ts"].hour: r for r in
           downsample_m4(df, "1 hour").collect()}
    h0 = out[0]
    assert h0["n"] == 5
    assert (h0["first_ts"], h0["first_v"]) == (
        datetime(2024, 1, 1, 0, 5), 20.0)
    assert (h0["min_ts"], h0["min_v"]) == (datetime(2024, 1, 1, 0, 10), 7.0)
    assert (h0["max_ts"], h0["max_v"]) == (datetime(2024, 1, 1, 0, 20), 90.0)
    assert (h0["last_ts"], h0["last_v"]) == (
        datetime(2024, 1, 1, 0, 50), 30.0)
    h1 = out[1]
    assert h1["n"] == 1
    assert ({h1["first_ts"], h1["min_ts"], h1["max_ts"], h1["last_ts"]}
            == {datetime(2024, 1, 1, 1, 15)})
    assert ({h1["first_v"], h1["min_v"], h1["max_v"], h1["last_v"]}
            == {42.0})


def test_downsample_m4_plan_shape(spark):
    """M4 is ONE hash aggregate: no Python, no window operators at all
    (unlike LTTB's bounded summary window)."""
    from json_time_series_extractor_spark.operators.downsample import (
        downsample_m4)

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)],
        "series_key string, ts timestamp, value_double double")
    plan = downsample_m4(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan
    assert "Window" not in plan


def test_interval_join_semantics_and_plan(spark):
    """Bucketed range join: inclusive bounds, multi-bucket intervals,
    overlapping intervals multiply, left keeps unmatched; and the plan
    is an equi-join (no nested-loop/cartesian) despite the range
    predicate."""
    from json_time_series_extractor_spark.operators.joins import (
        interval_join)

    ev = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1, 3)),
         (2, "a", datetime(2024, 1, 2, 12)),
         (3, "a", datetime(2024, 1, 5, 3)),
         (4, "b", datetime(2024, 1, 1, 3))],
        "event_id long, series_key string, ts timestamp")
    iv = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 2), datetime(2024, 1, 3, 4), "m1"),
         ("a", datetime(2024, 1, 1, 2, 30), datetime(2024, 1, 1, 3),
          "m2")],   # inclusive end boundary hits event 1 exactly
        "series_key string, start_ts timestamp, end_ts timestamp, "
        "label string")
    inner = sorted((r["event_id"], r["label"])
                   for r in interval_join(ev, iv).collect())
    assert inner == [(1, "m1"), (1, "m2"), (2, "m1")]
    left = sorted((r["event_id"], r["label"])
                  for r in interval_join(ev, iv, how="left").collect())
    assert left == inner + [(3, None), (4, None)]
    plan = interval_join(ev, iv)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(ev, iv.withColumnRenamed("label", "ts"))
    with pytest.raises(Exception, match="wider than|SparkRuntimeException"):
        wide = spark.createDataFrame(
            [("a", datetime(2000, 1, 1), datetime(2024, 1, 1), "w")],
            "series_key string, start_ts timestamp, end_ts timestamp, "
            "label string")
        interval_join(ev, wide).collect()


def test_rolling_over_time_hand_computed(spark):
    from json_time_series_extractor_spark.operators.rollup import (
        rolling_over_time)

    rows = [("a", datetime(2024, 1, 1, h), float(v))
            for h, v in [(0, 10), (1, 20), (2, 60), (4, 4)]]  # gap at 3
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, mean double")
    out = {r["bucket_ts"].hour: r for r in
           rolling_over_time(df, 3, aggs=("avg", "max", "count"))
           .collect()}
    assert out[0]["avg_over_time"] == 10.0
    assert out[1]["avg_over_time"] == 15.0
    assert out[2]["avg_over_time"] == 30.0 and out[2]["max_over_time"] == 60.0
    # PRESENT-row frame: the gap at hour 3 does not shrink hour 4's
    # window of trailing rollup rows.
    assert out[4]["avg_over_time"] == 28.0  # (20+60+4)/3
    assert out[4]["buckets_in_window"] == 3

    # min_buckets gates the aggregates but keeps the count column.
    strict = {r["bucket_ts"].hour: r for r in
              rolling_over_time(df, 3, aggs=("avg",), min_buckets=3)
              .collect()}
    assert strict[0]["avg_over_time"] is None
    assert strict[2]["avg_over_time"] == 30.0

    with pytest.raises(ValueError, match="k_buckets"):
        rolling_over_time(df, 0)
    with pytest.raises(ValueError, match="unknown aggs"):
        rolling_over_time(df, 2, aggs=("median",))


def test_cm_sketch_cascade_estimates_and_bound(spark):
    """Count-Min: cascade == direct registers; estimates are exact when
    width >> keys; one-sided (>= truth) always; params validated."""
    import numpy as np

    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_cascade, cm_estimate, cm_rollup)

    rng = np.random.default_rng(7)
    rows = [(f"s{i % 2}",
             datetime(2024, 1, 1, int(i // 1000), int(i % 60)),
             f"k{rng.zipf(1.5) % 50}")
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")

    direct = cm_rollup(df, "1 hour", key_col="key")
    cascaded = cm_cascade(cm_rollup(df, "1 minute", key_col="key"),
                          "1 hour")
    assert direct.exceptAll(cascaded).count() == 0
    assert cascaded.exceptAll(direct).count() == 0

    keys = df.select("series_key",
                     F.window("ts", "1 hour")["start"].alias("bucket_ts"),
                     "key").distinct()
    exact = {(r["series_key"], r["bucket_ts"], r["key"]): r["cnt"]
             for r in df.groupBy(
                 "series_key",
                 F.window("ts", "1 hour")["start"].alias("bucket_ts"),
                 "key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    est = {(r["series_key"], r["bucket_ts"], r["key"]): r["cm_est"]
           for r in cm_estimate(direct, keys).collect()}
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)       # one-sided
    # ~50 keys vs width 1024: collisions across all 4 rows are rare
    # enough that >= 95% of estimates are exact.
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits / len(exact) >= 0.95

    plan = cm_estimate(direct, keys)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan

    with pytest.raises(ValueError, match="depth"):
        cm_rollup(df, "1 hour", key_col="key", depth=0)
    with pytest.raises(ValueError, match="power of two"):
        cm_rollup(df, "1 hour", key_col="key", width=1000)


def test_hll_cm_null_keys_dropped(spark):
    """NULL keys must not leave phantom registers (r6 ADVICE): a NULL
    is not a distinct value and contributes no frequency — and the
    DuckDB oracles cannot hash NULL at all. Registers with and without
    NULL rows in the input must be identical, matching the streaming
    tier's existing filter."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_rollup)
    from json_time_series_extractor_spark.operators.hll import (
        hll_rollup)

    clean = [("a", datetime(2024, 1, 1, 0, i % 60), f"k{i}")
             for i in range(50)]
    dirty = clean + [("a", datetime(2024, 1, 1, 0, 5), None)] * 3
    df_c = spark.createDataFrame(
        clean, "series_key string, ts timestamp, key string")
    df_d = spark.createDataFrame(
        dirty, "series_key string, ts timestamp, key string")

    h_c, h_d = (hll_rollup(d, "1 hour", key_col="key")
                for d in (df_c, df_d))
    assert h_d.where("reg IS NULL OR max_rank IS NULL").count() == 0
    assert h_c.exceptAll(h_d).count() == 0
    assert h_d.exceptAll(h_c).count() == 0

    c_c, c_d = (cm_rollup(d, "1 hour", key_col="key")
                for d in (df_c, df_d))
    assert c_d.where("cm_bucket IS NULL").count() == 0
    assert c_c.exceptAll(c_d).count() == 0
    assert c_d.exceptAll(c_c).count() == 0


def test_cm_estimate_param_mismatch_raises(spark):
    """The (depth, width) stamp on the register output (r6 ADVICE):
    probing with different parameters would silently miss buckets and
    lose the one-sided guarantee, so cm_estimate must refuse — through
    a cascade too."""
    from json_time_series_extractor_spark.operators.cmsketch import (
        cm_cascade, cm_estimate, cm_rollup)

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), "k")],
        "series_key string, ts timestamp, key string")
    regs = cm_rollup(df, "1 minute", key_col="key", depth=4, width=1024)
    keys = df.select("series_key",
                     F.window("ts", "1 hour")["start"].alias("bucket_ts"),
                     "key")
    with pytest.raises(ValueError, match="does not match"):
        cm_estimate(regs, keys, width=2048)
    with pytest.raises(ValueError, match="does not match"):
        cm_estimate(cm_cascade(regs, "1 hour"), keys, depth=2)
    # matching params work, including after a cascade
    assert cm_estimate(cm_cascade(regs, "1 hour"), keys).count() == 1
    # registers without the stamp (e.g. read back from parquet) probe
    # under the caller's responsibility — no spurious rejection
    bare = spark.createDataFrame(regs.collect(), regs.schema)
    bare = bare.select("series_key", "bucket_ts", "cm_row", "cm_bucket",
                       F.col("cnt").alias("cnt"))
    assert cm_estimate(bare, keys, width=1024).count() == 1


def test_interval_join_null_bounds_policy(spark):
    """NULL-bounded intervals (r6 ADVICE): they can satisfy no range
    predicate, so the default drops them (documented SQL semantics);
    on_null_bounds='error' validates eagerly with a message that names
    the null bound instead of the misleading span error."""
    from json_time_series_extractor_spark.operators.joins import (
        interval_join)

    ev = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1, 3))],
        "event_id long, series_key string, ts timestamp")
    iv = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), datetime(2024, 1, 2), "ok"),
         ("a", None, datetime(2024, 1, 2), "nullstart")],
        "series_key string, start_ts timestamp, end_ts timestamp, "
        "label string")
    dropped = interval_join(ev, iv).collect()   # default: drop
    assert [(r["event_id"], r["label"]) for r in dropped] == [(1, "ok")]
    with pytest.raises(ValueError, match="NULL"):
        interval_join(ev, iv, on_null_bounds="error")
    # eager validation passes through when no bounds are null
    clean = iv.where("start_ts IS NOT NULL")
    ok = interval_join(ev, clean, on_null_bounds="error").collect()
    assert [(r["event_id"], r["label"]) for r in ok] == [(1, "ok")]
    with pytest.raises(ValueError, match="on_null_bounds"):
        interval_join(ev, iv, on_null_bounds="ignore")


from hypothesis import given, settings
from hypothesis import strategies as st

_ij_minutes = st.integers(min_value=0, max_value=600)


@st.composite
def _ij_case(draw):
    """Random events/intervals over a 10-hour span with 1-hour buckets:
    overlapping intervals, zero-length intervals (start == end), and
    multi-key rows all arise naturally."""
    events = draw(st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _ij_minutes),
        min_size=1, max_size=12))
    intervals = draw(st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _ij_minutes,
                  st.integers(min_value=0, max_value=180)),
        min_size=1, max_size=8))
    return events, intervals


@settings(max_examples=10, deadline=None)
@given(_ij_case())
def test_interval_join_matches_bruteforce(spark, case):
    """Property test pinning the bucketed equi-rewrite beyond the
    deterministic oracle fixture (r5 verdict item 9): inner and left
    results must equal a brute-force in-memory range join on random
    inputs including overlapping and zero-length intervals."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.joins import (
        interval_join)

    events, intervals = case
    base = datetime(2024, 3, 1)
    ev_rows = [(i, k, base + timedelta(minutes=m))
               for i, (k, m) in enumerate(events)]
    iv_rows = [(j, k, base + timedelta(minutes=s),
                base + timedelta(minutes=s + ln))
               for j, (k, s, ln) in enumerate(intervals)]
    ev = spark.createDataFrame(
        ev_rows, "event_id long, series_key string, ts timestamp")
    iv = spark.createDataFrame(
        iv_rows, "iv_id long, series_key string, start_ts timestamp, "
                 "end_ts timestamp")

    expect_inner = sorted(
        (e_id, i_id)
        for e_id, ek, ets in ev_rows
        for i_id, ik, s, t in iv_rows
        if ek == ik and s <= ets <= t)
    got_inner = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, bucket="1 hour",
                               max_span_buckets=100).collect())
    assert got_inner == expect_inner

    matched = {e for e, _ in expect_inner}
    expect_left = sorted(expect_inner
                         + [(e_id, None) for e_id, _, _ in ev_rows
                            if e_id not in matched])
    got_left = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, how="left", bucket="1 hour",
                               max_span_buckets=100).collect())
    assert got_left == expect_left


def test_bloom_tier_cascade_probe_and_prefilter(spark):
    """Bloom membership tier (r6): cascade == direct build (union is
    idempotent), probes have NO false negatives, the parameter stamp
    rejects mismatched probes, and the incremental-dedup prefilter
    passes a superset of true duplicates (exact join result unchanged
    after pruning)."""
    from datetime import datetime, timedelta

    from json_time_series_extractor_spark.operators.bloom import (
        bloom_cascade, bloom_prefilter, bloom_probe, bloom_rollup)

    rows = [("s%d" % (i % 2), datetime(2024, 1, 1) +
             timedelta(minutes=7 * i), "k%d" % (i % 41), )
            for i in range(300)] + \
           [("s0", datetime(2024, 1, 1, 3), None)]    # NULL key dropped
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, key string")

    direct = bloom_rollup(df, "1 hour", key_col="key", k=3, m=256)
    casc = bloom_cascade(
        bloom_rollup(df, "1 minute", key_col="key", k=3, m=256), "1 hour")
    assert direct.exceptAll(casc).count() == 0
    assert casc.exceptAll(direct).count() == 0

    # no false negatives: every seen (series, hour, key) probes true
    seen = (df.where("key is not null")
            .select("series_key",
                    F.date_trunc("hour", "ts").alias("bucket_ts"),
                    "key").distinct())
    probed = bloom_probe(casc, seen, k=3, m=256)
    assert probed.where("NOT maybe_present").count() == 0
    assert probed.count() == seen.count()

    # parameter stamp: a wrong-width probe raises instead of missing
    import pytest
    with pytest.raises(ValueError, match="do not match"):
        bloom_probe(casc, seen, k=3, m=512)

    # prefilter: reference corpus knows keys r0..r19; the new batch
    # carries a mix of those and fresh n0..n79 keys. Every true
    # duplicate must survive the prune; most fresh keys must not.
    ref = spark.createDataFrame(
        [("s0", datetime(2024, 1, 1), "r%d" % i) for i in range(20)],
        "series_key string, ts timestamp, key string")
    ref_regs = bloom_rollup(ref, "1 day", key_col="key", k=3, m=256)
    new = spark.createDataFrame(
        [("s0", datetime(2024, 1, 2), ("r%d" if i % 5 == 0 else "n%d")
          % (i % 80)) for i in range(200)],
        "series_key string, ts timestamp, key string")
    kept = bloom_prefilter(new, ref_regs, key_col="key", k=3, m=256)
    true_dups = new.join(ref.select("key").distinct(), "key")
    kept_dups = kept.join(ref.select("key").distinct(), "key")
    # one-sided guarantee: every true duplicate row is kept
    assert true_dups.select(*new.columns).exceptAll(
        kept_dups.select(*new.columns)).count() == 0
    # and the prefilter really prunes the fresh-key majority
    assert true_dups.count() <= kept.count() < new.count()


def test_holt_winters_seasonal_hand_computed(spark):
    """Triple smoothing (r7): seed at i=period, per-step seasonal
    state, replayed by hand; short series unscored; validation."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.smoothing import (
        holt_winters_seasonal)

    p, sf, tf, gf = 3, 0.5, 0.25, 0.5
    vals = [10, 16, 13, 11, 17, 14, 40]  # period-3 pattern + a spike
    rows = [("a", datetime(2024, 1, 1, h), c)
            for h, c in enumerate(vals)] \
        + [("b", datetime(2024, 1, 1, 0), 7),
           ("b", datetime(2024, 1, 1, 1), 9)]  # shorter than period
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    out = {(r.series_key, r.bucket_ts.hour):
           (r.level, r.trend, r.season, r.scored)
           for r in holt_winters_seasonal(
               df, sf, tf, gf, p).collect()}

    # Independent replay with the documented op shapes.
    csf, ctf, cgf = 1 - sf, 1 - tf, 1 - gf
    level = float(vals[p - 1])
    tr = (vals[p - 1] - vals[0]) / (p - 1)
    seasons = [float(v) - vals[p - 1] for v in vals[:p]]
    expect = {p - 1: (level, tr, 0.0)}
    for i in range(p, len(vals)):
        s_old = seasons[i - p]
        nl = sf * (vals[i] - s_old) + csf * (level + tr)
        tr = tf * (nl - level) + ctf * tr
        s = gf * (vals[i] - nl) + cgf * s_old
        seasons.append(s)
        level = nl
        expect[i] = (level, tr, s)
    for h, (lv, t, s) in expect.items():
        got = out[("a", h)]
        assert got[3] is True
        assert abs(got[0] - lv) < 1e-12 and abs(got[1] - t) < 1e-12 \
            and abs(got[2] - s) < 1e-12
    for h in range(p - 1):  # pre-seed rows unscored
        assert out[("a", h)] == (None, None, None, False)
    assert out[("b", 0)] == (None, None, None, False)
    assert out[("b", 1)] == (None, None, None, False)
    with _pytest.raises(ValueError, match="period"):
        holt_winters_seasonal(df, period=1)
    with _pytest.raises(ValueError, match="factors"):
        holt_winters_seasonal(df, gf=1.5)


def test_rate_extrapolated_hand_computed(spark):
    """PromQL extrapolatedRate per bucket (r7): independent replay of
    the documented algorithm — edge-gap extension, the 1.1x-mean-
    spacing cap, the counter zero clamp, resets, and <2-sample buckets
    unscored."""
    from datetime import timedelta

    from json_time_series_extractor_spark.operators.rate import (
        rate_extrapolated)

    t0 = datetime(2024, 1, 1)

    def S(mins, val, key="a"):
        return (key, t0 + timedelta(minutes=mins), float(val))

    rows = [
        # bucket 0: dense samples at :10..:50 — edge gaps capped vs
        # in-window spacing; one reset (40 -> 5).
        S(10, 0), S(20, 10), S(30, 40), S(40, 5), S(50, 25),
        # bucket 1: single sample -> unscored
        S(70, 100),
        # bucket 2: two samples hugging the start; large end gap gets
        # the avg/2 treatment; small firstV triggers the zero clamp.
        S(120, 1), S(125, 61),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    out = {r.bucket_ts.hour: (r.n_samples, r.inc, r.extrapolated,
                              r.rate, r.scored)
           for r in rate_extrapolated(df, "1 hour").collect()}

    def replay(ts_vals, start, rng=3600.0):
        ts_vals = sorted(ts_vals)
        ts = [t for t, _ in ts_vals]
        vs = [v for _, v in ts_vals]
        inc = 0.0
        for a, b in zip(vs, vs[1:]):
            inc += (b - a) if b - a >= 0 else b
        si = ts[-1] - ts[0]
        ds, de = ts[0] - start, (start + rng) - ts[-1]
        avg = si / (len(vs) - 1)
        thr = avg * 1.1
        if inc > 0 and vs[0] >= 0 and si * (vs[0] / inc) < ds:
            ds = si * (vs[0] / inc)
        dsx = ds if ds < thr else avg / 2.0
        dex = de if de < thr else avg / 2.0
        ex = inc * ((si + dsx + dex) / si)
        return inc, ex, ex / rng

    b0 = replay([(600, 0.0), (1200, 10.0), (1800, 40.0),
                 (2400, 5.0), (3000, 25.0)], 0.0)
    assert out[0][0] == 5 and out[0][4] is True
    assert abs(out[0][1] - b0[0]) < 1e-9
    assert abs(out[0][2] - b0[1]) < 1e-9
    assert abs(out[0][3] - b0[2]) < 1e-9
    # reset-aware increase: 10 + 30 + 5(reset) + 20 = 65
    assert abs(out[0][1] - 65.0) < 1e-12

    assert out[1] == (1, None, None, None, False)

    b2 = replay([(7200, 1.0), (7500, 61.0)], 7200.0)
    assert out[2][4] is True
    assert abs(out[2][2] - b2[1]) < 1e-9
    # the end gap (3300s) exceeded thr (330s) -> avg/2 (150s) added,
    # and the zero clamp bound the start side: extrapolated < inc * 2
    assert out[2][2] < out[2][1] * 2


def test_detect_changepoints_cusum(spark):
    """Hand-checked two-sided CUSUM on a step series, plus the
    degenerate zero-MAD case."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.anomaly import (
        detect_changepoints_cusum)

    # 6 baseline buckets then a sustained +10 level shift: single
    # spikes should NOT alarm at h=5*MAD but the shift must.
    vals = [10, 12, 11, 10, 12, 11, 21, 22, 21, 22]
    rows = [("a", datetime(2024, 1, 1, h), v) for h, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    out = {r["bucket_ts"].hour: r for r in
           detect_changepoints_cusum(df, kappa_div=2, h_mult=5).collect()}

    # sorted vals [10,10,11,11,12,12,21,21,22,22]: lower median idx
    # (10+1)//2 = 5 -> 12; devs sorted [0,0,1,1,2,2,9,9,10,10] -> MAD 2
    assert (out[0]["mu"], out[0]["mad"]) == (12, 2)
    assert out[0]["scored"]
    # brute-force replay of the recursion (kappa=1, h=10)
    sp = sn = 0
    expect = {}
    for h, v in enumerate(vals):
        sp = max(0, sp + (v - 12 - 1))
        sn = max(0, sn - (v - 12 + 1))
        expect[h] = (sp, sn, sp > 10 or sn > 10)
    for h in range(len(vals)):
        r = out[h]
        assert (r["s_pos"], r["s_neg"], r["alarm"]) == expect[h], h
    # the shift alarms within two shifted buckets, baseline never does
    assert not any(out[h]["alarm"] for h in range(6))
    assert out[7]["alarm"]

    # zero MAD -> scored false, alarm false regardless of deviation
    rows = [("c", datetime(2024, 1, 1, h), 5) for h in range(6)] + \
           [("c", datetime(2024, 1, 1, 6), 500)]
    dfc = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    outc = {r["bucket_ts"].hour: r for r in
            detect_changepoints_cusum(dfc).collect()}
    assert not outc[6]["scored"] and not outc[6]["alarm"]

    with _pytest.raises(ValueError):
        detect_changepoints_cusum(df, kappa_div=0)
    with _pytest.raises(ValueError):
        detect_changepoints_cusum(df, h_mult=0)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=50),
                         min_size=1, max_size=30),
                min_size=1, max_size=3))
def test_cusum_closed_form_matches_recursion(spark, series):
    """Property test: the drawup/drawdown closed form equals the
    max(0, .) recursion on random multi-series integer inputs."""
    from datetime import timedelta

    from json_time_series_extractor_spark.operators.anomaly import (
        detect_changepoints_cusum)

    rows = [(f"s{i}", datetime(2024, 1, 1) + timedelta(hours=h), v)
            for i, vals in enumerate(series)
            for h, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, count long")
    got = {(r["series_key"], r["bucket_ts"]):
           (r["mu"], r["mad"], r["s_pos"], r["s_neg"], r["alarm"])
           for r in detect_changepoints_cusum(
               df, kappa_div=2, h_mult=5).collect()}

    for i, vals in enumerate(series):
        n = len(vals)
        a = sorted(vals)
        mu = a[(n + 1) // 2 - 1]
        mad = sorted(abs(v - mu) for v in vals)[(n + 1) // 2 - 1]
        kappa, h = mad // 2, 5 * mad
        sp = sn = 0
        for hh, v in enumerate(vals):
            sp = max(0, sp + (v - mu - kappa))
            sn = max(0, sn - (v - mu + kappa))
            alarm = mad > 0 and (sp > h or sn > h)
            key = (f"s{i}", datetime(2024, 1, 1) + timedelta(hours=hh))
            assert got[key] == (mu, mad, sp, sn, alarm), key


def test_dedup_ingest_lww(spark):
    """Hand-checked winner ladder: later ingest_ts wins; at equal
    ingest_ts the higher seq wins; at equal (ingest_ts, seq) the higher
    value wins (total order); a NULL payload loses to a real one; a
    never-redelivered row passes through with n_versions = 1."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.ingest import (
        dedup_ingest_lww)

    t0 = datetime(2024, 1, 1, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 5)
    rows = [
        # key A: correction at t1 beats two t0 versions
        ("a", t0, 1.0, t0, 0), ("a", t0, 1.0, t0, 0),
        ("a", t0, 99.0, t1, 1),
        # key B: same ingest_ts, seq tie-break
        ("b", t0, 5.0, t1, 0), ("b", t0, 7.0, t1, 1),
        # key C: same (ingest_ts, seq), value tie-break
        ("c", t0, 3.0, t0, 0), ("c", t0, 4.0, t0, 0),
        # key D: NULL payload at same (ingest_ts, seq) loses
        ("d", t0, None, t0, 0), ("d", t0, 2.0, t0, 0),
        # key E: single delivery
        ("e", t0, 8.0, t0, 0),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double, "
              "ingest_ts timestamp, ingest_seq int")
    got = {r["series_key"]:
           (r["value_double"], r["ingest_ts"], r["ingest_seq"],
            r["n_versions"])
           for r in dedup_ingest_lww(df).collect()}
    assert got == {
        "a": (99.0, t1, 1, 3),
        "b": (7.0, t1, 1, 2),
        "c": (4.0, t0, 0, 2),
        "d": (2.0, t0, 0, 2),
        "e": (8.0, t0, 0, 1),
    }
    # the aggregate is mergeable: dedup of (dedup of any split) is
    # identical to dedup of the whole — replay with a two-way split
    a = dedup_ingest_lww(df.where(F.col("ingest_seq") == 0))
    b = df.where(F.col("ingest_seq") == 1)
    re = dedup_ingest_lww(
        a.drop("n_versions").unionByName(b).withColumn(
            "ingest_seq", F.col("ingest_seq")))
    got2 = {r["series_key"]: (r["value_double"], r["ingest_seq"])
            for r in re.collect()}
    assert {k: v[:2] for k, v in got2.items()} == {
        k: (v[0], v[2]) for k, v in got.items()}

    with _pytest.raises(ValueError):
        dedup_ingest_lww(df, key_cols=())


@settings(max_examples=8, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),   # bucket hour
              st.integers(min_value=-50, max_value=50)),
    min_size=1, max_size=25, unique_by=lambda t: t[0]))
def test_series_acf_matches_bruteforce(spark, pts):
    """Property test: grid-aligned ACF equals the from-scratch Python
    computation on random sparse integer series (gaps included), and
    degenerate cases (constant series, no co-present pairs) emit
    defined=false rows for every requested lag."""
    from fractions import Fraction

    from json_time_series_extractor_spark.operators.correlate import (
        series_acf)

    rows = [("s", datetime(2024, 1, 1) + timedelta(hours=h), float(v))
            for h, v in pts]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    got = {r["lag"]: r for r in series_acf(df, "1 hour", 4).collect()}
    assert set(got) == {1, 2, 3, 4}

    by_h = {h: v * 10**6 for h, v in pts}   # fp6 of an integer value
    n = len(by_h)
    sx = sum(by_h.values())
    sxx = sum(v * v for v in by_h.values())
    for k in range(1, 5):
        pairs = [(by_h[h], by_h[h + k]) for h in by_h if h + k in by_h]
        m = len(pairs)
        num = (n * n * sum(a * b for a, b in pairs)
               - n * sx * (sum(a for a, _ in pairs)
                           + sum(b for _, b in pairs))
               + m * sx * sx)
        den = n * n * sxx - n * sx * sx
        r = got[k]
        assert r["n"] == n and r["m_pairs"] == m
        if m > 0 and den > 0:
            assert r["defined"]
            assert r["acf"] == float(num) / float(den) or \
                abs(r["acf"] - float(Fraction(num, den))) < 1e-12
        else:
            assert not r["defined"] and r["acf"] is None


def test_slo_burn_rate(spark):
    """Hand-checked multiwindow burn: a 5-minute error burst must trip
    the alert only while BOTH windows burn above threshold, gaps widen
    the time window (RANGE, not ROWS), and zero-traffic windows are
    unscored rather than zero-burn."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.slo import (
        slo_burn_rate)

    base = datetime(2024, 1, 1, 12, 0)
    rows = []
    # service 0: 10 req/min for 30 min, minutes 10-14 all errors
    for m in range(30):
        for i in range(10):
            rows.append((0, base + timedelta(minutes=m, seconds=i),
                         10 <= m < 15))
    # service 1: one clean request, then a 3-min gap, then an error —
    # with ROWS frames the error minute would see only 2 present rows;
    # with RANGE the clean minute at t-4min is still inside a 5-min
    # short window.
    rows.append((1, base, False))
    rows.append((1, base + timedelta(minutes=4), True))
    df = spark.createDataFrame(
        rows, "service long, ts timestamp, is_error boolean")
    out = slo_burn_rate(df, tier="1 minute", short_window="5 minutes",
                        long_window="15 minutes", slo_target=0.9,
                        threshold=3.0)
    got = {(r["service"], r["bucket_ts"].minute): r
           for r in out.collect()}

    # service 0, minute 14: short window (10..14) all errors ->
    # ratio 1.0, burn 10; long window (0..14) 50/150 -> burn 10/3
    r = got[(0, 14)]
    assert (r["req_short"], r["err_short"]) == (50, 50)
    assert (r["req_long"], r["err_long"]) == (150, 50)
    assert r["alert"] and abs(r["burn_short"] - 10.0) < 1e-12
    # minute 9: no errors anywhere yet
    assert not got[(0, 9)]["alert"] and got[(0, 9)]["err_long"] == 0
    # minute 25: short window clean again -> alert clears even though
    # the long window still carries the burst
    r25 = got[(0, 25)]
    assert r25["err_short"] == 0 and r25["err_long"] > 0
    assert not r25["alert"]
    # service 1 RANGE semantics: the error minute's short window spans
    # minutes 0..4 -> 2 requests, 1 error
    r1 = got[(1, 4)]
    assert (r1["req_short"], r1["err_short"]) == (2, 1)
    assert r1["scored"]

    with _pytest.raises(ValueError):
        slo_burn_rate(df, slo_target=1.0)
    with _pytest.raises(ValueError):
        slo_burn_rate(df, short_window="6 hours", long_window="1 hour")


def test_seasonal_decompose(spark):
    """On x_t = 10t + s[t % 4] (s summing to 0) the 2xP centered MA
    recovers the line EXACTLY (symmetric weights kill the periodic
    part), so trend/seasonal/residual are exact; edges are undefined;
    a gap disables every window that spans it (RANGE semantics)."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.decompose import (
        seasonal_decompose)

    s = [0.0, 5.0, -3.0, -2.0]
    base = datetime(2024, 1, 1)   # midnight -> phase == hour % 4
    rows = [("a", base + timedelta(hours=t), 10.0 * t + s[t % 4])
            for t in range(12)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    got = {r["bucket_ts"].hour: r
           for r in seasonal_decompose(df, "1 hour", 4).collect()}

    for t in range(12):
        r = got[t]
        assert r["phase"] == t % 4
        if 2 <= t <= 9:
            assert r["defined"]
            assert abs(r["trend"] - 10.0 * t) < 1e-9, t
            assert abs(r["seasonal"] - s[t % 4]) < 1e-9, t
            assert abs(r["residual"]) < 1e-9, t
        else:
            assert not r["defined"] and r["trend"] is None

    # a missing hour disables every centered window spanning it
    df2 = df.where(F.hour("ts") != 5)
    got2 = {r["bucket_ts"].hour: r["defined"]
            for r in seasonal_decompose(df2, "1 hour", 4).collect()}
    assert not any(got2[t] for t in (3, 4, 6, 7))
    assert got2[8] and got2[9]

    with _pytest.raises(ValueError):
        seasonal_decompose(df, period=5)


def test_rollup_calendar_cascade(spark):
    """Month/quarter tiers cascade exactly from the day tier across a
    calendar boundary (variable-length months — the case F.window
    cannot bucket), matching a direct from-raw aggregate."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.rollup import (
        rollup, rollup_cascade, rollup_calendar_cascade)

    rows = [("a", datetime(2024, 1, 30, 5), 1.0),
            ("a", datetime(2024, 1, 31, 23, 59), 5.0),
            ("a", datetime(2024, 2, 1, 0, 0), 9.0),
            ("a", datetime(2024, 3, 31, 12), 2.0),
            ("a", datetime(2024, 4, 1, 12), 7.0)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    r1d = rollup_cascade(rollup(df, "1 minute",
                                deterministic_last=True), "1 day")
    got = {r["bucket_ts"].month: r for r in
           rollup_calendar_cascade(r1d, "month").collect()}
    assert set(got) == {1, 2, 3, 4}
    jan = got[1]
    assert (jan["min"], jan["max"], jan["count"]) == (1.0, 5.0, 2)
    assert jan["last"] == 5.0 and jan["last_ts"].day == 31
    assert got[2]["count"] == 1 and got[2]["last"] == 9.0
    assert all(got[m]["bucket_ts"].day == 1 for m in got)

    q = {r["bucket_ts"].month: r for r in
         rollup_calendar_cascade(r1d, "quarter").collect()}
    assert set(q) == {1, 4}
    assert q[1]["count"] == 4 and q[1]["sum"] == 17.0
    assert q[4]["count"] == 1 and q[4]["last"] == 7.0

    with _pytest.raises(ValueError):
        rollup_calendar_cascade(r1d, "week")


def test_histogram_fraction(spark):
    """Hand-checked fractions against the bin construction: interior
    interpolation, both clamps, and monotonicity across thresholds;
    plus the inversion property — frac(quantile(q)) ~= q when the
    quantile lands strictly inside an interior bin."""
    import pytest as _pytest

    from json_time_series_extractor_spark.operators.rollup import (
        histogram_fraction, rollup_histogram)

    bounds = (10.0, 20.0, 40.0)
    vals = [5.0, 15.0, 15.0, 25.0, 30.0, 35.0, 50.0, 60.0]
    rows = [("a", datetime(2024, 1, 1, 0, i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    h = rollup_histogram(df, "1 hour", bounds=bounds)
    out = histogram_fraction(
        h, [10.0, 15.0, 25.0, 40.0], bounds=bounds,
        names=("f10", "f15", "f25", "f40")).collect()[0]
    # bins: (<10)=1, [10,20)=2, [20,40)=3, [>=40]=2 ; cnt=8
    assert abs(out["f10"] - 1 / 8) < 1e-12          # clamp low: c0
    assert abs(out["f15"] - (1 + 2 * 0.5) / 8) < 1e-12   # interior
    assert abs(out["f25"] - (3 + 3 * 0.25) / 8) < 1e-12
    assert abs(out["f40"] - 6 / 8) < 1e-12          # clamp high: c2
    assert out["f10"] <= out["f15"] <= out["f25"] <= out["f40"]

    with _pytest.raises(ValueError):
        histogram_fraction(h, [5.0], bounds=bounds)     # below range
    with _pytest.raises(ValueError):
        histogram_fraction(h, [41.0], bounds=bounds)    # above range
    with _pytest.raises(ValueError):
        histogram_fraction(h, [15.0], bounds=(10.0, 10.0, 40.0))


def test_mg_tier_hand_example(spark):
    """MG compaction on a hand-computed bucket: counts [5,4,4,2,1] with
    k=2 -> d = 3rd largest = 4 -> survivors {a:1} (the tied 4s and the
    tail subtract to <= 0); a bucket with <= k items passes through
    exactly (d=0)."""
    from json_time_series_extractor_spark.operators.mg import mg_tier

    t0 = datetime(2024, 1, 1, 0, 30)
    rows = ([("s", t0, "a")] * 5 + [("s", t0, "b")] * 4
            + [("s", t0, "c")] * 4 + [("s", t0, "d")] * 2
            + [("s", t0, "e")]
            + [("u", t0, "x")] * 3 + [("u", t0, "y")])
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, item string")
    out = {(r.series_key, r.item): r.mg_cnt
           for r in mg_tier(df, "1 hour", k=2, item_col="item").collect()}
    assert out == {("s", "a"): 1, ("u", "x"): 3, ("u", "y"): 1}


def test_mg_guarantee_property(spark):
    """Frequency guarantee vs brute force on adversarial-ish streams:
    the tier underestimates by at most n/(k+1), the 2-level cascade by
    at most 2n/(k+1), estimates never exceed truth, and every item more
    frequent than the bound survives."""
    from collections import Counter

    from json_time_series_extractor_spark.operators.mg import (
        mg_cascade,
        mg_tier,
    )

    import random
    rnd = random.Random(11)
    k = 4
    rows = []
    for h in range(6):  # six 1h buckets cascading into one day
        for _ in range(200):
            # Zipf-ish: few heavy items + a long tail
            item = (f"hot{rnd.randint(0, 2)}" if rnd.random() < 0.5
                    else f"cold{rnd.randint(0, 60)}")
            rows.append(("s", datetime(2024, 1, 1, h, rnd.randint(0, 59)),
                         item))
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, item string")
    tier = mg_tier(df, "1 hour", k=k, item_col="item")
    day = mg_cascade(tier, "1 day", k=k)

    per_hour = Counter()
    for _, ts, item in rows:
        per_hour[(ts.hour, item)] += 1
    got_hour = {(r.bucket_ts.hour, r.item): r.mg_cnt
                for r in tier.collect()}
    n_hour = Counter()
    for (h, _), c in per_hour.items():
        n_hour[h] += c
    for (h, item), f in per_hour.items():
        est = got_hour.get((h, item), 0)
        assert est <= f
        assert f - est <= n_hour[h] // (k + 1) + 1, (h, item)
        if f > n_hour[h] / (k + 1):
            assert (h, item) in got_hour
    for key, est in got_hour.items():
        assert est <= per_hour[key]          # never an overestimate

    true_day = Counter(item for _, _, item in rows)
    n = sum(true_day.values())
    got_day = {r.item: r.mg_cnt for r in day.collect()}
    for item, f in true_day.items():
        est = got_day.get(item, 0)
        assert est <= f
        assert f - est <= 2 * n // (k + 1) + 1, item
        if f > 2 * n / (k + 1):
            assert item in got_day, item
    for item, est in got_day.items():
        assert est <= true_day[item]


def test_mg_partial_log_merge_and_bound(spark, tmp_path):
    """Streaming MG partial log: per-batch compacted summaries merged
    at read equal the brute-force sum+compact of the same batch
    summaries, and keep the 2n/(k+1) undercount bound vs the TRUE
    union counts; re-writing a batch directory (crash replay) changes
    nothing."""
    from collections import Counter

    from json_time_series_extractor_spark.operators.mg import (
        mg_tier,
        read_merged_mg,
    )

    k = 3
    t0 = datetime(2024, 1, 1, 0, 30)
    batches = [
        [("s", t0, f"i{j % 7}") for j in range(40)],
        [("s", t0, f"i{j % 5}") for j in range(25)],
    ]
    base = str(tmp_path / "mglog")
    for bi, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "series_key string, ts timestamp, item string")
        (mg_tier(df, "1 hour", k=k, item_col="item")
         .withColumn("p_batch", F.lit(bi))
         .write.mode("overwrite").parquet(f"{base}/b{bi:05d}"))
    got = {r.item: r.mg_cnt
           for r in read_merged_mg(spark, base, k=k).collect()}

    def compact(counts):
        d = sorted(counts.values(), reverse=True)[k] \
            if len(counts) > k else 0
        return {i: c - d for i, c in counts.items() if c > d}

    per_batch = [compact(Counter(i for _, _, i in rows))
                 for rows in batches]
    summed = Counter()
    for s in per_batch:
        summed.update(s)
    assert got == compact(summed)
    true = Counter(i for rows in batches for _, _, i in rows)
    n = sum(true.values())
    for item, f in true.items():
        est = got.get(item, 0)
        assert est <= f and f - est <= 2 * n // (k + 1) + 1
    # crash replay: rewriting batch 0 with identical content is a no-op
    df0 = spark.createDataFrame(
        batches[0], "series_key string, ts timestamp, item string")
    (mg_tier(df0, "1 hour", k=k, item_col="item")
     .withColumn("p_batch", F.lit(0))
     .write.mode("overwrite").parquet(f"{base}/b00000"))
    again = {r.item: r.mg_cnt
             for r in read_merged_mg(spark, base, k=k).collect()}
    assert again == got


def test_funnel_steps_semantics(spark):
    """First-conversion funnel edge cases: earliest step-1 anchors,
    strictly-after ordering (an exact-ts tie does NOT advance), the
    horizon is anchored at t1 and inclusive, stalls propagate NULLs,
    and users without step 1 are absent."""
    from json_time_series_extractor_spark.operators.funnel import (
        funnel_steps,
    )

    def t(m, s=0):
        return datetime(2024, 1, 1, 0, m, s)

    rows = [
        # u1: clean conversion; earliest view anchors even though a
        # later view also precedes the click
        (1, t(0), "view"), (1, t(4), "view"), (1, t(5), "click"),
        (1, t(9), "purchase"),
        # u2: click EXACTLY at the view timestamp -> tie does not count;
        # the later click does, purchase after horizon (t1 + 10min) out
        (2, t(2), "view"), (2, t(2), "click"), (2, t(3), "click"),
        (2, t(20), "purchase"),
        # u3: purchase BEFORE the click -> stalls at click=NULL even
        # though a purchase exists
        (3, t(1), "view"), (3, t(2), "purchase"), (3, t(6), "click"),
        # u4: no view at all -> absent from the funnel
        (4, t(0), "click"), (4, t(1), "purchase"),
        # u5: purchase exactly at t1 + horizon -> inclusive, counts
        (5, t(0), "view"), (5, t(1), "click"), (5, t(10), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in funnel_steps(
        df, ["view", "click", "purchase"],
        horizon="10 minutes").collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].t1, out[1].t2, out[1].t3) == (t(0), t(5), t(9))
    assert out[1].steps_completed == 3
    assert (out[2].t1, out[2].t2, out[2].t3) == (t(2), t(3), None)
    assert (out[3].t1, out[3].t2, out[3].t3) == (t(1), t(6), None)
    assert (out[5].t1, out[5].t2, out[5].t3) == (t(0), t(1), t(10))
    with pytest.raises(ValueError):
        funnel_steps(df, ["view"])
    # no horizon: u2's late purchase now converts
    free = {r.user_id: r.t3 for r in funnel_steps(
        df, ["view", "click", "purchase"]).collect()}
    assert free[2] == t(20)


def test_cohort_retention_hand_example(spark):
    """Cohort retention on hand-built activity: cohorting by FIRST
    event period, distinct-period activity (two events in one period
    count once), exact integer retention ratios, and epoch-aligned
    periods (not ISO weeks)."""
    from json_time_series_extractor_spark.operators.funnel import (
        cohort_retention,
    )

    def d(day, hour=12):
        return datetime(2024, 1, day, hour)

    rows = [
        # cohort day 1: users 1,2,3 — day2: only 1,2; day3: only 1
        (1, d(1)), (1, d(2)), (1, d(2, 18)), (1, d(3)),
        (2, d(1)), (2, d(2)),
        (3, d(1)),
        # cohort day 2: user 4 — active again day 3
        (4, d(2)), (4, d(3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort_ts.day, r.period_offset):
           (r.active_users, r.cohort_users, r.retention_fp6)
           for r in cohort_retention(df, "1 day").collect()}
    assert got == {
        (1, 0): (3, 3, 1_000_000),
        (1, 1): (2, 3, 666_666),       # exact DIV, truncating
        (1, 2): (1, 3, 333_333),
        (2, 0): (1, 1, 1_000_000),
        (2, 1): (1, 1, 1_000_000),
    }


def test_mg_partial_log_compaction_invariant(spark, tmp_path):
    """compact_mg_partials folds by exact counter sums only, so
    read_merged_mg is bit-identical before and after compaction; the
    generation supersedes its inputs (b-dirs swept), and a later batch
    still merges in."""
    from json_time_series_extractor_spark.operators.mg import (
        compact_mg_partials,
        mg_tier,
        read_merged_mg,
    )

    k = 3
    t0 = datetime(2024, 1, 1, 0, 30)
    base = str(tmp_path / "mglog2")

    def write_batch(bi, items):
        df = spark.createDataFrame(
            [("s", t0, i) for i in items],
            "series_key string, ts timestamp, item string")
        (mg_tier(df, "1 hour", k=k, item_col="item")
         .withColumn("p_batch", F.lit(bi))
         .write.mode("overwrite").parquet(f"{base}/b{bi:05d}"))

    write_batch(0, [f"i{j % 7}" for j in range(40)])
    write_batch(1, [f"i{j % 5}" for j in range(25)])
    before = {tuple(r) for r in read_merged_mg(spark, base, k=k).collect()}
    assert compact_mg_partials(spark, base) == 2
    after = {tuple(r) for r in read_merged_mg(spark, base, k=k).collect()}
    assert after == before
    import os
    names = sorted(os.listdir(base))
    assert "c00001" in names and not any(n.startswith("b") for n in names)
    # a later batch merges into the compacted view
    write_batch(2, [f"i{j % 2}" for j in range(30)])
    with_late = {tuple(r)
                 for r in read_merged_mg(spark, base, k=k).collect()}
    assert with_late != after
    # idempotent: nothing left to fold after a second compaction + read
    assert compact_mg_partials(spark, base) == 2
    assert {tuple(r) for r in read_merged_mg(spark, base,
                                             k=k).collect()} == with_late


def test_mg_over_time_window_semantics_and_bound(spark):
    """Sliding MG: trailing PRESENT-bucket windows (absent buckets skip
    — index semantics, not wall clock), n_buckets ramps, estimates
    never exceed window truth and undercount <= 2*n_win/(k+1); a
    window-dominant item always survives."""
    from collections import Counter

    from json_time_series_extractor_spark.operators.mg import (
        mg_over_time,
        mg_tier,
    )

    import random
    rnd = random.Random(5)
    k, kb = 3, 3
    # hours 0,1,2 and 5 (gap: 3,4 absent) — hour 5's window is the
    # trailing 3 PRESENT buckets {1, 2, 5}
    hours = [0, 1, 2, 5]
    rows = []
    for h in hours:
        for _ in range(60):
            item = (f"hot{rnd.randint(0, 1)}" if rnd.random() < 0.6
                    else f"cold{rnd.randint(0, 25)}")
            rows.append(("s", datetime(2024, 1, 1, h, rnd.randint(0, 59)),
                         item))
    df = spark.createDataFrame(
        rows, "series_key string, ts timestamp, item string")
    tier = mg_tier(df, "1 hour", k=k, item_col="item")
    out = mg_over_time(tier, kb, k=k)
    got = {}
    nb = {}
    for r in out.collect():
        got.setdefault(r.bucket_ts.hour, {})[r.item] = r.mg_cnt
        nb[r.bucket_ts.hour] = r.n_buckets
    assert nb == {0: 1, 1: 2, 2: 3, 5: 3}
    windows = {0: [0], 1: [0, 1], 2: [0, 1, 2], 5: [1, 2, 5]}
    for h, win in windows.items():
        true = Counter(i for _, ts, i in rows if ts.hour in win)
        n = sum(true.values())
        for item, f in true.items():
            est = got.get(h, {}).get(item, 0)
            assert est <= f, (h, item)
            assert f - est <= 2 * n // (k + 1) + 1, (h, item)
            if f > 2 * n / (k + 1):
                assert item in got.get(h, {}), (h, item)
        for item, est in got.get(h, {}).items():
            assert est <= true[item]
    with pytest.raises(ValueError):
        mg_over_time(tier, 0)
