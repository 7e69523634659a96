"""End-to-end tests for the Spark extraction operator and synthetic pages."""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from json_time_series_extractor_spark.core.extractor import TimestampSource
from json_time_series_extractor_spark.operators.extract import (
    extract_samples,
    extract_samples_fixed,
)
from json_time_series_extractor_spark.sources.pages import (
    PAGES_EXTRACT_OPTIONS,
    synthesize_pages,
)

UTC = timezone.utc


def dumps(obj) -> str:
    return json.dumps(obj, separators=(",", ":"))


def test_extract_matches_pure_core(spark):
    """The Spark operator must produce exactly the pure core's samples."""
    doc = dumps({"body": {"data": [
        {"t": "Instrument-1", "ts": "2024-02-05T16:13:50.4156498Z", "v": 20476},
        {"t": "Instrument-2", "ts": "2024-02-05T16:13:50Z", "v": 2047.5999999999995},
        {"t": "Instrument-2", "ts": "2024-02-05T16:13:55Z", "v": 2050},
    ]}})
    pages = spark.createDataFrame(
        [("https://a.example/1", datetime(2024, 2, 5, 16, 0, 0), doc)],
        "url string, warc_ts timestamp, text string")
    out = extract_samples(pages, PAGES_EXTRACT_OPTIONS).collect()
    assert [(r.series_key, r.value_double) for r in out] == [
        ("Instrument-1", 20476.0),
        ("Instrument-2", 2047.5999999999995),
        ("Instrument-2", 2050.0),
    ]
    assert out[0].ts == datetime(2024, 2, 5, 16, 13, 50, 415649)
    assert all(r.ts_source == int(TimestampSource.DOCUMENT) for r in out)
    assert all(r.value_kind == 1 for r in out)


def test_extract_fallback_timestamp_uses_warc_ts(spark):
    pages = spark.createDataFrame(
        [("u1", datetime(2024, 2, 5, 12, 0, 0), dumps({"value": 99})),
         ("u2", datetime(2024, 2, 5, 13, 0, 0), dumps({"value": 1}))],
        "url string, warc_ts timestamp, text string")
    out = {r.url: r for r in extract_samples(pages, {}).collect()}
    assert out["u1"].ts == datetime(2024, 2, 5, 12, 0, 0)
    assert out["u2"].ts == datetime(2024, 2, 5, 13, 0, 0)
    assert out["u1"].ts_source == int(TimestampSource.FALLBACK_PROVIDER)


def test_extract_tagged_union_value_columns(spark):
    doc = dumps({"time": "2024-02-05T16:00:00Z", "n": 1.5, "s": "x",
                 "b": True, "z": None, "o": {"a": 1}})
    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 5), doc)],
        "url string, warc_ts timestamp, text string")
    rows = {r.series_key: r for r in extract_samples(pages, {}).collect()}
    assert rows["n"].value_double == 1.5 and rows["n"].value_kind == 1
    assert rows["s"].value_str == "x" and rows["s"].value_kind == 2
    assert rows["b"].value_bool is True and rows["b"].value_kind == 3
    assert rows["z"].value_kind == 0
    assert rows["o"].value_str == '{"a":1}' and rows["o"].value_kind == 4


def test_synthesized_pages_are_deterministic_and_extractable(spark):
    a = synthesize_pages(spark, 50).collect()
    b = synthesize_pages(spark, 50).collect()
    assert a == b
    assert all(r.url.startswith("https://host") for r in a)
    assert all(r.text.startswith('{"body":{"data":[') for r in a)
    # 3 measurements per page
    samples = extract_samples(
        synthesize_pages(spark, 50), PAGES_EXTRACT_OPTIONS)
    assert samples.count() == 150
    keys = {r.series_key for r in samples.select("series_key").distinct().collect()}
    assert keys == {"fetch_latency_ms", "page_size_bytes", "lang_count"}


def test_fixed_pointer_fast_path_has_no_python(spark):
    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 5), dumps(
            {"time": "2024-02-05T16:00:00Z", "a": {"b": 2.5}, "c": 7}))],
        "url string, warc_ts timestamp, text string")
    out = extract_samples_fixed(
        pages, [("ab", "/a/b"), ("c", "/c")], timestamp_pointer="/time")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "Python" not in plan
    rows = {r.series_key: r for r in out.collect()}
    assert rows["ab"].value_double == 2.5
    assert rows["c"].value_double == 7.0
    assert rows["ab"].ts == datetime(2024, 2, 5, 16, 0, 0)
    assert rows["ab"].ts_source == int(TimestampSource.DOCUMENT)


def test_html_payload_text_byte_identical(spark):
    """input_hint invariant: text extracted from the html binary equals the
    page's text column byte-for-byte, for every url."""
    from pyspark.sql import functions as F

    from json_time_series_extractor_spark.sources.pages import (
        html_payload_text,
        synthesize_pages,
    )

    pages = synthesize_pages(spark, 500)
    mismatches = (pages
                  .select(F.col("url"),
                          (html_payload_text(F.col("html"))
                           == F.col("text")).alias("same"))
                  .where(~F.col("same"))
                  .count())
    assert mismatches == 0
    # And the extracted text is non-empty (regex actually matched).
    empties = (pages
               .select(F.length(html_payload_text(F.col("html")))
                       .alias("n"))
               .where(F.col("n") == 0).count())
    assert empties == 0


def test_extract_ts_raw_preserves_offset(spark):
    """DateTimeOffset fidelity: ts is UTC-normalized, ts_raw keeps the
    document's original offset (reference TimeSeriesSample.Timestamp)."""
    from json_time_series_extractor_spark.operators.extract import (
        extract_samples,
    )

    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 5),
          '{"time":"2021-05-28T17:41:09.7031076+03:00","temp":19.3}')],
        "url string, warc_ts timestamp, text string")
    rows = extract_samples(pages, {}, include_ts_raw=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.ts_raw == "2021-05-28T17:41:09.703107+03:00"
    assert r.ts == datetime(2021, 5, 28, 14, 41, 9, 703107)  # UTC-normalized


def test_fixed_pointer_arrays_dotted_keys_and_epoch_ts(spark):
    """jpath must bracket array indexes and non-identifier keys, and the
    document timestamp accepts epoch-millis ints; non-numeric values and
    malformed timestamps must not throw under ANSI mode."""
    from json_time_series_extractor_spark.operators.extract import (
        extract_samples,
    )

    doc = dumps({"time": 1707148800000,
                 "body": {"data": [{"v": 1.5}, {"v": 2.5}]},
                 "a.b": {"x": 7},
                 "s": "not-a-number"})
    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 1), doc)],
        "url string, warc_ts timestamp, text string")
    out = extract_samples_fixed(
        pages, [("v0", "/body/data/0/v"), ("v1", "/body/data/1/v"),
                ("ab", "/a.b/x"), ("s", "/s")],
        timestamp_pointer="/time")
    rows = {r.series_key: r for r in out.collect()}
    assert rows["v0"].value_double == 1.5
    assert rows["v1"].value_double == 2.5
    assert rows["ab"].value_double == 7.0
    # Strings pass through as value_str (reference coercion table) —
    # previously the numeric-only fast path dropped them to kind 0.
    assert rows["s"].value_double is None and rows["s"].value_kind == 2
    assert rows["s"].value_str == "not-a-number"
    assert rows["v0"].ts == datetime(2024, 2, 5, 16, 0, 0)  # epoch millis
    assert rows["v0"].ts_source == int(TimestampSource.DOCUMENT)

    # Parity with the general operator on the same pointers.
    gen = extract_samples(pages, {"pointers_to_include":
                                  ["/body/data/0/v", "/body/data/1/v"],
                                  "recursive": True})
    gen_rows = {r.series_key: r.value_double for r in gen.collect()}
    assert gen_rows["body/data/0/v"] == 1.5
    assert gen_rows["body/data/1/v"] == 2.5


def test_fixed_pointer_full_coercion_table(spark):
    """The fast path emits the same tagged union as the general operator
    across the whole coercion table (TimeSeriesExtractor.cs:923-938):
    number, numeric-string (stays string), bool, object, array, JSON
    null, missing pointer."""
    doc = dumps({"n": 2.5, "ns": "123", "s": "hello", "b": True,
                 "o": {"x": 1}, "a": [1, 2], "z": None})
    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 1), doc)],
        "url string, warc_ts timestamp, text string")
    out = extract_samples_fixed(
        pages, [("n", "/n"), ("ns", "/ns"), ("s", "/s"), ("b", "/b"),
                ("o", "/o"), ("a", "/a"), ("z", "/z"), ("m", "/missing")],
        timestamp_pointer=None)
    rows = {r.series_key: r for r in out.collect()}
    assert rows["n"].value_kind == 1 and rows["n"].value_double == 2.5
    # Numeric JSON string must NOT coerce to double.
    assert rows["ns"].value_kind == 2 and rows["ns"].value_str == "123"
    assert rows["ns"].value_double is None
    assert rows["s"].value_kind == 2 and rows["s"].value_str == "hello"
    assert rows["b"].value_kind == 3 and rows["b"].value_bool is True
    assert rows["o"].value_kind == 4 and json.loads(rows["o"].value_str) == {
        "x": 1}
    assert rows["a"].value_kind == 5 and json.loads(rows["a"].value_str) == [1, 2]
    assert rows["z"].value_kind == 0 and rows["z"].value_double is None
    assert rows["m"].value_kind == 0 and rows["m"].value_str is None
    # One row per pointer per document, always.
    assert len(rows) == 8


def test_fixed_pointer_general_parity_on_mixed_types(spark):
    """Fast path vs general recursive operator on the same pointers: the
    (kind, value) union matches field-for-field on scalars."""
    from json_time_series_extractor_spark.operators.extract import (
        extract_samples,
    )

    doc = dumps({"n": 7.25, "ns": "42", "s": "txt", "b": False})
    pages = spark.createDataFrame(
        [("u", datetime(2024, 2, 1), doc)],
        "url string, warc_ts timestamp, text string")
    fixed = {r.series_key.lstrip("/"): r for r in extract_samples_fixed(
        pages, [("n", "/n"), ("ns", "/ns"), ("s", "/s"), ("b", "/b")],
        timestamp_pointer=None).collect()}
    gen = {r.series_key: r for r in extract_samples(
        pages, {"pointers_to_include": ["/n", "/ns", "/s", "/b"],
                "recursive": True}).collect()}
    for key in ("n", "ns", "s", "b"):
        f, g = fixed[key], gen[key]
        assert (f.value_kind, f.value_double, f.value_str, f.value_bool) \
            == (g.value_kind, g.value_double, g.value_str, g.value_bool), key
