"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Per ``BASELINE.json`` ``input_hint`` the engine's input is an Iceberg table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists in this sandbox, so we synthesize the table with
pure Column expressions — fully deterministic (seeded by row id through
``xxhash64``; no wall-clock, no ``rand()``), generated distributed (no
driver-side loops), at any scale.

Payload shape = fixture F6 (IoT-gateway array,
``/root/reference/samples/JsonTimeSeriesExtractor.Cli/data-1.json``): each
page's ``text`` embeds one JSON document with three measurements
(fetch latency, page size, language count) carrying per-sample nested
timestamps — the canonical multi-points-per-document shape that feeds the
rollup engine. Host distribution is log-uniform (zipf-ish) over ``hosts``
so a handful of hosts are heavy hitters — the skew fixture for salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: Extraction options used for the synthetic payloads (F6 shape).
PAGES_EXTRACT_OPTIONS = {
    "recursive": True,
    "allow_nested_timestamps": True,
    "timestamp_property": "/ts",
    "allow_wildcard_expressions": True,
    "pointers_to_include": ["/body/data/+/v"],
    "template": "{t}",
    "include_array_indexes_in_sample_keys": False,
}

BASE_EPOCH = 1707148800  # 2024-02-05T16:00:00Z


def _unit(col: Column, salt: int) -> Column:
    """Deterministic pseudo-uniform in [0, 1) derived from a column."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000))
            / F.lit(1_000_000.0))


def synthesize_pages(
    spark: SparkSession,
    n_docs: int,
    hosts: int = 1000,
    span_seconds: int = 4 * 86400,
    partitions: int = 0,
) -> DataFrame:
    """Generate ``n_docs`` pages. Timestamps sweep ``span_seconds`` from
    ``BASE_EPOCH`` so the table is range-partitionable by day."""
    df = spark.range(0, n_docs, numPartitions=partitions or None)
    i = F.col("id")

    # Log-uniform host skew: host_id in [0, hosts) with mass near 0.
    host = F.floor(F.pow(F.lit(float(hosts)), _unit(i, 1))).cast("long") % hosts
    warc_ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH)
        + (i * span_seconds / F.lit(max(n_docs, 1))).cast("long")
        + (F.pmod(F.xxhash64(i, F.lit(2)), F.lit(37))).cast("long"))

    iso = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    latency = F.round(F.lit(20.0) + _unit(i, 3) * 2000.0, 3)
    page_size = F.floor(F.lit(500) + _unit(i, 4) * 1_000_000).cast("double")
    lang_count = F.floor(_unit(i, 5) * 40).cast("double")

    # F6 payload via to_json(struct(...)): compact, key order = field order.
    text = F.to_json(F.struct(F.struct(F.array(
        F.struct(F.lit("fetch_latency_ms").alias("t"), iso.alias("ts"),
                 latency.alias("v")),
        F.struct(F.lit("page_size_bytes").alias("t"), iso.alias("ts"),
                 page_size.alias("v")),
        F.struct(F.lit("lang_count").alias("t"), iso.alias("ts"),
                 lang_count.alias("v")),
    ).alias("data")).alias("body")))

    url = F.format_string("https://host%04d.example/p/%d", host, i)
    html = F.encode(
        F.concat(F.lit("<html><body><script type=\"application/json\">"),
                 text, F.lit("</script></body></html>")), "UTF-8")
    lang = F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"),
                                F.lit("ja")), (i % 4 + 1).cast("int"))

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


#: Markers the synthetic html wraps the JSON payload in (see
#: :func:`synthesize_pages`) — the Common-Crawl-style stand-in for a WARC
#: record's extracted-text step.
_PAYLOAD_RE = r'(?s)<script type="application/json">(.*)</script>'


def html_payload_text(html: Column) -> Column:
    """Extract the embedded JSON payload text from the ``html`` binary
    column — **byte-identical** to the page's ``text`` column (the
    input_hint invariant: identical extracted text per url). Pure JVM
    expressions: decode + anchored regexp, no Python."""
    return F.regexp_extract(F.decode(html, "UTF-8"), _PAYLOAD_RE, 1)


def write_samples_bucketed(samples: DataFrame, table: str,
                           buckets: int = 32) -> None:
    """Materialize a samples table bucketed by ``series_key`` (sorted by
    ``ts`` within buckets).

    Bucketing pre-pays the rollup shuffle at write time: a groupBy on
    (series_key, window) over a table hash-bucketed by series_key satisfies
    the aggregate's clustering requirement, so every subsequent rollup —
    all tiers, every re-run, gap-fill grids, chunk compression groups —
    runs with NO exchange (asserted in
    tests/test_rollup.py::test_bucketed_rollup_has_no_exchange). At 10^12
    rows this converts the dominant recurring shuffle into a one-time
    write-side sort. Parquet bucketed tables here; Iceberg's bucket()
    partition transform is the same contract at cluster scale.
    """
    (samples
     .write.mode("overwrite")
     .bucketBy(buckets, "series_key")
     .sortBy("series_key", "ts")
     .format("parquet")
     .saveAsTable(table))


def write_pages_partitioned(pages: DataFrame, path: str,
                            url_buckets: int = 32) -> None:
    """Materialize with the explicit partition spec from the north rule:
    bucket by url-hash, range by warc_ts day.

    On a real cluster this is the Iceberg spec ``bucket(N, url),
    days(warc_ts)``; parquet fallback encodes both as directory partitions.
    """
    (pages
     .withColumn("url_bucket", F.pmod(F.xxhash64("url"), F.lit(url_buckets)))
     .withColumn("dt", F.to_date("warc_ts"))
     .write.mode("overwrite")
     .partitionBy("dt", "url_bucket")
     .parquet(path))
