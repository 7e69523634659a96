"""PySpark-native measurement-extraction + time-series rollup engine.

A from-scratch re-expression of the query/data-processing capabilities of
``wazzamatazz/json-time-series-extractor`` (reference at ``/root/reference``,
C# / .NET) as an idiomatic PySpark engine:

- ``core``       — pure-Python JSON time-series extraction semantics
                   (parity with the reference's ``TimeSeriesExtractor``;
                   see ``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs``).
- ``operators``  — Spark DataFrame operators: vectorized extraction
                   (``mapInPandas``), tiered continuous-aggregate rollups,
                   LOCF/linear gap-fill, Gorilla-style chunk compression,
                   dedup / similarity / text-analysis for training pipelines.
- ``sources``    — deterministic synthetic Common-Crawl-style ``pages`` table
                   and parquet test-table catalog.
- ``functions``  — reusable Column-expression helpers (JVM-side, no Python UDFs).
- ``plans``      — session builder, lineage/checkpoint/resume, skew salting.
- ``streaming``  — Structured Streaming shell over the same stage functions.
"""

from json_time_series_extractor_spark.core.options import ExtractorOptions
from json_time_series_extractor_spark.core.extractor import (
    TimeSeriesSample,
    TimestampSource,
    get_samples,
    get_samples_from_value,
)
from json_time_series_extractor_spark.core.matcher import (
    compile_match_delegate,
)

__all__ = [
    "ExtractorOptions",
    "TimeSeriesSample",
    "TimestampSource",
    "compile_match_delegate",
    "get_samples",
    "get_samples_from_value",
]

__version__ = "0.1.0"
