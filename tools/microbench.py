"""Micro-benchmark mirroring the reference's BenchmarkDotNet harness.

Ports the two scenarios of
``/root/reference/test/JsonTimeSeriesExtractor.Benchmarks/TimeSeriesExtractorBenchmarks.cs``
(payloads at ``:22-92``, benchmarks at ``:95-108``) onto the pure-Python
extraction core, plus the Arrow batch kernel — the unit that actually runs
per executor core. The reference publishes no committed numbers
(BASELINE.md), so these are our half of the comparison, reproducible with
``python tools/microbench.py`` -> BENCH/MICRO.md.

Single-process, single-thread: this measures the leaf operator, not Spark.
Cluster throughput = (batch-kernel docs/sec) x cores x scaling efficiency
(see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import timeit

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from json_time_series_extractor_spark.core.extractor import get_samples
from json_time_series_extractor_spark.core.matcher import (
    compile_match_delegate,
)
from json_time_series_extractor_spark.core.options import ExtractorOptions
from json_time_series_extractor_spark.operators.extract import process_batch

OBJECT_PAYLOAD = {
    "Data": {
        "Timestamp": "2021-05-28T17:41:09.7031076+03:00",
        "SignalStrength": -75,
        "DataFormat": 5,
        "Temperature": 19.3,
        "Humidity": 37.905,
        "Pressure": 1013.35,
        "Acceleration": {"X": -0.872, "Y": 0.512, "Z": -0.04},
        "BatteryVoltage": 3.085,
        "TxPower": 4,
        "MovementCounter": 5,
        "MeasurementSequence": 34425,
        "MacAddress": "AB:CD:EF:01:23:45",
        "Metadata": {
            "Labels": ["Label1", "Label2"],
            "ModelName": "Model1",
            "Location": "Location1",
            "Manufacturer": {"Name": "Manufacturer1",
                             "Address": "Address1"},
        },
    }
}

ARRAY_PAYLOAD = {
    "Data": [
        {"Source": "Instrument-1",
         "Timestamp": "2024-04-13T10:01:47Z", "Value": 1019.0},
        {"Source": "Instrument-2",
         "Timestamp": "2024-04-13T09:59:51Z", "Value": 23.7},
        {"Source": "Instrument-2",
         "Timestamp": "2024-04-13T10:00:32Z", "Value": 23.6},
    ]
}


def object_options() -> ExtractorOptions:
    # TimeSeriesExtractorBenchmarks.cs:55-58
    return ExtractorOptions(recursive=True,
                            timestamp_property="/Data/Timestamp")


def array_options() -> ExtractorOptions:
    # TimeSeriesExtractorBenchmarks.cs:82-92
    opts = ExtractorOptions(
        recursive=True,
        allow_nested_timestamps=True,
        timestamp_property="/Timestamp",
        template="{Source}")
    opts.can_process_element = compile_match_delegate(
        ["/Data/+/Value"], None, True)
    return opts


def bench_core(text: str, opts: ExtractorOptions, n: int = 20000):
    dt = min(timeit.repeat(lambda: list(get_samples(text, opts)),
                           number=n, repeat=3)) / n
    samples = len(list(get_samples(text, opts)))
    return dt, samples


def bench_batch(text: str, opts: ExtractorOptions, rows: int = 20000):
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(rows)],
        "warc_ts": pd.Series(np.arange(rows) * 1_000_000,
                             dtype="datetime64[us]"),
        "text": [text] * rows,
    })
    process_batch(pdf, opts)
    dt = min(timeit.repeat(lambda: process_batch(pdf, opts),
                           number=1, repeat=3)) / rows
    return dt


def main() -> None:
    rows = []
    for name, payload, opts_fn, expected in (
            ("complex_object (26 props, recursive)", OBJECT_PAYLOAD,
             object_options, 19),
            ("array_mqtt_nested_ts ({Source} template)", ARRAY_PAYLOAD,
             array_options, 3)):
        text = json.dumps(payload, separators=(",", ":"))
        opts = opts_fn()
        dt_core, n_samples = bench_core(text, opts)
        assert n_samples == expected, (name, n_samples)
        dt_batch = bench_batch(text, opts)
        rows.append((name, n_samples, dt_core, dt_batch))

    lines = [
        "# BENCH micro — reference-benchmark scenario counterparts",
        "",
        "Same payloads/options as the reference's BenchmarkDotNet harness",
        "(`TimeSeriesExtractorBenchmarks.cs:22-108`; the reference commits",
        "no numbers). Single core, no Spark; `core` = pure-Python",
        "`get_samples`, `batch` = the Arrow kernel as run per executor",
        "core. Regenerate: `python tools/microbench.py`.",
        "",
        "| scenario | samples/doc | core µs/doc | core docs/s | "
        "batch µs/doc | batch docs/s |",
        "|---|---|---|---|---|---|",
    ]
    for name, n, dt_core, dt_batch in rows:
        lines.append(
            f"| {name} | {n} | {dt_core*1e6:.1f} | {1/dt_core:,.0f} "
            f"| {dt_batch*1e6:.1f} | {1/dt_batch:,.0f} |")
    lines.append("")
    with open("/root/repo/BENCH/MICRO.md", "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
