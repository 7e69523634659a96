"""Parity tests ported from the reference xUnit suite.

Each test mirrors one test in
``/root/reference/test/JsonTimeSeriesExtractor.Tests/JsonTimeSeriesExtractorTests.cs``
(cited per test). Fixtures are serialized compactly (no spaces), matching
``System.Text.Json.JsonSerializer.Serialize`` output so raw-text golden
values are byte-identical.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest

from json_time_series_extractor_spark.core.extractor import (
    TimestampSource,
    get_samples,
)
from json_time_series_extractor_spark.core.options import ExtractorOptions

UTC = timezone.utc


def dumps(obj) -> str:
    return json.dumps(obj, separators=(",", ":"))


TS_STR = "2021-05-28T17:41:09.7031076+03:00"
# .NET keeps 7 fractional digits; we truncate to microseconds (6).
TS = datetime(2021, 5, 28, 17, 41, 9, 703107,
              tzinfo=timezone(timedelta(hours=3)))
TS_UTC = TS.astimezone(UTC)

DEVICE_SAMPLE = {
    "Timestamp": TS_STR,
    "SignalStrength": -75,
    "DataFormat": 5,
    "Temperature": 19.3,
    "Humidity": 37.905,
    "Pressure": 1013.35,
    "AccelerationX": -0.872,
    "AccelerationY": 0.512,
    "AccelerationZ": -0.04,
    "BatteryVoltage": 3.085,
    "TxPower": 4,
    "MovementCounter": 5,
    "MeasurementSequence": 34425,
    "MacAddress": "AB:CD:EF:01:23:45",
}

NESTED_DEVICE_SAMPLE = {
    "Data": {
        "Timestamp": TS_STR,
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
    }
}


# JsonTimeSeriesExtractorTests.cs:14-42
def test_extract_samples_for_all_non_timestamp_fields():
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        timestamp_property="/Timestamp")))
    assert len(samples) == 13
    assert all(s.timestamp == TS_UTC for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


# JsonTimeSeriesExtractorTests.cs:45-73
def test_default_key_template():
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        timestamp_property="/Timestamp")))
    assert len(samples) == 13
    assert [s.key for s in samples] == [
        k for k in DEVICE_SAMPLE if k != "Timestamp"]


# JsonTimeSeriesExtractorTests.cs:76-106
def test_custom_key_template():
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        template="test/{MacAddress}/{$prop}",
        timestamp_property="/Timestamp")))
    assert len(samples) == 13
    assert all(s.key.startswith("test/AB:CD:EF:01:23:45/") for s in samples)
    assert samples[0].key == "test/AB:CD:EF:01:23:45/SignalStrength"


# JsonTimeSeriesExtractorTests.cs:109-148
def test_custom_key_template_with_default_replacements():
    uuid = "8fd7e83c-6f54-4a8e-a7f8-3a1ad0f4d90b"
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        template="test/{MacAddress}/{Uuid}/{$prop}",
        timestamp_property="/Timestamp",
        get_template_replacement=lambda name: uuid if name.upper() == "UUID" else None)))
    assert len(samples) == 13
    assert all(s.key.startswith(f"test/AB:CD:EF:01:23:45/{uuid}/")
               for s in samples)


# JsonTimeSeriesExtractorTests.cs:151-178
def test_property_path_in_custom_template():
    data = {"A": {"B": {"C": {"Name": "Instrument-1", "Value": 99.997}}}}
    samples = list(get_samples(dumps(data), ExtractorOptions(
        recursive=True,
        pointers_to_include=["/A/B/C/Value"],
        template="{$prop-path}/{Name}")))
    assert len(samples) == 1
    assert samples[0].key == "A/B/C/Instrument-1"
    assert samples[0].value == 99.997
    assert samples[0].timestamp_source == TimestampSource.CURRENT_TIME


# JsonTimeSeriesExtractorTests.cs:181-211
def test_property_path_without_array_indexes_in_custom_template():
    data = {"A": {"B": {"C": [{"Name": "Instrument-1", "Value": 99.997}]}}}
    samples = list(get_samples(dumps(data), ExtractorOptions(
        recursive=True,
        pointers_to_include=["/A/B/C/0/Value"],
        template="{$prop-path}/{Name}",
        include_array_indexes_in_sample_keys=False)))
    assert len(samples) == 1
    assert samples[0].key == "A/B/C/Instrument-1"
    assert samples[0].value == 99.997
    assert samples[0].timestamp_source == TimestampSource.CURRENT_TIME


# JsonTimeSeriesExtractorTests.cs:214-250
def test_exclude_specified_properties():
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        template="test/{MacAddress}/{DataFormat}/{$prop}",
        timestamp_property="/Timestamp",
        pointers_to_exclude=["/DataFormat", "/MacAddress"])))
    assert len(samples) == 11
    assert all(s.key.startswith("test/AB:CD:EF:01:23:45/5/") for s in samples)


# JsonTimeSeriesExtractorTests.cs:253-290
def test_include_specified_properties():
    samples = list(get_samples(dumps(DEVICE_SAMPLE), ExtractorOptions(
        template="test/{MacAddress}/{DataFormat}/{$prop}",
        timestamp_property="/Timestamp",
        pointers_to_include=["/Temperature", "/Humidity", "/Pressure"])))
    assert len(samples) == 3
    assert all(s.key.startswith("test/AB:CD:EF:01:23:45/5/") for s in samples)


# JsonTimeSeriesExtractorTests.cs:293-333
def test_mqtt_multi_level_include():
    samples = list(get_samples(dumps(NESTED_DEVICE_SAMPLE), ExtractorOptions(
        recursive=True,
        timestamp_property="/Data/Timestamp",
        allow_wildcard_expressions=True,
        pointers_to_include=["/Data/Acceleration/#"])))
    assert len(samples) == 3
    assert all(s.timestamp == TS_UTC for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)
    assert all(s.key.startswith("Data/Acceleration/") for s in samples)


# JsonTimeSeriesExtractorTests.cs:336-378
def test_mqtt_single_level_include():
    samples = list(get_samples(dumps(NESTED_DEVICE_SAMPLE), ExtractorOptions(
        recursive=True,
        timestamp_property="/Data/Timestamp",
        allow_wildcard_expressions=True,
        pointers_to_include=["/+/+/X"])))
    assert len(samples) == 1
    assert samples[0].key == "Data/Acceleration/X"
    assert samples[0].timestamp == TS_UTC
    assert samples[0].timestamp_source == TimestampSource.DOCUMENT


# JsonTimeSeriesExtractorTests.cs:381-423
def test_multi_character_pattern_include():
    samples = list(get_samples(dumps(NESTED_DEVICE_SAMPLE), ExtractorOptions(
        recursive=True,
        timestamp_property="/Data/Timestamp",
        allow_wildcard_expressions=True,
        pointers_to_include=["*/X"])))
    assert len(samples) == 1
    assert samples[0].key == "Data/Acceleration/X"


# JsonTimeSeriesExtractorTests.cs:426-466
def test_single_character_pattern_include():
    samples = list(get_samples(dumps(NESTED_DEVICE_SAMPLE), ExtractorOptions(
        recursive=True,
        timestamp_property="/Data/Timestamp",
        allow_wildcard_expressions=True,
        pointers_to_include=["/Data/Acceleration/?"])))
    assert len(samples) == 3
    assert all(s.key.startswith("Data/Acceleration/") for s in samples)


# JsonTimeSeriesExtractorTests.cs:469-491 — output order must equal array order
def test_top_level_array():
    values = [55.5, 417.1, -0.0032, 14.0]
    doc = dumps([{"Value": v} for v in values])
    samples = list(get_samples(doc, ExtractorOptions(
        template="test/sample/{$prop}")))
    assert len(samples) == 4
    assert all(s.timestamp_source == TimestampSource.CURRENT_TIME
               for s in samples)
    assert all(s.key == "test/sample/Value" for s in samples)
    assert [s.value for s in samples] == values


# JsonTimeSeriesExtractorTests.cs:494-541
def test_recursive_parse_object():
    doc = {
        "Timestamp": TS_STR,
        "Metadata": {"SignalStrength": -75, "DataFormat": 5,
                     "MeasurementSequence": 34425,
                     "MacAddress": "AB:CD:EF:01:23:45"},
        "Environment": [
            {"Temperature": 19.3, "Humidity": 37.905, "Pressure": 1013.35},
            {"Temperature": 19.3, "Humidity": 37.905, "Pressure": 1013.35},
        ],
        "Acceleration": {"X": -0.872, "Y": 0.512, "Z": -0.04},
        "Power": {"BatteryVoltage": 3.085, "TxPower": 4},
        "Other": {"MovementCounter": 5},
    }
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        template="test/{$prop}",
        timestamp_property="/Timestamp",
        recursive=True)))
    assert len(samples) == 16
    assert all(s.timestamp == TS_UTC for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)
    assert samples[4].key == "test/Environment/0/Temperature"


# JsonTimeSeriesExtractorTests.cs:544-566
def test_recursive_template_replacements():
    doc = {"location": "System A",
           "measurements": {"location": "Subsystem 1", "temperature": 28.2}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        template="{location}/{$prop}",
        path_separator="/",
        recursive=True,
        can_process_element=lambda ctx, ptr, el: ptr[-1] != "location")))
    assert len(samples) == 1
    assert samples[0].key == "System A/Subsystem 1/measurements/temperature"
    assert samples[0].timestamp_source == TimestampSource.CURRENT_TIME


# JsonTimeSeriesExtractorTests.cs:569-591
def test_recursive_template_replacements_with_local_property_name():
    doc = {"location": "System A",
           "measurements": {"location": "Subsystem 1", "temperature": 28.2}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        template="{location}/{$prop-local}",
        path_separator="/",
        recursive=True,
        can_process_element=lambda ctx, ptr, el: ptr[-1] != "location")))
    assert len(samples) == 1
    assert samples[0].key == "System A/Subsystem 1/temperature"


# JsonTimeSeriesExtractorTests.cs:594-620 — raw-text golden value
def test_recursion_depth_limit():
    doc = {"location": "System A",
           "measurements": {"location": "Subsystem 1", "temperature": 14}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, max_depth=1)))
    assert len(samples) == 2
    assert samples[0].key == "location"
    assert samples[0].value == "System A"
    assert samples[1].key == "measurements"
    assert samples[1].value == '{"location":"Subsystem 1","temperature":14}'
    assert all(s.timestamp_source == TimestampSource.CURRENT_TIME
               for s in samples)


# JsonTimeSeriesExtractorTests.cs:623-648
def test_recursion_depth_limit_with_inclusion_delegate():
    doc = {"parent": {"child": {"value": 100.0}}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, max_depth=3,
        allow_wildcard_expressions=True,
        pointers_to_include=["/+/+/value"])))
    assert len(samples) == 1
    assert samples[0].key == "parent/child/value"
    assert samples[0].value == 100.0
    assert samples[0].timestamp_source == TimestampSource.CURRENT_TIME


# JsonTimeSeriesExtractorTests.cs:651-669
def test_fallback_timestamp():
    fallback = datetime(1999, 12, 31, tzinfo=UTC)
    samples = list(get_samples(dumps({"value": 99}), ExtractorOptions(
        template="test/{$prop}",
        get_default_timestamp=lambda: fallback)))
    assert len(samples) == 1
    assert samples[0].timestamp == fallback
    assert samples[0].timestamp_source == TimestampSource.FALLBACK_PROVIDER


# JsonTimeSeriesExtractorTests.cs:672-688
def test_allow_unresolved_template_replacements():
    samples = list(get_samples(dumps({"value": 99}), ExtractorOptions(
        template="test/{deviceId}/{$prop}",
        allow_unresolved_template_replacements=True)))
    assert len(samples) == 1
    assert samples[0].key == "test/{deviceId}/value"
    assert samples[0].timestamp_source == TimestampSource.CURRENT_TIME


# JsonTimeSeriesExtractorTests.cs:691-705
def test_disallow_unresolved_template_replacements():
    samples = list(get_samples(dumps({"value": 99}), ExtractorOptions(
        template="test/{deviceId}/{$prop}",
        allow_unresolved_template_replacements=False)))
    assert samples == []


# JsonTimeSeriesExtractorTests.cs:708-740 — epoch-millis numeric timestamp
def test_numerical_timestamp():
    doc = dict(DEVICE_SAMPLE, Timestamp=1646312969367)
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        timestamp_property="/Timestamp")))
    assert len(samples) == 13
    expected = datetime(1970, 1, 1, tzinfo=UTC) + timedelta(
        milliseconds=1646312969367)
    assert all(s.timestamp == expected for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


# JsonTimeSeriesExtractorTests.cs:743-776 — custom seconds parser
def test_custom_timestamp_parsing():
    secs = 1686559277
    doc = dict(DEVICE_SAMPLE, Timestamp=secs)
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        timestamp_property="/Timestamp",
        timestamp_parser=lambda el: datetime(1970, 1, 1, tzinfo=UTC)
        + timedelta(seconds=int(el)))))
    assert len(samples) == 13
    expected = datetime(1970, 1, 1, tzinfo=UTC) + timedelta(seconds=secs)
    assert all(s.timestamp == expected for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


# JsonTimeSeriesExtractorTests.cs:779-817 — StartAt re-rooting
def test_custom_start_position():
    ms = 1646312969367
    doc = {"data": {"time": ms, "device1": {
        k: v for k, v in DEVICE_SAMPLE.items() if k != "Timestamp"}}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        start_at="/data", recursive=True)))
    assert len(samples) == 13
    assert all(s.key.startswith("device1/") for s in samples)
    expected = datetime(1970, 1, 1, tzinfo=UTC) + timedelta(milliseconds=ms)
    assert all(s.timestamp == expected for s in samples)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


NOW = datetime(2024, 2, 5, 16, 0, 0, tzinfo=UTC)
NOW_STR = "2024-02-05T16:00:00+00:00"
T_MINUS_2H = "2024-02-05T14:00:00+00:00"
T_MINUS_1H = "2024-02-05T15:00:00+00:00"


# JsonTimeSeriesExtractorTests.cs:820-851
def test_nested_timestamps_in_recursive_mode():
    doc = {"time": NOW_STR, "data": [
        {"time": T_MINUS_2H, "temperature": 19.3},
        {"time": T_MINUS_1H, "temperature": 20.6},
    ]}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, allow_nested_timestamps=True)))
    assert len(samples) == 2
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)
    assert samples[0].timestamp == NOW - timedelta(hours=2)
    assert samples[0].value == 19.3
    assert samples[1].timestamp == NOW - timedelta(hours=1)
    assert samples[1].value == 20.6


# JsonTimeSeriesExtractorTests.cs:854-888 — nested time props become samples
def test_no_nested_timestamps_in_recursive_mode():
    doc = {"time": NOW_STR, "data": [
        {"time": T_MINUS_2H, "temperature": 19.3},
        {"time": T_MINUS_1H, "temperature": 20.6},
    ]}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, allow_nested_timestamps=False)))
    assert len(samples) == 4
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)
    assert all(s.timestamp == NOW for s in samples)
    assert samples[0].value == T_MINUS_2H
    assert samples[1].value == 19.3
    assert samples[2].value == T_MINUS_1H
    assert samples[3].value == 20.6


# JsonTimeSeriesExtractorTests.cs:891-922 — ancestor timestamp inheritance
def test_inherit_timestamp_from_ancestor_level():
    doc = {"data": {"time": NOW_STR, "samples": [
        {"temperature": 19.3}, {"temperature": 20.6}]}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, allow_nested_timestamps=True)))
    assert len(samples) == 2
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)
    assert all(s.timestamp == NOW for s in samples)
    assert [s.value for s in samples] == [19.3, 20.6]


# JsonTimeSeriesExtractorTests.cs:925-960
def test_include_array_indexes_in_sample_keys():
    doc = {"data": [
        {"time": T_MINUS_2H, "temperature": 19.3},
        {"time": T_MINUS_1H, "temperature": 20.6},
    ]}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, allow_nested_timestamps=True,
        include_array_indexes_in_sample_keys=True)))
    assert len(samples) == 2
    assert samples[0].key == "data/0/temperature"
    assert samples[1].key == "data/1/temperature"
    assert samples[0].timestamp == NOW - timedelta(hours=2)
    assert samples[1].timestamp == NOW - timedelta(hours=1)
    assert [s.value for s in samples] == [19.3, 20.6]


# JsonTimeSeriesExtractorTests.cs:963-998
def test_exclude_array_indexes_from_sample_keys():
    doc = {"data": [
        {"time": T_MINUS_2H, "temperature": 19.3},
        {"time": T_MINUS_1H, "temperature": 20.6},
    ]}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, allow_nested_timestamps=True,
        include_array_indexes_in_sample_keys=False)))
    assert len(samples) == 2
    assert samples[0].key == "data/temperature"
    assert samples[1].key == "data/temperature"
    assert samples[0].timestamp == NOW - timedelta(hours=2)
    assert samples[1].timestamp == NOW - timedelta(hours=1)
    assert [s.value for s in samples] == [19.3, 20.6]


# ---------------------------------------------------------------------------
# CLI sample payloads (samples/JsonTimeSeriesExtractor.Cli/Program.cs:15-66)
# exercise recursive + nested timestamps + MQTT include + templates at once.
# ---------------------------------------------------------------------------

def test_cli_data1_gateway_array_payload():
    doc = {"body": {"data": [
        {"t": "Instrument-1", "ts": "2024-02-05T16:13:50.4156498Z", "v": 20476},
        {"t": "Instrument-2", "ts": "2024-02-05T16:13:50Z", "v": 2047.5999999999995},
        {"t": "Instrument-2", "ts": "2024-02-05T16:13:55Z", "v": 2050},
    ]}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True,
        allow_nested_timestamps=True,
        timestamp_property="/ts",
        allow_wildcard_expressions=True,
        pointers_to_include=["/body/data/+/v"],
        template="{t}",
        include_array_indexes_in_sample_keys=False)))
    assert [s.key for s in samples] == [
        "Instrument-1", "Instrument-2", "Instrument-2"]
    assert [s.value for s in samples] == [20476.0, 2047.5999999999995, 2050.0]
    assert samples[0].timestamp == datetime(2024, 2, 5, 16, 13, 50, 415649,
                                            tzinfo=UTC)
    assert samples[2].timestamp == datetime(2024, 2, 5, 16, 13, 55, tzinfo=UTC)
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


def test_cli_data2_map_array_mix_with_start_at():
    doc = {"body": {"data": {
        "Instrument-1": {"ts": "2024-02-05T16:13:50.4156498Z", "v": 20476},
        "Instrument-2": [
            {"ts": "2024-02-05T16:13:50Z", "v": 2047.5999999999995},
            {"ts": "2024-02-05T16:13:55Z", "v": 2050},
        ],
    }}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        start_at="/body/data",
        recursive=True,
        allow_nested_timestamps=True,
        timestamp_property="/ts",
        allow_wildcard_expressions=True,
        pointers_to_include=["/+/v", "/+/+/v"],
        template="{$prop-path}",
        include_array_indexes_in_sample_keys=False)))
    assert [s.key for s in samples] == [
        "Instrument-1", "Instrument-2", "Instrument-2"]
    assert [s.value for s in samples] == [20476.0, 2047.5999999999995, 2050.0]
    assert all(s.timestamp_source == TimestampSource.DOCUMENT for s in samples)


# ---------------------------------------------------------------------------
# Raw-text byte-identity beyond the reference suite: original whitespace must
# be preserved in subtree values (GetRawText returns the exact input slice).
# ---------------------------------------------------------------------------

def test_raw_text_preserves_original_whitespace():
    text = '{"a": {  "b" : [1,  2] },"time":"2024-02-05T16:00:00Z"}'
    samples = list(get_samples(text, ExtractorOptions(recursive=False)))
    assert len(samples) == 1
    assert samples[0].key == "a"
    assert samples[0].value == '{  "b" : [1,  2] }'


def test_raw_text_number_formats_preserved_in_template():
    text = '{"id":5e2,"value":1}'
    samples = list(get_samples(text, ExtractorOptions(
        template="{id}/{$prop}", pointers_to_include=["/value"])))
    assert len(samples) == 1
    assert samples[0].key == "5e2/value"
    assert samples[0].value == 1.0


def test_get_samples_from_value_parity():
    """GetSamples(JsonElement) overload parity (TimeSeriesExtractor.cs:382):
    parsed-value input behaves like its canonical serialization."""
    from json_time_series_extractor_spark.core.extractor import (
        get_samples_from_value,
    )

    doc = {"time": "2024-01-01T00:00:00Z", "a": 1.5,
           "nested": {"b": True, "c": "x"}}
    via_value = list(get_samples_from_value(
        doc, ExtractorOptions(recursive=True)))
    via_text = list(get_samples(
        json.dumps(doc, separators=(",", ":")),
        ExtractorOptions(recursive=True)))
    assert via_value == via_text
    assert [s.key for s in via_value] == ["a", "nested/b", "nested/c"]
