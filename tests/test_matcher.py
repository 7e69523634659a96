"""Unit tests for the pointer-rule compiler (O8-O11) and options binding."""

from __future__ import annotations

import json

import pytest

from json_time_series_extractor_spark.core.extractor import get_samples
from json_time_series_extractor_spark.core.matcher import (
    MatchRule,
    compile_match_delegate,
)
from json_time_series_extractor_spark.core.options import ExtractorOptions
from json_time_series_extractor_spark.core.pointer import (
    evaluate,
    MISSING,
    parse_pointer,
    pointer_str,
)


def dumps(obj) -> str:
    return json.dumps(obj, separators=(",", ":"))


class _Ctx:
    def __init__(self, options, stack_len=1, max_depth=None):
        self.options = options
        self.element_stack = [None] * stack_len
        self.max_depth = max_depth if max_depth is not None else (
            options.max_depth if options.recursive else 1)


def test_pointer_roundtrip_and_escaping():
    assert parse_pointer("") == ()
    assert parse_pointer("/a/b") == ("a", "b")
    assert parse_pointer("/a~1b/c~0d") == ("a/b", "c~d")
    assert pointer_str(("a/b", "c~d")) == "/a~1b/c~0d"
    assert parse_pointer("no-leading-slash") is None
    assert parse_pointer("/bad~2escape") is None


def test_pointer_evaluate():
    doc = {"a": [{"b": 1}, {"b": 2}], "n": None}
    assert evaluate(doc, ("a", "1", "b")) == 2
    assert evaluate(doc, ("a", "01", "b")) is MISSING  # leading zero invalid
    assert evaluate(doc, ("missing",)) is MISSING
    assert evaluate(doc, ("n",)) is None  # JSON null is a real value


def test_rule_classification():
    assert not MatchRule("/a/b").is_wildcard
    assert MatchRule("/a/+/b").is_mqtt
    assert MatchRule("/a/#").is_mqtt
    # '#' not in final segment is not an MQTT wildcard
    assert not MatchRule("/#/a").is_mqtt
    assert MatchRule("/a/b*").is_pattern
    assert MatchRule("*/X").is_pattern
    assert MatchRule("/a/b?c").is_pattern
    with pytest.raises(ValueError):
        MatchRule("not-a-pointer-no-wildcards")


def test_exclude_wins_over_include():
    opts = ExtractorOptions()
    pred = compile_match_delegate(["/a", "/b"], ["/b"])
    ctx = _Ctx(opts)
    assert pred(ctx, ("a",), 1.0)
    assert not pred(ctx, ("b",), 1.0)
    assert not pred(ctx, ("c",), 1.0)


def test_literal_prefix_match_keeps_recursion_alive():
    opts = ExtractorOptions(recursive=True)
    pred = compile_match_delegate(["/a/b/c"], None)
    ctx = _Ctx(opts)
    # Container at a prefix of the rule: match (descend).
    assert pred(ctx, ("a",), {"b": {}})
    assert pred(ctx, ("a", "b"), {"c": 1})
    # Scalar at a prefix: no match.
    assert not pred(ctx, ("a",), 1.0)
    # Diverging path: no match even for containers.
    assert not pred(ctx, ("x",), {"b": {}})


def test_many_literal_rules_keep_prefix_semantics():
    """Documented deviation: the reference switches to exact-only HashSet
    matching above 8 literal rules (``TimeSeriesExtractor.cs:262-281``),
    silently losing container-prefix matching and pruning recursion. We keep
    prefix semantics at any rule count."""
    rules = [f"/deep/nested/p{i}" for i in range(9)] + ["/a/b/c"]
    doc = {"a": {"b": {"c": 42}}}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True, pointers_to_include=rules)))
    assert len(samples) == 1
    assert samples[0].key == "a/b/c"
    assert samples[0].value == 42.0


def test_mqtt_single_level_no_match_beyond_rule_length():
    opts = ExtractorOptions(recursive=True)
    pred = compile_match_delegate(["/a/+"], None, allow_wildcard_expressions=True)
    ctx = _Ctx(opts, stack_len=4)
    assert pred(ctx, ("a", "x"), 1.0)
    assert not pred(ctx, ("a", "x", "y"), 1.0)


def test_mqtt_multi_level_matches_descendants():
    opts = ExtractorOptions(recursive=True)
    pred = compile_match_delegate(["/a/#"], None, allow_wildcard_expressions=True)
    ctx = _Ctx(opts, stack_len=4)
    assert pred(ctx, ("a", "x"), 1.0)
    assert pred(ctx, ("a", "x", "y"), 1.0)
    assert not pred(ctx, ("b",), 1.0)


def test_glob_is_case_insensitive():
    opts = ExtractorOptions(recursive=True)
    pred = compile_match_delegate(["/DATA/*"], None,
                                  allow_wildcard_expressions=True)
    ctx = _Ctx(opts, stack_len=3, max_depth=2)
    # Past max depth, containers are no longer passed through; regex applies.
    assert pred(_Ctx(opts, stack_len=5, max_depth=2), ("data", "x"), 1.0)


def test_wildcards_ignored_when_not_allowed():
    doc = {"a": {"b": 1}, "time": "2024-02-05T16:00:00Z"}
    samples = list(get_samples(dumps(doc), ExtractorOptions(
        recursive=True,
        pointers_to_include=["/+/+"],  # literal rule: no '+' properties exist
        allow_wildcard_expressions=False)))
    assert samples == []


def test_options_from_dict_pascal_and_snake():
    opts = ExtractorOptions.from_dict({
        "TimestampProperty": "/ts",
        "Recursive": True,
        "MaxDepth": 3,
        "pointers_to_include": ["/a/#"],
        "AllowWildcardExpressions": True,
        "IncludeArrayIndexesInSampleKeys": False,
    })
    assert opts.timestamp_property == "/ts"
    assert opts.recursive is True
    assert opts.max_depth == 3
    assert opts.include_array_indexes_in_sample_keys is False
    roundtrip = ExtractorOptions.from_dict(opts.to_dict())
    assert roundtrip.to_dict() == opts.to_dict()


def test_options_validation():
    with pytest.raises(ValueError):
        ExtractorOptions(template="   ")
    with pytest.raises(ValueError):
        ExtractorOptions(path_separator="")
    with pytest.raises(ValueError):
        ExtractorOptions(start_at="not-a-pointer")


# --- ConfigurationBinder parity (ConfigurationBinderTests.cs:11-126) -------

def test_binder_valid_start_at_pointer():
    opts = ExtractorOptions.from_dict({"StartAt": "/foo/bar"})
    assert opts.start_at == "/foo/bar"
    assert opts._start_at_segments == ("foo", "bar")


def test_binder_invalid_start_at_pointer_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ExtractorOptions.from_dict({"StartAt": "invalid"}).validate()


def test_binder_null_and_empty_match_rules_dropped():
    from json_time_series_extractor_spark.core.matcher import (
        compile_match_delegate,
    )

    # Null/empty rules bind to nothing (ShouldNotBindNullValue/EmptyValue):
    # a list of only blank rules behaves like an empty include list.
    pred = compile_match_delegate(["", None], None, True)
    ctx = type("C", (), {"options": ExtractorOptions(recursive=True),
                         "max_depth": 5, "element_stack": []})()
    assert pred(ctx, ("foo",), 1.0) is False


def test_binder_rule_classification_literal_mqtt_pattern():
    from json_time_series_extractor_spark.core.matcher import MatchRule

    literal = MatchRule("/foo/bar")
    assert not literal.is_wildcard

    mqtt = MatchRule("/foo/bar/+/baz/#")
    assert mqtt.is_wildcard and mqtt.is_mqtt and not mqtt.is_pattern

    pattern = MatchRule("*/bar")
    assert pattern.is_wildcard and pattern.is_pattern and not pattern.is_mqtt
