"""Extraction options — the reference's "query language".

Mirrors ``TimeSeriesExtractorOptions``
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractorOptions.cs:13-410``)
and its defaults (``TimeSeriesExtractorConstants.cs:12-38``), as a plain
dataclass so it can be captured in a Spark UDF closure and shipped to
executors. ``from_dict`` provides the config-binding surface the reference
gets from ``Microsoft.Extensions.Configuration`` TypeConverters
(``JsonPointerLiteral.cs:199-281``, ``ConfigurationBinderTests.cs:11-126``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from datetime import datetime
from typing import Any, Callable, Mapping, Optional, Sequence

from json_time_series_extractor_spark.core.pointer import Pointer, parse_pointer

DEFAULT_TEMPLATE = "{$prop}"
LOCAL_PROPERTY_PLACEHOLDER = "{$prop-local}"
DEFAULT_TIMESTAMP_PROPERTY = "/time"
DEFAULT_PATH_SEPARATOR = "/"
DEFAULT_MAX_DEPTH = 5


@dataclass
class ExtractorOptions:
    """Options controlling JSON time-series sample extraction.

    Callable fields cannot be expressed in a JSON job config; they exist for
    API parity with the reference's delegates and for tests. The picklable
    subset round-trips through ``to_dict``/``from_dict``.
    """

    #: JSON Pointer to re-root extraction at (``StartAt``); ``None`` = root.
    start_at: Optional[str] = None
    #: Sample-key template (``Template``); ``{$prop}``, ``{$prop-local}``,
    #: ``{$prop-path}`` and ``{property_name}`` placeholders supported.
    template: str = DEFAULT_TEMPLATE
    #: Default replacement provider for unresolved placeholders
    #: (``GetTemplateReplacement``).
    get_template_replacement: Optional[Callable[[str], Optional[str]]] = None
    #: Emit samples even when placeholders are unresolved
    #: (``AllowUnresolvedTemplateReplacements``).
    allow_unresolved_template_replacements: bool = True
    #: JSON Pointer to the timestamp property (``TimestampProperty``).
    timestamp_property: Optional[str] = DEFAULT_TIMESTAMP_PROPERTY
    #: Custom timestamp parser (``TimestampParser``); receives the parsed
    #: JSON value, returns an aware ``datetime`` or ``None`` for unparseable.
    timestamp_parser: Optional[Callable[[Any], Optional[datetime]]] = None
    #: Fallback timestamp provider (``GetDefaultTimestamp``); ``None`` means
    #: "current UTC time at parse" (TimestampSource.CurrentTime).
    get_default_timestamp: Optional[Callable[[], Optional[datetime]]] = None
    #: Resolve ``timestamp_property`` at every object level
    #: (``AllowNestedTimestamps``; only effective with ``recursive``).
    allow_nested_timestamps: bool = False
    #: Element predicate (``CanProcessElement``): ``f(ctx, pointer, element)``.
    can_process_element: Optional[Callable[..., bool]] = None
    #: Recurse into objects/arrays (``Recursive``).
    recursive: bool = False
    #: Maximum recursion depth (``MaxDepth``; <1 falls back to default 5).
    max_depth: int = DEFAULT_MAX_DEPTH
    #: Hierarchy separator for generated keys (``PathSeparator``).
    path_separator: str = DEFAULT_PATH_SEPARATOR
    #: Include array indexes in generated keys
    #: (``IncludeArrayIndexesInSampleKeys``).
    include_array_indexes_in_sample_keys: bool = True

    # -- include/exclude rules (reference: CreateJsonPointerMatchDelegate,
    #    TimeSeriesExtractor.cs:92-119). When set (and can_process_element is
    #    None), a matcher is compiled from these at context creation.
    pointers_to_include: Optional[Sequence[str]] = None
    pointers_to_exclude: Optional[Sequence[str]] = None
    allow_wildcard_expressions: bool = False

    # -- cached parsed pointers -------------------------------------------
    _start_at_segments: Optional[Pointer] = field(
        default=None, init=False, repr=False, compare=False)
    _timestamp_segments: Optional[Pointer] = field(
        default=None, init=False, repr=False, compare=False)

    def __post_init__(self) -> None:
        self.validate()
        if self.start_at is not None:
            segs = parse_pointer(self.start_at)
            if segs is None:
                raise ValueError(f"invalid StartAt pointer: {self.start_at!r}")
            self._start_at_segments = segs
        if self.timestamp_property is not None:
            segs = parse_pointer(self.timestamp_property)
            if segs is None:
                raise ValueError(
                    f"invalid TimestampProperty pointer: {self.timestamp_property!r}")
            self._timestamp_segments = segs

    def validate(self) -> None:
        """Mirror options validation (``TimeSeriesExtractorOptions.cs:404-408``)."""
        if self.template is None or not self.template.strip():
            raise ValueError("Template cannot be null or white space.")
        if self.path_separator is None or self.path_separator == "":
            raise ValueError("PathSeparator is required.")

    # -- config binding ----------------------------------------------------

    _CONFIG_KEYS = {
        "start_at", "template", "allow_unresolved_template_replacements",
        "timestamp_property", "allow_nested_timestamps", "recursive",
        "max_depth", "path_separator", "include_array_indexes_in_sample_keys",
        "pointers_to_include", "pointers_to_exclude",
        "allow_wildcard_expressions",
    }

    @classmethod
    def from_dict(cls, config: Mapping[str, Any]) -> "ExtractorOptions":
        """Bind options from a plain config mapping (JSON job spec /
        ``spark-submit --conf`` style). Accepts snake_case or the reference's
        PascalCase key names."""
        kwargs: dict = {}
        for key, value in config.items():
            snake = _to_snake(key)
            if snake not in cls._CONFIG_KEYS:
                raise KeyError(f"unknown extractor option: {key!r}")
            kwargs[snake] = value
        return cls(**kwargs)

    def to_dict(self) -> dict:
        """Export the picklable/configurable subset."""
        out = {}
        for key in sorted(self._CONFIG_KEYS):
            value = getattr(self, key)
            if isinstance(value, tuple):
                value = list(value)
            out[key] = value
        return out

    def copy(self, **overrides: Any) -> "ExtractorOptions":
        """Copy-constructor parity (``TimeSeriesExtractorOptions.cs:382-400``)."""
        return replace(self, **overrides)


def _to_snake(name: str) -> str:
    if "_" in name or name.islower():
        return name
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and (not name[i - 1].isupper()
                                       or (i + 1 < len(name) and name[i + 1].islower())):
            out.append("_")
        out.append(ch.lower())
    return "".join(out)
