"""Pure-Python JSON time-series extraction (operators O1-O15).

Re-expresses the full extraction pipeline of the reference's
``TimeSeriesExtractor``
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs``):

- O1  JSON parse with raw-literal numbers (``:356-359``),
- O2  ``StartAt`` re-rooting (``:390-397``),
- O3  root-array flatten (``:425-438``),
- O4  default-timestamp resolution + fallback chain (``:453-467,637-674``),
- O5  depth-capped recursive DFS (``:501-541``),
- O6  depth guard (``TimeSeriesExtractorContext.cs:58-65``),
- O7  element filter before descend and before emit (``:507,600``),
- O12 key-template rendering incl. recursive data-driven lookups (``:689-902``),
- O13 array-index suppression (``:778-837,840-901``),
- O14 value coercion (``:923-938``),
- O15 nested-timestamp scoping (``:554-570``).

Output order is the document DFS order, as asserted by the reference tests
(``JsonTimeSeriesExtractorTests.cs:488-490``). This module is deliberately
Spark-free: the Spark operator wraps :func:`get_samples` in an Arrow-batched
``mapInPandas`` (see ``..operators.extract``).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from enum import IntEnum
from functools import lru_cache
from typing import Any, Iterator, List, NamedTuple, Optional, Tuple

from json_time_series_extractor_spark.core import jsondoc
from json_time_series_extractor_spark.core.jsondoc import JsonNumber, RawTextResolver
from json_time_series_extractor_spark.core.matcher import compile_match_delegate
from json_time_series_extractor_spark.core.options import (
    DEFAULT_MAX_DEPTH,
    DEFAULT_PATH_SEPARATOR,
    DEFAULT_TEMPLATE,
    LOCAL_PROPERTY_PLACEHOLDER,
    ExtractorOptions,
)
from json_time_series_extractor_spark.core.pointer import (
    MISSING,
    Pointer,
    evaluate,
    pointer_str,
)
from json_time_series_extractor_spark.core.timestamps import parse_timestamp_value


class TimestampSource(IntEnum):
    """Mirror of the reference's ``TimestampSource`` enum
    (``TimestampSource.cs:6-30``)."""

    UNSPECIFIED = 0
    DOCUMENT = 1
    FALLBACK_PROVIDER = 2
    CURRENT_TIME = 3


class TimeSeriesSample(NamedTuple):
    """Mirror of ``TimeSeriesSample`` (``TimeSeriesSample.cs:8-53``), plus
    ``value_kind`` — the JSON kind of the source element (the reference
    encodes this implicitly in the runtime type of ``Value``; Spark's
    tagged-union schema needs it explicit). 0=null, 1=number, 2=string,
    3=bool, 4=object, 5=array."""

    key: str
    timestamp: datetime
    value: Any
    timestamp_source: TimestampSource = TimestampSource.UNSPECIFIED
    value_kind: int = 0


class _ParsedTimestamp(NamedTuple):
    timestamp: datetime
    source: TimestampSource
    pointer: Optional[Pointer]  # absolute pointer of the matched ts property


# Element-stack entry: (key, element, is_array_item) as a plain tuple —
# the stack is pushed/popped for every JSON node on the extraction hot
# path, and NamedTuple construction + attribute access measure ~10% of the
# whole walk. Index layout: [0]=key, [1]=element, [2]=is_array_item.
def _StackEntry(key: Optional[str], element: Any,
                is_array_item: bool) -> tuple:
    return (key, element, is_array_item)


_PLACEHOLDER_RE = re.compile(r"\{([^\}]+?)\}", re.DOTALL)


class _UnresolvedTemplate(Exception):
    pass


@lru_cache(maxsize=64)
def _compile_match_cached(include: Optional[tuple], exclude: Optional[tuple],
                          allow_wildcards: bool):
    """Rule-content-keyed cache over :func:`compile_match_delegate` (the
    compiled predicates are pure functions of the rules — context flows in
    per call, so sharing across documents is sound)."""
    return compile_match_delegate(include, exclude, allow_wildcards)


class _Context:
    """Per-document extraction state (``TimeSeriesExtractorContext.cs:11-117``)."""

    __slots__ = ("options", "max_depth", "element_stack", "timestamp_stack",
                 "is_default_template", "template_has_placeholders",
                 "_can_process", "resolver", "abs_prefix")

    def __init__(self, options: ExtractorOptions, resolver: RawTextResolver,
                 abs_prefix: Pointer) -> None:
        self.options = options
        self.max_depth = (
            (DEFAULT_MAX_DEPTH if options.max_depth < 1 else options.max_depth)
            if options.recursive else 1)
        self.element_stack: List[_StackEntry] = []
        self.timestamp_stack: List[_ParsedTimestamp] = []
        if options.recursive:
            self.is_default_template = options.template == DEFAULT_TEMPLATE
        else:
            self.is_default_template = options.template in (
                DEFAULT_TEMPLATE, LOCAL_PROPERTY_PLACEHOLDER)
        self.template_has_placeholders = (
            self.is_default_template or "{" in options.template)
        if options.can_process_element is not None:
            self._can_process = options.can_process_element
        elif (options.pointers_to_include is not None
              or options.pointers_to_exclude is not None):
            # Memoized by rule CONTENT: a batch extracts thousands of
            # documents with identical options, and recompiling the rule
            # predicates (regex/MQTT parsing) per document was ~12% of
            # extraction time. Keying on the tuples (not the options
            # object) keeps mutation of the rule lists safe.
            self._can_process = _compile_match_cached(
                tuple(options.pointers_to_include)
                if options.pointers_to_include is not None else None,
                tuple(options.pointers_to_exclude)
                if options.pointers_to_exclude is not None else None,
                options.allow_wildcard_expressions)
        else:
            self._can_process = None
        self.resolver = resolver
        self.abs_prefix = abs_prefix

    def can_process(self, ptr: Pointer, element: Any) -> bool:
        """Filter check incl. timestamp-property auto-exclusion
        (``TimeSeriesExtractorContext.cs:94-102``)."""
        ts = self.timestamp_stack[-1]
        if ts.pointer is not None and ptr == ts.pointer:
            return False
        return self._can_process is None or self._can_process(self, ptr, element)


def get_samples(json_text: str,
                options: Optional[ExtractorOptions] = None,
                ) -> Iterator[TimeSeriesSample]:
    """Extract time-series samples from a JSON document string.

    Entry-point parity: ``TimeSeriesExtractor.GetSamples(string, ...)``
    (``TimeSeriesExtractor.cs:356-402``). The document must be a JSON object
    or an array of objects; other roots yield no samples.
    """
    if options is None:
        options = ExtractorOptions()
    else:
        options.validate()

    doc = jsondoc.loads(json_text)
    resolver = RawTextResolver(json_text)
    abs_prefix: Pointer = ()

    if options._start_at_segments is not None:
        rerooted = evaluate(doc, options._start_at_segments)
        if rerooted is MISSING:
            return
        doc = rerooted
        abs_prefix = options._start_at_segments

    yield from _from_root(doc, options, resolver, abs_prefix)


def get_samples_from_value(value: Any,
                           options: Optional[ExtractorOptions] = None,
                           ) -> Iterator[TimeSeriesSample]:
    """Extract samples from an already-parsed JSON value (dict / list).

    Entry-point parity: ``TimeSeriesExtractor.GetSamples(JsonElement, ...)``
    (``TimeSeriesExtractor.cs:382-402``). Raw-text sample values (container
    subtrees, template number rendering) are sliced from the canonical
    compact ``json.dumps`` serialization of *value* — the reference's
    ``GetRawText`` equally reflects however its ``JsonElement`` was built.
    """
    import json as _json

    text = _json.dumps(value, separators=(",", ":"), ensure_ascii=False)
    yield from get_samples(text, options)


def _from_root(element: Any, options: ExtractorOptions,
               resolver: RawTextResolver, abs_prefix: Pointer,
               ) -> Iterator[TimeSeriesSample]:
    """Root-array flatten (``TimeSeriesExtractor.cs:425-438``): each member
    object is an independent document with its own timestamp resolution;
    non-object members are silently dropped."""
    if isinstance(element, list):
        for i, item in enumerate(element):
            yield from _from_root(item, options, resolver,
                                  abs_prefix + (str(i),))
    elif isinstance(element, dict):
        yield from _document(element, options, resolver, abs_prefix)


def _document(root: dict, options: ExtractorOptions,
              resolver: RawTextResolver, abs_prefix: Pointer,
              ) -> Iterator[TimeSeriesSample]:
    """Per-document setup + top-level property loop
    (``TimeSeriesExtractor.cs:453-483``)."""
    ctx = _Context(options, resolver, abs_prefix)

    ts = _try_get_timestamp(root, options._timestamp_segments, options)
    if ts is None:
        fallback = (options.get_default_timestamp()
                    if options.get_default_timestamp is not None else None)
        if fallback is None:
            default = _ParsedTimestamp(datetime.now(timezone.utc),
                                       TimestampSource.CURRENT_TIME, None)
        else:
            default = _ParsedTimestamp(fallback,
                                       TimestampSource.FALLBACK_PROVIDER, None)
    else:
        default = _ParsedTimestamp(ts, TimestampSource.DOCUMENT,
                                   options._timestamp_segments)
    ctx.timestamp_stack.append(default)
    ctx.element_stack.append(_StackEntry(None, root, False))

    for name, value in root.items():
        ctx.element_stack.append(_StackEntry(name, value, False))
        try:
            yield from _walk(ctx, 1, (name,))
        finally:
            ctx.element_stack.pop()


def _walk(ctx: _Context, depth: int, ptr: Pointer,
          ) -> Iterator[TimeSeriesSample]:
    """Depth-first walk (``TimeSeriesExtractor.cs:501-541``).

    The filter check is ``_Context.can_process`` inlined — one method call
    per JSON node is measurable at 10^5 docs/sec/core. ``depth >=
    ctx.max_depth`` also covers the non-recursive mode: the context pins
    ``max_depth`` to 1 when ``recursive`` is off, so depth 1 (every
    top-level property) already emits.
    """
    stack = ctx.element_stack
    element = stack[-1][1]
    ts_entry = ctx.timestamp_stack[-1]
    if ts_entry.pointer is not None and ptr == ts_entry.pointer:
        return
    can = ctx._can_process
    if can is not None and not can(ctx, ptr, element):
        return

    if depth >= ctx.max_depth:
        sample = _build_sample(ctx, ptr, element)
        if sample is not None:
            yield sample
        return

    if isinstance(element, dict):
        # Nested-timestamp scoping (``:554-570``): re-evaluate the timestamp
        # property relative to this object; nearest ancestor wins.
        pushed = False
        opts = ctx.options
        if (opts.allow_nested_timestamps
                and opts._timestamp_segments is not None):
            ts = _try_get_timestamp(element, opts._timestamp_segments, opts)
            if ts is not None:
                ctx.timestamp_stack.append(_ParsedTimestamp(
                    ts, TimestampSource.DOCUMENT,
                    ptr + opts._timestamp_segments))
                pushed = True
        next_depth = depth + 1
        for name, value in element.items():
            stack.append((name, value, False))
            yield from _walk(ctx, next_depth, ptr + (name,))
            stack.pop()
        if pushed:
            ctx.timestamp_stack.pop()
    elif isinstance(element, list):
        next_depth = depth + 1
        for i, item in enumerate(element):
            key = str(i)
            stack.append((key, item, True))
            yield from _walk(ctx, next_depth, ptr + (key,))
            stack.pop()
    else:
        sample = _build_sample(ctx, ptr, element)
        if sample is not None:
            yield sample


def _build_sample(ctx: _Context, ptr: Pointer, element: Any,
                  ) -> Optional[TimeSeriesSample]:
    """Emit-time filter re-check + key render + value coercion
    (``TimeSeriesExtractor.cs:598-615``). Unresolvable templates skip the
    sample silently (``:611-614``)."""
    if not ctx.can_process(ptr, element):
        return None
    try:
        key = _build_key(ctx, ptr)
    except _UnresolvedTemplate:
        return None
    ts = ctx.timestamp_stack[-1]
    return TimeSeriesSample(key, ts.timestamp, coerce_value(ctx, ptr, element),
                            ts.source, value_kind(element))


def coerce_value(ctx: _Context, ptr: Pointer, element: Any) -> Any:
    """Value coercion (``TimeSeriesExtractor.cs:923-938``): numbers ->
    float64, strings/bools pass through, containers -> raw JSON text sliced
    byte-identically from the input, null -> None."""
    if isinstance(element, bool):
        return element
    if isinstance(element, JsonNumber):
        return float(element)
    if isinstance(element, str):
        return element
    if isinstance(element, (dict, list)):
        return ctx.resolver.raw(ctx.abs_prefix + ptr)
    return None


def value_kind(element: Any) -> int:
    """Tagged-union discriminator for the Spark sample schema:
    0=null, 1=number, 2=string, 3=bool, 4=object, 5=array."""
    if element is None:
        return 0
    if isinstance(element, bool):
        return 3
    if isinstance(element, JsonNumber):
        return 1
    if isinstance(element, str):
        return 2
    if isinstance(element, dict):
        return 4
    return 5


def _try_get_timestamp(element: Any, segments: Optional[Pointer],
                       options: ExtractorOptions) -> Optional[datetime]:
    """``TryGetTimestamp`` (``TimeSeriesExtractor.cs:637-674``)."""
    if segments is None or not isinstance(element, dict):
        return None
    value = evaluate(element, segments)
    if value is MISSING:
        return None
    return parse_timestamp_value(value, options.timestamp_parser)


# ---------------------------------------------------------------------------
# Key template rendering (O12/O13, ``TimeSeriesExtractor.cs:689-902``)
# ---------------------------------------------------------------------------

def _build_key(ctx: _Context, ptr: Pointer) -> str:
    options = ctx.options

    if ctx.is_default_template:
        return _full_property_name(ctx, ptr, False)
    if not ctx.template_has_placeholders:
        return options.template

    def replace(match: "re.Match[str]") -> str:
        name = match.group(1)
        if name == "$prop":
            return _full_property_name(ctx, ptr, False)
        if name == "$prop-local":
            return _full_property_name(ctx, ptr, True)
        if name == "$prop-path":
            return _property_path(ctx, ptr)

        if options.recursive:
            # Concatenate the replacement from every ancestor object that
            # defines the property, root -> leaf (``:721-751``).
            values = []
            for i, entry in enumerate(ctx.element_stack):
                el = entry[1]
                if isinstance(el, dict) and name in el:
                    values.append(_display_value(ctx, ptr, i, name, el[name]))
            if values:
                return options.path_separator.join(values)
        else:
            # Non-recursive: first object entry from the stack bottom
            # (``:752-760``; ``ElementStack.FirstOrDefault`` iterates from
            # the root, ``ElementStack.cs:147-159``).
            for i, entry in enumerate(ctx.element_stack):
                if isinstance(entry[1], dict):
                    if name in entry[1]:
                        return _display_value(ctx, ptr, i, name,
                                              entry[1][name])
                    break

        replacement = (options.get_template_replacement(name)
                       if options.get_template_replacement is not None else None)
        if replacement is None and not options.allow_unresolved_template_replacements:
            raise _UnresolvedTemplate(name)
        return replacement if replacement is not None else match.group(0)

    return _PLACEHOLDER_RE.sub(replace, options.template)


def _display_value(ctx: _Context, ptr: Pointer, stack_index: int,
                   name: str, value: Any) -> str:
    """``GetElementDisplayValue`` (``:773-775``): string value as-is,
    everything else as raw JSON text."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, JsonNumber):
        return value.raw
    if value is None:
        return "null"
    # Container: locate its absolute path. Stack entry i holds the element at
    # ptr[:i] (entry 0 is the document root), so the property lives at
    # ptr[:stack_index] + (name,).
    path = ctx.abs_prefix + ptr[:stack_index] + (name,)
    return ctx.resolver.raw(path)


def _stack_has_array_items(ctx: _Context) -> bool:
    return any(entry[2] for entry in ctx.element_stack)


def _full_property_name(ctx: _Context, ptr: Pointer, force_local: bool) -> str:
    """``GetFullPropertyName`` (``:778-837``)."""
    options = ctx.options
    if not options.recursive or force_local:
        return ptr[-1] if ptr else ""

    include_all = options.include_array_indexes_in_sample_keys
    if not include_all:
        include_all = not _stack_has_array_items(ctx)

    if include_all:
        if options.path_separator == DEFAULT_PATH_SEPARATOR:
            # Escaped pointer string with leading slashes trimmed (`:806-807`).
            return pointer_str(ptr).lstrip("/")
        return options.path_separator.join(ptr)

    # Rebuild from the element stack, skipping array entries, so numeric
    # *object* keys survive (``:822-836``).
    parts = [entry[0] for entry in ctx.element_stack
             if entry[0] is not None and not entry[2]]
    return options.path_separator.join(parts)


def _property_path(ctx: _Context, ptr: Pointer) -> str:
    """``GetPropertyPath`` (``:840-901``): parent path, no property name."""
    options = ctx.options
    if not options.recursive or len(ptr) <= 1:
        return ""

    use_direct = options.include_array_indexes_in_sample_keys
    if not use_direct:
        use_direct = not _stack_has_array_items(ctx)

    if use_direct:
        ancestor = ptr[:-1]
        if options.path_separator == DEFAULT_PATH_SEPARATOR:
            rendered = pointer_str(ancestor)
            return rendered[1:] if rendered.startswith("/") else rendered
        return options.path_separator.join(ancestor)

    parts = [entry[0] for entry in ctx.element_stack[:-1]
             if entry[0] is not None and not entry[2]]
    return options.path_separator.join(parts)
