"""Include/exclude pointer-rule compiler (operators O8-O11).

Re-expresses ``TimeSeriesExtractor.CreateJsonPointerMatchDelegate``
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs:92-290``)
and the rule classification in ``JsonPointerMatch.cs:85-161``:

- literal pointers: exact match, plus prefix ("partial") match for container
  elements in recursive mode (``TimeSeriesExtractor.cs:318-337``);
- glob patterns (``*`` any sequence / ``?`` single char): anchored
  case-insensitive regex over the full escaped pointer string, with a
  container passthrough below max depth (``TimeSeriesExtractor.cs:160-189``);
- MQTT-style segment rules (``+`` one level, ``#`` trailing multi-level):
  incremental final-segment matching (``TimeSeriesExtractor.cs:191-259``);
- exclude-wins composition (``TimeSeriesExtractor.cs:112-118``).

Deliberate deviation from the reference: the ``>8`` literal-rules HashSet
fast path (``TimeSeriesExtractor.cs:262-281``) silently *drops* prefix
matching, pruning recursive descent. We always apply exact-or-prefix
semantics regardless of rule count (see test
``tests/test_matcher.py::test_many_literal_rules_keep_prefix_semantics``).

Predicates have signature ``f(ctx, pointer, element) -> bool`` where *ctx*
exposes ``options``, ``max_depth`` (effective) and ``element_stack`` — the
same information the reference's ``TimeSeriesExtractorContext`` exposes.
"""

from __future__ import annotations

import re
from typing import Any, Callable, List, Optional, Sequence, Tuple

from json_time_series_extractor_spark.core.pointer import (
    Pointer,
    parse_pointer,
    pointer_str,
)

MatchDelegate = Callable[[Any, Pointer, Any], bool]

SINGLE_LEVEL_MQTT = "+"
MULTI_LEVEL_MQTT = "#"
SINGLE_CHAR_WILDCARD = "?"
MULTI_CHAR_WILDCARD = "*"


class MatchRule:
    """A single include/exclude rule, classified like ``JsonPointerMatch``."""

    __slots__ = ("raw", "segments", "is_pattern", "is_mqtt")

    def __init__(self, raw: str) -> None:
        if raw is None:
            raise ValueError("rule cannot be None")
        self.raw = raw
        self.segments: Optional[Pointer] = parse_pointer(raw)
        self.is_pattern = False
        self.is_mqtt = False
        if self.segments is not None:
            # Valid pointer: classify per segment (JsonPointerMatch.cs:100-115).
            n = len(self.segments)
            for i, seg in enumerate(self.segments):
                if seg == SINGLE_LEVEL_MQTT:
                    self.is_mqtt = True
                elif i == n - 1 and seg == MULTI_LEVEL_MQTT:
                    self.is_mqtt = True
                elif SINGLE_CHAR_WILDCARD in seg:
                    self.is_pattern = True
                elif MULTI_CHAR_WILDCARD in seg:
                    self.is_pattern = True
        else:
            # Not a valid pointer: only acceptable as a pattern expression
            # (JsonPointerMatch.cs:144-161).
            if SINGLE_CHAR_WILDCARD in raw or MULTI_CHAR_WILDCARD in raw:
                self.is_pattern = True
            else:
                raise ValueError(
                    f"{raw!r} is not a valid JSON pointer or pattern expression")

    @property
    def is_wildcard(self) -> bool:
        return self.is_pattern or self.is_mqtt


def compile_match_delegate(
    pointers_to_include: Optional[Sequence[str]] = None,
    pointers_to_exclude: Optional[Sequence[str]] = None,
    allow_wildcard_expressions: bool = False,
) -> MatchDelegate:
    """Build the fused include/exclude predicate (exclude wins)."""
    include = (_compile_rules(pointers_to_include, allow_wildcard_expressions)
               if pointers_to_include is not None else None)
    exclude = (_compile_rules(pointers_to_exclude, allow_wildcard_expressions)
               if pointers_to_exclude is not None else None)

    # Specialized compositions: the predicate runs twice per emitted sample
    # on the extraction hot path, so avoid dead call layers.
    if include is None and exclude is None:
        return lambda ctx, ptr, el: True
    if exclude is None:
        return include  # type: ignore[return-value]
    if include is None:
        def not_excluded(ctx: Any, ptr: Pointer, el: Any) -> bool:
            return not exclude(ctx, ptr, el)
        return not_excluded

    def predicate(ctx: Any, ptr: Pointer, el: Any) -> bool:
        if exclude(ctx, ptr, el):
            return False
        return include(ctx, ptr, el)

    return predicate


def _compile_rules(rules: Sequence[str], allow_wildcards: bool) -> MatchDelegate:
    literal_pointers: List[Pointer] = []
    wildcard_preds: List[MatchDelegate] = []

    for raw in rules:
        if raw is None or not str(raw).strip():
            continue
        rule = MatchRule(str(raw))
        if not allow_wildcards or not rule.is_wildcard:
            if rule.segments is not None:
                literal_pointers.append(rule.segments)
            # A pattern-only rule (invalid pointer) with wildcards disallowed
            # has no pointer to match literally — the reference adds a null
            # pointer which never matches; we just drop it.
            continue
        if rule.is_pattern:
            wildcard_preds.append(_compile_pattern(rule.raw))
        else:
            wildcard_preds.append(_compile_mqtt(rule.segments))  # type: ignore[arg-type]

    # Single-wildcard-rule fast path (common config shape): no loop frame.
    if not literal_pointers and len(wildcard_preds) == 1:
        return wildcard_preds[0]

    def predicate(ctx: Any, ptr: Pointer, el: Any) -> bool:
        for match_segs in literal_pointers:
            if _match_exact_or_partial(ctx, match_segs, ptr, el):
                return True
        for pred in wildcard_preds:
            if pred(ctx, ptr, el):
                return True
        return False

    return predicate


def _match_exact_or_partial(ctx: Any, match_segs: Pointer, ptr: Pointer,
                            el: Any) -> bool:
    """Exact match, or container-prefix match in recursive mode
    (``TimeSeriesExtractor.cs:318-337``)."""
    if match_segs == ptr:
        return True
    if (ctx.options.recursive and isinstance(el, (dict, list))
            and len(ptr) < len(match_segs)):
        return match_segs[:len(ptr)] == ptr
    return False


def _compile_pattern(raw: str) -> MatchDelegate:
    """Glob pattern -> anchored case-insensitive regex over the escaped
    pointer string, with recursive-container passthrough
    (``TimeSeriesExtractor.cs:160-189``)."""
    pattern = re.escape(raw).replace(r"\*", ".*").replace(r"\?", ".")
    regex = re.compile(f"^{pattern}$", re.IGNORECASE | re.DOTALL)

    def predicate(ctx: Any, ptr: Pointer, el: Any) -> bool:
        if (ctx.options.recursive and len(ctx.element_stack) < ctx.max_depth
                and isinstance(el, (dict, list))):
            # Never prune containers early: the regex tests the full pointer
            # string, not per-segment, so intermediate containers always pass
            # while below the depth limit.
            return True
        return regex.match(pointer_str(ptr)) is not None

    return predicate


def _compile_mqtt(match_segs: Pointer) -> MatchDelegate:
    """MQTT-style segment matcher (``TimeSeriesExtractor.cs:191-259``).

    Incremental contract: ancestors of *ptr* were validated at shallower
    recursion levels, so only the final segment is tested here.
    """
    table: List[Tuple[str, bool, bool]] = []
    n = len(match_segs)
    for i, seg in enumerate(match_segs):
        table.append((
            seg,
            seg == SINGLE_LEVEL_MQTT,
            i == n - 1 and seg == MULTI_LEVEL_MQTT,
        ))

    def predicate(ctx: Any, ptr: Pointer, el: Any) -> bool:
        if len(ptr) < n:
            # Shorter than the rule: only containers in recursive mode may
            # pass through (to keep descending), and only within MaxDepth.
            if not ctx.options.recursive:
                return False
            if not isinstance(el, (dict, list)):
                return False
            # Reference quirk preserved: this guard uses the *raw* options
            # MaxDepth and the element stack count (which includes the root).
            if (ctx.options.max_depth >= 1
                    and len(ctx.element_stack) > ctx.options.max_depth):
                return False
        longer = len(ptr) > n
        if longer and not table[-1][2]:
            return False
        idx = len(ptr) - 1
        seg, is_single, is_multi = table[idx] if idx < n else table[-1]
        if is_single:
            if longer and idx >= n:
                return False
            return True
        if is_multi:
            return True
        return ptr[idx] == seg

    return predicate
