"""JSON document loading with raw-text fidelity.

The reference emits object/array subtrees as *raw JSON text sliced from the
original document* (``TimeSeriesExtractor.cs:934-935`` via
``JsonElement.GetRawText``), and renders numbers in template keys using
their raw literal form (``TimeSeriesExtractor.cs:773-775`` via
``GetRawText``). To reproduce this byte-identically we:

1. parse with the C-speed :func:`json.loads`, wrapping every number in
   :class:`JsonNumber` (a ``float`` subclass carrying the raw literal), and
2. lazily locate the character span of container subtrees in the original
   text with :class:`RawTextResolver` — paying the (pure-Python) scan cost
   only when a raw-text value is actually emitted.

All numbers coerce to float64, matching ``JsonElement.GetDouble()``
(``TimeSeriesExtractor.cs:930``).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional, Sequence, Tuple


class JsonNumber(float):
    """A JSON number: float64 value + the raw literal text it came from."""

    __slots__ = ("raw",)

    raw: str

    def __new__(cls, raw: str) -> "JsonNumber":
        self = super().__new__(cls, float(raw))
        self.raw = raw
        return self

    def try_int64(self) -> Optional[int]:
        """Mirror ``JsonElement.TryGetInt64``: integer literal within int64 range."""
        raw = self.raw
        if "." in raw or "e" in raw or "E" in raw:
            return None
        try:
            value = int(raw)
        except ValueError:  # pragma: no cover - defensive
            return None
        if -(2**63) <= value < 2**63:
            return value
        return None


def loads(text: str) -> Any:
    """Parse JSON preserving raw number literals (see :class:`JsonNumber`)."""
    return json.loads(text, parse_float=JsonNumber, parse_int=JsonNumber,
                      parse_constant=_parse_constant)


def _parse_constant(name: str) -> Any:
    # System.Text.Json rejects NaN/Infinity by default; so do we.
    raise ValueError(f"invalid JSON constant: {name}")


# Matches a complete JSON string token, or a single structural bracket.
# Strings are consumed wholesale at C speed so bracket matching never looks
# inside them.
_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[{}\[\]]')
_STRING = re.compile(r'"(?:[^"\\]|\\.)*"')
_WS = " \t\n\r"


class RawTextResolver:
    """Lazily resolves the raw-text slice of any subtree in a JSON document.

    ``raw(path)`` returns exactly the characters of the value at *path*
    (a tuple of object keys / array-index strings from the document root),
    with no surrounding whitespace — the same contract as
    ``JsonElement.GetRawText``.
    """

    def __init__(self, text: str) -> None:
        self._text = text
        # Cache of path -> (start, end) spans discovered so far.
        self._spans: Dict[Tuple[str, ...], Tuple[int, int]] = {}
        # Cache of path -> value start; _descend records every sibling it
        # walks past, so resolving k children of one container is O(n), not
        # O(k * n) rescans from the container start.
        self._starts: Dict[Tuple[str, ...], int] = {}
        # Per-container scan cursor: (position, element_count) where the
        # last walk stopped — forward iteration over children resumes here
        # instead of rescanning from the container start.
        self._cursor: Dict[Tuple[str, ...], Tuple[int, int]] = {}

    def raw(self, path: Sequence[str]) -> str:
        start, end = self._span(tuple(path))
        return self._text[start:end]

    # -- internal ---------------------------------------------------------

    def _span(self, path: Tuple[str, ...]) -> Tuple[int, int]:
        cached = self._spans.get(path)
        if cached is not None:
            return cached
        start = self._starts.get(path)
        if start is not None:
            # A previous sibling walk already located this value.
            span = (start, self._value_end(start))
            self._spans[path] = span
            return span
        # Find the nearest cached ancestor (resolved span or recorded
        # value-start) to begin the scan from.
        base_start = 0
        depth = 0
        for i in range(len(path) - 1, 0, -1):
            anc = self._spans.get(path[:i])
            if anc is not None:
                base_start, depth = anc[0], i
                break
            start = self._starts.get(path[:i])
            if start is not None:
                base_start, depth = start, i
                break
        pos = self._skip_ws(base_start)
        for i in range(depth, len(path)):
            pos = self._descend(pos, path[i], path[:i])
            self._starts[path[:i + 1]] = pos
        span = (pos, self._value_end(pos))
        self._spans[path] = span
        return span

    def _skip_ws(self, pos: int) -> int:
        text = self._text
        while pos < len(text) and text[pos] in _WS:
            pos += 1
        return pos

    def _descend(self, pos: int, segment: str,
                 parent_path: Tuple[str, ...] = ()) -> int:
        """Given *pos* at the start of a container value, return the position
        of the child value named/indexed by *segment*, recording the start
        of every sibling walked past (so later sibling lookups are O(1))."""
        text = self._text
        starts = self._starts
        pos = self._skip_ws(pos)
        ch = text[pos]
        if ch == "{":
            cursor = self._cursor.get(parent_path)
            if cursor is not None:
                pos, _ = cursor
            else:
                pos += 1
            while True:
                pos = self._skip_ws(pos)
                if text[pos] == "}":
                    raise KeyError(segment)
                m = _STRING.match(text, pos)
                if not m:
                    raise ValueError(f"malformed JSON object at {pos}")
                key = json.loads(m.group(0))
                pos = self._skip_ws(m.end())
                if text[pos] != ":":
                    raise ValueError(f"expected ':' at {pos}")
                pos = self._skip_ws(pos + 1)
                starts[parent_path + (key,)] = pos
                if key == segment:
                    return pos
                pos = self._skip_ws(self._value_end(pos))
                if text[pos] == ",":
                    pos += 1
                elif text[pos] == "}":
                    raise KeyError(segment)
                self._cursor[parent_path] = (pos, 0)
        elif ch == "[":
            index = int(segment)
            cursor = self._cursor.get(parent_path)
            if cursor is not None and cursor[1] <= index:
                pos, count = cursor
            else:
                pos += 1
                count = 0
            while True:
                pos = self._skip_ws(pos)
                if text[pos] == "]":
                    raise IndexError(index)
                starts[parent_path + (str(count),)] = pos
                if count == index:
                    return pos
                pos = self._skip_ws(self._value_end(pos))
                count += 1
                if text[pos] == ",":
                    pos += 1
                elif text[pos] == "]":
                    raise IndexError(index)
                self._cursor[parent_path] = (pos, count)
        raise ValueError(f"cannot descend into scalar at {pos}")

    def _value_end(self, pos: int) -> int:
        """Position one past the end of the value starting at *pos*."""
        text = self._text
        ch = text[pos]
        if ch == '"':
            m = _STRING.match(text, pos)
            if not m:
                raise ValueError(f"malformed JSON string at {pos}")
            return m.end()
        if ch in "{[":
            depth = 0
            for m in _TOKEN.finditer(text, pos):
                tok = m.group(0)
                if tok == "{" or tok == "[":
                    depth += 1
                elif tok == "}" or tok == "]":
                    depth -= 1
                    if depth == 0:
                        return m.end()
            raise ValueError(f"unbalanced JSON starting at {pos}")
        # Scalar literal: number / true / false / null.
        end = pos
        n = len(text)
        while end < n and text[end] not in ",}] \t\n\r":
            end += 1
        return end
