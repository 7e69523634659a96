"""RFC 6901 JSON Pointer utilities.

The reference uses the external ``JsonPointer.Net`` package
(``/root/reference/Directory.Packages.props:10``) for pointer parsing,
string rendering (``~0``/``~1`` escaping) and evaluation. We implement the
small subset the extractor needs. Pointers are represented as tuples of
*unescaped* segment strings; the escaped string form (with leading ``/``)
is produced by :func:`pointer_str`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

Pointer = Tuple[str, ...]


def escape_segment(segment: str) -> str:
    """Escape a single segment for the RFC 6901 string form."""
    if "~" in segment or "/" in segment:
        return segment.replace("~", "~0").replace("/", "~1")
    return segment


def unescape_segment(segment: str) -> str:
    """Unescape a single RFC 6901 segment (``~1`` -> ``/``, ``~0`` -> ``~``)."""
    if "~" in segment:
        return segment.replace("~1", "/").replace("~0", "~")
    return segment


def parse_pointer(text: str) -> Optional[Pointer]:
    """Parse an RFC 6901 pointer string into a segment tuple.

    Returns ``None`` for syntactically invalid pointers (non-empty strings
    that do not start with ``/``, or segments containing a ``~`` escape that
    is not ``~0``/``~1``) — mirroring ``JsonPointer.TryParse`` failure.
    """
    if text == "":
        return ()
    if not text.startswith("/"):
        return None
    segments = []
    for raw in text[1:].split("/"):
        # Validate ~ escapes: every ~ must be followed by 0 or 1.
        i = raw.find("~")
        while i != -1:
            if i + 1 >= len(raw) or raw[i + 1] not in "01":
                return None
            i = raw.find("~", i + 2)
        segments.append(unescape_segment(raw))
    return tuple(segments)


def pointer_str(segments: Sequence[str]) -> str:
    """Render segments in the canonical escaped string form (leading ``/``)."""
    if not segments:
        return ""
    return "".join("/" + escape_segment(s) for s in segments)


def evaluate(doc: Any, segments: Sequence[str]) -> Any:
    """Evaluate a pointer against a parsed JSON document.

    Returns the sentinel :data:`MISSING` when the pointer does not resolve
    (mirrors ``JsonPointer.Evaluate`` returning ``null``). ``None`` is a
    legitimate JSON ``null`` result, hence the sentinel.
    """
    current = doc
    for seg in segments:
        if isinstance(current, dict):
            if seg in current:
                current = current[seg]
            else:
                return MISSING
        elif isinstance(current, list):
            # RFC 6901: array index must be '0' or digits without leading zero.
            if seg == "0":
                idx = 0
            elif seg.isdigit() and not seg.startswith("0"):
                idx = int(seg)
            else:
                return MISSING
            if idx >= len(current):
                return MISSING
            current = current[idx]
        else:
            return MISSING
    return current


class _Missing:
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<missing>"

    def __bool__(self) -> bool:
        return False


#: Sentinel returned by :func:`evaluate` when a pointer does not resolve.
MISSING = _Missing()
