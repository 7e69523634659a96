"""Timestamp parsing rules (operator O4).

Mirrors ``TimeSeriesExtractor.TryGetTimestamp``
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs:637-674``):

- string values: strict-ish ISO-8601 (``JsonElement.TryGetDateTimeOffset``);
  offsets preserved, fractional seconds truncated to microseconds (Spark
  timestamps are microsecond-resolution; .NET keeps 100ns ticks — the
  deviation only affects sub-microsecond digits);
- integer numbers: milliseconds since the Unix epoch, UTC
  (``TimeSeriesExtractor.cs:666-671``); non-integral numbers fail;
- a custom parser delegate overrides both; returning ``None`` means
  "unparseable" (``TimeSeriesExtractor.cs:650-658``).

Deviation: ISO strings without an explicit offset are treated as UTC
(.NET would assume the machine-local offset — non-deterministic across a
cluster, so UTC is the only sane distributed semantics).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from functools import lru_cache
from typing import Any, Optional

from json_time_series_extractor_spark.core.jsondoc import JsonNumber

EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

_ISO_RE = re.compile(
    r"^(?P<date>\d{4}-\d{2}-\d{2})"
    r"(?:[Tt ](?P<time>\d{2}:\d{2}(?::\d{2})?)"
    r"(?:\.(?P<frac>\d{1,9}))?"
    r"(?P<tz>[Zz]|[+-]\d{2}:?\d{2})?)?$"
)


@lru_cache(maxsize=4096)
def parse_iso_timestamp(text: str) -> Optional[datetime]:
    """Parse an ISO-8601 timestamp string to an aware ``datetime`` or
    ``None``. Memoized: documents typically repeat the same timestamp
    string across sibling measurements."""
    m = _ISO_RE.match(text)
    if not m:
        return None
    date_part = m.group("date")
    time_part = m.group("time") or "00:00:00"
    if len(time_part) == 5:
        time_part += ":00"
    frac = m.group("frac") or ""
    micros = int(frac[:6].ljust(6, "0")) if frac else 0
    tz_part = m.group("tz")
    if tz_part is None or tz_part in ("Z", "z"):
        tzinfo = timezone.utc
    else:
        sign = 1 if tz_part[0] == "+" else -1
        hh = int(tz_part[1:3])
        mm = int(tz_part.replace(":", "")[3:5])
        tzinfo = timezone(sign * timedelta(hours=hh, minutes=mm))
    try:
        base = datetime.fromisoformat(f"{date_part}T{time_part}")
    except ValueError:
        return None
    return base.replace(microsecond=micros, tzinfo=tzinfo)


def parse_timestamp_value(value: Any,
                          timestamp_parser=None) -> Optional[datetime]:
    """Apply the reference's value->timestamp rules to a parsed JSON value."""
    if timestamp_parser is not None:
        return timestamp_parser(value)
    if isinstance(value, str):
        return parse_iso_timestamp(value)
    if isinstance(value, JsonNumber):
        ms = value.try_int64()
        if ms is not None:
            return EPOCH + timedelta(milliseconds=ms)
    return None
