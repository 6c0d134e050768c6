"""Timestamp kernels: ISO-8601 <-> 14-digit <-> HTTP-date conversions.

Reference semantics (studied, not copied; the doctest tables at
warcio/timeutils.py:28-316 are the spec):
- ISO parse with fractional seconds padded/truncated to micros
  (warcio/timeutils.py:28-71)
- 14-digit timestamps pad *up* when partial and clamp each field to its valid
  range, day clamped to the month's last day, non-numeric fields -> max
  (warcio/timeutils.py:199-354)
- RFC-2822 GMT http dates (warcio/timeutils.py:74-102)
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone
from email.utils import formatdate, parsedate

_NON_DIGIT = re.compile(r"[^\d]")

ISO_FMT = "%Y-%m-%dT%H:%M:%SZ"
TS14_FMT = "%Y%m%d%H%M%S"
_PAD6_UP = "299912"
_MICRO_PAD = "000000"


def iso_to_datetime(s: str, tz_aware: bool = False) -> datetime:
    parts = _NON_DIGIT.split(s)
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if len(parts) == 7:
        frac = parts[6][:6]
        parts[6] = frac + _MICRO_PAD[len(frac):]
    tz = timezone.utc if tz_aware else None
    return datetime(*(int(p) for p in parts), tzinfo=tz)


def datetime_to_iso(dt: datetime, use_micros: bool = False) -> str:
    if not use_micros:
        return dt.strftime(ISO_FMT)
    return dt.isoformat() + "Z"


def datetime_to_ts14(dt: datetime) -> str:
    return dt.strftime(TS14_FMT)


def _clamp_field(raw: str, lo: int, hi: int) -> int:
    try:
        return max(lo, min(int(raw), hi))
    except (TypeError, ValueError):
        return hi


def ts14_to_datetime(s: str, tz_aware: bool = False) -> datetime:
    """Lenient 14-digit timestamp: pad partial values up, clamp fields."""
    if len(s) < len(_PAD6_UP):
        s = s + _PAD6_UP[len(s):]

    def field(start, end, lo, hi):
        return _clamp_field(s[start:end], lo, hi) if len(s) >= end else hi

    year = field(0, 4, 1900, 2999)
    month = field(4, 6, 1, 12)
    day = field(6, 8, 1, calendar.monthrange(year, month)[1])
    hour = field(8, 10, 0, 23)
    minute = field(10, 12, 0, 59)
    second = field(12, 14, 0, 59)
    tz = timezone.utc if tz_aware else None
    return datetime(year, month, day, hour, minute, second, tzinfo=tz)


def ts14_to_iso(s: str) -> str:
    return datetime_to_iso(ts14_to_datetime(s))


def iso_to_ts14(s: str) -> str:
    return datetime_to_ts14(iso_to_datetime(s))


def http_date_to_datetime(s: str, tz_aware: bool = False) -> datetime:
    tz = timezone.utc if tz_aware else None
    return datetime(*parsedate(s)[:6], tzinfo=tz)


def datetime_to_http_date(dt: datetime) -> str:
    secs = calendar.timegm(dt.utctimetuple())
    return formatdate(timeval=secs, localtime=False, usegmt=True)


def http_date_to_ts14(s: str) -> str:
    return datetime_to_ts14(http_date_to_datetime(s))


def ts14_to_http_date(s: str) -> str:
    return datetime_to_http_date(ts14_to_datetime(s))


def ts14_to_sec(s: str) -> int:
    return calendar.timegm(ts14_to_datetime(s, tz_aware=True).utctimetuple())


def sec_to_ts14(secs) -> str:
    return datetime_to_ts14(datetime.fromtimestamp(secs, timezone.utc))
