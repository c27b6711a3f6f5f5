"""Solr date-math expressions — util/DateMathParser.java analog.

Grammar: an anchor (``NOW`` or an ISO-8601 instant ``2024-03-05T10:30:00Z``)
followed by operations evaluated LEFT TO RIGHT:

  /UNIT      round down to the start of UNIT
  +N UNIT    add
  -N UNIT    subtract

Units (singular or plural): YEAR MONTH DAY DATE HOUR MINUTE SECOND MILLI
(MILLISECOND). Examples: ``NOW/DAY+6MONTHS+3DAYS``, ``NOW/HOUR``,
``2024-01-01T00:00:00Z+1MONTH/DAY``.

The parse is driver-side (query compilation, like the reference — the
parser runs in the request thread, the resulting instant is a constant in
the query), so the Spark plan sees only a timestamp literal.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_UNIT_ALIASES = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RE = re.compile(r"(/([A-Z]+))|([+-])(\d+)([A-Z]+)")


class DateMathError(ValueError):
    pass


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise DateMathError(f"unknown unit {unit}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        return _add_months(dt, 12 * n)
    if unit == "MONTH":
        return _add_months(dt, n)
    delta = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }.get(unit)
    if delta is None:
        raise DateMathError(f"unknown unit {unit}")
    return dt + delta


def _add_months(dt: datetime, n: int) -> datetime:
    m = dt.month - 1 + n
    year = dt.year + m // 12
    month = m % 12 + 1
    # clamp day into the target month (Calendar.add semantics)
    for day in (dt.day, 30, 29, 28):
        try:
            return dt.replace(year=year, month=month, day=day)
        except ValueError:
            continue
    raise DateMathError("month arithmetic failed")


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a date-math expression to a tz-aware UTC datetime."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        if now is None:
            raise DateMathError("NOW requires an explicit 'now' anchor here "
                                "(determinism: the caller supplies the clock)")
        anchor, rest = now, expr[3:]
    else:
        m = re.match(r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z", expr)
        if not m:
            raise DateMathError(f"bad anchor in {expr!r}")
        anchor = datetime.fromisoformat(m.group(1)).replace(tzinfo=timezone.utc)
        rest = expr[m.end():]
    if anchor.tzinfo is None:
        anchor = anchor.replace(tzinfo=timezone.utc)
    dt = anchor
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise DateMathError(f"bad date math at {rest[pos:]!r}")
        if m.group(2):  # /UNIT
            unit = _UNIT_ALIASES.get(m.group(2))
            if unit is None:
                raise DateMathError(f"unknown unit {m.group(2)}")
            dt = _round_down(dt, unit)
        else:
            unit = _UNIT_ALIASES.get(m.group(5))
            if unit is None:
                raise DateMathError(f"unknown unit {m.group(5)}")
            n = int(m.group(4)) * (1 if m.group(3) == "+" else -1)
            dt = _add(dt, n, unit)
        pos = m.end()
    return dt
