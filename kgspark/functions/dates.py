"""Deterministic temporal-expression resolver (SURVEY E3; reference
utils/maintenance/temporal_operations.py:33-71 + edge_operations.py:167-181
ISO-8601 Z-fixup). Pure Python — called from inside the extraction
pandas UDF, vectorized over Arrow batches.

Rules (EXTRACTION SPEC v1, frozen — goldens assert exact outputs):
- "from <D1> to <D2>" / "from <D1> - <D2>"  → (valid_at=D1, invalid_at=D2)
- "since <D>" / "starting <D>"               → (valid_at=D, None)
- "until <D>"                                → (None, invalid_at=D)
- "on <D>"                                   → (valid_at=D, None)
- "in <Month YYYY>" / "in <YYYY>"            → (valid_at=first-of-period, None)
- "last year" → ref-365d; "last month" → ref-30d; "yesterday" → ref-1d;
  "today"/"currently"/"now" → ref
- no explicit temporal info: present-tense fact → valid_at=ref (the
  reference's "ongoing fact ⇒ valid_at = reference time",
  prompts/extract_edge_dates.py:67-74); past-tense → (None, None).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

MONTHS = {m.lower(): i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}

_MONTH_RE = "|".join(MONTHS)
# "January 3, 2011" | "3 January 2011" | "2011-01-03" | "January 2011"
_DATE_PATTERNS = [
    re.compile(rf"\b(?P<mon>{_MONTH_RE})\s+(?P<day>\d{{1,2}}),?\s+(?P<year>\d{{4}})", re.I),
    re.compile(rf"\b(?P<day>\d{{1,2}})\s+(?P<mon>{_MONTH_RE})\s+(?P<year>\d{{4}})", re.I),
    re.compile(r"\b(?P<year>\d{4})-(?P<monnum>\d{2})-(?P<day>\d{2})"),
    re.compile(rf"\b(?P<mon>{_MONTH_RE})\s+(?P<year>\d{{4}})", re.I),
]


def parse_date(s: str) -> datetime | None:
    """First date expression in s, or None. Z-suffix ISO handled
    (reference edge_operations.py:167-181 replaces 'Z' with '+00:00')."""
    s = s.replace("Z", "")
    for pat in _DATE_PATTERNS:
        m = pat.search(s)
        if not m:
            continue
        g = m.groupdict()
        year = int(g["year"])
        month = MONTHS[g["mon"].lower()] if g.get("mon") else int(g.get("monnum") or 1)
        day = int(g.get("day") or 1)
        try:
            return datetime(year, month, day)
        except ValueError:
            return None
    return None


_RANGE = re.compile(
    rf"from\s+(?P<a>[^.;]*?\d{{4}})\s*(?:to|through|-|–)\s+(?P<b>[^.;]*?\d{{4}})", re.I)
_SINCE = re.compile(r"\b(?:since|starting)\s+(?P<a>[^.;]*?\d{4})", re.I)
_UNTIL = re.compile(r"\buntil\s+(?P<a>[^.;]*?\d{4})", re.I)
_ON = re.compile(rf"\bon\s+(?P<a>(?:{_MONTH_RE})[^.;]*?\d{{4}}|\d{{4}}-\d{{2}}-\d{{2}})", re.I)
_IN = re.compile(rf"\bin\s+(?P<a>(?:{_MONTH_RE})\s+\d{{4}}|\d{{4}})\b", re.I)


def resolve_dates(sentence: str, ref: datetime, present_tense: bool,
                  ) -> tuple[datetime | None, datetime | None]:
    s = sentence
    low = s.lower()
    m = _RANGE.search(s)
    if m:
        return parse_date(m.group("a")), parse_date(m.group("b"))
    m = _SINCE.search(s)
    if m:
        return parse_date(m.group("a")), None
    m = _UNTIL.search(s)
    if m:
        return (ref if present_tense else None), parse_date(m.group("a"))
    m = _ON.search(s)
    if m:
        d = parse_date(m.group("a"))
        if d:
            return d, None
    m = _IN.search(s)
    if m:
        a = m.group("a")
        d = parse_date(a) if not a.isdigit() else datetime(int(a), 1, 1)
        if d:
            return d, None
    if "last year" in low:
        return ref - timedelta(days=365), None
    if "last month" in low:
        return ref - timedelta(days=30), None
    if "yesterday" in low:
        return ref - timedelta(days=1), None
    if "today" in low or "currently" in low or " now" in low:
        return ref, None
    return (ref if present_tense else None), None
