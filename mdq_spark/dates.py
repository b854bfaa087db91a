"""Date parsing/rendering with the reference's coercion rules.

Mirrors /root/reference/src/date.rs: a date is an i64 of epoch seconds;
accepted inputs are RFC3339 strings, ``%Y-%m-%dT%T%z`` strings, or raw
integers (date.rs:36-49); the *indexed* form is the RFC3339 rendering of
the epoch (date.rs:23-34).  The reference renders in the machine-local
timezone — a documented nondeterminism (SURVEY.md §2.3 T5); this engine
pins UTC so index contents are reproducible across a cluster.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone, timedelta
from typing import Optional

_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})"
    r"(?:\.(\d+))?"
    r"(Z|z|[+-]\d{2}:?\d{2})$"
)


def parse_date(value) -> Optional[int]:
    """Parse a frontmatter date value to epoch seconds (or None).

    Order matches date.rs:40-48: RFC3339, then ``%Y-%m-%dT%T%z`` (the
    regex above accepts both: RFC3339 requires the colon in the offset,
    the chrono fallback accepts it without), then a raw integer.
    """
    if value is None:
        return None
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        return int(value)
    s = str(value).strip()
    m = _RFC3339.match(s)
    if m:
        y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
        off = m.group(8)
        if off in ("Z", "z"):
            tz = timezone.utc
        else:
            sign = 1 if off[0] == "+" else -1
            off = off[1:].replace(":", "")
            tz = timezone(sign * timedelta(hours=int(off[:2]),
                                           minutes=int(off[2:])))
        try:
            dt = datetime(y, mo, d, h, mi, sec, tzinfo=tz)
        except ValueError:
            return None
        return int(dt.timestamp())
    try:
        return int(s)
    except ValueError:
        return None


def render_rfc3339(epoch) -> str:
    """RFC3339 rendering of epoch seconds, pinned to UTC.

    This string is what gets indexed under the ``D`` prefix
    (reference src/document.rs:172, src/date.rs:23-34).
    """
    if epoch is None:
        epoch = 0
    dt = datetime.fromtimestamp(int(epoch), tz=timezone.utc)
    return dt.isoformat()
