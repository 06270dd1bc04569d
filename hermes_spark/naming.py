"""Small pure helpers: unique temp-column naming, timing, formatting.

Behavioral parity targets:
* ``generate_unique_column_name`` — ``DatasetComparator.scala:239-254``
  (``base`` if free, else ``base_0``, ``base_1``, ...).
* ``pretty_elapsed`` — ``utils/.../HelperFunctions.scala:181-211``
  ("1 day, 1 hour, 24 minutes and 1.00 second").
* ``rich_format`` — ``HelperFunctions.scala:218-219``.
* ``ordinal`` — ``HelperFunctions.scala:222-230`` (1st/2nd/3rd/11th).
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Mapping
from contextlib import contextmanager


def generate_unique_column_name(columns: Iterable[str], base: str = "tmp") -> str:
    existing = set(columns)
    if base not in existing:
        return base
    i = 0
    while f"{base}_{i}" in existing:
        i += 1
    return f"{base}_{i}"


@contextmanager
def calculate_time():
    """Context manager yielding a dict that receives ``elapsed_ms`` on exit."""
    out: dict[str, float] = {}
    start = time.perf_counter()
    try:
        yield out
    finally:
        out["elapsed_ms"] = (time.perf_counter() - start) * 1000.0


def pretty_elapsed(elapsed_ms: int) -> str:
    ms_per_second = 1000
    ms_per_minute = ms_per_second * 60
    ms_per_hour = ms_per_minute * 60
    ms_per_day = ms_per_hour * 24

    days, rem = divmod(int(elapsed_ms), ms_per_day)
    hours, rem = divmod(rem, ms_per_hour)
    minutes, millis = divmod(rem, ms_per_minute)

    def stringify(count: int, noun: str, factor: int = 1) -> str | None:
        if count == 0:
            return None
        text = str(count) if factor == 1 else f"{count / factor:.2f}"
        plural = "" if count == factor else "s"
        return f"{text} {noun}{plural}"

    segments = [
        s
        for s in (
            stringify(days, "day"),
            stringify(hours, "hour"),
            stringify(minutes, "minute"),
            stringify(millis, "second", ms_per_second),
        )
        if s is not None
    ]
    if not segments:
        return "0 seconds"
    if len(segments) == 1:
        return segments[0]
    return ", ".join(segments[:-1]) + " and " + segments[-1]


def rich_format(template: str, replacements: Mapping[str, str]) -> str:
    for key, value in replacements.items():
        template = template.replace(f"{{{key}}}", value)
    return template


def ordinal(num: int) -> str:
    if num % 100 in (11, 12, 13):
        return f"{num}th"
    suffixes = ["th", "st", "nd", "rd", "th"]
    return f"{num}{suffixes[min(num % 10, len(suffixes) - 1)]}"
