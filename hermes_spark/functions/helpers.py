"""Driver-side helper utilities.

Behavior mirrors ``utils/.../HelperFunctions.scala:160-230`` (SURVEY.md
§2.12): block timing, human-readable elapsed time, ``{key}`` template
substitution, English ordinal suffixes.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, TypeVar

T = TypeVar("T")

_MS_PER_SECOND = 1000
_MS_PER_MINUTE = _MS_PER_SECOND * 60
_MS_PER_HOUR = _MS_PER_MINUTE * 60
_MS_PER_DAY = _MS_PER_HOUR * 24


def calculate_time(process: Callable[[], T]) -> tuple[int, T]:
    """Run ``process``; return ``(elapsed_milliseconds, return_value)``."""
    start = time.perf_counter_ns()
    value = process()
    elapsed_ms = (time.perf_counter_ns() - start) // 1_000_000
    return elapsed_ms, value


@contextmanager
def timed():
    """Context-manager timing: ``with timed() as t: ...; t.elapsed_ms``."""

    class _Timer:
        elapsed_ms = 0

    timer = _Timer()
    start = time.perf_counter_ns()
    try:
        yield timer
    finally:
        timer.elapsed_ms = (time.perf_counter_ns() - start) // 1_000_000


def pretty_print_elapsed_time(elapsed_ms: int) -> str:
    """``91441000`` → ``"1 day, 1 hour, 24 minutes and 1.00 second"``.

    Seconds show two decimals; a segment is singular exactly when its
    count equals one unit (so ``1.00 second`` but ``1.50 seconds``).
    """

    def stringify(count: int, noun: str, factor: int = 1) -> str | None:
        if count == 0:
            return None
        text = f"{count}" if factor == 1 else f"{count / factor:.2f}"
        plural = "" if count == factor else "s"
        return f"{text} {noun}{plural}"

    days, rem = divmod(elapsed_ms, _MS_PER_DAY)
    hours, rem = divmod(rem, _MS_PER_HOUR)
    minutes, milliseconds = divmod(rem, _MS_PER_MINUTE)

    segments = [
        s
        for s in (
            stringify(days, "day"),
            stringify(hours, "hour"),
            stringify(minutes, "minute"),
            stringify(milliseconds, "second", _MS_PER_SECOND),
        )
        if s is not None
    ]
    if not segments:
        return "0 seconds"
    if len(segments) == 1:
        return segments[0]
    return ", ".join(segments[:-1]) + " and " + segments[-1]


def rich_format(string: str, replacement: dict[str, str]) -> str:
    """Substitute ``{key}`` placeholders from ``replacement``."""
    for key, value in replacement.items():
        string = string.replace(f"{{{key}}}", value)
    return string


def append_ordinal_suffix(num: int) -> str:
    """``1 → 1st, 2 → 2nd, 3 → 3rd, 11 → 11th, 21 → 21st``."""
    suffixes = ["th", "st", "nd", "rd", "th"]
    if num % 100 in (11, 12, 13):
        return f"{num}th"
    return f"{num}{suffixes[min(num % 10, len(suffixes) - 1)]}"
