"""Microsecond timing helpers (reference ``utils::TimingGuard``,
``src/utils/utils.h:54-68``)."""

from __future__ import annotations

import time


def now_us() -> int:
    return time.perf_counter_ns() // 1000


class TimingGuard:
    """Context manager measuring elapsed microseconds into ``self.us``;
    optionally accumulates into a callable sink."""

    def __init__(self, sink=None):
        self._sink = sink
        self.us = 0

    def __enter__(self):
        self._start = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        self.us = (time.perf_counter_ns() - self._start) // 1000
        if self._sink is not None:
            self._sink(self.us)
        return False
