"""Global stats registry + RAII-style scope timers.

Counterpart of the reference's `Stats`/`Timer`/`MaxTimer` (Core/Core.h:64-122,
accumulation in Core/Core.cpp:63-80): timers accumulate measurements into a
string-keyed board, `flush_timers()` folds them into per-frame stats, and
`MaxTimer` additionally tracks the running max per key.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Union

StatValue = Union[int, float, str]


class Stats:
    """String-keyed stat board (≙ Stats::AddStat/GetStats, Core/Core.h:64-92)."""

    _lock = threading.Lock()
    _stats: Dict[str, StatValue] = {}
    _pending: Dict[str, float] = {}       # timer accumulations awaiting flush
    _max: Dict[str, float] = {}           # running max per MaxTimer key

    @classmethod
    def add_stat(cls, name: str, value: StatValue) -> None:
        with cls._lock:
            cls._stats[name] = value

    @classmethod
    def add_measurement(cls, name: str, seconds: float) -> None:
        with cls._lock:
            cls._pending[name] = cls._pending.get(name, 0.0) + seconds

    @classmethod
    def add_max_measurement(cls, name: str, seconds: float) -> None:
        with cls._lock:
            cls._pending[name] = cls._pending.get(name, 0.0) + seconds
            prev = cls._max.get(name, 0.0)
            if seconds > prev:
                cls._max[name] = seconds
                cls._stats[f"Max: {name}"] = f"{seconds * 1e3:.2f} ms"

    @classmethod
    def flush_timers(cls) -> None:
        """Fold pending timer accumulations into the stat board
        (≙ Stats::FlushTimers called once per frame, Application.cpp:343)."""
        with cls._lock:
            for name, seconds in cls._pending.items():
                cls._stats[name] = f"{seconds * 1e3:.2f} ms"
            cls._pending.clear()

    @classmethod
    def reset_max(cls) -> None:
        with cls._lock:
            cls._max.clear()

    @classmethod
    def get_stats(cls) -> Dict[str, StatValue]:
        with cls._lock:
            return dict(cls._stats)

    @classmethod
    def clear(cls) -> None:
        with cls._lock:
            cls._stats.clear()
            cls._pending.clear()
            cls._max.clear()


class Timer:
    """Context-manager scope timer accumulating into Stats
    (≙ Timer dtor, Core/Core.cpp:63-70)."""

    def __init__(self, name: str):
        self.name = name
        self._start = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        Stats.add_measurement(self.name, time.perf_counter() - self._start)


class MaxTimer(Timer):
    """Scope timer that also tracks the per-name running max
    (≙ MaxTimer dtor, Core/Core.cpp:72-80)."""

    def __exit__(self, *exc) -> None:
        Stats.add_max_measurement(self.name, time.perf_counter() - self._start)
