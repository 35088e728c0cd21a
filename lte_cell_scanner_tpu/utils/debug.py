"""Tracing and diagnostics: the reference's debug machinery, re-designed.

Behavioral contract (/root/reference/include/macros.h:22-72,
src/macros.cpp:23-25):

- ``ITPP_DEBUG_EXPORT(var)`` appends any variable to a global
  ``ITPP_DEBUG.it`` file in debug builds, so intermediates can be diffed
  against the MATLAB prototype offline -> here: a process-global
  :class:`DebugDump` that appends numpy arrays (device arrays are pulled
  to host) to an ``.it`` container, enabled by ``LTE_DEBUG_DUMP=<path>``
  or programmatically.
- ``MARK`` prints a reached-here file:line -> :func:`mark`.
- the commented Real_Timer tic/toc scaffolding around the hot loop
  (searcher.cpp:143,173) and the live ``searcher_cycle_time`` metric
  (searcher_thread.cpp:82-85,245) -> :class:`Timer`.
- the NaN-poisoning convention (every output pre-filled with NaN under
  ``#ifndef NDEBUG`` so uninitialized reads are visible,
  searcher.cpp:127-131) -> :func:`poison`, active when ``LTE_DEBUG=1``.
"""

from __future__ import annotations

import inspect
import os
import time
from typing import Optional

import numpy as np

from .itfile import _MAGIC, _pack_var

# 3-level verbosity global (reference common.h.in:35-38)
verbosity: int = 1


def set_verbosity(level: int) -> None:
    global verbosity
    verbosity = int(level)


def vprint(level: int, *args) -> None:
    """Print when the global verbosity is at least ``level``."""
    if verbosity >= level:
        print(*args)


def mark(msg: str = "") -> None:
    """Reached-here tracer (reference MARK, macros.h:22)."""
    fr = inspect.currentframe().f_back
    print(f"MARK {fr.f_code.co_filename}:{fr.f_lineno} {msg}".rstrip())


def poison(shape, dtype=np.float64) -> np.ndarray:
    """NaN-prefilled output buffer in debug mode, zeros otherwise
    (reference NaN-poisoning, searcher.cpp:127-131)."""
    if os.environ.get("LTE_DEBUG") == "1" \
            and np.issubdtype(np.dtype(dtype), np.inexact):
        return np.full(shape, np.nan, dtype=dtype)
    return np.zeros(shape, dtype=dtype)


class DebugDump:
    """Appends named arrays to an IT++ ``.it`` file for offline diffing.

    Repeated names get ``_1``, ``_2``, ... suffixes so every export
    survives (the reference's global it_file simply accumulates blocks).
    """

    def __init__(self, path: str):
        self.path = path
        self._names = set()
        if not os.path.exists(path) or os.path.getsize(path) < 5:
            with open(path, "wb") as f:
                f.write(_MAGIC + bytes([3]))
        else:
            # appending to an earlier run's dump: don't shadow its blocks
            from .itfile import read_itfile
            self._names = set(read_itfile(path))

    def export(self, name: str, arr) -> None:
        uname, n = name, 0
        while uname in self._names:
            n += 1
            uname = f"{name}_{n}"
        self._names.add(uname)
        with open(self.path, "ab") as f:
            f.write(_pack_var(uname, np.asarray(arr)))


_dump: Optional[DebugDump] = None


def get_dump() -> Optional[DebugDump]:
    """The process-global dump (reference ITPP_DEBUG global it_file),
    lazily created from ``LTE_DEBUG_DUMP`` if set."""
    global _dump
    if _dump is None:
        path = os.environ.get("LTE_DEBUG_DUMP")
        if path:
            _dump = DebugDump(path)
    return _dump


def set_dump(dump: Optional[DebugDump]) -> None:
    global _dump
    _dump = dump


def debug_export(name: str, arr) -> None:
    """Append to the global dump when one is active; no-op otherwise
    (reference ITPP_DEBUG_EXPORT semantics: zero cost in release)."""
    d = get_dump()
    if d is not None:
        d.export(name, arr)


_profile: Optional[dict] = None


def enable_profiling(on: bool = True) -> None:
    """Turn on the per-stage profiler (the reference only carried
    commented-out Real_Timer scaffolding, searcher.cpp:143,173)."""
    global _profile
    _profile = {} if on else None


class stage:
    """Context manager accumulating wall time per pipeline stage when
    profiling is enabled; zero-cost no-op otherwise."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if _profile is not None:
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _profile is not None:
            dt = time.perf_counter() - self._t0
            tot, n = _profile.get(self.name, (0.0, 0))
            _profile[self.name] = (tot + dt, n + 1)


def profile_report() -> str:
    if not _profile:
        return "(profiling not enabled or no stages recorded)"
    total = sum(t for t, _ in _profile.values())
    lines = [f"{'stage':<16s} {'total':>9s} {'calls':>6s} {'mean':>9s} "
             f"{'share':>6s}"]
    for name, (t, n) in sorted(_profile.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"{name:<16s} {t * 1e3:8.1f}ms {n:6d} "
                     f"{t / n * 1e3:8.2f}ms {t / total * 100:5.1f}%")
    return "\n".join(lines)


class Timer:
    """tic/toc stage timer; also usable as a context manager.

    ``timer.elapsed`` holds the last interval -- feeds the tracker's
    ``searcher_cycle_time`` dashboard metric.
    """

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def tic(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def toc(self) -> float:
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def __enter__(self) -> "Timer":
        return self.tic()

    def __exit__(self, *exc) -> None:
        self.toc()
