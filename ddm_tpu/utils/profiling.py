"""Throughput counters and profiler hooks.

The reference has no profiling at all (SURVEY §5.1 — tqdm's it/s display is
the entire story). The north-star metric is images/sec/chip, so this module
instruments it from day one:

  * :class:`Throughput` — windowed items/sec counter with per-chip
    normalisation.
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory when enabled.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax

__all__ = ["Throughput", "trace"]


class Throughput:
    """Tally of items processed per second (e.g. images/sec).

    ``update(n)`` after each step. ``rate`` is computed over the last
    ``window`` updates (insensitive to compile warmup); ``overall`` since the
    last reset; ``per_chip`` divides by the local device count. Call
    ``reset()`` right after the first blocking sync so ``overall`` excludes
    compile time.
    """

    def __init__(self, window: int = 50) -> None:
        self.window = window
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._items = 0
        self._events: deque = deque(maxlen=self.window + 1)
        self._events.append((self._t0, 0))

    def update(self, n: int) -> None:
        self._items += n
        self._events.append((time.perf_counter(), n))

    @property
    def overall(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0

    @property
    def rate(self) -> float:
        if len(self._events) < 2:
            return self.overall
        t_first = self._events[0][0]
        dt = self._events[-1][0] - t_first
        items = sum(n for _, n in list(self._events)[1:])
        return items / dt if dt > 0 else self.overall

    @property
    def per_chip(self) -> float:
        return self.rate / max(jax.local_device_count(), 1)


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a ``jax.profiler`` trace when ``logdir`` is set."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
