"""Tracing: CPU/device section timers with a real collector.

The reference carries PUSH_CPU_SECTION markers that are compiled-out no-ops
and GL debug groups for external profilers (/root/reference/src/viamd.h:
54-59; POSTPROCESS_ENABLE_TIMING at postprocessing_utils.cpp:39-53; script
wall-time logging at main.cpp:70,987-996). Here the markers collect:
nested sections accumulate wall time + call counts into a global profile,
and `section(..., device=True)` blocks on outstanding device work so the
span covers the dispatched computation.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class SectionStats:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float):
        self.calls += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)


class Tracer:
    def __init__(self):
        self._stats: dict[str, SectionStats] = defaultdict(SectionStats)
        self._local = threading.local()
        self.enabled = True

    def _stack(self) -> list:
        if not hasattr(self._local, "stack"):
            self._local.stack = []
        return self._local.stack

    @contextmanager
    def section(self, name: str, device: bool = False):
        """Timed scope; nested names join with '/'."""
        if not self.enabled:
            yield
            return
        stack = self._stack()
        stack.append(name)
        key = "/".join(stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if device:
                try:
                    import jax

                    # fence: make the span cover dispatched device work
                    jax.block_until_ready(
                        jax.device_put(0.0)
                    )
                except Exception:
                    pass
            self._stats[key].add(time.perf_counter() - t0)
            stack.pop()

    def stats(self) -> dict[str, SectionStats]:
        return dict(self._stats)

    def reset(self):
        self._stats.clear()

    def report(self) -> str:
        lines = ["section                                     calls    total      max"]
        for key in sorted(self._stats):
            s = self._stats[key]
            lines.append(
                f"{key:<42s} {s.calls:6d} {s.total_s * 1e3:8.2f}ms "
                f"{s.max_s * 1e3:8.2f}ms"
            )
        return "\n".join(lines)


TRACER = Tracer()
section = TRACER.section
