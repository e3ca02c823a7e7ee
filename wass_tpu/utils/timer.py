"""Named-event stage timer (cvlab::HiresTimer equivalent).

The reference instruments every stage with `timer << "Dense Stereo"`
events and renders a per-task seconds table at exit
(/root/reference/src/wass_lib/hires_timer.h:28-60,
/root/reference/src/wass_stereo/render.hpp:175-191).
"""

from __future__ import annotations

import time
from typing import List, Tuple


class StageTimer:
    def __init__(self):
        self.start_time = time.perf_counter()
        self._last = self.start_time
        self.events: List[Tuple[str, float]] = []

    def mark(self, name: str) -> float:
        """Record time elapsed since the previous mark under `name`."""
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.events.append((name, dt))
        return dt

    # The reference's `timer << "name"` idiom.
    def __lshift__(self, name: str) -> "StageTimer":
        self.mark(name)
        return self

    @property
    def total(self) -> float:
        return time.perf_counter() - self.start_time

    def table(self) -> str:
        """Per-task seconds table (render.hpp:175-191 format)."""
        width = max([len(n) for n, _ in self.events] + [10])
        lines = ["+" + "-" * (width + 2) + "+" + "-" * 12 + "+"]
        lines.append(f"| {'Task':<{width}} | {'Secs':>10} |")
        lines.append("+" + "-" * (width + 2) + "+" + "-" * 12 + "+")
        for name, dt in self.events:
            lines.append(f"| {name:<{width}} | {dt:>10.3f} |")
        lines.append("+" + "-" * (width + 2) + "+" + "-" * 12 + "+")
        lines.append(f"| {'Total':<{width}} | {self.total:>10.3f} |")
        lines.append("+" + "-" * (width + 2) + "+" + "-" * 12 + "+")
        return "\n".join(lines)
