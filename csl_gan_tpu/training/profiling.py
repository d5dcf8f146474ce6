"""Training-profile section summary.

The reference prints a torch.profiler key-averages table when its trace is
ready (reference train.py:139-148) alongside the chrome trace file. The
TPU equivalent writes a jax.profiler xplane trace (loop.py) — which needs
TensorBoard to inspect — so, for at-a-glance parity, the Trainer also
brackets its host-visible phases with wall-clock timers and prints this
summary table when training ends under ``-p``.

Timed sections force device execution (jax.device_get on a result) so the
numbers reflect compute, not async dispatch — this perturbs pipelining,
which is why it only runs under the profiling flag.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class SectionTimer:
    def __init__(self):
        self.totals = {}
        self.counts = {}
        self._t0 = time.perf_counter()

    @contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        wall = time.perf_counter() - self._t0
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        name_w = max([len("section")] + [len(n) for n, _ in rows])
        lines = [
            "=== Training profile (per-section wall-clock) ===",
            f"{'section':<{name_w}}  {'count':>7}  {'total s':>9}  "
            f"{'mean ms':>9}  {'% wall':>6}",
        ]
        for name, tot in rows:
            c = self.counts[name]
            lines.append(f"{name:<{name_w}}  {c:>7}  {tot:>9.3f}  "
                         f"{tot / c * 1e3:>9.2f}  {100 * tot / wall:>5.1f}%")
        lines.append(f"{'(total wall)':<{name_w}}  {'':>7}  {wall:>9.3f}")
        return "\n".join(lines)
