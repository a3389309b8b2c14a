"""Timing and metrics utilities.

The reference's instrumentation (SURVEY.md §5): per-phase wall-clock spans
printed per substep (MLSMPM3DFluidMultithread.cs:185-219) and a debug overlay
with frame-time min/avg/max/last over a 150-frame window
(addons/debug_menu/debug_menu.gd:27,299-348). Headless equivalents here.

IMPORTANT honest-timing note: on some platforms (axon-tunneled TPU)
`block_until_ready` can return before the computation chain has finished, so
all timing fences here force a device->host transfer of the result.
"""

from __future__ import annotations

import collections
import time
from typing import Callable

import numpy as np
import jax


def fence(pytree) -> None:
    """Force completion by pulling one leaf to host memory."""
    leaves = jax.tree_util.tree_leaves(pytree)
    if leaves:
        np.asarray(leaves[0])


def time_fn(fn: Callable, *args, iters: int = 100, warmup: int = 3):
    """Time `fn(*args) -> result` chained on its own output's first arg if
    signatures match; otherwise re-invoked with the same args. Returns
    (seconds_per_iter, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        args = (out, *args[1:])
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args = (out, *args[1:])
    fence(out)
    dt = time.perf_counter() - t0
    return dt / iters, out


class FrameStats:
    """Rolling frame-time window: avg/min/max/last over `window` frames
    (the debug-menu overlay's 150-frame history, debug_menu.gd:27).

    Optionally tracks a device/host split per frame (the reference's separate
    CPU and GPU frame times, debug_menu.gd:132,383,403): callers report
    `split(dev_s, host_s)` where dev is fenced device compute and host is
    encode/IO wait; `stats` then carries dev_ms/host_ms averages."""

    def __init__(self, window: int = 150):
        self.times = collections.deque(maxlen=window)
        self.dev_times = collections.deque(maxlen=window)
        self.host_times = collections.deque(maxlen=window)
        self._last_t: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last_t is not None:
            self.times.append(now - self._last_t)
        self._last_t = now

    def split(self, dev_s: float, host_s: float) -> None:
        self.dev_times.append(dev_s)
        self.host_times.append(host_s)

    @property
    def stats(self) -> dict:
        if not self.times:
            return {"avg_ms": 0.0, "min_ms": 0.0, "max_ms": 0.0, "last_ms": 0.0,
                    "fps": 0.0, "dev_ms": 0.0, "host_ms": 0.0}
        arr = np.asarray(self.times)
        out = {
            "avg_ms": float(arr.mean() * 1e3),
            "min_ms": float(arr.min() * 1e3),
            "max_ms": float(arr.max() * 1e3),
            "last_ms": float(arr[-1] * 1e3),
            "fps": float(1.0 / arr.mean()),
            "dev_ms": 0.0,
            "host_ms": 0.0,
        }
        if self.dev_times:
            out["dev_ms"] = float(np.mean(self.dev_times) * 1e3)
            out["host_ms"] = float(np.mean(self.host_times) * 1e3)
        return out


class PhaseTimer:
    """Named phase spans, the MLSMPM3DFluidMultithread.cs:185-219 analogue.
    Use around *fenced* jitted calls; accumulates per-phase totals."""

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    def measure(self, name: str, fn: Callable, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name, tot in self.totals.items():
            n = max(self.counts[name], 1)
            lines.append(f"{name}: {tot / n * 1e3:.3f} ms/call x{n}")
        return "\n".join(lines)
