"""Tracing / profiling utilities.

The reference's observability is wall-clock brackets + rays/sec + stats
dicts + tqdm prints (SURVEY.md §5 "Tracing/profiling").  The TPU-native
equivalents here:

* ``Timer`` — the ``time.time()`` bracket with derived rays/sec.
* ``device_trace`` — a ``jax.profiler`` trace context producing a
  TensorBoard-loadable / Perfetto trace directory (replaces "no profiler,
  no flamegraphs").
* ``progress`` — tqdm if present, else the reference's percent-milestone
  prints (RL/Planets 2.ipynb cell 0 style).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterable, Iterator, Optional


class Timer:
    def __init__(self, name: str = "", rays: Optional[int] = None):
        self.name = name
        self.rays = rays
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0
        return False

    @property
    def rays_per_second(self) -> float:
        return (self.rays / self.elapsed
                if self.rays and self.elapsed > 0 else 0.0)

    def report(self) -> str:
        s = f"{self.name}: {self.elapsed:.3f}s"
        if self.rays:
            s += f" ({self.rays_per_second / 1e6:.2f} Mrays/s)"
        return s


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile (xplane/Perfetto) around a block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def progress(it: Iterable, total: Optional[int] = None,
             desc: str = "") -> Iterator:
    try:
        from tqdm import tqdm
        yield from tqdm(it, total=total, desc=desc)
        return
    except ImportError:                                 # pragma: no cover
        pass
    total = total or (len(it) if hasattr(it, "__len__") else None)
    milestones = list(range(0, 101, 10))
    for i, x in enumerate(it):
        if total:
            pct = (i + 1) / total * 100
            while milestones and pct >= milestones[0]:
                print(f"{desc}: {milestones.pop(0)}%", end="\r")
        yield x
