"""Tracing / profiling hooks (the reference has wall-clock timers only,
utils.hpp:168-198; this framework adds per-stage timing + JAX device traces).

Usage:
    with Trace("encode") as t:
        with t.stage("transform"):
            ...
        with t.stage("pack"):
            ...
    t.report()   # per-stage ms + throughput, via Logger

    with device_trace("/tmp/jax-trace"):   # XLA-level profile for xprof
        run()
"""

from __future__ import annotations

import contextlib
import time

from .logger import Logger


class Trace:
    def __init__(self, name: str, pixels: int | None = None):
        self.name = name
        self.pixels = pixels
        self.stages: list[tuple[str, float]] = []
        self._t0 = None
        self.total = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total = time.perf_counter() - self._t0
        return False

    @contextlib.contextmanager
    def stage(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((label, time.perf_counter() - t0))

    def report(self) -> None:
        for label, dt in self.stages:
            Logger.write(f"[trace:{self.name}] {label}: {dt * 1e3:.2f} ms")
        if self.total:
            msg = f"[trace:{self.name}] total: {self.total * 1e3:.2f} ms"
            if self.pixels:
                msg += f" ({self.pixels / self.total / 1e6:.1f} Mpix/s)"
            Logger.write(msg)


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA device trace via the JAX profiler (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
