"""Tracing / profiling hooks (the reference has wall-clock timers only,
utils.hpp:168-198; this framework adds per-stage timing + JAX device traces).

Usage:
    with Trace("encode") as t:
        with t.stage("transform"):
            ...
        with t.stage("pack"):
            ...
    t.report()   # per-stage ms + throughput, via Logger

Ambient usage (how the CLI's --trace works): library stages mark
themselves with the module-level ``stage()`` context manager, which is a
no-op unless a ``tracing()`` scope is active — zero overhead on untraced
runs, and the codec internals need no plumbing of trace objects:

    with tracing("decode", pixels=w * h) as t:
        decode_image(data)          # its internal stage() calls report to t
    t.report()

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


_CURRENT: Trace | None = None


def current() -> Trace | None:
    """The innermost active tracing() scope, or None."""
    return _CURRENT


@contextlib.contextmanager
def tracing(name: str, pixels: int | None = None):
    """Activate a Trace as the ambient collector for nested stage() marks."""
    global _CURRENT
    t = Trace(name, pixels)
    prev = _CURRENT
    _CURRENT = t
    try:
        with t:
            yield t
    finally:
        _CURRENT = prev


@contextlib.contextmanager
def stage(label: str):
    """Mark a library stage; records into the ambient trace if one is
    active, else free (a single global read)."""
    t = _CURRENT
    if t is None:
        yield
    else:
        with t.stage(label):
            yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA device trace via the JAX profiler (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
