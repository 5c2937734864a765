"""Tracing / metrics / observability.

Capability reference: the reference's optional `tracing` integration
(util/tracing_wrappers.rs:8-26 swaps real spans for no-op macros so hot
paths carry zero cost when disabled; the CLI enables an EnvFilter'd
subscriber, jxl_cli/src/main.rs:99-106). Here:

- `span(name)` / `@instrument` record wall-clock per stage into a global
  registry when tracing is enabled, and are no-ops otherwise.
- enable via `JXL_TPU_TRACE=1` (env) or `enable()`.
- `metrics` carries counters (megapixels decoded, sections, device calls).
- `device_trace(dir)` wraps the JAX profiler for TPU timeline capture.
- `report()` renders per-stage totals + MP/s.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from collections import defaultdict

_enabled = os.environ.get("JXL_TPU_TRACE", "0") not in ("", "0")

_times: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


class _Metrics:
    """Counter registry (decode MP, sections, device dispatches)."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)

    def add(self, name: str, value: float = 1.0) -> None:
        if _enabled:
            self.counters[name] += value

    def get(self, name: str) -> float:
        return self.counters.get(name, 0.0)

    def reset(self) -> None:
        self.counters.clear()


metrics = _Metrics()


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


def reset() -> None:
    _times.clear()
    _counts.clear()
    metrics.reset()


@contextlib.contextmanager
def span(name: str):
    """Timed span; ~free when tracing is off."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times[name] += time.perf_counter() - t0
        _counts[name] += 1


def instrument(fn=None, *, name: str | None = None):
    """Decorator form of span (the reference's #[instrument] analog)."""

    def deco(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def wrapper(*a, **kw):
            if not _enabled:
                return f(*a, **kw)
            t0 = time.perf_counter()
            try:
                return f(*a, **kw)
            finally:
                _times[label] += time.perf_counter() - t0
                _counts[label] += 1

        return wrapper

    return deco(fn) if fn is not None else deco


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace (TensorBoard format) around a block."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def report() -> str:
    """Per-stage wall-clock table + derived MP/s."""
    lines = ["stage                                   calls   total_s    avg_ms"]
    for name in sorted(_times, key=lambda n: -_times[n]):
        t, c = _times[name], _counts[name]
        lines.append(f"{name:<40}{c:>5}{t:>10.3f}{t / c * 1e3:>10.2f}")
    mp = metrics.get("megapixels_decoded")
    total = metrics.get("decode_seconds")
    if mp and total:
        lines.append(f"decode throughput: {mp / total:.3f} MP/s ({mp:.2f} MP in {total:.3f}s)")
    for k, v in sorted(metrics.counters.items()):
        if k not in ("megapixels_decoded", "decode_seconds"):
            lines.append(f"counter {k}: {v:g}")
    return "\n".join(lines)
