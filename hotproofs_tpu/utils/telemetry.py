"""Structured tracing, metrics and profiler hooks (SURVEY.md §5).

The reference has no observability beyond `println!` timestamps around
`prove_step` (rust_fold/src/main.rs:173-178).  Production proving needs
three things the prints cannot give:

  * **structured counters/timers** — machine-readable per-phase numbers
    (folds, MSM launches, host-transcript time, bytes moved) that a fleet
    scheduler or dashboard can scrape;
  * **device-timeline annotation** — spans that show up in the TPU/XLA
    profiler trace viewer so host phases can be correlated with device
    kernels (`jax.profiler.TraceAnnotation`);
  * **on-demand capture** — start/stop a real profiler trace around a
    window of interest without restarting the prover.

Everything here is dependency-free, thread-safe, and ~free when disabled:
`span()` costs two `time.perf_counter()` calls and a dict update.

Usage:
    from hotproofs_tpu.utils import telemetry as T
    with T.span("ivc/fold_chunk", steps=16):
        ...
    T.count("ivc/folds", 16)
    print(T.metrics.report())        # or .snapshot() for the raw dict
    T.start_trace("/tmp/prof")       # jax.profiler capture on demand
    ...
    T.stop_trace()
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional


@dataclass
class _Timer:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        if dt > self.max_s:
            self.max_s = dt


@dataclass
class Metrics:
    """Process-wide registry of named counters and span timers."""

    counters: Dict[str, float] = field(default_factory=dict)
    timers: Dict[str, _Timer] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    def count(self, name: str, n: float = 1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + n

    def observe(self, name: str, dt: float) -> None:
        with self._lock:
            self.timers.setdefault(name, _Timer()).add(dt)

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "timers": {k: {"calls": t.calls,
                               "total_s": round(t.total_s, 6),
                               "mean_s": round(t.total_s / t.calls, 6),
                               "max_s": round(t.max_s, 6)}
                           for k, t in self.timers.items()},
            }

    def report(self) -> str:
        return json.dumps(self.snapshot(), indent=2, sort_keys=True)

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timers.clear()


metrics = Metrics()
count = metrics.count


@contextlib.contextmanager
def span(name: str, **attrs: Any) -> Iterator[None]:
    """Time a phase AND annotate the device profiler timeline.

    The TraceAnnotation makes the span visible in a captured XLA profile
    (trace viewer row per host thread), so 'host transcript hashing' can be
    lined up against the device's MSM kernels when hunting pipeline
    bubbles.  Falls back silently when jax isn't importable (pure-host
    tools)."""
    t0 = time.perf_counter()
    ann = None
    try:
        import jax.profiler
        ann = jax.profiler.TraceAnnotation(name, **attrs)
        ann.__enter__()
    except Exception:
        ann = None
    try:
        yield
    finally:
        if ann is not None:
            ann.__exit__(None, None, None)
        metrics.observe(name, time.perf_counter() - t0)


_trace_lock = threading.Lock()
_trace_dir: Optional[str] = None


def start_trace(log_dir: str) -> None:
    """Start an on-demand jax.profiler capture (device + host timeline).

    View with `tensorboard --logdir` or xprof.  Safe to call when a trace
    is already running (no-op)."""
    global _trace_dir
    import jax.profiler
    with _trace_lock:
        if _trace_dir is None:
            jax.profiler.start_trace(log_dir)
            _trace_dir = log_dir


def stop_trace() -> Optional[str]:
    """Stop the running capture; returns its log dir (None if not running)."""
    global _trace_dir
    import jax.profiler
    with _trace_lock:
        d, _trace_dir = _trace_dir, None
        if d is not None:
            jax.profiler.stop_trace()
        return d
