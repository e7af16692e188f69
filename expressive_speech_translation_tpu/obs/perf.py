"""Performance counters: per-stage wall/RSS accounting, RTF/xRT, profiler hooks.

The reference approximates this with a ``performance_logger`` decorator
(services/utils.py:54-81) and ad-hoc phase timestamps. Here RTF (real-time
factor: processing_seconds / audio_seconds) and per-stage xRT are first-class —
they are the benchmark metric (BASELINE.md) — and ``jax.profiler`` trace capture
is one context-manager away.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import psutil

log = logging.getLogger(__name__)


def rtf(processing_seconds: float, audio_seconds: float) -> float:
    """Real-time factor; <1 means faster than real time."""
    if audio_seconds <= 0:
        return float("inf")
    return processing_seconds / audio_seconds


@dataclass
class StageTimer:
    """Accumulates per-stage wall time for one request; computes xRT per stage.

    Usage::

        timer = StageTimer(audio_seconds=12.3)
        with timer.stage("asr"):
            ...
        timer.summary()  # {"asr": {"seconds": ..., "xrt": ...}, "total": {...}}

    Stages time device work correctly only if the caller blocks on results
    inside the ``with`` (use ``jax.block_until_ready`` at stage boundaries).
    """

    audio_seconds: float = 0.0
    stages: Dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.perf_counter)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - start

    def total_seconds(self) -> float:
        return time.perf_counter() - self._t0

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for name, seconds in self.stages.items():
            out[name] = {"seconds": seconds, "xrt": rtf(seconds, self.audio_seconds)}
        total = self.total_seconds()
        out["total"] = {"seconds": total, "xrt": rtf(total, self.audio_seconds)}
        return out


def performance_logger(func):
    """Wall-time + RSS-delta logging decorator (parity: services/utils.py:54-81)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        process = psutil.Process()
        rss_before = process.memory_info().rss
        start = time.perf_counter()
        try:
            return func(*args, **kwargs)
        finally:
            elapsed = time.perf_counter() - start
            rss_delta = process.memory_info().rss - rss_before
            log.info(
                "%s took %.3fs (RSS delta %+.1f MB)",
                func.__qualname__, elapsed, rss_delta / 1e6,
            )

    return wrapper


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
