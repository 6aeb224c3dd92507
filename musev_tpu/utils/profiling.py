"""Tracing and per-phase timing.

The reference has no built-in profiling (SURVEY §5); this provides the
TPU-native replacement: ``jax.profiler`` trace capture around any phase plus
lightweight wall-clock phase timers that respect async dispatch (explicit
block_until_ready at phase edges).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


class PhaseTimers:
    """Accumulating named wall-clock timers.

    Usage:
        timers = PhaseTimers()
        with timers.phase("denoise", block_on=latents):
            latents = run(...)
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name}: {total:.3f}s / {self.counts[name]} calls"
            for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(
            {k: {"seconds": v, "calls": self.counts[k]} for k, v in self.totals.items()}
        )


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", log_dir)
