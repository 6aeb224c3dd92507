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


def device_status() -> list:
    """Per-device memory/utilization snapshot — the TPU counterpart of mmcm
    ``get_gpu_status`` (imported by the reference at
    temporal_transformer.py:35 for debug logging; SURVEY §2.9).

    Returns a list of dicts (one per local device) with whatever the
    platform exposes: HBM ``bytes_in_use``/``bytes_limit`` on TPU, process
    memory on CPU backends (which report no memory_stats).
    """
    out = []
    for d in jax.local_devices():
        entry = {
            "id": d.id,
            "platform": d.platform,
            "device_kind": d.device_kind,
        }
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:  # CPU/older backends: not implemented
            stats = None
        if stats:
            entry["bytes_in_use"] = int(stats.get("bytes_in_use", 0))
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit"
            )
            if limit:
                entry["bytes_limit"] = int(limit)
                entry["utilization"] = entry["bytes_in_use"] / int(limit)
        out.append(entry)
    return out


def log_device_status(prefix: str = "") -> None:
    for e in device_status():
        if "bytes_in_use" in e:
            used = e["bytes_in_use"] / 2**30
            lim = e.get("bytes_limit", 0) / 2**30
            logger.info(
                "%sdevice %d (%s): %.2f/%.2f GiB HBM in use",
                prefix, e["id"], e["device_kind"], used, lim,
            )
        else:
            logger.info(
                "%sdevice %d (%s): no memory stats", prefix, e["id"],
                e["device_kind"],
            )
