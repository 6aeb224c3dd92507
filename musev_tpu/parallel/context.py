"""Trace-time sharding context.

Pallas custom calls cannot be auto-partitioned by XLA SPMD; when a mesh axis
is active the attention dispatch must stay on the XLA path (which partitions
cleanly over batch and head dims) or route through the explicit shard_map
ring-attention path (``sp``). The flags here are read at trace time only —
each ``DenoiseSpec`` is a separate static jit key, so a cached executable
can never observe a stale value.
"""

from __future__ import annotations

import contextlib
from typing import Optional

_DP_AXIS: Optional[str] = None
_TP_AXIS: Optional[str] = None
_SP_AXIS: Optional[str] = None


def dp_axis() -> Optional[str]:
    return _DP_AXIS


def tp_axis() -> Optional[str]:
    return _TP_AXIS


def sp_axis() -> Optional[str]:
    return _SP_AXIS


def mesh_active() -> bool:
    return _DP_AXIS is not None or _TP_AXIS is not None or _SP_AXIS is not None


@contextlib.contextmanager
def sharding_ctx(
    dp: Optional[str] = None,
    tp: Optional[str] = None,
    sp: Optional[str] = None,
):
    global _DP_AXIS, _TP_AXIS, _SP_AXIS
    prev = (_DP_AXIS, _TP_AXIS, _SP_AXIS)
    _DP_AXIS, _TP_AXIS, _SP_AXIS = dp, tp, sp
    try:
        yield
    finally:
        _DP_AXIS, _TP_AXIS, _SP_AXIS = prev
