"""Device-mesh construction and sharding helpers.

The reference has no distributed execution (SURVEY §2.10); here the VCPD
window batch maps onto a ``dp`` mesh axis and (optionally) attention heads /
channels onto ``tp``. All collectives are XLA-inserted via shardings — no
explicit communication code in the model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices. Default: 1-D ``dp`` mesh over all."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard the leading axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cli_topology(topology: str):
    """CLI helper: ``none``/``fp``/``dp`` -> (mesh context manager, pipeline
    kwargs). ``fp`` shards every (window, cfg, frame) row of the denoise
    (parallel/frame_parallel.py — the flagship multi-chip topology); ``dp``
    shards the window x CFG batch. Falls back to no mesh on one device."""
    import contextlib

    if topology not in ("none", "fp", "dp"):
        raise ValueError(f"unknown parallel topology {topology!r}")
    devices = jax.devices()
    if topology == "none" or len(devices) < 2:
        return contextlib.nullcontext(), {}
    axis = topology
    mesh = make_mesh((len(devices),), (axis,))
    return jax.set_mesh(mesh), {f"{axis}_axis": axis, "mesh": mesh}
