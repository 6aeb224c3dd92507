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
