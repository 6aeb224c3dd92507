"""Parameter/activation sharding rules over a (dp, tp) mesh.

The reference has no distributed execution; here the window/CFG batch shards
over ``dp`` and parameter matrices shard over ``tp`` (last/output dim of
linear kernels, output-channel dim of conv kernels — the Megatron-style
column split; XLA's sharding propagation inserts the all-gathers/reduces).
ZeRO-style weight sharding falls out of the same rule when activations stay
replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """device_put the param pytree with kernels split over ``axis``.

    2-D kernels split the output dim; 4-D conv kernels split output channels;
    1-D (bias/scale) and small leaves stay replicated. Dims that don't divide
    the mesh axis stay replicated.
    """
    size = mesh.shape[axis]

    def spec_for(leaf):
        if leaf.ndim == 2 and leaf.shape[1] % size == 0:
            return P(None, axis)
        if leaf.ndim == 4 and leaf.shape[3] % size == 0:
            return P(None, None, None, axis)
        return P()

    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(leaf))),
        params,
    )


def shard_batch(x, mesh: Mesh, axis: str = "dp"):
    return jax.device_put(
        x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    )
