"""Fast host-side parameter initialization.

``init_*`` functions build params with jax.random, which is correct but slow
on remote-dispatch backends (every leaf becomes a device RPC). For benchmarks
and compile checks, ``fast_init`` materializes the same tree structure on the
host with one numpy RNG pass and transfers it in bulk.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def fast_init(init_fn: Callable, *args, seed: int = 0, scale: float = 0.02, **kw):
    """Evaluate ``init_fn``'s tree structure shape-only, then fill on host.

    Weight statistics are N(0, scale) for >=2-D leaves, zeros for biases,
    ones for norm scales — adequate for perf work and compile checks, not for
    quality.
    """
    shapes = jax.eval_shape(lambda: init_fn(jax.random.PRNGKey(0), *args, **kw))
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for path, leaf in leaves:
        name = str(path[-1]) if path else ""
        shape, dtype = leaf.shape, leaf.dtype
        if "scale" in name:
            arr = np.ones(shape, np.float32)
        elif len(shape) >= 2:
            arr = rng.standard_normal(shape, dtype=np.float32) * scale
        else:
            arr = np.zeros(shape, np.float32)
        out.append(arr.astype(dtype))
    return jax.tree_util.tree_unflatten(treedef.treedef if hasattr(treedef, "treedef") else treedef, out)
