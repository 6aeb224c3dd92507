"""Native checkpoint save/restore for converted param pytrees (orbax).

The reference re-runs torch checkpoint surgery on every startup
(SURVEY §5 checkpoint/resume). Here converted pytrees are saved once in
orbax format and restored directly — startup cost becomes a single
deserialize, and the same path snapshots training state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)
