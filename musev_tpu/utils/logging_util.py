"""Logging configuration and seeding helpers.

Reference: musev/logging.conf loaded at musev/__init__.py:1-9 (root INFO,
package DEBUG, console handler with file:line format) and mmcm's
set_all_seed. JAX has no global RNG — ``set_all_seed`` seeds numpy/python
for host-side code and returns the root jax PRNG key.
"""

from __future__ import annotations

import logging
import random
import sys
from typing import Tuple

import jax
import numpy as np

_FORMAT = "%(asctime)s %(levelname)s [%(name)s %(filename)s:%(lineno)d] %(message)s"


def configure_logging(level: int = logging.INFO, package_level: int = logging.DEBUG):
    """Root at ``level``; the musev_tpu logger at ``package_level``
    (musev/logging.conf semantics)."""
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        root.addHandler(handler)
    logging.getLogger("musev_tpu").setLevel(package_level)


def set_all_seed(seed: int) -> Tuple[int, jax.Array]:
    """Seed host RNGs and return (seed, jax key) — mmcm set_all_seed shape."""
    random.seed(seed)
    np.random.seed(seed)
    return seed, jax.random.PRNGKey(seed)
