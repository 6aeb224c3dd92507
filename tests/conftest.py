"""Test harness: run everything on a virtual 8-device CPU mesh.

``XLA_FLAGS=--xla_force_host_platform_device_count=8`` is the JAX-native way
to test multi-chip sharding without hardware (SURVEY.md §4). Must be set
before jax initializes, hence module scope here.
"""

import os

# the environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# override it — hard-set, not setdefault
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the suite is compile-bound on CPU
jax.config.update("jax_compilation_cache_dir", "/tmp/musev_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
