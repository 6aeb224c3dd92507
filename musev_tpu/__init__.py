"""musev_tpu: TPU-native infinite-length virtual-human video generation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TMElyralab/MuseV:
diffusion-based Text2Video / Image2Video / Video2Video with Visual Conditioned
Parallel Denoising (VCPD) for unbounded video length, SD1.5-ecosystem
compatibility (LoRA, textual inversion, ControlNet), and multi-reference
conditioning (IP-Adapter, ReferenceOnly, ReferenceNet).

Design stance (vs. the torch/CUDA reference):
  * pure-functional models: params are pytrees, forwards are jittable functions
  * one compiled denoise step scanned over timesteps (``lax.scan``)
  * VCPD windows are a batched array axis, sharded over a ``jax.sharding.Mesh``
  * overlap-averaging is a scatter-add that XLA turns into ICI collectives
  * hot attention paths run Pallas flash-attention kernels on the MXU
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: musev_tpu.MusevPipeline etc. without import cost."""
    if name in ("MusevPipeline", "MusevModels", "VideoResult"):
        from .pipelines import pipeline as _p

        return getattr(_p, name)
    if name == "build_models":
        from .pipelines.loader import build_models

        return build_models
    if name in ("get_model_preset", "ModelPreset", "NEGATIVE_PROMPTS"):
        from .configs import model_registry as _r

        return getattr(_r, name)
    if name in ("DenoiseSpec", "denoise_loop"):
        from .pipelines import denoiser as _d

        return getattr(_d, name)
    if name in ("ring_attention", "sp_sdpa"):
        from .parallel import ring_attention as _ra

        return getattr(_ra, name)
    if name in ("make_mesh", "batch_sharding"):
        from .parallel import mesh as _m

        return getattr(_m, name)
    if name in ("TrainSpec", "train_step", "SuperTrainSpec", "super_train_step"):
        from . import train as _t

        return getattr(_t, name)
    raise AttributeError(name)
