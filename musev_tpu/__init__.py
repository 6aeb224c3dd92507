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
