"""TAIR-TPU: a TPU-native text-aware image restoration framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the TAIR
(TeReDiff) reference system: a DiffBIR-style latent-diffusion restoration
module (SwinIR cleaner -> SD-2.1 VAE + OpenCLIP text encoder -> ControlNet +
UNet under v-parameterization with zero-terminal SNR) welded to a TESTR
deformable-DETR text spotter that consumes diffusion UNet decoder features
and recycles recognized text into the next denoising step's prompt.

Everything here is TPU-first: NHWC layouts, static shapes, `lax.scan`
sampling loops, `jax.sharding.Mesh` + `shard_map` data parallelism over ICI,
and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
