"""tpu_superresolution_tpu — a TPU-native super-resolution framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch workbench ``ViacheslavTimofeev/tpu_superresolution``:

- Model zoo: MS_ResUNet (RefineNet CNN), UNet2D, SwinIR, HAT, DAT
  (Flax modules, NHWC, bf16-compute / fp32-param policy).
- On-device data pipeline: stem-paired dataset index, host PNG decode,
  batched bicubic degrade / paired random crop / flips as jit'd TPU ops.
- Unified train/finetune engine: one jit'd train step (optax AdamW,
  OneCycle/Exponential/Cosine schedules, grad-clip 1.0, freeze-regex
  masks), Orbax checkpointing.
- Evaluation: PSNR/SSIM with pytorch_msssim parity, bicubic baseline,
  tiled whole-image inference with overlap blending.
- Parallelism: `jax.sharding.Mesh` + shard_map data parallelism with ICI
  gradient psum; spatially-tiled inference.
- Pallas TPU kernels for the hot ops (window attention, channel
  attention, pixel-shuffle) with pure-jnp reference paths.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPU_SR_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pins the JAX
    # platform and ignores JAX_PLATFORMS (e.g. the axon TPU tunnel):
    # TPU_SR_PLATFORM=cpu forces the backend BEFORE first use, letting
    # CLIs and the proof harness smoke-test on CPU while another
    # process holds the TPU.  Set XLA_FLAGS=--xla_force_host_platform_
    # device_count=N in the environment as well for a multi-device
    # CPU mesh.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPU_SR_PLATFORM"])
