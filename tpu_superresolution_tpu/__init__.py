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
