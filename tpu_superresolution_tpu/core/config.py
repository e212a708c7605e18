"""Config dataclasses + model registry.

The reference has no config system — hyperparameters live in argparse
flags (``modules/train.py:184-211``) and hard-coded constructor calls
(``modules/finetune_swinir.py:269-281``).  Here every model family gets a
serializable dataclass config, a registry maps names → (config, builder),
and configs are embedded into checkpoints for reproducibility (the
reference embeds ``vars(args)`` — ``modules/train.py:400``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple


# --------------------------------------------------------------------------
# Model configs
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Base class for model configs; `name` keys the registry."""

    name: str = "base"
    in_channels: int = 1
    out_channels: int = 1
    # SR scale the *pipeline* trains at.  Note MS_ResUNet/UNet2D are
    # restoration nets (input pre-upscaled to HR size, reference
    # sr_transforms.py:55-63); transformers upsample internally.
    scale: int = 2

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["__model__"] = self.name
        return d

    @property
    def upsamples_internally(self) -> bool:
        """True if forward maps [B,H,W,C] -> [B,H*s,W*s,C]."""
        return False


@dataclass(frozen=True)
class MSResUNetConfig(ModelConfig):
    """RefineNet-style restoration CNN (reference modules/ms_resunet.py).

    `layers` = bottleneck counts per encoder stage; the published best is
    [3,4,3,3] (reference ms_resunet.py:263, results.ipynb cell 40).
    """

    name: str = "ms_resunet"
    layers: Tuple[int, ...] = (3, 4, 3, 3)
    stem_channels: int = 32
    stage_planes: Tuple[int, ...] = (32, 64, 128, 256)
    refine_channels: int = 128
    use_batchnorm: bool = True


@dataclass(frozen=True)
class UNet2DConfig(ModelConfig):
    """Simple U-Net family (capabilities of the reference's missing
    unet2d.py, documented in notebooks/to_present/cnn.ipynb cells 31-34:
    UNetConfig(in_channels, out_channels, base_channels, depth, bilinear,
    norm, dropout))."""

    name: str = "unet2d"
    base_channels: int = 64
    depth: int = 4
    bilinear: bool = True
    norm: str = "batch"  # "batch" | "none"
    dropout: float = 0.0
    residual: bool = False  # results.ipynb cell 13: residual-head variant


@dataclass(frozen=True)
class SwinIRConfig(ModelConfig):
    """SwinIR window-attention transformer (reference
    modules/network_swinir.py:618-851).  Defaults = SwinIR-M, the config
    the reference fine-tunes (modules/finetune_swinir.py:269-281)."""

    name: str = "swinir"
    in_channels: int = 3
    out_channels: int = 3
    scale: int = 4
    img_size: int = 64
    window_size: int = 8
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    upsampler: str = "pixelshuffle"  # pixelshuffle|pixelshuffledirect|nearest+conv|""
    resi_connection: str = "1conv"  # "1conv" | "3conv"
    ape: bool = False
    patch_norm: bool = True
    num_feat: int = 64
    img_range: float = 1.0
    use_remat: bool = False
    attention_impl: str = "auto"  # "auto" | "jnp" | "pallas"
    # tanh-gelu production default: measured (round 2, v5e, converted
    # torch-init SwinIR-M) the tanh-vs-erf output delta is 67.8 dB PSNR —
    # BELOW the bf16-vs-fp32 dtype floor of 64.1 dB — and ~7% faster
    # whole-model.  Parity tests pass False (torch uses exact erf).
    gelu_approximate: bool = True
    # Stochastic depth, linear decay 0 -> rate over sum(depths)
    # (reference network_swinir.py:649,701); inactive at inference.
    drop_path_rate: float = 0.1
    # Collapse the linear Upsample+conv_last chain into one conv + one
    # pixel_shuffle (ops/fused_upsample.py; exact in the interior, a
    # border ring of up to ~3 LR px = 3*scale output px differs — 12
    # output px at x4).  Parity tests pin False.
    fused_reconstruct: bool = True

    @property
    def upsamples_internally(self) -> bool:
        return True


@dataclass(frozen=True)
class HATConfig(ModelConfig):
    """HAT hybrid attention transformer (reference modules/hat_arch.py:710-994)."""

    name: str = "hat"
    in_channels: int = 3
    out_channels: int = 3
    scale: int = 4
    img_size: int = 64
    window_size: int = 7
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    num_feat: int = 64
    img_range: float = 1.0
    use_remat: bool = False
    attention_impl: str = "auto"  # "auto" | "jnp" | "pallas"
    patch_norm: bool = True  # LayerNorm after embed (hat_arch.py:758)
    # Stochastic depth on HAB residuals (reference hat_arch.py:755,827).
    drop_path_rate: float = 0.1
    fused_reconstruct: bool = True  # see SwinIRConfig.fused_reconstruct
    # tanh-gelu production default (same rationale as SwinIRConfig:
    # measured below the bf16 floor there); parity tests pin False
    # (torch nn.GELU is exact erf — hat_arch.py uses the default).
    gelu_approximate: bool = True

    @property
    def upsamples_internally(self) -> bool:
        return True


@dataclass(frozen=True)
class HATFastConfig(HATConfig):
    """Framework-native fast-HAT production preset: window_size=8.

    The reference pins window_size=7 (hat_arch.py:738-749) and its
    official checkpoints require it — but ws=7 windows are 8-lane
    misaligned on the TPU, and the packed-window kernel's per-step
    serial VMEM chain costs ~3x per token vs ws=8 (PARITY.md "HAT ws=7
    floor CLOSED": 256^2 x4 forward ~79.7 ms at ws=7 vs 61.8 ms for the
    ws=8 packed variant, round-2 measurement).  For from-scratch
    training — every "lite" quality proof in PARITY.md already uses
    ws=8 — this preset is the recommended config; official-checkpoint
    users keep `hat` (ws=7 parity)."""

    name: str = "hat_fast"
    window_size: int = 8


@dataclass(frozen=True)
class DATConfig(ModelConfig):
    """DAT dual aggregation transformer (reference modules/dat_arch.py:699-859).

    Defaults follow the reference's production smoke-test config
    (dat_arch.py:862-883): depth [6]x6, heads [6]x6, expansion 2,
    split_size [8,16]."""

    name: str = "dat"
    in_channels: int = 3
    out_channels: int = 3
    scale: int = 4
    img_size: int = 64
    embed_dim: int = 180
    split_size: Tuple[int, int] = (8, 16)
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    expansion_factor: float = 2.0
    qkv_bias: bool = True
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    num_feat: int = 64
    img_range: float = 1.0
    use_remat: bool = False
    attention_impl: str = "auto"  # "auto" | "jnp" | "pallas"
    # Stochastic depth on DATB residuals (reference dat_arch.py:733,771).
    drop_path_rate: float = 0.1
    fused_reconstruct: bool = True  # see SwinIRConfig.fused_reconstruct

    @property
    def upsamples_internally(self) -> bool:
        return True


# --------------------------------------------------------------------------
# Pipeline configs
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig:
    """Paired LR/HR dataset config (reference modules/sr_datasets.py:31-73)."""

    data_root: str = ""
    dataset: str = "shuffled2D"
    scale: str = "X2"  # "X2" | "X4"
    # Transform convention: "pre_upscale" (bicubic LR→HR size before the
    # model, reference sr_transforms.py:136-152) or "native_lr" (model
    # upsamples internally, reference finetune_swinir.py:96-131).
    convention: str = "pre_upscale"
    patch_size: Optional[int] = 100  # HR-space patch for pre_upscale
    lr_patch: Optional[int] = 64  # LR-space patch for native_lr
    do_flips: bool = True
    # Extended aug (reference notebook pipeline, cnn.ipynb cell 22):
    # paired gaussian blur at p=0.5, and mean/std normalization of BOTH
    # pair members (training runs in normalized space; metrics follow
    # the notebook and are reported in that space).
    do_blur: bool = False
    norm_mean: Optional[float] = None
    norm_std: Optional[float] = None
    grayscale: bool = True
    channels: int = 1

    @property
    def normalizes(self) -> bool:
        return self.norm_mean is not None and self.norm_std is not None

    @property
    def scale_int(self) -> int:
        return int(self.scale[1:])


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 5
    batch_size: int = 8
    loss: str = "mse"  # "mse" | "l1" | "l1_ssim"
    lr: float = 1e-4
    weight_decay: float = 0.0
    scheduler: str = "none"  # "onecycle" | "exponential" | "cosine" | "none"
    min_lr: float = 1e-7  # cosine floor (reference finetune_swinir.py:309)
    grad_clip_norm: float = 1.0
    seed: int = 42
    freeze_regex: Optional[str] = None
    finetune: bool = False
    ft_lr: Optional[float] = None
    # Stop after N epochs without val-loss improvement (the lost
    # reference CLI's --early_stop_patience, common_commands.txt:5-6).
    early_stop_patience: Optional[int] = None
    # Log within-epoch data/step timing every N batches (0 = off) —
    # reference --time_log_every (train.py:196).
    time_log_every: int = 0
    # Validate every N epochs (always on the last epoch).  At tiny
    # patch sizes the every-epoch full-image validation pass dominates
    # wall time ~7x (measured on the round-4 quality proofs); the
    # reference validates every epoch (train.py:140) so 1 stays the
    # default.  Checkpoint selection and early stopping only see
    # validated epochs.
    val_every: int = 1
    # EMA of params (BasicSR-style, e.g. 0.999); None/0 = off.
    # Validation + best-checkpoint selection score the EMA weights;
    # checkpoints carry them under <ckpt>/ema (evaluate --ema).
    ema_decay: Optional[float] = None
    # TPU specifics
    bf16_compute: bool = True
    remat: bool = False
    # Parallelism: data-parallel shard count.  0/1 = single device,
    # -1 = auto (all local devices), N>1 = exactly N shards.
    dp_shards: int = 0


@dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 4
    tile_size: Optional[int] = None  # None = whole image (padded/bucketed)
    tile_overlap: int = 16
    # Cap on tiles per model call (None = all tiles in one batch).
    # Bounds peak HBM for production whole-image sizes (>=1024^2 LR).
    max_tile_batch: Optional[int] = None
    save_n: int = 0
    save_every: Optional[int] = None
    save_start: int = 0
    save_indices: Tuple[int, ...] = ()
    rescale_png: bool = False
    # x8 geometric self-ensemble (test-time augmentation): average the
    # SR output over all 4 rotations x 2 flips of the input.  Standard
    # SR practice (EDSR/SwinIR "+" results); the reference has no
    # equivalent.  ~8x inference FLOPs for typically +0.1-0.2 dB.
    self_ensemble: bool = False


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

model_registry: Dict[str, Tuple[type, Callable]] = {}


def register_model(name: str, config_cls: type, builder: Callable) -> None:
    model_registry[name] = (config_cls, builder)


def build_model(config: ModelConfig, dtype=None):
    """Build a Flax module from a config via the registry.

    `dtype` sets the compute dtype (params stay fp32); bfloat16 is the
    TPU production setting, fp32 the parity-test setting (default).
    """
    # Import models lazily to avoid cycles; importing registers builders.
    from tpu_superresolution_tpu import models as _models  # noqa: F401

    if config.name not in model_registry:
        raise KeyError(
            f"Unknown model '{config.name}'. Registered: {sorted(model_registry)}"
        )
    _, builder = model_registry[config.name]
    if dtype is not None:
        return builder(config, dtype=dtype)
    return builder(config)


def config_from_dict(d: Dict[str, Any]) -> ModelConfig:
    """Rebuild a config from its serialized dict (checkpoint round-trip)."""
    from tpu_superresolution_tpu import models as _models  # noqa: F401

    d = dict(d)
    name = d.pop("__model__", d.get("name"))
    if name not in model_registry:
        raise KeyError(f"Unknown model '{name}' in checkpoint config")
    config_cls, _ = model_registry[name]
    fields = {f.name for f in dataclasses.fields(config_cls)}
    kwargs = {k: v for k, v in d.items() if k in fields}
    # JSON round-trips tuples as lists; restore tuple-typed fields.
    for f in dataclasses.fields(config_cls):
        if f.name in kwargs and isinstance(kwargs[f.name], list):
            kwargs[f.name] = tuple(kwargs[f.name])
    return config_cls(**kwargs)
