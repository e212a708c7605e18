"""PyTorch checkpoint -> JAX param-tree converters.

Needed for (a) golden numerical-parity tests against the reference
PyTorch models and (b) loading official pretrained SwinIR/HAT/DAT
checkpoints (the reference fine-tunes from them —
finetune_swinir.py:283-287).

`extract_state_dict` reproduces the reference's flexible checkpoint
unwrapping (model_debug.ipynb cell 2 + evaluate.py:139-145 +
finetune_swinir.py:283-285): wrapper keys
state_dict/model/model_state_dict/net/generator/params/params_ema and
DataParallel 'module.' prefix stripping.

Layout transforms (torch -> flax NHWC):
- Conv2d weight [O, I, kh, kw] -> kernel [kh, kw, I, O]
- ConvTranspose2d weight [I, O, kh, kw] -> kernel [kh, kw, O, I]
  (blocks.ConvTranspose2dTorch layout)
- Linear weight [O, I] -> kernel [I, O]
- LayerNorm/BatchNorm weight/bias -> scale/bias; BN running stats ->
  batch_stats collection.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

_WRAPPER_KEYS = ("params_ema", "params", "state_dict", "model_state_dict", "model", "net", "generator")


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load + unwrap + numpy-ify (CPU torch is a host-side tool
    here; nothing torch touches the TPU path)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return extract_state_dict(ckpt)


def extract_state_dict(ckpt: Any) -> Dict[str, np.ndarray]:
    """Unwrap common checkpoint formats to a flat {name: ndarray}."""
    import torch

    sd = ckpt
    if isinstance(ckpt, Mapping) and not all(
        torch.is_tensor(v) for v in ckpt.values()
    ):
        for k in _WRAPPER_KEYS:
            v = ckpt.get(k)
            if isinstance(v, Mapping):
                sd = v
                break
    out = {}
    for k, v in sd.items():
        if torch.is_tensor(v):
            k = k[len("module.") :] if k.startswith("module.") else k
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _put(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


# ---------------------------------------------------------------------------
# MS_ResUNet
# ---------------------------------------------------------------------------

_RCU_SUFFIX = {"_conv": 1, "_conv_relu_varout_dimred": 2}

# torch decoder prefixes -> (jax refine module, jax submodule)
_MSRES_DECODER = {}
for _k, _ref in ((1, "refine1"), (2, "refine2"), (3, "refine3"), (4, "refine4")):
    _MSRES_DECODER[f"p_ims1d2_outl{_k}_dimred"] = (_ref, "dimred")
    _MSRES_DECODER[f"adapt_stage{_k}_b"] = (_ref, "adapt")
    _MSRES_DECODER[f"adapt_stage{_k}_b2_joint_varout_dimred"] = (_ref, "adapt_dimred")
    _MSRES_DECODER[f"mflow_conv_g{_k}_pool"] = (_ref, "pool")
    _MSRES_DECODER[f"mflow_conv_g{_k}_b"] = (_ref, "mflow")
    _MSRES_DECODER[f"mflow_conv_g{_k}_b3_joint_varout_dimred"] = (_ref, "out_dimred")


def convert_msresunet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ms_resunet.py state dict -> {'params':…, 'batch_stats':…}.

    Handles the setattr-generated RCU/RCPB key names
    (ms_resunet.py:16-19,39-43): '{i}_conv' / '{i}_conv_relu_varout_dimred'
    and '{i}_outvar_dimred'.  Ignores the vestigial 'up_ps*' keys from the
    commented-out PixelShuffle variant (model_debug.ipynb cell 7 found
    them unexpected too).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(jpath, tname):
        _put(params, jpath + ("scale",), sd[tname + ".weight"])
        _put(params, jpath + ("bias",), sd[tname + ".bias"])
        _put(stats, jpath + ("mean",), sd[tname + ".running_mean"])
        _put(stats, jpath + ("var",), sd[tname + ".running_var"])

    # stem
    _put(params, ("conv1", "kernel"), _conv_w(sd["conv1.weight"]))
    put_bn(("bn1",), "bn1")

    # encoder bottlenecks
    for key in sd:
        m = re.match(r"layer(\d+)\.(\d+)\.(conv|bn)(\d)\.(weight|bias|running_mean|running_var)$", key)
        if m:
            s, b, kind, idx, leaf = m.groups()
            jmod = (f"layer{s}_{b}",)
            if kind == "conv" and leaf == "weight":
                _put(params, jmod + (f"conv{idx}", "kernel"), _conv_w(sd[key]))
            elif kind == "bn":
                pass  # handled below in bulk
    for s in (1, 2, 3, 4):
        b = 0
        while f"layer{s}.{b}.conv1.weight" in sd:
            jmod = (f"layer{s}_{b}",)
            for idx in (1, 2, 3):
                put_bn(jmod + (f"bn{idx}",), f"layer{s}.{b}.bn{idx}")
            if f"layer{s}.{b}.downsample.0.weight" in sd:
                _put(
                    params,
                    jmod + ("downsample_conv", "kernel"),
                    _conv_w(sd[f"layer{s}.{b}.downsample.0.weight"]),
                )
                put_bn(jmod + ("downsample_bn",), f"layer{s}.{b}.downsample.1")
            b += 1

    # decoder
    for key, arr in sd.items():
        parts = key.split(".")
        head = parts[0]
        if head in ("conv1", "bn1", "clf_conv1", "clf_conv2") or head.startswith(
            ("layer", "upCT", "up_ps", "ps")
        ):
            continue
        if head not in _MSRES_DECODER:
            continue
        ref, sub = _MSRES_DECODER[head]
        leaf = parts[-1]
        if sub in ("dimred", "adapt_dimred", "out_dimred"):
            if leaf == "weight":
                _put(params, (ref, sub, "kernel"), _conv_w(arr))
            else:
                _put(params, (ref, sub, "bias"), arr)
        elif sub == "pool":
            # mflow_conv_gK_pool.0.{i}_outvar_dimred.weight -> pool/conv{i}
            m = re.match(r"(\d+)_outvar_dimred", parts[2])
            _put(params, (ref, sub, f"conv{m.group(1)}", "kernel"), _conv_w(arr))
        else:  # adapt / mflow RCU blocks: {i}_conv | {i}_conv_relu_varout_dimred
            m = re.match(r"(\d+)(_conv(?:_relu_varout_dimred)?)", parts[2])
            i, suffix = m.group(1), m.group(2)
            j = _RCU_SUFFIX[suffix]
            leaf_name = "kernel" if leaf == "weight" else "bias"
            val = _conv_w(arr) if leaf == "weight" else arr
            _put(params, (ref, sub, f"b{i}s{j}", leaf_name), val)

    # transposed convs
    for k in (2, 3, 4):
        _put(params, (f"upCT{k}", "kernel"), _convT_w(sd[f"upCT{k}.weight"]))
        _put(params, (f"upCT{k}", "bias"), sd[f"upCT{k}.bias"])

    # head
    for name in ("clf_conv1", "clf_conv2"):
        _put(params, (name, "kernel"), _conv_w(sd[f"{name}.weight"]))
        _put(params, (name, "bias"), sd[f"{name}.bias"])

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# SwinIR
# ---------------------------------------------------------------------------


def convert_swinir(sd: Dict[str, np.ndarray], scale: int = 4) -> Dict[str, Any]:
    """Reference network_swinir.py state dict -> {'params': …}."""
    params: Dict[str, Any] = {}

    def put_ln(jpath, tname):
        _put(params, jpath + ("scale",), sd[tname + ".weight"])
        _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_conv(jpath, tname):
        _put(params, jpath + ("kernel",), _conv_w(sd[tname + ".weight"]))
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_dense(jpath, tname):
        _put(params, jpath + ("kernel",), sd[tname + ".weight"].T)
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    put_conv(("conv_first",), "conv_first")
    if "patch_embed.norm.weight" in sd:
        put_ln(("patch_norm",), "patch_embed.norm")
    if "absolute_pos_embed" in sd:
        ape = sd["absolute_pos_embed"][0]  # [L, C]
        side = int(round(ape.shape[0] ** 0.5))
        _put(params, ("absolute_pos_embed",), ape.reshape(side, side, -1))

    i = 0
    while f"layers.{i}.conv.weight" in sd or f"layers.{i}.conv.0.weight" in sd:
        lp = (f"layers_{i}",)
        j = 0
        while f"layers.{i}.residual_group.blocks.{j}.norm1.weight" in sd:
            t = f"layers.{i}.residual_group.blocks.{j}"
            bp = lp + (f"blocks_{j}",)
            put_ln(bp + ("norm1",), f"{t}.norm1")
            put_ln(bp + ("norm2",), f"{t}.norm2")
            put_dense(bp + ("attn", "qkv"), f"{t}.attn.qkv")
            put_dense(bp + ("attn", "proj"), f"{t}.attn.proj")
            _put(
                params,
                bp + ("attn", "relative_position_bias_table"),
                sd[f"{t}.attn.relative_position_bias_table"],
            )
            put_dense(bp + ("mlp", "fc1"), f"{t}.mlp.fc1")
            put_dense(bp + ("mlp", "fc2"), f"{t}.mlp.fc2")
            j += 1
        if f"layers.{i}.conv.weight" in sd:
            put_conv(lp + ("conv",), f"layers.{i}.conv")
        else:  # 3conv
            put_conv(lp + ("conv_0",), f"layers.{i}.conv.0")
            put_conv(lp + ("conv_2",), f"layers.{i}.conv.2")
            put_conv(lp + ("conv_4",), f"layers.{i}.conv.4")
        i += 1

    put_ln(("norm",), "norm")
    if "conv_after_body.weight" in sd:
        put_conv(("conv_after_body",), "conv_after_body")
    elif "conv_after_body.0.weight" in sd:
        put_conv(("conv_after_body_0",), "conv_after_body.0")
        put_conv(("conv_after_body_2",), "conv_after_body.2")
        put_conv(("conv_after_body_4",), "conv_after_body.4")

    if "conv_before_upsample.0.weight" in sd:
        put_conv(("conv_before_upsample",), "conv_before_upsample.0")
    # upsample chain: torch Sequential indices 0,2,4… are convs
    k = 0
    for t_idx in (0, 2, 4):
        if f"upsample.{t_idx}.weight" in sd:
            # pixelshuffledirect has a single conv named 'conv'
            jname = "conv" if "conv_before_upsample.0.weight" not in sd else f"conv_{k}"
            put_conv(("upsample", jname), f"upsample.{t_idx}")
            k += 1
    for name in ("conv_last", "conv_up1", "conv_up2", "conv_hr"):
        if f"{name}.weight" in sd:
            put_conv((name,), name)

    return {"params": params}


# ---------------------------------------------------------------------------
# HAT
# ---------------------------------------------------------------------------


def convert_hat(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference hat_arch.py state dict -> {'params': …}.

    CAB sequential indices (hat_arch.py:67-72): cab.0 conv1, cab.2
    conv2, cab.3.attention.{1,3} the SE squeeze/excite 1x1 convs.
    The rpi_sa/rpi_oca buffers are skipped (trace-time constants here).
    """
    params: Dict[str, Any] = {}

    def put_ln(jpath, tname):
        _put(params, jpath + ("scale",), sd[tname + ".weight"])
        _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_conv(jpath, tname):
        _put(params, jpath + ("kernel",), _conv_w(sd[tname + ".weight"]))
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_dense(jpath, tname):
        _put(params, jpath + ("kernel",), sd[tname + ".weight"].T)
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    put_conv(("conv_first",), "conv_first")
    if "patch_embed.norm.weight" in sd:
        put_ln(("patch_norm",), "patch_embed.norm")

    i = 0
    while f"layers.{i}.residual_group.overlap_attn.qkv.weight" in sd:
        lp = (f"layers_{i}",)
        j = 0
        while f"layers.{i}.residual_group.blocks.{j}.norm1.weight" in sd:
            t = f"layers.{i}.residual_group.blocks.{j}"
            bp = lp + (f"blocks_{j}",)
            put_ln(bp + ("norm1",), f"{t}.norm1")
            put_ln(bp + ("norm2",), f"{t}.norm2")
            put_dense(bp + ("attn", "qkv"), f"{t}.attn.qkv")
            put_dense(bp + ("attn", "proj"), f"{t}.attn.proj")
            _put(params, bp + ("attn", "relative_position_bias_table"),
                 sd[f"{t}.attn.relative_position_bias_table"])
            put_conv(bp + ("conv_block", "conv1"), f"{t}.conv_block.cab.0")
            put_conv(bp + ("conv_block", "conv2"), f"{t}.conv_block.cab.2")
            put_conv(bp + ("conv_block", "ca", "fc1"), f"{t}.conv_block.cab.3.attention.1")
            put_conv(bp + ("conv_block", "ca", "fc2"), f"{t}.conv_block.cab.3.attention.3")
            put_dense(bp + ("mlp", "fc1"), f"{t}.mlp.fc1")
            put_dense(bp + ("mlp", "fc2"), f"{t}.mlp.fc2")
            j += 1
        t = f"layers.{i}.residual_group.overlap_attn"
        op = lp + ("overlap_attn",)
        put_ln(op + ("norm1",), f"{t}.norm1")
        put_ln(op + ("norm2",), f"{t}.norm2")
        put_dense(op + ("qkv",), f"{t}.qkv")
        put_dense(op + ("proj",), f"{t}.proj")
        _put(params, op + ("relative_position_bias_table",),
             sd[f"{t}.relative_position_bias_table"])
        put_dense(op + ("mlp", "fc1"), f"{t}.mlp.fc1")
        put_dense(op + ("mlp", "fc2"), f"{t}.mlp.fc2")
        if f"layers.{i}.conv.weight" in sd:
            put_conv(lp + ("conv",), f"layers.{i}.conv")
        i += 1

    put_ln(("norm",), "norm")
    if "conv_after_body.weight" in sd:
        put_conv(("conv_after_body",), "conv_after_body")
    put_conv(("conv_before_upsample",), "conv_before_upsample.0")
    k = 0
    for t_idx in (0, 2, 4):
        if f"upsample.{t_idx}.weight" in sd:
            put_conv(("upsample", f"conv_{k}"), f"upsample.{t_idx}")
            k += 1
    put_conv(("conv_last",), "conv_last")
    return {"params": params}


# ---------------------------------------------------------------------------
# DAT
# ---------------------------------------------------------------------------


def convert_dat(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference dat_arch.py state dict -> {'params', 'batch_stats'}.

    Sequential indices: dwconv = [conv(0), BN(1), GELU];
    channel_interaction = [GAP(0), conv(1), BN(2), GELU, conv(4)];
    spatial_interaction = [conv(0), BN(1), GELU, conv(3)];
    DynamicPosBias pos{1,2,3} = [LN(0), ReLU, Linear(2)].
    Buffers (rpe_biases, relative_position_index, attn_mask_*) skipped.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_ln(jpath, tname):
        _put(params, jpath + ("scale",), sd[tname + ".weight"])
        _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_conv(jpath, tname):
        _put(params, jpath + ("kernel",), _conv_w(sd[tname + ".weight"]))
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_dense(jpath, tname):
        _put(params, jpath + ("kernel",), sd[tname + ".weight"].T)
        if tname + ".bias" in sd:
            _put(params, jpath + ("bias",), sd[tname + ".bias"])

    def put_bn(jpath, tname):
        _put(params, jpath + ("scale",), sd[tname + ".weight"])
        _put(params, jpath + ("bias",), sd[tname + ".bias"])
        _put(stats, jpath + ("mean",), sd[tname + ".running_mean"])
        _put(stats, jpath + ("var",), sd[tname + ".running_var"])

    def put_aim(jp, tp):
        put_conv(jp + ("dwconv", "conv"), f"{tp}.dwconv.0")
        put_bn(jp + ("dwconv", "bn"), f"{tp}.dwconv.1")
        put_conv(jp + ("channel_interaction", "fc1"), f"{tp}.channel_interaction.1")
        put_bn(jp + ("channel_interaction", "bn"), f"{tp}.channel_interaction.2")
        put_conv(jp + ("channel_interaction", "fc2"), f"{tp}.channel_interaction.4")
        put_conv(jp + ("spatial_interaction", "fc1"), f"{tp}.spatial_interaction.0")
        put_bn(jp + ("spatial_interaction", "bn"), f"{tp}.spatial_interaction.1")
        put_conv(jp + ("spatial_interaction", "fc2"), f"{tp}.spatial_interaction.3")

    put_conv(("conv_first",), "conv_first")
    put_ln(("before_RG_norm",), "before_RG.1")

    i = 0
    while any(k.startswith(f"layers.{i}.") for k in sd):
        lp = (f"layers_{i}",)
        j = 0
        while f"layers.{i}.blocks.{j}.norm1.weight" in sd:
            t = f"layers.{i}.blocks.{j}"
            bp = lp + (f"blocks_{j}",)
            put_ln(bp + ("norm1",), f"{t}.norm1")
            put_ln(bp + ("norm2",), f"{t}.norm2")
            ap = bp + ("attn",)
            put_dense(ap + ("qkv",), f"{t}.attn.qkv")
            put_dense(ap + ("proj",), f"{t}.attn.proj")
            put_aim(ap, f"{t}.attn")
            if f"{t}.attn.temperature" in sd:  # channel block
                _put(params, ap + ("temperature",), sd[f"{t}.attn.temperature"])
            else:  # spatial block: two DynamicPosBias branches
                for idx in (0, 1):
                    pp = ap + (f"attns_{idx}", "pos")
                    tpos = f"{t}.attn.attns.{idx}.pos"
                    put_dense(pp + ("pos_proj",), f"{tpos}.pos_proj")
                    for n in (1, 2, 3):
                        put_ln(pp + (f"pos{n}_norm",), f"{tpos}.pos{n}.0")
                        put_dense(pp + (f"pos{n}_fc",), f"{tpos}.pos{n}.2")
            # SGFN
            put_dense(bp + ("ffn", "fc1"), f"{t}.ffn.fc1")
            put_dense(bp + ("ffn", "fc2"), f"{t}.ffn.fc2")
            put_ln(bp + ("ffn", "sg_norm"), f"{t}.ffn.sg.norm")
            put_conv(bp + ("ffn", "sg_conv"), f"{t}.ffn.sg.conv")
            j += 1
        if f"layers.{i}.conv.weight" in sd:
            put_conv(lp + ("conv",), f"layers.{i}.conv")
        elif f"layers.{i}.conv.0.weight" in sd:
            put_conv(lp + ("conv_0",), f"layers.{i}.conv.0")
            put_conv(lp + ("conv_2",), f"layers.{i}.conv.2")
            put_conv(lp + ("conv_4",), f"layers.{i}.conv.4")
        i += 1

    put_ln(("norm",), "norm")
    if "conv_after_body.weight" in sd:
        put_conv(("conv_after_body",), "conv_after_body")
    elif "conv_after_body.0.weight" in sd:
        put_conv(("conv_after_body_0",), "conv_after_body.0")
        put_conv(("conv_after_body_2",), "conv_after_body.2")
        put_conv(("conv_after_body_4",), "conv_after_body.4")
    if "conv_before_upsample.0.weight" in sd:
        put_conv(("conv_before_upsample",), "conv_before_upsample.0")
        k = 0
        for t_idx in (0, 2, 4):
            if f"upsample.{t_idx}.weight" in sd:
                put_conv(("upsample", f"conv_{k}"), f"upsample.{t_idx}")
                k += 1
        put_conv(("conv_last",), "conv_last")
    elif "upsample.0.weight" in sd:  # pixelshuffledirect
        put_conv(("upsample", "conv"), "upsample.0")

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Architecture inference from a torch state dict
# ---------------------------------------------------------------------------


def _depths_heads_swin(sd, prefix="layers.{i}.residual_group.blocks.{j}"):
    """Count blocks per layer and read heads from each layer's first
    block's relative_position_bias_table [-1] dim."""
    depths, heads = [], []
    i = 0
    while prefix.format(i=i, j=0) + ".norm1.weight" in sd:
        j = 0
        while prefix.format(i=i, j=j) + ".norm1.weight" in sd:
            j += 1
        depths.append(j)
        heads.append(
            int(sd[prefix.format(i=i, j=0) + ".attn.relative_position_bias_table"].shape[1])
        )
        i += 1
    return tuple(depths), tuple(heads)


def _ws_from_rpb(rows: int, what: str) -> int:
    """Window size from a [(2ws-1)^2, nH] bias table row count."""
    side = int(round(rows**0.5))
    if side * side != rows or side % 2 != 1:
        raise ValueError(
            f"{what}: relative_position_bias_table has {rows} rows, "
            f"which is not an odd perfect square (2*ws-1)^2 — "
            "unrecognized window geometry"
        )
    return (side + 1) // 2


def infer_swinir_config(sd: Dict[str, np.ndarray], scale: int):
    """Build a SwinIRConfig matching a reference network_swinir.py state
    dict (width/depth/heads/window inferred from tensor shapes), so
    non-default checkpoints evaluate correctly instead of failing deep
    inside the converter (reference evaluate.py:136-145 hardcodes the
    published architecture; we can do better)."""
    from tpu_superresolution_tpu.core.config import SwinIRConfig

    if "conv_first.weight" not in sd:
        raise ValueError(
            "not a SwinIR checkpoint: missing 'conv_first.weight' "
            f"(keys start: {sorted(sd)[:5]})"
        )
    embed_dim = int(sd["conv_first.weight"].shape[0])
    in_channels = int(sd["conv_first.weight"].shape[1])
    depths, heads = _depths_heads_swin(sd)
    if not depths:
        raise ValueError(
            "SwinIR checkpoint has no "
            "'layers.*.residual_group.blocks.*' keys — wrong --model?"
        )
    b0 = "layers.0.residual_group.blocks.0"
    ws = _ws_from_rpb(
        sd[f"{b0}.attn.relative_position_bias_table"].shape[0], "SwinIR"
    )
    mlp_ratio = sd[f"{b0}.mlp.fc1.weight"].shape[0] / embed_dim
    if "conv_up1.weight" in sd:
        upsampler = "nearest+conv"
        num_feat = int(sd["conv_up1.weight"].shape[0])
        out_channels = int(sd["conv_last.weight"].shape[0])
    elif "conv_before_upsample.0.weight" in sd:
        upsampler = "pixelshuffle"
        num_feat = int(sd["conv_before_upsample.0.weight"].shape[0])
        out_channels = int(sd["conv_last.weight"].shape[0])
    elif "upsample.0.weight" in sd:
        upsampler = "pixelshuffledirect"
        num_feat = 64
        out_channels = int(sd["upsample.0.weight"].shape[0]) // (scale * scale)
    else:
        upsampler = ""
        num_feat = 64
        out_channels = int(sd["conv_last.weight"].shape[0])
    return SwinIRConfig(
        scale=scale,
        in_channels=in_channels,
        out_channels=out_channels,
        window_size=ws,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=heads,
        mlp_ratio=float(mlp_ratio),
        qkv_bias=f"{b0}.attn.qkv.bias" in sd,
        upsampler=upsampler,
        resi_connection="1conv" if "layers.0.conv.weight" in sd else "3conv",
        ape="absolute_pos_embed" in sd,
        patch_norm="patch_embed.norm.weight" in sd,
        num_feat=num_feat,
    )


def infer_hat_config(sd: Dict[str, np.ndarray], scale: int):
    """HATConfig from a reference hat_arch.py state dict (see
    infer_swinir_config).  conv_scale is not a weight (default 0.01)."""
    from tpu_superresolution_tpu.core.config import HATConfig

    if "layers.0.residual_group.overlap_attn.qkv.weight" not in sd:
        raise ValueError(
            "not a HAT checkpoint: missing "
            "'layers.0.residual_group.overlap_attn.qkv.weight' — wrong --model?"
        )
    embed_dim = int(sd["conv_first.weight"].shape[0])
    in_channels = int(sd["conv_first.weight"].shape[1])
    depths, heads = _depths_heads_swin(sd)
    b0 = "layers.0.residual_group.blocks.0"
    ws = _ws_from_rpb(
        sd[f"{b0}.attn.relative_position_bias_table"].shape[0], "HAT"
    )
    # OCAB table rows = (ws + owin - 1)^2, owin = ws*(1+overlap_ratio)
    # (hat_arch.py:381-382)
    orows = sd[
        "layers.0.residual_group.overlap_attn.relative_position_bias_table"
    ].shape[0]
    oside = int(round(orows**0.5))
    if oside * oside != orows:
        raise ValueError(f"HAT: OCAB bias table rows {orows} not a square")
    owin = oside + 1 - ws
    mlp_ratio = sd[f"{b0}.mlp.fc1.weight"].shape[0] / embed_dim
    cab_mid = int(sd[f"{b0}.conv_block.cab.0.weight"].shape[0])
    sq_mid = int(sd[f"{b0}.conv_block.cab.3.attention.1.weight"].shape[0])
    return HATConfig(
        scale=scale,
        in_channels=in_channels,
        out_channels=int(sd["conv_last.weight"].shape[0]),
        window_size=ws,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=heads,
        mlp_ratio=float(mlp_ratio),
        qkv_bias=f"{b0}.attn.qkv.bias" in sd,
        compress_ratio=max(1, round(embed_dim / cab_mid)),
        squeeze_factor=max(1, round(embed_dim / sq_mid)),
        overlap_ratio=owin / ws - 1.0,
        num_feat=int(sd["conv_before_upsample.0.weight"].shape[0]),
        patch_norm="patch_embed.norm.weight" in sd,
    )


def infer_dat_config(sd: Dict[str, np.ndarray], scale: int):
    """DATConfig from a reference dat_arch.py state dict.  split_size is
    not recoverable from weights (DynamicPosBias input is always 2-dim);
    the published default (8, 16) is kept — pass a config explicitly for
    exotic splits."""
    from tpu_superresolution_tpu.core.config import DATConfig

    if "before_RG.1.weight" not in sd:
        raise ValueError(
            "not a DAT checkpoint: missing 'before_RG.1.weight' — wrong --model?"
        )
    embed_dim = int(sd["conv_first.weight"].shape[0])
    depths, heads = [], []
    i = 0
    while f"layers.{i}.blocks.0.norm1.weight" in sd:
        j = 0
        while f"layers.{i}.blocks.{j}.norm1.weight" in sd:
            j += 1
        depths.append(j)
        # odd blocks are channel attention with temperature [nH, 1, 1]
        if f"layers.{i}.blocks.1.attn.temperature" in sd:
            heads.append(int(sd[f"layers.{i}.blocks.1.attn.temperature"].shape[0]))
        else:  # depth-1 group: read from DynamicPosBias head count
            heads.append(
                int(sd[f"layers.{i}.blocks.0.attn.attns.0.pos.pos3.2.weight"].shape[0]) * 2
            )
        i += 1
    if not depths:
        raise ValueError("DAT checkpoint has no 'layers.*.blocks.*' keys")
    b0 = "layers.0.blocks.0"
    expansion = sd[f"{b0}.ffn.fc1.weight"].shape[0] / embed_dim
    if "conv_before_upsample.0.weight" in sd:
        upsampler = "pixelshuffle"
        num_feat = int(sd["conv_before_upsample.0.weight"].shape[0])
        out_channels = int(sd["conv_last.weight"].shape[0])
    else:
        upsampler = "pixelshuffledirect"
        num_feat = 64
        out_channels = int(sd["upsample.0.weight"].shape[0]) // (scale * scale)
    return DATConfig(
        scale=scale,
        in_channels=int(sd["conv_first.weight"].shape[1]),
        out_channels=out_channels,
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(heads),
        expansion_factor=float(expansion),
        qkv_bias=f"{b0}.attn.qkv.bias" in sd,
        upsampler=upsampler,
        resi_connection="1conv" if "layers.0.conv.weight" in sd else "3conv",
        num_feat=num_feat,
    )


def infer_msresunet_config(sd: Dict[str, np.ndarray], scale: int):
    """MSResUNetConfig from a reference ms_resunet.py state dict: per-
    stage bottleneck counts are counted; channel widths are verified
    against the (only) published geometry and mismatches named."""
    from tpu_superresolution_tpu.core.config import MSResUNetConfig

    if "conv1.weight" not in sd or "clf_conv2.weight" not in sd:
        raise ValueError(
            "not an MS_ResUNet checkpoint: missing conv1/clf_conv2 — wrong --model?"
        )
    layers = []
    for s in (1, 2, 3, 4):
        b = 0
        while f"layer{s}.{b}.conv1.weight" in sd:
            b += 1
        layers.append(b)
    if 0 in layers:
        raise ValueError(f"MS_ResUNet: empty encoder stage (counts {layers})")
    cfg = MSResUNetConfig(scale=scale, layers=tuple(layers))
    stem = int(sd["conv1.weight"].shape[0])
    if stem != cfg.stem_channels:
        raise ValueError(
            f"MS_ResUNet: conv1 out={stem}, expected {cfg.stem_channels} "
            "(non-default width; pass a config explicitly)"
        )
    return cfg


def infer_config(model_name: str, sd: Dict[str, np.ndarray], scale: int):
    """Dispatch: infer the model config for `model_name` from a torch
    state dict, with clear errors for wrong-model / exotic checkpoints
    (VERDICT round-2 item 10)."""
    fns = {
        "ms_resunet": infer_msresunet_config,
        "swinir": infer_swinir_config,
        "hat": infer_hat_config,
        "dat": infer_dat_config,
    }
    if model_name not in fns:
        raise ValueError(f"unknown model '{model_name}' (one of {sorted(fns)})")
    return fns[model_name](sd, scale)
