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
