"""JAX param-tree -> PyTorch checkpoint exporters (the reverse of
torch_convert.py): publish framework-trained weights in the reference's
native format so reference users can consume them directly
(``/root/reference/modules/evaluate.py:41-63`` loads these via
torch.load + state-dict unwrap).

Layout transforms (flax NHWC -> torch):
- kernel [kh, kw, I, O] -> Conv2d weight [O, I, kh, kw]
- kernel [kh, kw, O, I] -> ConvTranspose2d weight [I, O, kh, kw]
- kernel [I, O] -> Linear weight [O, I]
- scale/bias -> LayerNorm/BatchNorm weight/bias; batch_stats mean/var
  -> running_mean/running_var (+ num_batches_tracked = 0, torch's
  fresh-module default).

Every exporter round-trips bit-exactly through its torch_convert
counterpart (tests/test_torch_export.py proves sd -> convert -> export
== sd against the actual reference models)."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv_w_inv(k) -> np.ndarray:
    return np.transpose(_np(k), (3, 2, 0, 1))


def _convT_w_inv(k) -> np.ndarray:
    return np.transpose(_np(k), (3, 2, 0, 1))


class _Tree:
    """Path-based reads over a nested param dict."""

    def __init__(self, root: Mapping):
        self.root = root or {}

    def has(self, *path) -> bool:
        node = self.root
        for p in path:
            if not isinstance(node, Mapping) or p not in node:
                return False
            node = node[p]
        return True

    def get(self, *path) -> np.ndarray:
        node = self.root
        for p in path:
            node = node[p]
        return _np(node)


class _Exporter:
    def __init__(self, variables: Mapping):
        self.p = _Tree(variables.get("params", variables))
        self.s = _Tree(variables.get("batch_stats", {}))
        self.out: Dict[str, np.ndarray] = {}

    def ln(self, tname, *jpath):
        self.out[tname + ".weight"] = self.p.get(*jpath, "scale")
        self.out[tname + ".bias"] = self.p.get(*jpath, "bias")

    def conv(self, tname, *jpath):
        self.out[tname + ".weight"] = _conv_w_inv(self.p.get(*jpath, "kernel"))
        if self.p.has(*jpath, "bias"):
            self.out[tname + ".bias"] = self.p.get(*jpath, "bias")

    def dense(self, tname, *jpath):
        self.out[tname + ".weight"] = self.p.get(*jpath, "kernel").T
        if self.p.has(*jpath, "bias"):
            self.out[tname + ".bias"] = self.p.get(*jpath, "bias")

    def bn(self, tname, *jpath):
        self.out[tname + ".weight"] = self.p.get(*jpath, "scale")
        self.out[tname + ".bias"] = self.p.get(*jpath, "bias")
        self.out[tname + ".running_mean"] = self.s.get(*jpath, "mean")
        self.out[tname + ".running_var"] = self.s.get(*jpath, "var")
        self.out[tname + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def raw(self, tname, value):
        self.out[tname] = _np(value)


def _export_upsample_tail(e: _Exporter):
    """Shared SwinIR/HAT/DAT reconstruction tail (torch Sequential
    conv indices 0/2/4 interleave PixelShuffle stages)."""
    if e.p.has("conv_after_body"):
        e.conv("conv_after_body", "conv_after_body")
    elif e.p.has("conv_after_body_0"):
        e.conv("conv_after_body.0", "conv_after_body_0")
        e.conv("conv_after_body.2", "conv_after_body_2")
        e.conv("conv_after_body.4", "conv_after_body_4")
    if e.p.has("conv_before_upsample"):
        e.conv("conv_before_upsample.0", "conv_before_upsample")
        for k, t_idx in enumerate((0, 2, 4)):
            if e.p.has("upsample", f"conv_{k}"):
                e.conv(f"upsample.{t_idx}", "upsample", f"conv_{k}")
    elif e.p.has("upsample", "conv"):  # pixelshuffledirect
        e.conv("upsample.0", "upsample", "conv")
    # nearest+conv heads coexist with conv_before_upsample; conv_last is
    # shared by every reconstruction variant that has it
    for name in ("conv_last", "conv_up1", "conv_up2", "conv_hr"):
        if e.p.has(name):
            e.conv(name, name)


def export_swinir(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_swinir."""
    e = _Exporter(variables)
    e.conv("conv_first", "conv_first")
    if e.p.has("patch_norm"):
        e.ln("patch_embed.norm", "patch_norm")
    if e.p.has("absolute_pos_embed"):
        ape = e.p.get("absolute_pos_embed")  # [side, side, C]
        e.raw("absolute_pos_embed", ape.reshape(1, -1, ape.shape[-1]))
    i = 0
    while e.p.has(f"layers_{i}"):
        lp, t = f"layers_{i}", f"layers.{i}"
        j = 0
        while e.p.has(lp, f"blocks_{j}"):
            bp = (lp, f"blocks_{j}")
            tb = f"{t}.residual_group.blocks.{j}"
            e.ln(f"{tb}.norm1", *bp, "norm1")
            e.ln(f"{tb}.norm2", *bp, "norm2")
            e.dense(f"{tb}.attn.qkv", *bp, "attn", "qkv")
            e.dense(f"{tb}.attn.proj", *bp, "attn", "proj")
            e.raw(f"{tb}.attn.relative_position_bias_table",
                  e.p.get(*bp, "attn", "relative_position_bias_table"))
            e.dense(f"{tb}.mlp.fc1", *bp, "mlp", "fc1")
            e.dense(f"{tb}.mlp.fc2", *bp, "mlp", "fc2")
            j += 1
        if e.p.has(lp, "conv"):
            e.conv(f"{t}.conv", lp, "conv")
        else:
            e.conv(f"{t}.conv.0", lp, "conv_0")
            e.conv(f"{t}.conv.2", lp, "conv_2")
            e.conv(f"{t}.conv.4", lp, "conv_4")
        i += 1
    e.ln("norm", "norm")
    _export_upsample_tail(e)
    return e.out


def export_hat(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_hat."""
    e = _Exporter(variables)
    e.conv("conv_first", "conv_first")
    if e.p.has("patch_norm"):
        e.ln("patch_embed.norm", "patch_norm")
    i = 0
    while e.p.has(f"layers_{i}"):
        lp, t = f"layers_{i}", f"layers.{i}"
        j = 0
        while e.p.has(lp, f"blocks_{j}"):
            bp = (lp, f"blocks_{j}")
            tb = f"{t}.residual_group.blocks.{j}"
            e.ln(f"{tb}.norm1", *bp, "norm1")
            e.ln(f"{tb}.norm2", *bp, "norm2")
            e.dense(f"{tb}.attn.qkv", *bp, "attn", "qkv")
            e.dense(f"{tb}.attn.proj", *bp, "attn", "proj")
            e.raw(f"{tb}.attn.relative_position_bias_table",
                  e.p.get(*bp, "attn", "relative_position_bias_table"))
            e.conv(f"{tb}.conv_block.cab.0", *bp, "conv_block", "conv1")
            e.conv(f"{tb}.conv_block.cab.2", *bp, "conv_block", "conv2")
            e.conv(f"{tb}.conv_block.cab.3.attention.1",
                   *bp, "conv_block", "ca", "fc1")
            e.conv(f"{tb}.conv_block.cab.3.attention.3",
                   *bp, "conv_block", "ca", "fc2")
            e.dense(f"{tb}.mlp.fc1", *bp, "mlp", "fc1")
            e.dense(f"{tb}.mlp.fc2", *bp, "mlp", "fc2")
            j += 1
        to = f"{t}.residual_group.overlap_attn"
        op = (lp, "overlap_attn")
        e.ln(f"{to}.norm1", *op, "norm1")
        e.ln(f"{to}.norm2", *op, "norm2")
        e.dense(f"{to}.qkv", *op, "qkv")
        e.dense(f"{to}.proj", *op, "proj")
        e.raw(f"{to}.relative_position_bias_table",
              e.p.get(*op, "relative_position_bias_table"))
        e.dense(f"{to}.mlp.fc1", *op, "mlp", "fc1")
        e.dense(f"{to}.mlp.fc2", *op, "mlp", "fc2")
        if e.p.has(lp, "conv"):
            e.conv(f"{t}.conv", lp, "conv")
        i += 1
    e.ln("norm", "norm")
    _export_upsample_tail(e)
    return e.out


def export_dat(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_dat."""
    e = _Exporter(variables)

    def aim(tp, *jp):
        e.conv(f"{tp}.dwconv.0", *jp, "dwconv", "conv")
        e.bn(f"{tp}.dwconv.1", *jp, "dwconv", "bn")
        e.conv(f"{tp}.channel_interaction.1",
               *jp, "channel_interaction", "fc1")
        e.bn(f"{tp}.channel_interaction.2", *jp, "channel_interaction", "bn")
        e.conv(f"{tp}.channel_interaction.4",
               *jp, "channel_interaction", "fc2")
        e.conv(f"{tp}.spatial_interaction.0",
               *jp, "spatial_interaction", "fc1")
        e.bn(f"{tp}.spatial_interaction.1", *jp, "spatial_interaction", "bn")
        e.conv(f"{tp}.spatial_interaction.3",
               *jp, "spatial_interaction", "fc2")

    e.conv("conv_first", "conv_first")
    e.ln("before_RG.1", "before_RG_norm")
    i = 0
    while e.p.has(f"layers_{i}"):
        lp, t = f"layers_{i}", f"layers.{i}"
        j = 0
        while e.p.has(lp, f"blocks_{j}"):
            bp = (lp, f"blocks_{j}")
            tb = f"{t}.blocks.{j}"
            e.ln(f"{tb}.norm1", *bp, "norm1")
            e.ln(f"{tb}.norm2", *bp, "norm2")
            e.dense(f"{tb}.attn.qkv", *bp, "attn", "qkv")
            e.dense(f"{tb}.attn.proj", *bp, "attn", "proj")
            aim(f"{tb}.attn", *bp, "attn")
            if e.p.has(*bp, "attn", "temperature"):  # channel block
                e.raw(f"{tb}.attn.temperature",
                      e.p.get(*bp, "attn", "temperature"))
            else:  # spatial block: two DynamicPosBias branches
                for idx in (0, 1):
                    pp = bp + ("attn", f"attns_{idx}", "pos")
                    tpos = f"{tb}.attn.attns.{idx}.pos"
                    e.dense(f"{tpos}.pos_proj", *pp, "pos_proj")
                    for n in (1, 2, 3):
                        e.ln(f"{tpos}.pos{n}.0", *pp, f"pos{n}_norm")
                        e.dense(f"{tpos}.pos{n}.2", *pp, f"pos{n}_fc")
            e.dense(f"{tb}.ffn.fc1", *bp, "ffn", "fc1")
            e.dense(f"{tb}.ffn.fc2", *bp, "ffn", "fc2")
            e.ln(f"{tb}.ffn.sg.norm", *bp, "ffn", "sg_norm")
            e.conv(f"{tb}.ffn.sg.conv", *bp, "ffn", "sg_conv")
            j += 1
        if e.p.has(lp, "conv"):
            e.conv(f"{t}.conv", lp, "conv")
        elif e.p.has(lp, "conv_0"):
            e.conv(f"{t}.conv.0", lp, "conv_0")
            e.conv(f"{t}.conv.2", lp, "conv_2")
            e.conv(f"{t}.conv.4", lp, "conv_4")
        i += 1
    e.ln("norm", "norm")
    _export_upsample_tail(e)
    return e.out


def export_msresunet(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_msresunet (setattr-generated RCU
    key names per ms_resunet.py:16-19,39-43)."""
    e = _Exporter(variables)
    e.conv("conv1", "conv1")
    e.bn("bn1", "bn1")
    for s in (1, 2, 3, 4):
        b = 0
        while e.p.has(f"layer{s}_{b}"):
            jmod = f"layer{s}_{b}"
            for idx in (1, 2, 3):
                e.conv(f"layer{s}.{b}.conv{idx}", jmod, f"conv{idx}")
                e.bn(f"layer{s}.{b}.bn{idx}", jmod, f"bn{idx}")
            if e.p.has(jmod, "downsample_conv"):
                e.conv(f"layer{s}.{b}.downsample.0", jmod, "downsample_conv")
                e.bn(f"layer{s}.{b}.downsample.1", jmod, "downsample_bn")
            b += 1
    # decoder: flax refine{k} submodules -> setattr-generated torch names
    rcu_suffix = {1: "_conv", 2: "_conv_relu_varout_dimred"}
    for k in (1, 2, 3, 4):
        ref = f"refine{k}"
        if not e.p.has(ref):
            continue
        if e.p.has(ref, "dimred"):
            e.conv(f"p_ims1d2_outl{k}_dimred", ref, "dimred")
        for sub, thead in (
            ("adapt", f"adapt_stage{k}_b"),
            ("mflow", f"mflow_conv_g{k}_b"),
        ):
            i = 1
            while e.p.has(ref, sub, f"b{i}s1"):
                for j in (1, 2):
                    e.conv(f"{thead}.0.{i}{rcu_suffix[j]}", ref, sub,
                           f"b{i}s{j}")
                i += 1
        if e.p.has(ref, "adapt_dimred"):
            e.conv(f"adapt_stage{k}_b2_joint_varout_dimred",
                   ref, "adapt_dimred")
        i = 1
        while e.p.has(ref, "pool", f"conv{i}"):
            e.conv(f"mflow_conv_g{k}_pool.0.{i}_outvar_dimred",
                   ref, "pool", f"conv{i}")
            i += 1
        if e.p.has(ref, "out_dimred"):
            e.conv(f"mflow_conv_g{k}_b3_joint_varout_dimred",
                   ref, "out_dimred")
    for k in (2, 3, 4):
        tname = f"upCT{k}"
        e.out[tname + ".weight"] = _convT_w_inv(e.p.get(tname, "kernel"))
        e.out[tname + ".bias"] = e.p.get(tname, "bias")
    for name in ("clf_conv1", "clf_conv2"):
        e.conv(name, name)
    return e.out


_EXPORTERS = {
    "ms_resunet": export_msresunet,
    "swinir": export_swinir,
    "hat": export_hat,
    "dat": export_dat,
}


def export_state_dict(model_name: str, variables: Mapping) -> Dict[str, np.ndarray]:
    """Framework variables -> reference-format flat torch state dict."""
    if model_name not in _EXPORTERS:
        raise ValueError(
            f"no torch exporter for '{model_name}' "
            f"(have: {sorted(_EXPORTERS)})"
        )
    return _EXPORTERS[model_name](variables)


def save_torch_checkpoint(model_name: str, variables: Mapping, path: str):
    """Write a reference-loadable .pt: {'params': state_dict} (one of
    the wrapper keys the reference's unwrap accepts —
    torch_convert._WRAPPER_KEYS / reference evaluate.py:139-145)."""
    import torch

    sd = export_state_dict(model_name, variables)
    torch.save(
        {"params": {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}},
        path,
    )
    return path
