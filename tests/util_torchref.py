"""Harness to import the reference PyTorch models for golden-parity tests.

The reference modules import `timm` (absent in this image), so a minimal
shim providing DropPath / to_2tuple / trunc_normal_ is injected first.
This is test scaffolding only — no reference code is copied; the torch
modules are imported from /root/reference read-only and used as the
numerical oracle.
"""

import sys
import types
from itertools import repeat

import torch
import torch.nn as nn

REFERENCE_MODULES = "/root/reference/modules"


def _install_timm_shim():
    if "timm" in sys.modules:
        return

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return tuple(repeat(x, 2))

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x.div(keep) * mask

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")
    models_layers = types.ModuleType("timm.models.layers")
    for mod in (layers, models_layers):
        mod.DropPath = DropPath
        mod.to_2tuple = to_2tuple
        mod.trunc_normal_ = trunc_normal_
    timm.layers = layers
    timm.models = models
    models.layers = models_layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = models_layers


def import_reference(name: str):
    """Import a reference module (e.g. 'ms_resunet', 'network_swinir')."""
    _install_timm_shim()
    if REFERENCE_MODULES not in sys.path:
        sys.path.insert(0, REFERENCE_MODULES)
    import importlib

    return importlib.import_module(name)
