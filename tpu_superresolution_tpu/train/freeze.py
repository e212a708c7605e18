"""Regex-based parameter freezing as an optax mask.

Equivalent of the reference's requires_grad=False loop
(train.py:291-296, finetune_swinir.py:290-297), expressed functionally:
a boolean pytree mask (True = trainable) fed to optax.masked so frozen
params get zero updates (and no optimizer state).
Param names are '/'-joined Flax paths, e.g. 'layers_0/blocks_1/attn/qkv/kernel'.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import optax
from flax.traverse_util import flatten_dict, unflatten_dict


def freeze_mask(params: Dict[str, Any], freeze_regex: Optional[str]):
    """True = trainable, False = frozen (matched by regex)."""
    if not freeze_regex:
        return jax.tree.map(lambda _: True, params)
    pat = re.compile(freeze_regex)
    flat = flatten_dict(params)
    mask = {k: not bool(pat.search("/".join(map(str, k)))) for k in flat}
    return unflatten_dict(mask)


def apply_freeze(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen leaves receive zero updates."""
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(
            optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)
        ),
    )


def count_trainable(mask) -> int:
    return sum(bool(x) for x in jax.tree.leaves(mask))
