"""Device-mesh construction + sharding helpers.

The reference has ZERO distributed code (SURVEY.md §2.4: no
torch.distributed anywhere); this layer is new, TPU-first
infrastructure: a `jax.sharding.Mesh` over ICI with named axes, batch
sharding via NamedSharding, replicated params.  On multi-host slices,
`jax.distributed.initialize` + per-host data sharding slot in here; the
same code runs on the fake 8-device CPU mesh in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the JAX distributed runtime for multi-host slices
    (SURVEY.md §2.4: the framework's 'communication backend' is the mesh
    + XLA collectives; multi-host discovery goes through
    jax.distributed.initialize — ICI within a slice, DCN across).

    No-ops on single-process setups (already-initialized or standalone).
    Returns the global device count.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # single process, or already initialized
    return len(jax.devices())


def make_mesh(
    dp: Optional[int] = None,
    axis_name: str = "dp",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over `dp` devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if dp is None or dp <= 0:
        dp = len(devs)
    if dp > len(devs):
        raise ValueError(f"requested dp={dp} > available devices {len(devs)}")
    return Mesh(np.asarray(devs[:dp]), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place [B, ...] arrays sharded along batch dim over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
