"""Device mesh and sharding utilities.

The reference's only parallelism is torch-DDP data parallelism over NCCL via
HF Accelerate (``scripts/smoke/train_base_sim.sh:3-10``,
``diffusion_2d.py:1153-1181``).  The TPU-native equivalent: a single jitted
SPMD train step over a ``jax.sharding.Mesh`` with the batch sharded along a
``data`` axis; XLA inserts the gradient all-reduce over ICI.  A ``model``
axis is reserved for tensor-parallel sharding of larger models (unused at
reference scale, kept open per SURVEY §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings"]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_shardings(mesh: Mesh):
    """(state_sharding, batch_sharding) for the canonical DP train step."""
    return replicate(mesh), shard_batch(mesh)
