"""Device mesh and sharding utilities.

The reference's only parallelism is torch-DDP data parallelism over NCCL via
HF Accelerate (``scripts/smoke/train_base_sim.sh:3-10``,
``diffusion_2d.py:1153-1181``).  The TPU-native equivalent: a single jitted
SPMD train step over a ``jax.sharding.Mesh`` with the batch sharded along a
``data`` axis; XLA inserts the gradient all-reduce over ICI.

Beyond the reference, a ``model`` axis provides tensor parallelism: every
conv/dense kernel's output-channel dimension is sharded over ``model``
(Megatron-style column parallelism, expressed as GSPMD parameter
annotations — XLA propagates the activation shardings and inserts the
all-gathers/reduce-scatters over ICI).  At reference scale one chip holds
the model, but the 140M-param Burgers UNet2D at dim 128 leaves little HBM
headroom next to a device-resident dataset; TP also halves optimizer+EMA
memory per chip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "maybe_shard_batch",
    "train_state_shardings",
]


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


def maybe_shard_batch(mesh: Optional[Mesh], batch_size: int) -> Optional[NamedSharding]:
    """``shard_batch(mesh)`` when the batch divides the 'data' axis, else
    None (e.g. a short final eval chunk that can't split evenly)."""
    if mesh is None or batch_size % int(mesh.shape.get("data", 1)):
        return None
    return shard_batch(mesh)


def _path_leaf_name(path) -> str:
    """Last key of a pytree path as a string ('kernel', 'bias', ...)."""
    if not path:
        return ""
    key = path[-1]
    for attr in ("key", "name", "idx"):
        if hasattr(key, attr):
            return str(getattr(key, attr))
    return str(key)


def train_state_shardings(
    mesh: Mesh, state: Any, axis: str = "model", fsdp: bool = False
):
    """NamedShardings for a full TrainState pytree under DP x TP (x FSDP).

    TP rule: any leaf whose pytree path ends in ``kernel`` with ndim >= 2 and
    an output-channel (last) dim divisible by the ``model`` axis size is
    sharded ``P(None, ..., 'model')``; everything else (biases, norm scales,
    embedding tables, scalars) is replicated.  Because optax's Adam moments
    and the EMA mirror the param tree structure (same dict keys), the same
    path rule shards them identically — optimizer memory is split with the
    params.

    FSDP rule (``fsdp=True``): kernels are additionally sharded over the
    ``data`` axis on their input-channel (second-to-last) dim — ZeRO-3-style
    fully-sharded params/moments/EMA; XLA GSPMD inserts the per-layer weight
    all-gathers in the forward/backward and reduce-scatters the gradients.

    With ``model`` size 1 and ``fsdp=False`` this degenerates to
    fully-replicated DP, so the Trainer uses it unconditionally.
    """
    n_model = int(mesh.shape.get(axis, 1))
    n_data = int(mesh.shape.get("data", 1))
    repl = NamedSharding(mesh, P())

    def rule(path, leaf):
        if (
            not hasattr(leaf, "ndim")
            or leaf.ndim < 2
            or _path_leaf_name(path) != "kernel"
        ):
            return repl
        spec = [None] * leaf.ndim
        if n_model > 1 and leaf.shape[-1] % n_model == 0:
            spec[-1] = axis
        if fsdp and n_data > 1 and leaf.shape[-2] % n_data == 0:
            spec[-2] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, state)
