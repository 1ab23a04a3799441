"""Multi-host (multi-slice) support.

The reference's distributed story stops at single-host multi-GPU DDP with an
NCCL rendezvous port (``scripts/smoke/train_base_sim.sh:3-10``).  On TPU pods
the equivalent pieces are:

* process bootstrap — ``jax.distributed.initialize`` (coordinator discovery
  is automatic on Cloud TPU; explicit args supported for other clusters);
* a global mesh over ``jax.devices()`` (all processes see every device);
* host-local input pipelines — each host loads only its shard of the batch
  and ``jax.make_array_from_process_local_data`` assembles the global array
  (gradient all-reduce rides ICI within a slice, DCN across slices, inserted
  by XLA from the shardings — no NCCL/MPI calls anywhere).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "global_batch_from_host_local", "process_batch_slice"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap multi-process JAX.  No-op when already initialized or when
    running single-process (the common single-host case)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no cluster env): nothing to do
        pass


def process_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this host must load."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_host_local(local_batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble the globally data-sharded batch from this host's rows.

    Each process passes only its local rows (``process_batch_slice`` of the
    global batch); the result is one logical array sharded over the 'data'
    mesh axis, ready for the jitted SPMD train step.
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_batch)
