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
    """Bootstrap multi-process JAX.  No-op when running single-process (the
    common single-host case).

    MUST run before anything initializes the XLA backend — so the
    cluster-or-not decision is made from the environment, NOT from
    ``jax.process_count()`` (which itself initializes the backend, after
    which ``jax.distributed.initialize`` raises and multi-host bootstrap
    silently never happens).
    """
    import os
    import sys

    def _hostlist(name: str) -> bool:
        # a real worker list is comma-separated hostnames/IPs; some runtimes
        # leave a warning STRING in the var — don't treat that as a cluster
        v = os.environ.get(name, "")
        return bool(v) and " " not in v.strip()

    cluster_env = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        # Cloud TPU pod slices: the TPU runtime exposes worker metadata and
        # jax.distributed.initialize autodiscovers the coordinator
        or (_hostlist("TPU_WORKER_HOSTNAMES") and "," in os.environ["TPU_WORKER_HOSTNAMES"])
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not cluster_env:
        return  # single-process run: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # do NOT swallow silently: a failed bootstrap on a real cluster
        # means every host trains alone with a wrong (local-only) mesh
        print(
            f"WARNING: jax.distributed.initialize failed ({e}); continuing "
            "single-process — multi-host collectives will NOT engage",
            file=sys.stderr,
        )


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
