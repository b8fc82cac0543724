"""Multi-host (pod) runtime: process init + global-batch assembly.

The reference launches one process per GPU with torchrun and rendezvouses
over env vars (``MASTER_ADDR``/``MASTER_PORT``, reference
``train_LDM.sh:32-36``, ``utils.py:55-63``). On TPU there is one process per
HOST; ``jax.distributed.initialize()`` auto-detects the coordinator on TPU
pods (GKE/TPU-VM metadata), and explicit coordinator/process arguments cover
CPU testing and bare-metal launches.

Data flow on a pod: each host's :class:`~ldm3d_tpu.data.loader.BatchLoader`
yields its contiguous shard of the global batch
(``num_hosts=jax.process_count()``); :func:`global_batch` assembles those
process-local arrays into one global jax.Array sharded over the mesh's
``data`` axis — the TPU-native replacement for ``DistributedSampler`` +
per-rank H2D copies. No barriers: collectives inside the jitted step are the
only synchronization.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("multihost")

__all__ = ["init_multihost", "global_batch", "is_multihost"]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> tuple[int, int]:
    """Initialize the JAX distributed runtime; returns (process_id, count).

    With no arguments, relies on TPU-pod auto-detection. Safe to call twice
    (the second call is a no-op warning, not an error).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # Only the double-init case is benign. A swallowed rendezvous/
        # coordinator failure would silently degrade a pod launch to N
        # independent single-process runs (wrong global batch, clashing
        # checkpoints) — re-raise anything else loudly (found in review).
        if "already initialized" not in str(e).lower():
            raise
        log.warning("jax.distributed already initialized: %s", e)
    pid, n = jax.process_index(), jax.process_count()
    log.info("multihost: process %d/%d, %d local / %d global devices",
             pid, n, jax.local_device_count(), jax.device_count())
    return pid, n


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_batch(mesh: Mesh, local_batch):
    """Assemble per-host local batches into a global data-sharded array.

    Each process passes its own shard (leading dim = global_batch/num_hosts);
    the result is a single global ``jax.Array`` with the leading axis sharded
    over ``data`` — every jitted step consumes it exactly like the
    single-host case.
    """
    sharding = NamedSharding(mesh, P("data"))

    def _put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_put, local_batch)
