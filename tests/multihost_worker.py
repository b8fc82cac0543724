"""Subprocess worker for the multi-host test (one JAX process per invocation).

Run by tests/test_multihost.py as: python multihost_worker.py PROC_ID NPROC PORT
Prints machine-readable RESULT lines the parent asserts on.
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldm3d_tpu.parallel import MeshSpec, create_mesh, init_multihost, shard_batch  # noqa: E402

pid, n = init_multihost(f"localhost:{port}", nproc, proc_id)
assert (pid, n) == (proc_id, nproc), (pid, n)
print(f"RESULT devices {jax.local_device_count()} {jax.device_count()}", flush=True)

mesh = create_mesh(MeshSpec(data=jax.device_count()))

# per-host loader shard: each host sees a disjoint slice of the dataset
from ldm3d_tpu.data.loader import BatchLoader  # noqa: E402


class IdxDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        return {"x": np.full((4,), float(i), np.float32)}


GLOBAL_BATCH = 4
loader = BatchLoader(IdxDataset(), GLOBAL_BATCH, shuffle=False, drop_last=True,
                     num_hosts=jax.process_count(), host_id=jax.process_index())
local = next(iter(loader.epoch(0)))
assert local["x"].shape == (GLOBAL_BATCH // nproc, 4), local["x"].shape
print(f"RESULT local_ids {sorted(set(local['x'][:, 0].tolist()))}", flush=True)

# assemble the global batch and reduce inside jit: the mean over the global
# array must equal the mean over ALL hosts' samples on every process
batch = shard_batch(mesh, local)
mean = jax.jit(lambda b: jnp.mean(b["x"]))(batch)
print(f"RESULT global_mean {float(mean):.6f}", flush=True)

# a data-parallel gradient: psum-style reduction through jit sharding — the
# update must be identical on every host
w = jnp.ones((4,))
grad = jax.jit(jax.grad(lambda w, b: jnp.mean((b["x"] @ w) ** 2)))(w, batch)
# repr round-trips float64 exactly — the reader asserts BITWISE agreement
print(f"RESULT grad {' '.join(repr(float(g)) for g in np.asarray(grad))}", flush=True)
