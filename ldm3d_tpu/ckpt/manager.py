"""Checkpointing via orbax: best/last retention, full train state.

Improves on the reference's checkpoint story while keeping its artifact
contract. The reference saves bare ``state_dict`` files (``autoencoder.pt``
best + ``autoencoder_last.pt`` etc., ``train_autoencoder.py:184-187,629-647``)
— optimizer state and epoch counter are lost, so resume restarts the schedule
(SURVEY.md 5.4). Here the full train state (params, opt state, step) plus
stage metadata (epoch, best loss, scale_factor) round-trips.

Artifact layout under ``model_dir``:
  autoencoder/{best,last}/     discriminator/{best,last}/
  diffusion_unet/{best,last}/  (+ meta.json per role)

Cross-stage contract parity: stage 2 hard-requires the stage-1 best
autoencoder (reference ``train_diffusion.py:92-96``), inference requires both.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "StageArtifacts"]


@dataclasses.dataclass(frozen=True)
class StageArtifacts:
    """Names of per-model checkpoint roles, mirroring the reference files."""

    AUTOENCODER = "autoencoder"
    DISCRIMINATOR = "discriminator"
    DIFFUSION = "diffusion_unet"


class CheckpointManager:
    """Best/last checkpointing for one named model role."""

    def __init__(self, model_dir: str, name: str):
        self.root = os.path.abspath(os.path.join(model_dir, name))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_meta: Optional[tuple[str, dict]] = None  # written at commit

    # -- paths ---------------------------------------------------------------

    def path(self, role: str) -> str:
        return os.path.join(self.root, role)

    def exists(self, role: str) -> bool:
        return os.path.isdir(self.path(role))

    # -- save ----------------------------------------------------------------

    def save(self, role: str, state: Any, meta: Optional[dict] = None,
             block: bool = True) -> None:
        """Save ``state`` (any pytree of arrays) under ``role`` (best/last).

        ``block=False`` lets orbax finish the write in the background while
        training continues (the save barriers only device->host transfer, not
        the serialization); any previous in-flight save is drained first, and
        callers must :meth:`wait` (or do a blocking save) before process exit
        or before restoring the same role. The meta sidecar of an async save
        is written only once the checkpoint commits (at the next drain), so a
        crash mid-write never leaves meta pointing at a missing checkpoint."""
        path = self.path(role)
        self._drain()  # previous async save commits; its meta flushes
        self._ckptr.save(path, state, force=True)
        if block:
            self._ckptr.wait_until_finished()
            if meta is not None:
                self._write_meta(role, meta)
        elif meta is not None:
            self._pending_meta = (role, meta)

    def _write_meta(self, role: str, meta: dict) -> None:
        with open(os.path.join(self.root, f"{role}_meta.json"), "w") as f:
            json.dump(meta, f)

    def _drain(self) -> None:
        self._ckptr.wait_until_finished()
        if self._pending_meta is not None:
            role, meta = self._pending_meta
            self._pending_meta = None
            self._write_meta(role, meta)

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk (and
        flush its deferred meta sidecar)."""
        self._drain()

    def save_best_and_last(self, state: Any, is_best: bool, meta: Optional[dict] = None,
                           block: bool = True) -> None:
        """``last`` = the full pytree (true resume: params + opt state + step);
        ``best`` = params only (the deployment artifact other stages load)."""
        # 'last' may overlap training (block=False); a following 'best' save
        # drains it first, so the deployment artifact is never half-written
        self.save("last", state, meta, block=block)
        if is_best:
            best = {"params": state["params"]} if isinstance(state, dict) and "params" in state else state
            self.save("best", best, meta)

    def restore_params(self, role: str, abstract_params: Any, sharding=None) -> Any:
        """Restore a params-only checkpoint (the ``best`` artifact).

        Pass ``sharding`` (e.g. ``replicated_sharding(mesh)``) when the active
        mesh uses a subset of the visible devices; the default replicates over
        ALL devices, which jit rejects when mixed with subset-mesh arrays."""
        return self.restore(role, {"params": abstract_params}, sharding=sharding)["params"]

    # -- restore ---------------------------------------------------------------

    def restore(self, role: str, abstract_state: Any, sharding=None) -> Any:
        """Restore into the structure of ``abstract_state`` (a matching pytree
        of arrays or ShapeDtypeStructs).

        The template pins an explicit target sharding (replicated over the
        current devices by default), so checkpoints restore across topologies
        — save on an N-chip mesh, load on 1 chip and vice versa (the
        cross-device ``map_location`` remap of the reference,
        ``train_autoencoder.py:197``).
        """
        if sharding is None:
            from jax.sharding import NamedSharding, PartitionSpec
            from jax.sharding import Mesh
            import numpy as np

            mesh = Mesh(np.asarray(jax.devices()), axis_names=("all",))
            sharding = NamedSharding(mesh, PartitionSpec())

        def _abstract(x):
            if isinstance(x, jax.ShapeDtypeStruct):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

        template = jax.tree.map(_abstract, abstract_state)
        return self._ckptr.restore(self.path(role), template)

    def load_meta(self, role: str) -> dict:
        p = os.path.join(self.root, f"{role}_meta.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def try_restore(self, role: str, abstract_state: Any, sharding=None) -> tuple[Any, bool]:
        """Restore if present; (state, restored?) — resume-from-scratch parity
        with the reference's silent fallback (``train_autoencoder.py:196-212``),
        but loud: callers log the outcome."""
        if not self.exists(role):
            return abstract_state, False
        return self.restore(role, abstract_state, sharding=sharding), True
