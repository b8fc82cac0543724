"""Latent caching for stage-2 training: encode the dataset once, train in
latent space.

The reference (and our default path) re-encodes both the high-count and the
low-count volume through the frozen VAE on EVERY train step
(``train_diffusion.py:179-195``) — redundant work, since stage-2 uses center
crops (``randcrop=False``) so each sample's posterior is the same every
epoch. This module precomputes the posterior ``(mu, sigma)`` for every
dataset sample in one pass and trains from those:

  * the per-step VAE encode disappears from the compiled train step
    (measured: the encode is a large fraction of the 96^3 step — see
    docs/PERFORMANCE.md),
  * posterior sampling stays exact: ``z = mu + sigma * N(0,1)`` is drawn
    fresh each step (identical semantics to ``encode_stage_2_inputs``),
  * host->device traffic per step drops ~200x (latents are
    ``(D/4)^3 x C_lat`` instead of ``D^3`` voxels),
  * memory: two fp32 latent pairs per sample ≈ 3.5 MB at 96^3 — thousands of
    volumes fit in host RAM.

Not compatible with random-crop stage-1-style augmentation (each crop would
need its own latent) — stage 2 doesn't use it.
"""

from __future__ import annotations

import logging
import time
from typing import Iterator

import numpy as np

log = logging.getLogger("latent_cache")

__all__ = ["LatentCache"]


class LatentCache:
    """Precomputed posterior latents + an epoch iterator over them."""

    def __init__(self, label_mu, label_sigma, image_mu, image_sigma,
                 batch_size: int, seed: int = 0):
        """``batch_size`` is this host's LOCAL batch (the global batch divided
        by the host count happens in :meth:`build`)."""
        self.label_mu = label_mu
        self.label_sigma = label_sigma
        self.image_mu = image_mu  # None for unconditional training
        self.image_sigma = image_sigma
        self.batch_size = batch_size
        self.seed = seed
        if batch_size <= 0 or len(label_mu) < batch_size:
            raise ValueError(f"cache of {len(label_mu)} samples cannot serve batch {batch_size}")

    @classmethod
    def build(cls, ae, ae_params, dataset, batch_size: int, encode_batch: int = 2,
              conditional: bool = True, seed: int = 0,
              num_hosts: int | None = None, host_id: int | None = None) -> "LatentCache":
        """Encode this host's dataset shard once (chunked jitted encode).

        ``dataset[i]`` must yield ``{"image": ..., "label": ...}`` NDHWC
        numpy volumes (the NPZPairDataset contract). ``batch_size`` is the
        GLOBAL batch; on pods each host caches only its contiguous shard
        (the same split as BatchLoader) and yields ``batch/num_hosts``
        samples per step for ``shard_batch`` to assemble globally.
        """
        import jax
        import jax.numpy as jnp

        if num_hosts is None:
            num_hosts = jax.process_count()
            host_id = jax.process_index()
        elif num_hosts > 1 and host_id is None:
            # same trap as prepare_dataloader: defaulting the shard id to 0
            # under an explicit num_hosts would cache the SAME shard on
            # every host (found in review)
            raise ValueError("host_id is required when num_hosts > 1 is "
                             "passed explicitly")
        host_id = host_id or 0
        if batch_size % num_hosts:
            raise ValueError(f"global batch {batch_size} not divisible by {num_hosts} hosts")

        @jax.jit
        def enc(params, x):
            mu, sigma = ae.apply({"params": params}, x, method="encode")
            return mu.astype(jnp.float32), sigma.astype(jnp.float32)

        t0 = time.time()
        lm, ls, im, isg = [], [], [], []
        per_host = len(dataset) // num_hosts
        lo = host_id * per_host
        n = lo + per_host
        for start in range(lo, n, encode_batch):
            idx = range(start, min(start + encode_batch, n))
            samples = [dataset[i] for i in idx]
            labels = jnp.clip(jnp.asarray(np.stack([s["label"] for s in samples])), 0, 1)
            mu, sigma = enc(ae_params, labels.astype(ae.dtype))
            lm.append(np.asarray(mu))
            ls.append(np.asarray(sigma))
            if conditional:
                images = jnp.clip(jnp.asarray(np.stack([s["image"] for s in samples])), 0, 1)
                mu_i, sigma_i = enc(ae_params, images.astype(ae.dtype))
                im.append(np.asarray(mu_i))
                isg.append(np.asarray(sigma_i))
        label_mu = np.concatenate(lm)
        label_sigma = np.concatenate(ls)
        image_mu = np.concatenate(im) if conditional else None
        image_sigma = np.concatenate(isg) if conditional else None
        mb = (label_mu.nbytes + label_sigma.nbytes
              + (image_mu.nbytes + image_sigma.nbytes if conditional else 0)) / 1e6
        log.info("cached %d samples' latents (host %d/%d) in %.1fs (%.1f MB host RAM)",
                 per_host, host_id, num_hosts, time.time() - t0, mb)
        return cls(label_mu, label_sigma, image_mu, image_sigma,
                   batch_size // num_hosts, seed)

    def __len__(self) -> int:
        return len(self.label_mu)

    def steps_per_epoch(self) -> int:
        return len(self) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Shuffled latent batches (numpy); same drop_last semantics as the
        volume loader."""
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self))
        for b in range(self.steps_per_epoch()):
            sel = order[b * self.batch_size:(b + 1) * self.batch_size]
            out = {"label_mu": self.label_mu[sel], "label_sigma": self.label_sigma[sel]}
            if self.image_mu is not None:
                out["image_mu"] = self.image_mu[sel]
                out["image_sigma"] = self.image_sigma[sel]
            yield out
