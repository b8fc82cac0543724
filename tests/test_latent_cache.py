"""Latent-cache tests: cached posteriors match direct encodes; the latent
train step trains; the CLI path is exercised end-to-end in CI's e2e job."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.data import LatentCache
from ldm3d_tpu.diffusion import DDPMScheduler
from ldm3d_tpu.training import (
    Stage2Config,
    TrainState,
    build_lr_schedule,
    make_diffusion_optimizer,
    make_stage2_train_step_latents,
)


class PairDataset:
    def __init__(self, n=6, shape=(16, 16, 16, 1), seed=0):
        rng = np.random.default_rng(seed)
        self.items = [{"image": rng.random(shape, np.float32),
                       "label": rng.random(shape, np.float32)} for _ in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def tiny_ae():
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    ae = ConfigResolver(cfg).instantiate("autoencoder_def")
    rng = jax.random.PRNGKey(0)
    params = ae.init({"params": rng, "sample": rng}, jnp.zeros((1, 16, 16, 16, 1)))["params"]
    return ae, params


def test_cache_matches_direct_encode(tiny_ae):
    ae, params = tiny_ae
    ds = PairDataset()
    cache = LatentCache.build(ae, params, ds, batch_size=2, encode_batch=4)
    assert len(cache) == len(ds)
    # spot-check sample 3 against a direct encode
    mu, sigma = ae.apply({"params": params},
                         jnp.clip(jnp.asarray(ds[3]["label"][None]), 0, 1), method="encode")
    np.testing.assert_allclose(cache.label_mu[3], np.asarray(mu)[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cache.label_sigma[3], np.asarray(sigma)[0], rtol=1e-5, atol=1e-6)
    mu_i, _ = ae.apply({"params": params},
                       jnp.clip(jnp.asarray(ds[3]["image"][None]), 0, 1), method="encode")
    np.testing.assert_allclose(cache.image_mu[3], np.asarray(mu_i)[0], rtol=1e-5, atol=1e-6)


def test_cache_epoch_batches_and_shuffle(tiny_ae):
    ae, params = tiny_ae
    cache = LatentCache.build(ae, params, PairDataset(), batch_size=2)
    b0 = list(cache.epoch(0))
    b1 = list(cache.epoch(1))
    assert len(b0) == cache.steps_per_epoch() == 3
    assert b0[0]["label_mu"].shape[0] == 2
    assert set(b0[0]) == {"label_mu", "label_sigma", "image_mu", "image_sigma"}
    # different epochs shuffle differently (with overwhelming probability)
    assert not all(np.array_equal(a["label_mu"], b["label_mu"]) for a, b in zip(b0, b1))


def test_latent_train_step_trains(tiny_ae):
    ae, ae_params = tiny_ae
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    unet = ConfigResolver(cfg).instantiate("diffusion_def")
    rng = jax.random.PRNGKey(0)
    u_params = unet.init(rng, jnp.zeros((1, 4, 4, 4, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]
    cache = LatentCache.build(ae, ae_params, PairDataset(), batch_size=2)
    sched = DDPMScheduler.create(num_train_timesteps=16)
    step = make_stage2_train_step_latents(unet, sched, Stage2Config())
    state = TrainState.create(unet.apply, u_params,
                              make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 3)))
    losses = []
    for epoch in range(2):
        for batch in cache.epoch(epoch):
            rng, srng = jax.random.split(rng)
            state, m = step(state, jax.tree_util.tree_map(jnp.asarray, batch),
                            jnp.float32(1.0), srng)
            losses.append(float(m["diffusion_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] != losses[0]  # params actually updated


def test_unconditional_cache(tiny_ae):
    ae, params = tiny_ae
    cache = LatentCache.build(ae, params, PairDataset(), batch_size=2, conditional=False)
    batch = next(iter(cache.epoch(0)))
    assert set(batch) == {"label_mu", "label_sigma"}


def test_cache_rejects_oversized_batch(tiny_ae):
    ae, params = tiny_ae
    with pytest.raises(ValueError, match="cannot serve batch"):
        LatentCache.build(ae, params, PairDataset(n=2), batch_size=4)


def test_host_sharded_cache(tiny_ae):
    """Pod semantics: hosts cache disjoint contiguous shards and serve the
    global batch divided by the host count (BatchLoader parity)."""
    ae, params = tiny_ae
    ds = PairDataset(n=8)
    c0 = LatentCache.build(ae, params, ds, batch_size=4, num_hosts=2, host_id=0)
    c1 = LatentCache.build(ae, params, ds, batch_size=4, num_hosts=2, host_id=1)
    assert len(c0) == len(c1) == 4
    assert c0.batch_size == c1.batch_size == 2  # local = global / hosts
    # disjoint contiguous shards: host0 = samples 0..3, host1 = 4..7
    full = LatentCache.build(ae, params, ds, batch_size=4, num_hosts=1, host_id=0)
    np.testing.assert_array_equal(c0.label_mu, full.label_mu[:4])
    np.testing.assert_array_equal(c1.label_mu, full.label_mu[4:])
    with pytest.raises(ValueError, match="divisible"):
        LatentCache.build(ae, params, ds, batch_size=3, num_hosts=2, host_id=0)
