"""Inferer tests: the compiled scan sampler equals a hand-stepped Python loop."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.diffusion import DDIMScheduler, DDPMScheduler, inferer


def _toy_unet(x, t):
    """Deterministic stand-in 'model': epsilon-hat depends on x and t."""
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1, 1) / 100.0
    # use only the first 2 channels (the 'latent') even when conditioned
    return 0.1 * x[..., :2] + 0.01 * tt


def test_scan_matches_python_loop_ddpm():
    sch = DDPMScheduler.create(num_train_timesteps=12)
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4, 2))
    rng = jax.random.PRNGKey(1)

    got = inferer.sample_latents(_toy_unet, sch, noise, rng)

    # hand-stepped loop with the identical per-step rng derivation
    ts = np.asarray(sch.timesteps)
    step_rngs = jax.random.split(rng, len(ts))
    x = noise
    for i, t in enumerate(ts):
        pred = _toy_unet(x, jnp.full((2,), t, jnp.int32))
        x = sch.step(pred, jnp.int32(t), x, step_rngs[i])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_scan_matches_python_loop_ddim_conditional():
    sch = DDIMScheduler.create(num_train_timesteps=20, num_inference_steps=5)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 2))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4, 2))
    rng = jax.random.PRNGKey(1)

    got = inferer.sample_latents(_toy_unet, sch, noise, rng, condition=cond)

    ts = np.asarray(sch.timesteps)
    step_rngs = jax.random.split(rng, len(ts))
    x = noise
    for i, t in enumerate(ts):
        xin = jnp.concatenate([x, cond], axis=-1)
        pred = _toy_unet(xin, jnp.full((1,), t, jnp.int32))
        x = sch.step(pred, jnp.int32(t), x, step_rngs[i])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_sample_applies_scale_factor_before_decode():
    sch = DDIMScheduler.create(num_train_timesteps=10, num_inference_steps=2)
    noise = jnp.ones((1, 2, 2, 2, 2))
    captured = {}

    def decode(z):
        captured["z"] = z
        return z * 2.0

    out = inferer.sample(lambda x, t: jnp.zeros_like(x), decode, sch, noise,
                         jax.random.PRNGKey(0), scale_factor=4.0)
    latents = inferer.sample_latents(lambda x, t: jnp.zeros_like(x), sch, noise, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(captured["z"]), np.asarray(latents) / 4.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(latents) / 2.0, atol=1e-6)


def test_training_inputs_concat_order():
    sch = DDPMScheduler.create(num_train_timesteps=10)
    lat = jnp.ones((1, 2, 2, 2, 3))
    cond = 2 * jnp.ones((1, 2, 2, 2, 5))
    noise = jnp.zeros_like(lat)
    t = jnp.array([0])
    out = inferer.noise_prediction_inputs(sch, lat, noise, t, cond)
    assert out.shape[-1] == 8
    # latent channels first, condition channels after (concat mode)
    a0 = float(sch.alphas_cumprod[0]) ** 0.5
    np.testing.assert_allclose(np.asarray(out[..., :3]), a0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 3:]), 2.0, rtol=1e-6)


def test_training_targets_by_prediction_type():
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 2, 2, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), lat.shape)
    t = jnp.array([1, 5])
    eps_sch = DDPMScheduler.create(num_train_timesteps=10)
    np.testing.assert_allclose(np.asarray(inferer.training_targets(eps_sch, lat, noise, t)),
                               np.asarray(noise))
    v_sch = DDPMScheduler.create(num_train_timesteps=10, prediction_type="v_prediction")
    v = inferer.training_targets(v_sch, lat, noise, t)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_sch.velocity(lat, noise, t)), atol=1e-6)
