"""Loss tests — superset of the reference's pre-flight loss smoke tests
(``3d_ldm/test_losses.py``: scalar-ness + NaN checks on dummy 32-cubed
tensors), plus golden closed-form values the reference never verified."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.losses import (
    kl_loss,
    l1_loss,
    l2_loss,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
)


def _dummy(shape=(2, 1, 32, 32, 1), seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape)


def test_all_losses_scalar_and_finite():
    x, y = _dummy(seed=0), _dummy(seed=1)
    mu = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4, 2))
    sigma = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), mu.shape)) + 0.1
    logits = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 4, 1))
    for loss in (l1_loss(x, y), l2_loss(x, y), kl_loss(mu, sigma),
                 lsgan_generator_loss(logits),
                 lsgan_discriminator_loss(logits, -logits)):
        assert loss.shape == ()
        assert np.isfinite(float(loss))


def test_recon_golden_values():
    a = jnp.zeros((1, 2, 2, 2, 1))
    b = jnp.full((1, 2, 2, 2, 1), 0.5)
    assert float(l1_loss(a, b)) == 0.5
    assert float(l2_loss(a, b)) == 0.25


def test_kl_closed_form():
    # KL(N(0, 1) || N(0, 1)) = 0 per element
    mu = jnp.zeros((3, 4, 4, 4, 2))
    sigma = jnp.ones_like(mu)
    assert abs(float(kl_loss(mu, sigma))) < 1e-4
    # KL(N(m, 1) || N(0,1)) = m^2/2 per element, summed over latent dims
    mu2 = jnp.full_like(mu, 2.0)
    expected = 0.5 * 4.0 * mu.shape[1] * mu.shape[2] * mu.shape[3] * mu.shape[4]
    np.testing.assert_allclose(float(kl_loss(mu2, sigma)), expected, rtol=1e-4)


def test_kl_clamp_parity():
    # the reference clamps KL to [0, 1000] (utils.py:262); opt-in here
    mu = jnp.full((1, 8, 8, 8, 4), 100.0)
    sigma = jnp.ones_like(mu)
    assert float(kl_loss(mu, sigma, clamp=True)) == 1000.0
    assert float(kl_loss(mu, sigma, clamp=False)) > 1000.0


def test_kl_bf16_stable_without_guards():
    """The north-star claim: bf16 inputs, fp32 accumulation, no NaN guards."""
    mu = (jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 16)) * 50).astype(jnp.bfloat16)
    sigma = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), mu.shape)).astype(jnp.bfloat16)
    val = kl_loss(mu, sigma)
    assert np.isfinite(float(val))
    # sigma values straight from exp(clip(logvar)) at the bf16 floor
    tiny_sigma = jnp.full(mu.shape, 1e-8, jnp.bfloat16)
    assert np.isfinite(float(kl_loss(mu, tiny_sigma)))


def test_lsgan_golden_values():
    ones = jnp.ones((2, 3, 3, 3, 1))
    zeros = jnp.zeros_like(ones)
    # G wants logits at 1: perfect generator -> 0
    assert float(lsgan_generator_loss(ones)) == 0.0
    assert float(lsgan_generator_loss(zeros)) == 1.0
    # perfect discriminator: fake->0, real->1 -> loss 0
    assert float(lsgan_discriminator_loss(zeros, ones)) == 0.0
    # fully fooled: fake->1, real->0 -> 0.5*(1+1) = 1
    assert float(lsgan_discriminator_loss(ones, zeros)) == 1.0
