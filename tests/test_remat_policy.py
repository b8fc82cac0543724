"""Remat-mode gradient parity: False vs True/'full' vs 'convs'.

``remat="convs"`` (blocks.remat_wrapped) uses a ``save_only_these_names``
checkpoint policy over the ``resblock_conv`` tags so the backward reuses the
saved MXU conv outputs and recomputes only GroupNorm/SiLU.  Checkpointing
must never change the math — these tests pin gradient equality across all
three modes for both model families (the stage-1 trace audit made 'convs'
the recommended stage-1 training mode, docs/PERFORMANCE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.nn import AutoencoderKL, DiffusionUNet3D

_MODES = [False, True, "convs"]


def _tree_allclose(a, b, atol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


def _ae_grads(remat):
    ae = AutoencoderKL(channels=(8, 16), num_res_blocks=(1, 1),
                       attention_levels=(False, True), latent_channels=4,
                       norm_num_groups=4, remat=remat)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 8, 1))
    params = ae.init({"params": rng, "sample": rng}, x)["params"]

    def loss(p):
        recon, mu, sigma = ae.apply({"params": p}, x,
                                    rngs={"sample": jax.random.PRNGKey(2)})
        return jnp.mean((recon - x) ** 2) + 1e-3 * jnp.mean(mu**2 + sigma**2)

    return params, jax.jit(jax.grad(loss))(params)


def test_autoencoder_remat_modes_grad_parity():
    params_f, g_false = _ae_grads(False)
    for mode in (True, "convs"):
        params_m, g_m = _ae_grads(mode)
        _tree_allclose(params_f, params_m, atol=0)  # same init
        _tree_allclose(g_false, g_m, atol=1e-5)


def _unet_grads(remat):
    unet = DiffusionUNet3D(in_channels=2, out_channels=2, channels=(8, 16),
                           num_res_blocks=(1, 1), attention_levels=(False, True),
                           num_head_channels=(0, 8), norm_num_groups=4,
                           remat=remat)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 2))
    t = jnp.array([3, 7], jnp.int32)
    params = unet.init(rng, x, t)["params"]

    def loss(p):
        return jnp.mean(unet.apply({"params": p}, x, t) ** 2)

    return jax.jit(jax.grad(loss))(params)


def test_unet_remat_modes_grad_parity():
    g_false = _unet_grads(False)
    for mode in (True, "convs"):
        _tree_allclose(g_false, _unet_grads(mode), atol=1e-5)


def test_remat_wrapped_rejects_unknown_mode():
    from ldm3d_tpu.nn.blocks import ResBlock3D, remat_wrapped

    with pytest.raises(ValueError, match="remat must be"):
        remat_wrapped(ResBlock3D, "bogus")
