"""Pallas GroupNorm-sums kernels (ops/groupnorm.py): interpret-mode parity
with the XLA dot formulation, block-divisor gating, and the end-to-end
GroupNorm32 path staying exact when the kernels engage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.ops.groupnorm import _pick_block_v, gn_bwd_sums, gn_sums

RNG = jax.random.PRNGKey(3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,v,c", [(2, 512, 64), (1, 4096, 32), (3, 256, 128)])
def test_gn_sums_kernel_matches_xla(b, v, c, dtype):
    x = (jax.random.normal(RNG, (b, v, c), jnp.float32) * 2 + 0.5).astype(dtype)
    s1k, s2k = gn_sums(x, use_pallas=True, interpret=True)
    s1x, s2x = gn_sums(x, use_pallas=False)
    tol = 1e-3 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1x),
                               rtol=tol, atol=tol * v)
    np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2x),
                               rtol=tol, atol=tol * v)
    assert s1k.dtype == jnp.float32 and s2k.dtype == jnp.float32


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gn_bwd_sums_kernel_matches_xla(dtype):
    b, v, c = 2, 1024, 64
    x = (jax.random.normal(RNG, (b, v, c), jnp.float32) * 3).astype(dtype)
    dy = jax.random.normal(jax.random.PRNGKey(4), (b, v, c), jnp.float32).astype(dtype)
    mean_c = jax.random.normal(jax.random.PRNGKey(5), (b, c), jnp.float32)
    inv_c = jax.random.uniform(jax.random.PRNGKey(6), (b, c), jnp.float32) + 0.5
    s1k, s2k = gn_bwd_sums(dy, x, mean_c, inv_c, use_pallas=True, interpret=True)
    s1x, s2x = gn_bwd_sums(dy, x, mean_c, inv_c, use_pallas=False)
    tol = 1e-3 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1x),
                               rtol=tol, atol=tol * v)
    np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2x),
                               rtol=tol, atol=tol * v)


def test_block_picker_and_fallback():
    # multiple-of-8 divisor under the byte cap
    bv = _pick_block_v(64 ** 3, 64, 2)
    assert bv % 8 == 0 and (64 ** 3) % bv == 0
    assert bv * 64 * 2 <= (1 << 20)
    # no usable divisor -> 0 -> gn_sums falls back to XLA and still answers
    assert _pick_block_v(9, 64, 2) == 0
    x = jnp.ones((1, 9, 64), jnp.float32)
    s1, s2 = gn_sums(x)  # auto: CPU backend and/or no divisor -> XLA path
    np.testing.assert_allclose(np.asarray(s1), 9.0)
    np.testing.assert_allclose(np.asarray(s2), 9.0)


def test_kernels_are_opt_in(monkeypatch):
    """The Pallas kernels measured slower than the XLA dot (see the module
    docstring of ops/groupnorm.py) — they must NOT engage without
    LDM3D_GN=pallas, even on a TPU backend."""
    from ldm3d_tpu.ops import groupnorm as gnops

    monkeypatch.setattr(gnops.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LDM3D_GN", raising=False)
    assert gnops._use_pallas(4096, 64, 2) == 0
    monkeypatch.setenv("LDM3D_GN", "pallas")
    assert gnops._use_pallas(4096, 64, 2) == _pick_block_v(4096, 64, 2) > 0


def test_groupnorm32_uses_kernels_when_forced(monkeypatch):
    """GroupNorm32 output with the kernels forced on (interpret) matches the
    plain-XLA output bit-for-bit-ish: the kernels change only HOW the sums
    stream, not the math."""
    from ldm3d_tpu.nn.blocks import _gn_affine
    from ldm3d_tpu.ops import groupnorm as gnops

    x = jax.random.normal(RNG, (2, 8, 8, 8, 16), jnp.float32)
    scale = jnp.ones((16,), jnp.float32) * 1.3
    bias = jnp.zeros((16,), jnp.float32) + 0.1
    ct = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss(x, s, b):
        return jnp.sum(_gn_affine(x, s, b, 4, 1e-6) * ct)

    y_ref = _gn_affine(x, scale, bias, 4, 1e-6)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)

    # force the Pallas path (interpret mode) inside the custom VJP
    orig_sums, orig_bwd = gnops._sums_impl, gnops._bwd_sums_impl
    monkeypatch.setattr(gnops, "_use_pallas",
                        lambda v, c, i: _pick_block_v(v, c, i))
    monkeypatch.setattr(gnops, "_sums_impl",
                        lambda x, bv, interpret=False: orig_sums(x, bv, True))
    monkeypatch.setattr(gnops, "_bwd_sums_impl",
                        lambda dy, x, m, i, bv, interpret=False:
                        orig_bwd(dy, x, m, i, bv, True))
    y_k = _gn_affine(x, scale, bias, 4, 1e-6)
    g_k = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-5)
    for a, b_ in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
