"""Volumetric attention tests: Pallas flash kernel vs XLA reference path.

The kernel runs in interpreter mode on CPU (numerically identical algorithm);
TPU execution is exercised by the benchmark/entry paths on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.ops.attention import _flash_blocks, _pick_block, volumetric_attention


def _qkv(b=2, n=216, h=4, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, h, d)
    return (jax.random.normal(ks[0], shape), jax.random.normal(ks[1], shape),
            jax.random.normal(ks[2], shape))


def test_flash_matches_xla_fp32():
    q, k, v = _qkv()
    ref = volumetric_attention(q, k, v, use_flash=False)
    out = volumetric_attention(q, k, v, use_flash=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_xla_bf16():
    q, k, v = [x.astype(jnp.bfloat16) for x in _qkv(seed=1)]
    ref = volumetric_attention(q, k, v, use_flash=False).astype(jnp.float32)
    out = volumetric_attention(q, k, v, use_flash=True, interpret=True).astype(jnp.float32)
    # bf16 IO with fp32 accumulation in both paths
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_flash_volumetric_shapes():
    """The UNet's real token counts: 12^3=1728 (level 1) and 6^3=216 (level 2)."""
    for n in (1728, 216):
        q, k, v = _qkv(b=1, n=n, h=8, d=64, seed=2)
        blocks = _flash_blocks(q, k, 512, 512)
        assert blocks is not None, f"no blocks for n={n}"
        out = volumetric_attention(q, k, v, use_flash=True, interpret=True)
        ref = volumetric_attention(q, k, v, use_flash=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pick_block():
    assert _pick_block(1728, 512) == 432
    assert _pick_block(216, 512) == 216
    assert _pick_block(13824, 512) == 512
    assert _pick_block(7, 512) == 0  # no multiple-of-8 divisor


def test_unsupported_shapes_fall_back():
    # n=100 has no multiple-of-8 block divisor (head_dim no longer matters:
    # odd widths are lane-padded)
    q, k, v = _qkv(b=1, n=100, h=2, d=48, seed=3)
    assert _flash_blocks(q, k, 512, 512) is None
    out = volumetric_attention(q, k, v)  # auto -> XLA path, no error
    assert out.shape == q.shape
    with pytest.raises(ValueError):
        volumetric_attention(q, k, v, use_flash=True)


def test_flash_head_dim_32():
    """head_dim 32 (``num_head_channels: 32`` configs) runs the flash path via
    exact lane padding instead of silently falling back (verdict item 8)."""
    for d in (32, 48):
        q, k, v = _qkv(b=1, n=216, h=2, d=d, seed=7)
        out = volumetric_attention(q, k, v, use_flash=True, interpret=True)
        ref = volumetric_attention(q, k, v, use_flash=False)
        assert out.shape == q.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_head_dim_32_gradients():
    q, k, v = _qkv(b=1, n=64, h=2, d=32, seed=8)

    def loss_flash(q, k, v):
        return jnp.sum(volumetric_attention(q, k, v, use_flash=True, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(volumetric_attention(q, k, v, use_flash=False) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-5)


def test_fallback_warning_on_tpu(monkeypatch, caplog):
    """The auto path must warn (once per trace) when a TPU backend falls back
    to O(n^2) attention, so perf cliffs are visible in logs."""
    import logging

    import ldm3d_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    q, k, v = _qkv(b=1, n=100, h=2, d=64, seed=9)
    with caplog.at_level(logging.WARNING, logger="ldm3d_tpu.ops.attention"):
        out = volumetric_attention(q, k, v)
    assert out.shape == q.shape
    assert any("falling back" in r.message for r in caplog.records)


def test_softmax_stability_large_logits():
    """Online softmax must survive large-magnitude logits (bf16 training)."""
    q, k, v = _qkv(b=1, n=64, h=1, d=64, seed=4)
    q = q * 30.0
    out = volumetric_attention(q, k, v, use_flash=True, interpret=True)
    ref = volumetric_attention(q, k, v, use_flash=False)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_flash_attention_gradients_match_xla():
    """Training differentiates through the flash kernel (custom VJP): grads
    must match the XLA attention path. This exact failure mode — Pallas
    forward with no reverse rule — crashed TPU train steps while CPU tests
    silently used the XLA fallback, so this pins it in interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d_tpu.ops.attention import volumetric_attention

    rng = np.random.default_rng(0)
    shape = (2, 64, 2, 64)  # (batch, tokens, heads, head_dim)
    q, k, v = (jnp.asarray(rng.standard_normal(shape, dtype=np.float32)) for _ in range(3))

    def loss_flash(q, k, v):
        out = volumetric_attention(q, k, v, use_flash=True, interpret=True,
                                   block_q=32, block_k=32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        out = volumetric_attention(q, k, v, use_flash=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_flash_backward_gradients_large_head_dim():
    """The d=256 single-head case (the VAE's attention blocks) exercises the
    streamed dK/dV kernel with MULTIPLE q-blocks per kv-block and the
    head_dim-aware block cap (_bwd_blocks): at batch 8 x 4096 tokens the old
    full-row formulation overflowed Mosaic's 16 MB scoped vmem on TPU.
    Gradients must match the XLA path across the q-block accumulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d_tpu.ops.attention import volumetric_attention

    rng = np.random.default_rng(5)
    shape = (1, 128, 1, 256)  # (batch, tokens, heads, head_dim=256)
    q, k, v = (jnp.asarray(0.3 * rng.standard_normal(shape, dtype=np.float32))
               for _ in range(3))

    def loss_flash(q, k, v):
        # block 32 -> 4 q-blocks per kv-block: the scratch accumulators carry
        # across inner-grid iterations and flush once per kv-block
        out = volumetric_attention(q, k, v, use_flash=True, interpret=True,
                                   block_q=32, block_k=32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(volumetric_attention(q, k, v, use_flash=False).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_bwd_blocks_head_dim_cap():
    """Backward block sizes shrink inversely with head_dim (vmem budget) and
    stay divisor-valid; flagship d=64 keeps the defaults untouched."""
    from ldm3d_tpu.ops.attention import _bwd_blocks

    # d=64: cap 512 == default -> unchanged
    assert _bwd_blocks(13824, 13824, 64, 432, 432) == (432, 432)
    # d=256: area budget 131072 -> cap 512, defaults kept (the 2026-08
    # backend fits the full blocks; measured 15.7 -> 9.1 ms fwd+bwd)
    assert _bwd_blocks(4096, 4096, 256, 512, 512) == (512, 512)
    # d=1024: cap 128 -> picked divisors of n that are multiples of 8
    bq, bk = _bwd_blocks(4096, 4096, 1024, 512, 512)
    assert bq <= 128 and bk <= 128
    assert 4096 % bq == 0 and 4096 % bk == 0 and bq % 8 == 0 and bk % 8 == 0
    # no valid divisor under the cap -> falls back to the caller's block
    assert _bwd_blocks(9, 9, 32768, 8, 8) == (8, 8)


def test_flash_forward_streamed_path_matches(monkeypatch):
    """Large-k/v shapes take the streamed forward (kv-blocks on an inner grid
    dim with online-softmax scratch carry); force that path at a small shape
    and pin it against the XLA reference — fwd AND grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d_tpu.ops import attention as A

    monkeypatch.setattr(A, "_MONO_KV_BYTES", 0)  # everything streams
    rng = np.random.default_rng(7)
    shape = (2, 96, 2, 64)
    q, k, v = (jnp.asarray(0.5 * rng.standard_normal(shape, dtype=np.float32))
               for _ in range(3))
    out = A.volumetric_attention(q, k, v, use_flash=True, interpret=True,
                                 block_q=32, block_k=32)
    ref = A.volumetric_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def loss(f):
        def inner(q, k, v):
            o = A.volumetric_attention(q, k, v, use_flash=f, interpret=True,
                                       block_q=32, block_k=32)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return inner

    gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)
