"""Volumetric self-attention over flattened D*H*W tokens.

The reference's attention runs inside MONAI blocks on cuDNN / flash-SDP
(reference ``3d_ldm/train_autoencoder.py:110-115`` enables flash SDP). Here the
hot path is a Pallas flash-attention kernel tiled for the MXU; a pure-XLA
einsum path (fp32 softmax accumulation) is used as fallback on CPU meshes, in
tests, and for token counts too small to benefit from tiling.

Shapes follow the JAX convention: q, k, v are ``(batch, tokens, heads, head_dim)``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["volumetric_attention"]


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference XLA path: softmax statistics accumulate in fp32."""
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    """Single-(batch, head, q-block) flash attention with online softmax.

    Grid: (batch*heads, num_q_blocks). Refs are VMEM blocks:
      q_ref: (block_q, head_dim), k_ref/v_ref: (kv_len, head_dim),
      o_ref: (block_q, head_dim).
    """
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, head_dim = q.shape
    num_kv_blocks = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    """Largest divisor of ``n`` that is a multiple of 8 and <= preferred."""
    best = 0
    for cand in range(8, min(preferred, n) + 1, 8):
        if n % cand == 0:
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_attention_impl(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: int, block_k: int, interpret: bool = False,
) -> jax.Array:
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    # fold batch and heads together; tokens-major layout for the kernel
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, kv_len, d)

    grid = (b * h, n // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=kv_len, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kv_len, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, kv_len, d), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i: (g, i, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


# Differentiable wrapper: Pallas kernels have no automatic reverse-mode rule,
# so without this the stage-1/2 TRAIN steps fail to linearize on TPU (the CPU
# test mesh falls back to the XLA path and cannot catch it). Forward = the
# flash kernel; backward recomputes attention through the mathematically
# identical XLA formulation and differentiates that — exact gradients, at the
# memory cost of materializing the (tokens x tokens) matrix for the backward
# only (fine at training patch sizes; a flash backward kernel can replace it
# without changing this interface).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, block_q: int, block_k: int, interpret: bool = False):
    return _flash_attention_impl(q, k, v, block_q, block_k, interpret)


def _flash_attention_fwd(q, k, v, block_q, block_k, interpret):
    return _flash_attention_impl(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_attention_bwd(block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _flash_blocks(q: jax.Array, k: jax.Array, block_q: int, block_k: int) -> tuple[int, int] | None:
    """Resolve usable block sizes, or None when the kernel doesn't apply.

    head_dim must be a lane-friendly multiple of 64; token counts need a
    divisor that is a multiple of 8 (volumetric token counts like 12^3=1728
    or 6^3=216 always have one).
    """
    n, kv = q.shape[1], k.shape[1]
    d = q.shape[-1]
    if d % 64 != 0:
        return None
    bq = _pick_block(n, block_q)
    bk = _pick_block(kv, block_k)
    if bq < 8 or bk < 8:
        return None
    return bq, bk


def volumetric_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    use_flash: bool | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention over volumetric tokens.

    Args:
      q, k, v: ``(batch, tokens, heads, head_dim)``.
      use_flash: force the Pallas path (True), the XLA path (False), or
        auto-select by backend/shape (None).
      interpret: run the Pallas kernel in interpreter mode (CPU tests).
    """
    blocks = _flash_blocks(q, k, block_q, block_k)
    if use_flash is None:
        use_flash = blocks is not None and jax.default_backend() == "tpu"
    if use_flash:
        if blocks is None:
            raise ValueError(f"flash kernel unsupported for shapes q={q.shape} k={k.shape}")
        bq, bk = blocks
        return _flash_attention(q, k, v, bq, bk, interpret)
    return _xla_attention(q, k, v)
