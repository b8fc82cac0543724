"""GroupNorm voxel reductions: XLA MXU-dot formulation + a probed-and-
rejected Pallas alternative.

GroupNorm's statistics (forward) and gradient sums (backward) reduce a
``(B, V, C)`` volume over the huge voxel axis into ``(B, C)``. The default
here is the dot-against-ones formulation (``preferred_element_type=fp32``):
re-measured on the 2026-08 v5e backend with the readback floor properly
amortized (50-step dependent chain; see ``tools/probe_kernels.probe_gn``),
it runs the stage-1 level-0 shape (8, 64^3, 64) in ~0.85 ms — ~630 GB/s
across its two operand reads, essentially HBM speed-of-light for a
two-dot formulation. An earlier in-repo estimate that these reductions sat
"~7x off speed-of-light" came from 10-step chains whose ~2.5 ms/step
tunnel-readback floor inflated every sample; it was wrong.

The Pallas streamed-sums kernels below (fp32 VMEM accumulators, voxel
blocks on the innermost sequential grid dimension — the flash-attention
streaming pattern) were built to beat that phantom gap and measured
STRICTLY SLOWER: 2.4 ms vs 0.85 at (8, 64^3, 64) — the kernel is VPU-bound
on bf16->fp32 converts + reduce adds, with half the lanes idle at C=64 —
and a stage-1 train-step A/B regressed 351.1 -> 426.8 ms. They stay as an
opt-in (``LDM3D_GN=pallas``) so future backends can re-probe cheaply, the
same lifecycle as the lhs_dilation upsample (rejected round 2, adopted
round 2 session 3 after a backend fix).

The kernels are NOT differentiable (no custom VJP) by design: the only
callers sit inside :func:`~ldm3d_tpu.nn.blocks._gn_affine`'s custom VJP,
where autodiff never traces through them.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_sums", "gn_bwd_sums"]

# target bytes for one streamed (block_v, C) operand tile; small enough that
# two operands + accumulators sit far below Mosaic's scoped-VMEM budget,
# large enough to amortize per-block overhead
_BLOCK_BYTES = 1 << 20


def _pick_block_v(v: int, c: int, itemsize: int) -> int:
    """Largest divisor of ``v`` that is a multiple of 8 and keeps a
    ``(block_v, c)`` tile under ``_BLOCK_BYTES``; 0 if none exists."""
    cap = max(8, _BLOCK_BYTES // max(1, c * itemsize))
    best = 0
    for cand in range(8, min(cap, v) + 1, 8):
        if v % cand == 0:
            best = cand
    return best


def _use_pallas(v: int, c: int, itemsize: int) -> int:
    # The Pallas kernels measured slower than the XLA dot on every probed
    # backend so far (module docstring) — they engage only on explicit
    # opt-in, for re-probing after jax/libtpu upgrades.
    if os.environ.get("LDM3D_GN", "").lower() != "pallas":
        return 0
    if jax.default_backend() != "tpu":
        return 0
    return _pick_block_v(v, c, itemsize)


def _sums_kernel(x_ref, s1_ref, s2_ref, acc1, acc2, *, num_blocks: int):
    vi = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # (block_v, C)

    @pl.when(vi == 0)
    def _init():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    acc1[...] += jnp.sum(xb, axis=0, keepdims=True)
    acc2[...] += jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(vi == num_blocks - 1)
    def _flush():
        s1_ref[0] = acc1[...]
        s2_ref[0] = acc2[...]


@functools.partial(jax.jit, static_argnames=("block_v", "interpret"))
def _sums_impl(x, block_v: int, interpret: bool = False):
    b, v, c = x.shape
    num_blocks = v // block_v
    return pl.pallas_call(
        functools.partial(_sums_kernel, num_blocks=num_blocks),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b, num_blocks),
        in_specs=[pl.BlockSpec((1, block_v, c), lambda bi, vi: (bi, vi, 0))],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)


def _resolve_block_v(use_pallas: bool | None, v: int, c: int, itemsize: int) -> int:
    """Shared use_pallas None/True/False resolution for both sum paths
    (0 = use the XLA dot fallback)."""
    if use_pallas is None:
        return _use_pallas(v, c, itemsize)
    return _pick_block_v(v, c, itemsize) if use_pallas else 0


def _dot_ones(t: jax.Array, v: int) -> jax.Array:
    """fp32 voxel-axis reduction as a dot against ones (the measured-fastest
    formulation — module docstring); shared by forward and backward sums."""
    ones = jnp.ones((v,), jnp.float32)
    return jax.lax.dot_general(t, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def gn_sums(x, *, use_pallas: bool | None = None, interpret: bool = False):
    """``(sum_v x, sum_v x^2)`` per (batch, channel), fp32, for ``x (B, V, C)``.

    Defaults to the dot-against-ones XLA formulation (the measured winner —
    module docstring); ``LDM3D_GN=pallas`` engages the streamed kernel on
    TPU when the voxel count has a usable block divisor.
    """
    b, v, c = x.shape
    block_v = _resolve_block_v(use_pallas, v, c, x.dtype.itemsize)
    if block_v:
        s1, s2 = _sums_impl(x, block_v, interpret)
        return s1[:, 0, :], s2[:, 0, :]
    xf = x.astype(jnp.float32)
    return _dot_ones(xf, v), _dot_ones(xf * xf, v)


def _bwd_sums_kernel(dy_ref, x_ref, mean_ref, inv_ref, s1_ref, s2_ref,
                     acc1, acc2, *, num_blocks: int):
    vi = pl.program_id(1)
    dyb = dy_ref[0].astype(jnp.float32)  # (block_v, C)
    xb = x_ref[0].astype(jnp.float32)
    xhat = (xb - mean_ref[0]) * inv_ref[0]  # (1, C) broadcasts over rows

    @pl.when(vi == 0)
    def _init():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    acc1[...] += jnp.sum(dyb, axis=0, keepdims=True)
    acc2[...] += jnp.sum(dyb * xhat, axis=0, keepdims=True)

    @pl.when(vi == num_blocks - 1)
    def _flush():
        s1_ref[0] = acc1[...]
        s2_ref[0] = acc2[...]


@functools.partial(jax.jit, static_argnames=("block_v", "interpret"))
def _bwd_sums_impl(dy, x, mean_c, inv_c, block_v: int, interpret: bool = False):
    b, v, c = x.shape
    num_blocks = v // block_v
    mean3 = mean_c[:, None, :]  # (B, 1, C) so blocks stay >= 3-D
    inv3 = inv_c[:, None, :]
    return pl.pallas_call(
        functools.partial(_bwd_sums_kernel, num_blocks=num_blocks),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b, num_blocks),
        in_specs=[
            pl.BlockSpec((1, block_v, c), lambda bi, vi: (bi, vi, 0)),
            pl.BlockSpec((1, block_v, c), lambda bi, vi: (bi, vi, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, vi: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(dy, x, mean3, inv3)


def gn_bwd_sums(dy, x, mean_c, inv_c, *, use_pallas: bool | None = None,
                interpret: bool = False):
    """``(sum_v dy, sum_v dy*xhat)`` per (batch, channel), fp32.

    ``xhat = (x - mean_c) * inv_c`` is formed on the fly inside the kernel —
    the GroupNorm backward's two reductions in ONE streamed pass over
    ``dy``/``x``. Fallback mirrors :func:`gn_sums`.
    """
    b, v, c = x.shape
    block_v = _resolve_block_v(use_pallas, v, c, x.dtype.itemsize)
    if block_v:
        s1, s2 = _bwd_sums_impl(dy, x, mean_c, inv_c, block_v, interpret)
        return s1[:, 0, :], s2[:, 0, :]
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean_c[:, None, :]) * inv_c[:, None, :]
    return _dot_ones(dyf, v), _dot_ones(dyf * xhat, v)
