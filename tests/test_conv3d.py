"""Pallas implicit-GEMM conv (ops/conv3d.py): exact parity vs XLA's emitter.

The kernel is the round-3 verdict item-4 attempt (measured slower than XLA
on-chip — see docs/PERFORMANCE.md "Implicit-GEMM A/B, measured" — and kept
as evidence + re-probe material for future toolchains). Parity must hold
regardless: a probe kernel that silently diverges would poison any future
re-measurement. Runs the Pallas interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.ops.conv3d import conv3d_igemm, conv3d_xla

SHAPES = [
    (1, 3, 8, 8, 8, 8),      # generic tiny
    (2, 4, 8, 16, 16, 8),    # multi-batch, rectangular plane, cout != cin
    (1, 2, 4, 8, 64, 64),    # the lane-starved L0 channel width
    (1, 2, 6, 8, 3, 5),      # odd channel counts exercise the pad paths
    (1, 1, 4, 8, 8, 8),      # single depth plane (both halo planes zero)
]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", SHAPES)
def test_parity_vs_xla(shape, dtype):
    B, D, H, W, C, CO = shape
    rng = np.random.default_rng(hash(shape) % 2**32)
    x = jnp.asarray(rng.standard_normal((B, D, H, W, C)), jnp.float32).astype(dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, CO)) * 0.1,
                    jnp.float32).astype(dtype)
    ref = conv3d_xla(x, w).astype(jnp.float32)
    out = conv3d_igemm(x, w, tile_m=max(H * W // 2, 8),
                       interpret=True).astype(jnp.float32)
    scale = max(float(jnp.abs(ref).max()), 1e-6)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    assert float(jnp.abs(ref - out).max()) / scale < tol


def test_rejects_untargeted_shapes():
    x = jnp.zeros((1, 2, 4, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="3x3x3"):
        conv3d_igemm(x, jnp.zeros((5, 5, 5, 8, 8), jnp.float32), interpret=True)
    with pytest.raises(ValueError, match="C <= 64"):
        conv3d_igemm(jnp.zeros((1, 2, 4, 8, 128), jnp.float32),
                     jnp.zeros((3, 3, 3, 128, 128), jnp.float32), interpret=True)
    with pytest.raises(ValueError, match="W % 8"):
        conv3d_igemm(jnp.zeros((1, 2, 4, 12, 8), jnp.float32),
                     jnp.zeros((3, 3, 3, 8, 8), jnp.float32), interpret=True)
